package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff of two table generations — the change-data-capture /
  * snapshot-reconciliation report: which keys were `added`, `removed`,
  * or `changed` between an old and a new snapshot of the same schema.
  * The audit face of [[graft.core.Tables.upsert]]: upsert applies a
  * delta, diff recovers one.
  *
  * Values are compared with NULL-SAFE equality per column (`<=>`), never
  * via string casts — numeric render formats differ across engines and a
  * row fingerprint built from them would drift; column-wise `<=>` compares
  * the values themselves and treats NULL = NULL as unchanged.
  *
  * Shape at scale: one full-outer equi-join on the key columns — the
  * minimal shuffle any exact diff pays, partitioned by key on both sides
  * (co-partitioned/bucketed generations join without an exchange, the
  * bk1 posture). Unchanged keys are dropped in the same stage, so the
  * output is delta-sized, not table-sized.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing `valueCols`
    * (default: every non-key column of `oldDf`). Output: the key columns
    * plus `change` ∈ {'added','removed','changed'}; unchanged keys are
    * omitted. Both inputs must carry all key and value columns.
    *
    * CONTRACT: `keyCols` identify AT MOST ONE row per snapshot (and are
    * non-null). A duplicated key multiplies rows through the full-outer
    * join and [[applyDelta]] would then rebuild a corrupt image — with no
    * error, since the join itself is well-defined. The contract is not
    * checked by default (a groupBy-count over both snapshots is real work
    * at 100 TB); pass `checkUniqueKeys = true` in validation runs to fail
    * loudly on the first duplicated key instead. No input column may be
    * named `change` (the classification output column — checked).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           valueCols: Seq[String] = Nil,
           checkUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val vals =
      if (valueCols.nonEmpty) valueCols
      else oldDf.columns.toSeq.filterNot(keyCols.contains)
    (keyCols ++ vals).foreach { c =>
      require(oldDf.columns.contains(c) && newDf.columns.contains(c),
        s"diff: column '$c' must exist in both snapshots")
    }
    require(!(keyCols ++ vals).contains("change"),
      "diff: a key/value column named 'change' would collide with the " +
        "classification output column — rename it before diffing")
    if (checkUniqueKeys)
      Seq("old" -> oldDf, "new" -> newDf).foreach { case (side, df) =>
        val dup = df.groupBy(keyCols.map(col): _*)
          .count().filter(col("count") > 1).limit(1).collect()
        if (dup.nonEmpty) throw new IllegalArgumentException(
          s"diff: $side snapshot has duplicated key " +
            keyCols.zip(dup.head.toSeq).map { case (k, v) => s"$k=$v" }
              .mkString("(", ", ", ")") +
            " — snapshots must hold at most one row per key")
      }
    val o = oldDf.select((keyCols ++ vals).map(col): _*).as("o")
    val n = newDf.select((keyCols ++ vals).map(col): _*).as("n")
    val keyEq = keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val valsEq =
      if (vals.isEmpty) lit(true)
      else vals.map(v => col(s"o.$v") <=> col(s"n.$v")).reduce(_ && _)
    // key presence: any key column non-null on that side (keys are
    // non-null by contract; the first key column stands in for presence)
    val inOld = col(s"o.${keyCols.head}").isNotNull
    val inNew = col(s"n.${keyCols.head}").isNotNull
    o.join(n, keyEq, "full_outer")
      .withColumn("change",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(!valsEq, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(k =>
        coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) :+ col("change"): _*)
  }

  /** Value-carrying diff: [[diff]]'s classification plus the NEW-side
    * value columns on `added`/`changed` rows (NULL on `removed`) — the
    * delta format [[applyDelta]] consumes. Same single full-outer join,
    * same unique-key contract as [[diff]].
    */
  def diffWithValues(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                     valueCols: Seq[String] = Nil,
                     checkUniqueKeys: Boolean = false): DataFrame = {
    val vals =
      if (valueCols.nonEmpty) valueCols
      else oldDf.columns.toSeq.filterNot(keyCols.contains)
    val d = diff(oldDf, newDf, keyCols, vals, checkUniqueKeys)
    d.join(newDf.select((keyCols ++ vals).map(col): _*), keyCols, "left")
      .select(keyCols.map(col) ++ (col("change") +: vals.map(col)): _*)
  }

  /** Apply a [[diffWithValues]] delta to the OLD snapshot, reproducing
    * the NEW one — the CDC-consumer half: a downstream replica holding
    * `oldDf` catches up from the delta alone, never re-reading the
    * source table. `removed`/`changed` keys leave the old image
    * (one anti-join), `added`/`changed` rows enter with their delta
    * values (a union) — delta-sized work against the old snapshot's one
    * key-shuffle, the same posture as [[graft.core.Tables.upsert]]'s
    * merge (and at scale the anti-join broadcasts the delta keys).
    */
  def applyDelta(oldDf: DataFrame, delta: DataFrame,
                 keyCols: Seq[String]): DataFrame = {
    val vals = oldDf.columns.toSeq.filterNot(keyCols.contains)
    require(!vals.contains("change"),
      "applyDelta: the old snapshot has a value column named 'change', " +
        "colliding with the delta's classification column — rename it")
    (keyCols :+ "change").foreach { c =>
      require(delta.columns.contains(c), s"applyDelta: delta missing '$c'")
    }
    val gone = delta.filter(col("change").isin("removed", "changed"))
      .select(keyCols.map(col): _*)
    val incoming = delta.filter(col("change").isin("added", "changed"))
      .select((keyCols ++ vals).map(col): _*)
    oldDf.select((keyCols ++ vals).map(col): _*)
      .join(gone, keyCols, "left_anti")
      .unionByName(incoming)
  }
}
