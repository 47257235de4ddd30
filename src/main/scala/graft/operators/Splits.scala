package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-split assignment — the train/validation/test
  * partitioner of a training-data pipeline.
  *
  * The bucket is a pure per-row projection: first 8 hex chars of
  * `md5(id)` → integer mod 100. Using md5 (rather than `xxhash64`/murmur)
  * makes the assignment portable across engines — any system with md5
  * reproduces the exact same split, so an experiment's split survives an
  * engine migration byte-for-byte. No shuffle, codegen'd builtins only;
  * partition the written table by `split` and downstream readers prune
  * whole splits at the scan.
  */
object Splits {

  /** Stable bucket in [0, 100) from the row id. */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Add a `split` column: `train` / `validation` / `test` with the given
    * percentages (test gets the remainder).
    */
  def assignSplit(df: DataFrame, idCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct val=$valPct")
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "validation")
        .otherwise("test"))
  }
}
