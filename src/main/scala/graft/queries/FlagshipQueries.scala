package graft.queries

import org.apache.spark.sql.functions._
import graft.ingest.CsvSource
import org.apache.spark.sql.types._
import QueryUtil._

/** Flagship analytic queries (multi-join + agg + top-k — the headline bench
  * shapes) and the CSV round-trip that oracle-checks the reference reader
  * option set (S1: header, multiline, escape-quote) end-to-end.
  */
object FlagshipQueries {

  /** Last dataset dir bk1's bucketed tables were built for in THIS JVM
    * (in-process memo: interleaved SF runs rebuild on switch; a new JVM
    * always rebuilds — prior-JVM managed-table state is never trusted).
    */
  private val bk1Built =
    new java.util.concurrent.atomic.AtomicReference[String]()

  private val baseQueries: Map[String, Q] = Map(
    // S1 — write with the reference CSV dialect, read back with the
    // explicit-schema reader; values with embedded comma/quote/newline must
    // survive. Oracle = recomputing the tricky column relationally.
    "s2_csv_roundtrip" -> ((s, d) => {
      val tmp = s"/tmp/graft-csv-roundtrip-${d.replaceAll("[^a-z0-9.]", "_")}"
      table(s, d, "nation")
        .withColumn("tricky",
          concat(col("n_name"), lit(", \"q\"\nend")))
        .coalesce(1)
        .write.mode("overwrite")
        .options(CsvSource.Options).csv(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType),
        StructField("tricky", StringType)))
      CsvSource.read(s, tmp, schema)
        .select(col("n_nationkey"), col("n_name"), col("tricky"))
    }),

    // S4/K1 — managed-table sink + scan round trip through the catalog
    // (`utilities.py:20-30`): overwrite a dim table, read it back by name
    "k1_table_roundtrip" -> ((s, d) => {
      val store = new graft.core.TableStore(s,
        graft.core.PipelineConfig(schema = "verifyk1"))
      store.drop("dim", "nation_copy") // clear any stale prior-JVM location
      store.save(table(s, d, "nation"), "dim", "nation_copy")
      store.load("dim", "nation_copy")
    }),

    // A6 — count() action / batch arithmetic (`reviews_fact.py:82`),
    // as a 1-row aggregate so the oracle can check it
    "a6_count" -> ((s, d) =>
      table(s, d, "orders").agg(count(lit(1)).as("n_rows"))),

    // P2 — schema-driven prefix-strip projection (`auxillary_dims.py:
    // 136-148`): mat_-prefixed source columns publish unprefixed
    "p2_strip_prefix" -> ((s, d) =>
      graft.operators.Projections.stripPrefix(
        table(s, d, "part").select(
          col("p_partkey"),
          col("p_retailprice").as("mat_retailprice"),
          col("p_brand").as("mat_brand")),
        "mat_")),

    // bucketed managed tables: both sides bucketed on the join key land
    // co-located, so the join runs shuffle-free (ScaleSpec asserts the
    // no-Exchange plan); the result is layout-invariant → plain-join
    // oracle. Bucketing is the INGEST-time layout (tables are written
    // bucketed once, joins benefit forever), so the build runs once per
    // (process, dataset) — the memo rebuilds on dataset switch, and a
    // fresh JVM always rebuilds (managed-table state from a prior JVM is
    // dropped, never trusted).
    "bk1_bucketed_join" -> ((s, d) => {
      val store = new graft.core.TableStore(s,
        graft.core.PipelineConfig(schema = "verifybk"))
      // Synchronized check-then-build: two concurrent executions in one
      // JVM would otherwise both see a stale memo and collide mid-build
      // on the shared `verifybk` tables. The lock only guards the
      // once-per-(JVM, dataset) layout build, never the join below.
      // Residual contract: a rebuild for a DIFFERENT dataset while
      // another thread's returned frame still scans these tables is
      // inherently unsafe (shared mutable layout) — interleaved-SF runs
      // must not overlap execution, which the harness's sequential
      // query protocol guarantees.
      bk1Built.synchronized {
        if (bk1Built.get() != d) {
          store.drop("dim", "cust_b"); store.drop("fact", "orders_b")
          store.saveBucketed(table(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            "dim", "cust_b", nBuckets = 8, bucketCols = Seq("c_custkey"))
          store.saveBucketed(table(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
            "fact", "orders_b", nBuckets = 8, bucketCols = Seq("o_custkey"))
          bk1Built.set(d) // only after a completed build
        }
      }
      store.load("fact", "orders_b")
        .join(store.load("dim", "cust_b"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
    }),

    // partitioned managed table + partition-pruned scan (the 100TB fact
    // layout; ScaleSpec asserts PartitionFilters reach the scan)
    "pt1_partition_pruning" -> ((s, d) => {
      val store = new graft.core.TableStore(s,
        graft.core.PipelineConfig(schema = "verifybk"))
      store.drop("fact", "orders_p")
      store.savePartitioned(table(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
        "fact", "orders_p", partitionCols = Seq("o_orderstatus"))
      store.load("fact", "orders_p")
        .filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // skew salting — result is salt-invariant (equals the plain join), so
    // the oracle is the unsalted SQL; what salting changes is only the
    // partitioning (hot keys spread over saltFactor reducers)
    "sk1_salted_join" -> ((s, d) =>
      graft.operators.Skew.saltedJoin(
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        table(s, d, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        keys = Seq("l_partkey"), saltFactor = 8)),

    // two-phase skew-safe aggregation (algebraic → salt-invariant; quantity
    // is integer-valued so double summation is order-exact)
    "sk2_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedSumCount(table(s, d, "lineitem"),
        Seq("l_returnflag"), "l_quantity", saltFactor = 8)),

    // planted power-law stress: one key absorbs ~20% of lineitem (every
    // 5th orderkey folds to -1) — the sk1/sk2 salting asserted on REAL
    // skew, not the mild natural kind. The two-phase salted agg caps any
    // single reducer's share of the hot key at ~1/saltFactor (partition-
    // share bound asserted in ScaleSpec); result is salt-invariant, so
    // the oracle is the plain unsalted GROUP BY
    "sk3_power_law_agg" -> ((s, d) => {
      val li = table(s, d, "lineitem").select(
        when(col("l_orderkey") % 5 === 0, -1L)
          .otherwise(col("l_orderkey")).as("skew_key"),
        col("l_quantity"))
      graft.operators.Skew.saltedSumCount(li, Seq("skew_key"), "l_quantity",
        saltFactor = 32)
    }),

    // S7/raw-catalog — the raw zone as a queryable layer (≙ the reference's
    // `steam.raw.inbound_*` exploration tables, `analysis.sql:20-21`): land
    // nation+region as reference-dialect CSVs, register `raw_*` views, then
    // ad-hoc J3-shape SQL straight over the raw layer.
    "r1_raw_explore" -> ((s, d) => {
      val tmp = s"/tmp/graft-rawzone-${d.replaceAll("[^a-z0-9.]", "_")}"
      Seq("nation", "region").foreach(t =>
        table(s, d, t).coalesce(1).write.mode("overwrite")
          .options(CsvSource.Options).csv(s"$tmp/$t"))
      graft.ingest.RawCatalog.register(s, tmp, Map(
        "nation" -> StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))),
        "region" -> StructType(Seq(
          StructField("r_regionkey", IntegerType),
          StructField("r_name", StringType)))))
      s.sql("""SELECT n_nationkey, n_name, r_name
              |FROM raw_nation JOIN raw_region ON n_regionkey = r_regionkey
              |ORDER BY n_nationkey""".stripMargin)
    }),

    // shipped-revenue top-10 by order among BUILDING customers (Q3 shape):
    // broadcast customer filter, partial-agg, TakeOrderedAndProject
    "h1_top_revenue_orders" -> ((s, d) =>
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        // revenue term hoisted below the aggregate (r20, guide §1.2): an
        // aggregate child re-evaluates at every update-expression
        // reference, so the product + BigDecimal-allocating cast ran
        // 2-3× per surviving row; projected once, AFTER the joins so
        // dropped rows never pay it
        .withColumn("_rev",
          dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dec(sum(col("_rev")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)),

    // local-supplier revenue by nation in ASIA (Q5 shape): 5-way star with
    // the customer-nation = supplier-nation colocation predicate
    "h2_region_nation_revenue" -> ((s, d) =>
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        // supplier grows linearly with SF (10k·SF rows): no broadcast
        // HINT — a hint forces the build side at ANY size (the latent
        // 100 TB OOM), while the unhinted join broadcasts while under
        // the size threshold and degrades to a shuffle join at scale.
        // Hints stay only on the fixed-cardinality dims (region 5,
        // nation 25 rows by data-model spec, forever).
        .join(table(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(table(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        // revenue term hoisted below the aggregate — see h1 (guide §1.2)
        .withColumn("_rev",
          dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .groupBy(col("n_name"))
        .agg(dec(sum(col("_rev")), 4).as("revenue")))
  )

  lazy val queries: Map[String, Q] = baseQueries ++ extraQueries

  private val rankWindow =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))

  private val extraQueries: Map[String, Q] = Map(
    // returned-item revenue by customer (Q10 shape): filtered fact join,
    // per-customer agg, top-k
    "h3_returned_revenue" -> ((s, d) =>
      table(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        // revenue term hoisted below the aggregate — see h1 (guide §1.2)
        .withColumn("_rev",
          dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dec(sum(col("_rev")), 4).as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)),

    // large-quantity orders (Q18 shape): aggregate-then-filter on the fact
    // producing a compact key set, joined back to orders/customer — the
    // "HAVING subquery as semi-join" pattern
    "h4_big_orders" -> ((s, d) => {
      val big = table(s, d, "lineitem")
        // quantity cast hoisted below the aggregate — see h1 (guide §1.2)
        .withColumn("_dqty", dec(col("l_quantity")))
        .groupBy(col("l_orderkey"))
        .agg(dec(sum(col("_dqty")), 2).as("total_qty"))
        .filter(col("total_qty") > 250)
      big.join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    }),

    // rank family: dense_rank + percent_rank per segment
    "w3_rank_family" -> ((s, d) =>
      table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          dense_rank().over(rankWindow).as("acct_dense_rank"),
          percent_rank().over(rankWindow).cast("decimal(18,6)")
            .as("acct_pct_rank"))
        .filter(col("acct_dense_rank") <= 10))
  )

  private val extraOracle: Map[String, String] = Map(
    "h4_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_qty
        | FROM lineitem GROUP BY 1
        | HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        | CAST(total_qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin,
    "h3_returned_revenue" ->
      """SELECT c_custkey, c_name,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS lost_revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "w3_rank_family" ->
      """SELECT c_custkey, c_mktsegment, acct_dense_rank,
        | CAST(CAST(acct_pct_rank AS DECIMAL(18,6)) AS DOUBLE) AS acct_pct_rank FROM (
        | SELECT c_custkey, c_mktsegment,
        |  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS acct_dense_rank,
        |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS acct_pct_rank
        | FROM customer)
        |WHERE acct_dense_rank <= 10""".stripMargin
  )

  private val baseOracle: Map[String, String] = Map(
    "k1_table_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "a6_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders",
    "p2_strip_prefix" ->
      "SELECT p_partkey, p_retailprice AS retailprice, p_brand AS brand FROM part",
    "bk1_bucketed_join" ->
      "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey",
    "pt1_partition_pruning" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'P'",
    "sk1_salted_join" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, p_brand FROM lineitem JOIN part ON l_partkey = p_partkey",
    "sk2_salted_agg" ->
      "SELECT l_returnflag, SUM(l_quantity) AS sum_l_quantity, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1",
    "sk3_power_law_agg" ->
      """SELECT CASE WHEN l_orderkey % 5 = 0 THEN -1 ELSE l_orderkey END AS skew_key,
        | SUM(l_quantity) AS sum_l_quantity, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "r1_raw_explore" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "s2_csv_roundtrip" ->
      """SELECT n_nationkey, n_name,
        | n_name || ', "q"' || chr(10) || 'end' AS tricky
        |FROM nation""".stripMargin,
    "h1_top_revenue_orders" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "h2_region_nation_revenue" ->
      """SELECT n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin
  )

  lazy val oracle: Map[String, String] = baseOracle ++ extraOracle
}
