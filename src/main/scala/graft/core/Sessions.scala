package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Local-mode defaults tuned for the test harness (local[N] with N shuffle
  * partitions, AQE on, UTC). On a real cluster the same builder is used
  * without `master`, letting spark-submit supply cluster config; shuffle
  * partitions then come from AQE coalescing rather than the static value.
  */
object Sessions {

  /** Build a local session. `cores` controls both parallelism and the static
    * shuffle-partition count — at 100TB scale AQE re-coalesces post-shuffle
    * partitions so the static setting only seeds the initial number.
    */
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // legacy events.parquet generations carry TIMESTAMP(NANOS) (read as
      // LONG under this flag); current ones ship native µs — see
      // QueryUtil.events, which normalizes either shape to TIMESTAMP
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode scan parallelism for few-MB files; clusters keep 128m
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
