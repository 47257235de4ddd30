package graft.queries

object CatalogDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try { q(spark, "/root/testdata/sf0.001").schema }
      catch { case e: Throwable =>
        println(s"FAILQUERY $name -> ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(150))
      }
    }
    println("DONE")
    spark.stop()
  }
}
