package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick wall-clock probe of individual SparkEntry queries at sf0.1 —
  * usage: runMain graft.tools.ProbeHot <query> [<query> ...]
  */
object ProbeHot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n  = graft.SparkEntry.queries(name)(spark, sfDir).collect().length
        println(f"[probe] $name%-28s run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
