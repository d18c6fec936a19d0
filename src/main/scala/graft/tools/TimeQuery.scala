package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-measure of named SparkEntry queries with Bench's exact confs —
  * the tool to run before believing (or disbelieving) any BENCH_rN.json
  * number: `runMain graft.tools.TimeQuery <sfDir> <reps> <name> [name ...]`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <reps> <name> [name ...]")
    val sfDir = args(0)
    val reps  = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      fn(spark, "/root/testdata/sf0.001").collect() // warmup (JIT/codegen)
      val times = (1 to reps).map(_ => graft.Bench.time(fn(spark, sfDir).collect())._2)
      println(f"[timequery] $name%-28s min=${times.min}%.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
