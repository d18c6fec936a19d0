package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the flat vs tree merge on the SMALL bench table (27 splits) and the
  * auto cutover: the tree must not tax the small-table flagship number.
  */
object ProbeTreeCutover {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (dir, n) = graft.Bench.ensureBenchTable(spark)
    val raw = spark.read.parquet(dir)
    println(s"[cutover] scan partitions = ${raw.rdd.getNumPartitions}, tokens = $n")
    def run(label: String, fanIn: Int): Unit = {
      graft.operators.TopK.tokensArray(raw, col("tokens"), graft.Bench.cfgLight,
        mergeFanIn = fanIn).collect() // warm
      val t = (1 to 3).map(_ => graft.Bench.time(
        graft.operators.TopK.tokensArray(raw, col("tokens"), graft.Bench.cfgLight,
          mergeFanIn = fanIn).collect())._2).min
      println(f"[cutover] $label%-22s min-of-3 = $t%.3f s")
    }
    run("flat (fanIn=1)", 1)
    run("forced tree (fanIn=8)", 8)
    run("auto (fanIn=64)", 64)
    spark.stop()
  }
}
