package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Is the 32-thread degradation Spark-wide (native hash agg too) or specific
  * to the sketch aggregate? Measures both at given core counts. */
object SparkScaleProbe {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(8, 32)) {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val raw = s.read.parquet("data/scaling_tokens")
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] local[$cores%d] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      t("warmup scan")(raw.count())
      t("scan count")(raw.count())
      t("explode count")(raw.select(explode(col("tokens")).as("t")).count())
      t("native groupBy(int) count")(
        raw.select(explode(col("tokens")).as("t")).groupBy("t").count()
          .orderBy(desc("count")).limit(5).collect())
      t("sketch tokensArray light")(
        graft.operators.TopK.tokensArray(raw, col("tokens"), graft.Bench.cfgLight).collect())
      t("sketch tokensArray again")(
        graft.operators.TopK.tokensArray(raw, col("tokens"), graft.Bench.cfgLight).collect())
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
