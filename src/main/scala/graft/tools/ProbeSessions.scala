package graft.tools
import graft.core.SketchConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeSessions {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val ev = s.read.parquet("/root/testdata/sf0.1/events.parquet")
    def t(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[sess] $n%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("native count per session")(
      ev.groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
        .agg(count(lit(1))).count())
    t("sketch per session")(
      graft.operators.SessionTopK.aggregate(ev, col("user_id"), col("ts"), "1 hour",
        col("event_type"), lit(1L), SketchConfig.withDefaults(2, width = 256, depth = 3)).count())
    t("sketch per session again")(
      graft.operators.SessionTopK.aggregate(ev, col("user_id"), col("ts"), "1 hour",
        col("event_type"), lit(1L), SketchConfig.withDefaults(2, width = 256, depth = 3)).count())
    s.stop()
  }
}
