package graft.tools

import graft.core.SketchConfig
import graft.operators.TopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bisect the gap-based session top-K plan: window-number only, exact count
  * aggregate, sketch aggregate — which stage eats the time?
  */
object ProbeSessions2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val ev = s.read.parquet("/root/testdata/sf0.1/events.parquet")
    def t(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sess2] $n%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
    }
    val byKey = Window.partitionBy(col("key")).orderBy(col("ts"))
    def sessions = ev.select(col("user_id").cast("long").as("key"), col("ts"),
        col("event_type").cast("string").as("item"), lit(1L).as("weight"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byKey))
      .withColumn("brk", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr("INTERVAL 3600 SECOND"), 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/sess_plan.txt"),
      graft.operators.SessionTopK.aggregateGap(ev, col("user_id").cast("long"),
        col("ts"), 3600L, col("event_type"), lit(1L),
        SketchConfig.withDefaults(2, width = 256, depth = 3))
        .queryExecution.executedPlan.toString)
    (1 to 1).foreach { _ =>
      t("window numbering only")(sessions.count())
      t("groupBy(key,sess) count")(
        sessions.groupBy(col("key"), col("sess")).agg(count(lit(1))).count())
      t("groupBy(key,sess) min/max ts")(
        sessions.groupBy(col("key"), col("sess"))
          .agg(min(col("ts")), max(col("ts"))).count())
      t("groupBy(key,sess) sketch w256")(
        sessions.groupBy(col("key"), col("sess"))
          .agg(TopK.topkColumn(col("item"), col("weight"),
            SketchConfig.withDefaults(2, width = 256, depth = 3), 4).as("topk")).count())
      t("groupBy(key,sess) sketch w64")(
        sessions.groupBy(col("key"), col("sess"))
          .agg(TopK.topkColumn(col("item"), col("weight"),
            SketchConfig.withDefaults(2, width = 64, depth = 2), 4).as("topk")).count())
      t("full aggregateGap count")(
        graft.operators.SessionTopK.aggregateGap(ev, col("user_id").cast("long"),
          col("ts"), 3600L, col("event_type"), lit(1L),
          SketchConfig.withDefaults(2, width = 256, depth = 3)).count())
      t("full aggregateGap collect")(
        graft.operators.SessionTopK.aggregateGap(ev, col("user_id").cast("long"),
          col("ts"), 3600L, col("event_type"), lit(1L),
          SketchConfig.withDefaults(2, width = 256, depth = 3)).collect().length.toLong)
    }
    s.stop()
  }
}
