package graft

import java.nio.file.{Files, Paths}

import graft.core.{SketchConfig, SlidingConfig}
import graft.plans.TopKAggregates
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-tier throughput: drive the tumbling and sliding engines from a
  * file-stream source over the deterministic bench table and measure
  * end-to-end rates (source -> stateful op -> exactly-once parquet sink).
  * Appends results to BENCH.md.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (dir, nTokens) = Bench.ensureBenchTable(spark)
    val schema = spark.read.parquet(dir).schema
    val nDocs  = spark.read.parquet(dir).count()
    val base   = Files.createTempDirectory("graft_streambench").toString

    // ---- tumbling: windowed TokensTopKAgg straight over the doc stream ----
    // (array-native aggregate inside a streaming window aggregation; fully
    // partition-parallel with map-side partials in the state store)
    val t0 = System.nanoTime()
    val tumbling = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 16).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(TopKAggregates.tokensTopK(col("tokens"),
        SketchConfig.withDefaults(40, width = 1024, depth = 3), 10).as("topk"))
    val q1 = tumbling.writeStream.format("parquet")
      .option("path", s"$base/tumb_out").option("checkpointLocation", s"$base/tumb_ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val tumbSec = (System.nanoTime() - t0) / 1e9
    val tumbTps = (nTokens / tumbSec).toLong

    // ---- sliding: single-key flatMapGroupsWithState state machine ----
    // (the per-key sequential path; measures one sliding window's state
    // machine; scale-out comes from independent keys)
    val updates = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 16).parquet(dir)
      .select(lit("global").as("key"), col("ts"), explode(col("tokens")).as("tok"))
      .select(col("key"), col("ts"), col("tok").cast("string").as("item"), lit(1L).as("weight"))
    val t1 = System.nanoTime()
    val q2 = graft.streaming.TopKStreams.sliding(updates, tickMillis = 3600000L,
        watermarkDelay = "0 seconds",
        cfg = SlidingConfig.withDefaults(20, 6, width = 1024, depth = 3), emitK = 10)
      .writeStream.format("parquet")
      .option("path", s"$base/slide_out").option("checkpointLocation", s"$base/slide_ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val slideSec = (System.nanoTime() - t1) / 1e9
    val slideTps = (nTokens / slideSec).toLong

    val outRows1 = spark.read.parquet(s"$base/tumb_out").count()
    val outRows2 = spark.read.parquet(s"$base/slide_out").count()

    val md =
      f"""
         |## Streaming throughput (file-stream source -> exactly-once parquet sink)
         |
         |Input: the same $nTokens%d-token table ($nDocs%d docs, ts = 1 doc/s),
         |Trigger.AvailableNow, maxFilesPerTrigger=16 (multi-batch),
         |local[$cpus%s].
         |
         || engine | wall sec | tokens/s | output rows |
         ||---|---|---|---|
         || tumbling 1h windows (array-native agg in streaming state) | $tumbSec%.1f | $tumbTps%d | $outRows1%d |
         || sliding 6x1h ticks, ONE key (single state machine; scale-out = independent keys) | $slideSec%.1f | $slideTps%d | $outRows2%d |
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"),
      Files.readString(Paths.get("BENCH.md")) + md)
    println(md)
    spark.stop()
  }
}
