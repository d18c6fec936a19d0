package graft.tools

import java.nio.file.Files
import java.sql.Timestamp

import graft.core.SlidingConfig
import graft.streaming.TopKStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Example / smoke driver for the streaming engines: file-source in,
  * exactly-once parquet sink out, kill + resume from checkpoint.
  * Run: `sbt "runMain graft.tools.DriveStream"`.
  */
object DriveStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Files.createTempDirectory("graft_drive_stream").toString
    val in   = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    println(s"[drive] dirs under $base")

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("ts", TimestampType),
      StructField("item", StringType), StructField("weight", LongType)))

    def feed(rows: Seq[(String, Long, String, Long)]): Unit =
      rows.map { case (k, ms, i, w) => (k, new Timestamp(ms), i, w) }
        .toDF("key", "ts", "item", "weight")
        .coalesce(1).write.mode("append").parquet(in)

    def run(): Unit = {
      val q = TopKStreams.sliding(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
        tickMillis = 1000L, watermarkDelay = "0 seconds",
        cfg = SlidingConfig.withDefaults(3, 3, width = 256, depth = 3), emitK = 3)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // session 1: ticks 0..2 of a hot/warm stream
    feed(Seq(("g", 100L, "hot", 10L), ("g", 200L, "warm", 3L)))
    feed(Seq(("g", 1100L, "hot", 10L), ("g", 2100L, "cold", 1L), ("g", 2200L, "hot", 5L)))
    feed(Seq(("g", 4100L, "hot", 2L))) // watermark pusher for t<=3
    run()
    val mid = spark.read.parquet(out).orderBy("tick", "rank")
    println("[drive] after session 1:")
    mid.collect().foreach(r => println(s"[drive]   $r"))

    // kill + resume: more data, same checkpoint
    feed(Seq(("g", 6100L, "late_burst", 50L), ("g", 8100L, "end", 1L)))
    run()
    println("[drive] after resume:")
    spark.read.parquet(out).orderBy("tick", "rank")
      .collect().foreach(r => println(s"[drive]   $r"))

    println("[drive] per-partition lineage (checkpoint offset log):")
    graft.streaming.Lineage.report(ckpt).linesIterator
      .foreach(l => println(s"[drive]   $l"))
    spark.stop()
  }
}
