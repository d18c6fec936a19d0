package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Profile the stateful stream-stream join (`stream_join_follows` shape):
  * split its wall time into streaming machinery vs join work, and compare
  * state-store configurations — the HDFS-backed default vs RocksDB, at
  * 32 vs 8 state partitions.
  *
  * Usage: runMain graft.tools.ProfileStreamJoin [sfDir] [reps]
  *
  * Per-batch numbers come from StreamingQueryProgress.durationMs
  * (triggerExecution = whole batch; addBatch = plan execution incl. state
  * commit; walCommit/commitOffsets/latestOffset/queryPlanning = machinery)
  * and stateOperators (allUpdatesTimeMs / commitTimeMs). Reps interleave
  * across configs; min per config wins (co-tenant noise discipline).
  */
object ProfileStreamJoin {

  final case class RunStats(
      wallSec: Double,
      batches: Int,
      trigMs: Long,
      addBatchMs: Long,
      walMs: Long,
      offsetsMs: Long,
      planMs: Long,
      stateUpdMs: Long,
      stateCommitMs: Long,
      stateRows: Long
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file-stream source needs a directory; link the events table into one
    val srcDir = Files.createTempDirectory("graft_psj_src")
    val target = Paths.get(s"$sfDir/events.parquet").toAbsolutePath.normalize
    Files.createSymbolicLink(srcDir.resolve("events.parquet"), target)
    val schema = spark.read.parquet(target.toString).schema

    def runOnce(provider: String, parts: Int, noData: Boolean = true): RunStats = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      def src() = spark.readStream.schema(schema).parquet(srcDir.toString)
        .select(col("user_id").cast("long").as("key"),
          col("ts").cast("timestamp").as("ts"), col("event_type").as("payload"))
      val out = graft.streaming.StreamJoins.followsWithin(
        src(), src(), withinSeconds = 600L, watermarkDelay = "0 seconds")
      val ckpt = Files.createTempDirectory("graft_psj_ckpt").toString
      val name = s"psj_${System.nanoTime()}"
      val t0   = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val ps   = q.recentProgress
      def d(k: String) = ps.map(p =>
        Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum
      val (upd, com, rows) = ps.foldLeft((0L, 0L, 0L)) { (acc, p) =>
        p.stateOperators.foldLeft(acc) { (a, so) =>
          (a._1 + so.allUpdatesTimeMs, a._2 + so.commitTimeMs,
            math.max(a._3, so.numRowsTotal))
        }
      }
      spark.sql(s"DROP TABLE IF EXISTS $name")
      RunStats(wall, ps.length, d("triggerExecution"), d("addBatch"),
        d("walCommit"), d("commitOffsets"), d("queryPlanning"), upd, com, rows)
    }

    val hdfs = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val rock = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val configs = Seq(
      ("hdfs-8", hdfs, 8, true), ("hdfs-8-nodata-off", hdfs, 8, false),
      ("hdfs-4", hdfs, 4, true), ("hdfs-4-nodata-off", hdfs, 4, false))

    // warmup (JIT + codegen + source listing), then interleaved timed reps
    runOnce(hdfs, 32)
    val best = scala.collection.mutable.Map.empty[String, RunStats]
    for (_ <- 1 to reps; (label, p, n, nd) <- configs) {
      val r = runOnce(p, n, nd)
      if (!best.contains(label) || r.wallSec < best(label).wallSec) best(label) = r
    }

    val md = new StringBuilder
    md.append(s"\n### stream_join_follows profile ($sfDir, min-of-$reps interleaved)\n\n")
    md.append("| config | wall s | batches | trigger ms | addBatch ms | wal+offsets ms | plan ms | state upd ms | state commit ms | state rows peak |\n")
    md.append("|---|---|---|---|---|---|---|---|---|---|\n")
    configs.foreach { case (label, _, _, _) =>
      val r = best(label)
      md.append(f"| $label | ${r.wallSec}%.2f | ${r.batches}%d | ${r.trigMs}%d | ${r.addBatchMs}%d | ${r.walMs + r.offsetsMs}%d | ${r.planMs}%d | ${r.stateUpdMs}%d | ${r.stateCommitMs}%d | ${r.stateRows}%d |\n")
    }
    println(md.toString)
    spark.stop()
  }
}
