package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-CAPACITY probe for the stream-stream-join state-store dial.
  *
  * ProfileStreamJoin showed the HDFS-backed (heap) provider beating RocksDB
  * at sf0.1 state sizes (~200k rows) — and BENCH.md asserts RocksDB wins
  * "when state no longer fits the executor heap", which until this tool was
  * an extrapolation. This probe grows join state to ~20M rows (~GBs): the
  * full 10M-event ScaleCorpus stream on BOTH join sides with disjoint keys
  * (left = even ids, right = odd), so nothing matches (zero output rows —
  * join compute excluded by construction), and a WATERMARK DELAY far wider
  * than the stream's event-time span, so neither side's state is ever
  * evictable. The delay — not the join interval — is what pins BOTH sides:
  * the `ts_b > ts_a` bound gives the right side a state watermark equal to
  * the global watermark, so with a small delay right-side rows are evicted
  * every commit no matter how wide the interval is. The result is a pure
  * measurement of state-store insert/commit/footprint at a state size that
  * EXCEEDS a production executor's per-store heap share.
  *
  * Run each provider in its OWN JVM with a pinned heap — the heap-backed
  * store is EXPECTED to OOM below the crossover, and that must not take the
  * other provider's measurement down:
  *
  *   SPARK_DRIVER_MEM=5g sbt "runMain graft.tools.BigStateProbe hdfs 8"
  *   SPARK_DRIVER_MEM=5g sbt "runMain graft.tools.BigStateProbe rocksdb 8"
  *
  * Results are hand-merged into BENCH.md (state-store crossover section).
  */
object BigStateProbe {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val provider = args.headOption.getOrElse("hdfs")
    val parts    = if (args.length > 1) args(1).toInt else 8
    val nUsers   = if (args.length > 2) args(2).toLong else 100000L
    val providerClass = provider match {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case other => sys.error( // a typo must not publish a mislabeled number
        s"unknown provider '$other' (use hdfs | rocksdb)")
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = graft.sources.ScaleCorpus.ensure(s"data/scale_events_$nUsers",
      () => graft.sources.ScaleCorpus.events(spark, nUsers))
    val schema = spark.read.parquet(dir).schema
    val nEvents = spark.read.parquet(dir).count()

    // both sides read the same files; key parity makes the sides disjoint
    def side(parity: Int) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(dir)
      .select((col("user_id") * 2 + parity).cast("long").as("key"),
        col("ts"), col("event_type").as("payload"))

    val out = graft.streaming.StreamJoins.followsWithin(
      side(0), side(1), withinSeconds = 1000000L, watermarkDelay = "3650 days")
    val ckpt = Files.createTempDirectory("graft_bigstate_ckpt").toString
    val heap = Runtime.getRuntime.maxMemory() >> 20
    println(s"[bigstate] provider=$provider parts=$parts events=$nEvents " +
      s"(2 sides), heap=${heap}MB")
    val t0 = System.nanoTime()
    val q = out.writeStream.format("memory").queryName("bigstate")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val ps   = q.recentProgress
    def d(k: String) = ps.map(p =>
      Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum
    var rows = 0L; var mem = 0L; var upd = 0L; var com = 0L
    ps.foreach(_.stateOperators.foreach { so =>
      rows = math.max(rows, so.numRowsTotal)
      mem = math.max(mem, so.memoryUsedBytes)
      upd += so.allUpdatesTimeMs; com += so.commitTimeMs
    })
    // RocksDB reports footprint via custom metrics, not memoryUsedBytes
    val rocksMem = ps.flatMap(_.stateOperators).flatMap { so =>
      import scala.jdk.CollectionConverters._
      so.customMetrics.asScala.collect {
        case (k, v) if k.toLowerCase.contains("memory") => v.longValue()
      }
    }.foldLeft(0L)(math.max)
    println(f"[bigstate] $provider-$parts wall=$wall%.1f s batches=${ps.length}%d " +
      f"stateRows=$rows%d stateMem=${math.max(mem, rocksMem) >> 20}%d MB " +
      f"updMs=$upd%d commitMs=$com%d addBatchMs=${d("addBatch")}%d")
    spark.stop()
  }
}
