package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, StreamingQueryProgress}

/** Per-partition lineage + metrics for streaming runs (north-rule
  * observability: "resumable from checkpoint with per-partition lineage and
  * metrics").
  *
  * Lineage: Structured Streaming's checkpoint already IS the lineage log —
  * `offsets/<batchId>` records exactly which source offsets (file-source:
  * which files; rate/kafka: which ranges) each batch consumed, and
  * `commits/<batchId>` marks the batch durable. `Lineage.batches` parses the
  * checkpoint into a queryable report: for every batch, the consumed source
  * slice — so any output row is traceable to the input files/offsets that
  * produced it, across restarts.
  *
  * Metrics: `MetricsListener` accumulates per-batch `StreamingQueryProgress`
  * (input rows, process rates, state-store size/rows per stateful operator)
  * for throughput accounting and state-growth monitoring.
  */
object Lineage {

  final case class BatchLineage(
      batchId: Long,
      committed: Boolean,
      sourceOffsets: Seq[String] // one JSON blob per source: files/offset ranges
  )

  /** Parse a checkpoint directory into per-batch lineage records. */
  def batches(checkpointDir: String): Seq[BatchLineage] = {
    val offsets = Paths.get(checkpointDir, "offsets")
    val commits = Paths.get(checkpointDir, "commits")
    if (!Files.isDirectory(offsets)) return Seq.empty
    // Files.list streams hold an open directory fd until closed — leak-free
    // under repeated per-batch monitoring calls
    def listNames(dir: java.nio.file.Path): Seq[String] = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
    val committed: Set[Long] =
      if (Files.isDirectory(commits))
        listNames(commits).flatMap(_.toLongOption).toSet
      else Set.empty
    listNames(offsets)
      .flatMap { name =>
        name.toLongOption.flatMap { id =>
          // offset log: line 1 = "v1", line 2 = metadata JSON, then one
          // offset JSON per source. The engine PURGES old entries past
          // minBatchesToRetain (default 100), so a file listed above can be
          // gone by the time it is read — a monitoring call racing the purge
          // must skip that batch, not throw. (The same purge means the
          // report's horizon is the retained window, not all-time; raise
          // spark.sql.streaming.minBatchesToRetain for a longer trail.)
          try {
            val lines = Files.readAllLines(offsets.resolve(name)).asScala.toSeq
            Some(BatchLineage(id, committed.contains(id), lines.drop(2)))
          } catch { case _: java.io.IOException => None }
        }
      }
      .sortBy(_.batchId)
  }

  /** Human-readable lineage report (batch -> consumed source offsets). */
  def report(checkpointDir: String): String =
    batches(checkpointDir).map { b =>
      val status = if (b.committed) "committed" else "PENDING"
      s"batch ${b.batchId} [$status]: ${b.sourceOffsets.mkString(" | ")}"
    }.mkString("\n")

  /** Per-batch metrics snapshot from StreamingQueryProgress. `queryId` keys
    * the series: batchIds restart from each query's own log, so two queries
    * on one session collide on batchId alone.
    */
  final case class BatchMetrics(
      queryId: java.util.UUID,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double,
      stateRows: Long,
      stateBytes: Long
  )

  /** Listener accumulating per-batch metrics for all queries on a session.
    * Retention is BOUNDED (default 100k batches, oldest dropped): the
    * listener lives for the session, and an unbounded buffer on a 1 s
    * trigger is a slow driver-memory leak in exactly the long-running
    * deployments this exists to monitor.
    */
  final class MetricsListener(maxRetained: Int = 100000) extends StreamingQueryListener {
    // keyed by (queryId, batchId), insertion-ordered: a batch replayed after
    // checkpoint restart (failure between sink write and commit) re-emits
    // the same key and OVERWRITES in place — last write wins at O(1), so
    // consumers summing a series never double-count, no matter how many
    // other queries' batches landed between the original and the replay
    // (a recency-window scan here missed replays past the window).
    private val buf =
      scala.collection.mutable.LinkedHashMap.empty[(java.util.UUID, Long), BatchMetrics]

    def metrics: Seq[BatchMetrics] = buf.synchronized(buf.values.toSeq)

    /** One query's series, in first-arrival order. */
    def metricsFor(queryId: java.util.UUID): Seq[BatchMetrics] =
      metrics.filter(_.queryId == queryId)

    private def record(p: StreamingQueryProgress): Unit = {
      val (rows, bytes) = p.stateOperators.foldLeft((0L, 0L)) { (acc, so) =>
        (acc._1 + so.numRowsTotal, acc._2 + so.memoryUsedBytes)
      }
      add(BatchMetrics(p.id, p.batchId, p.numInputRows, p.processedRowsPerSecond, rows, bytes))
    }

    // seam for the spec: StreamingQueryProgress has no public constructor
    private[streaming] def add(bm: BatchMetrics): Unit = buf.synchronized {
      buf.update((bm.queryId, bm.batchId), bm)
      while (buf.size > maxRetained) buf.remove(buf.head._1)
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      record(e.progress)
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** Attach a metrics listener to the session; returns it for inspection.
    * Attach once per session — repeated attaches stack listeners, each
    * recording every batch and retaining its own (bounded) buffer. Pair
    * with [[detach]] in harnesses that attach per run on a shared session.
    */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }

  /** Remove a listener previously returned by [[attach]]. */
  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.streams.removeListener(l)
}
