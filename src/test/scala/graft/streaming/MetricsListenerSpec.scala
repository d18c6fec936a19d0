package graft.streaming

import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite

/** Replay-dedup and retention semantics of Lineage.MetricsListener (no
  * Spark session needed: driven through the package-private `add` seam,
  * since StreamingQueryProgress has no public constructor).
  */
class MetricsListenerSpec extends AnyFunSuite {

  private def bm(q: UUID, batch: Long, rows: Long) =
    Lineage.BatchMetrics(q, batch, rows, 0.0, 0L, 0L)

  test("a replayed (queryId, batchId) overwrites, regardless of interleaving distance") {
    // the regression this pins: a recency-window scan (last 64 entries)
    // missed a replay once 64+ batches from OTHER queries landed between
    // the original and the replay — the duplicate then double-counted
    val l = new Lineage.MetricsListener()
    val a = UUID.randomUUID(); val b = UUID.randomUUID()
    l.add(bm(a, 0L, 100L))
    for (i <- 0 until 200) l.add(bm(b, i.toLong, 1L)) // 200 > any window
    l.add(bm(a, 0L, 100L)) // checkpoint-restart replay of A's batch 0
    assert(l.metricsFor(a).map(_.numInputRows).sum == 100L,
      "replayed batch double-counted")
    assert(l.metricsFor(b).size == 200)
    // same batchId on DIFFERENT queries must stay distinct series
    assert(l.metricsFor(b).map(_.numInputRows).sum == 200L)
  }

  test("retention bound drops oldest entries, never the newest") {
    val l = new Lineage.MetricsListener(maxRetained = 10)
    val q = UUID.randomUUID()
    for (i <- 0 until 25) l.add(bm(q, i.toLong, i.toLong))
    val kept = l.metricsFor(q).map(_.batchId)
    assert(kept == (15L until 25L).toSeq, s"kept=$kept")
  }

  test("replay overwrite keeps first-arrival order and updates the value") {
    val l = new Lineage.MetricsListener()
    val q = UUID.randomUUID()
    l.add(bm(q, 0L, 5L)); l.add(bm(q, 1L, 7L))
    l.add(bm(q, 0L, 6L)) // replay with a corrected count
    assert(l.metricsFor(q).map(b => (b.batchId, b.numInputRows)) ==
      Seq((0L, 6L), (1L, 7L)))
  }
}
