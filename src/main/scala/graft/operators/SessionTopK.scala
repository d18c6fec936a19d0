package graft.operators

import graft.core.SketchConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-window top-K: one HeavyKeeper sketch per (key, activity session),
  * sessions defined by an inactivity gap. Works identically over batch
  * DataFrames and watermarked streams (Spark's `session_window` merges
  * session state in the streaming aggregation's state store; in batch it is
  * a regular aggregation).
  *
  * Scale shape: identical to the tumbling path — partial sketches per
  * (partition x key x session) merge map-side; the shuffle key is
  * (key, session), never the item.
  */
object SessionTopK {

  /** @param df      rows with an event-time column
    * @param key     session partition key (e.g. user)
    * @param ts      event-time column
    * @param gap     inactivity gap, e.g. "1 hour"
    * @param item    counted item
    * @param weight  per-row weight
    * Output: key, session_start, session_end, rank, item, count, fingerprint.
    *
    * Boundary convention (differs from `aggregateGap`!): Spark's
    * `session_window` treats an event exactly `gap` after its predecessor as
    * starting a NEW session (windows are half-open `[start, start+gap)`),
    * while `aggregateGap` — like SQL `lag`-based sessionization and the
    * driver oracle — CONTINUES the session on the boundary timestamp (break
    * only when `ts > prev + gap`). The two agree on every input whose
    * inter-event gaps never land exactly on `gap`.
    */
  def aggregate(df: DataFrame, key: Column, ts: Column, gap: String,
                item: Column, weight: Column, cfg: SketchConfig,
                oversample: Int = 4): DataFrame =
    df.select(key.as("key"), ts.as("ts"),
        item.cast("string").as("item"), weight.cast("long").as("weight"))
      .groupBy(col("key"), session_window(col("ts"), gap))
      .agg(TopK.topkColumn(col("item"), col("weight"), cfg, oversample).as("topk"))
      .select(col("key"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        posexplode(col("topk")).as(Seq("rank0", "e")))
      .select(col("key"), col("session_start"), col("session_end"),
        (col("rank0") + 1).cast("long").as("rank"),
        col("e.item"), col("e.count"), col("e.fingerprint"))

  /** Batch-optimized session top-K via gap detection over a per-key
    * event-time sort: `lag` marks session breaks (gap strictly greater than
    * `gapSeconds`), a running sum numbers the sessions, and ONE hash
    * aggregation on (key, session) builds the per-session sketches.
    *
    * Why this exists alongside `aggregate`: Spark's batch `session_window`
    * runs the sort-heavy UpdatingSessions/MergingSessions machinery, which
    * costs several seconds even on 100k rows. This path is two exchanges
    * total — shuffle on key for the window sort, then the (key, session)
    * aggregation reuses that partitioning (HashPartitioning(key) satisfies
    * the ClusteredDistribution(key, session)), so the sketch aggregation adds
    * NO extra shuffle. At 100 TB the per-key sort is the standard
    * sessionization plan; skewed keys split via the salted variant upstream.
    *
    * Boundary convention matches SQL sessionization (and the driver oracle):
    * an event exactly `gapSeconds` after its predecessor CONTINUES the
    * session; `session_end = last_ts + gap`.
    *
    * Recommended session conf: raise
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
    * 128) well above the expected sessions-per-task, or the aggregate falls
    * back to sort-based execution and serializes a buffer per group through
    * the sort. Verify/Bench set 131072.
    */
  def aggregateGap(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
                   item: Column, weight: Column, cfg: SketchConfig,
                   oversample: Int = 4): DataFrame = {
    // a non-positive gap silently yields degenerate sessions (one row each,
    // session_end < session_start) — refuse, as SlidingTopK.perTick does
    // for windowTicks < 1
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    val byKey = Window.partitionBy(col("key")).orderBy(col("ts"))
    val base = df.select(key.as("key"), ts.as("ts"),
      item.cast("string").as("item"), weight.cast("long").as("weight"))
    // Pin the key exchange's partition count: the stage it feeds — per-key
    // sort, two window passes, and the per-session aggregate — is
    // compute-dense per byte, and AQE's byte-based coalescing bundles the
    // slim event rows into a single task at small shuffle sizes (measured:
    // 441 ms single-task at sf0.1, the query's largest stage). The
    // repartition REPLACES the window's own exchange (HashPartitioning
    // (key, n) satisfies its required distribution), so the one-exchange
    // plan shape is unchanged at any scale.
    val keyParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sessions = base
      .repartition(keyParts, col("key"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byKey))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapSeconds SECOND"), 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // adaptive buffer: sessions typically hold a handful of distinct items,
    // so the exact-map phase avoids allocating + serializing a full sketch
    // per tiny group (the dominant cost in the many-small-groups regime)
    val bufCfg = cfg.copy(k = cfg.k * math.max(1, oversample))
    val cutoff = math.max(64, bufCfg.k * 4)
    sessions
      .groupBy(col("key"), col("sess"))
      .agg(
        min(col("ts")).as("session_start"),
        (max(col("ts")) + expr(s"INTERVAL $gapSeconds SECOND")).as("session_end"),
        graft.plans.AdaptiveTopKAgg.adaptive(
          col("item"), col("weight"), bufCfg, cfg.k, cutoff).as("topk"))
      .select(col("key"), col("session_start"), col("session_end"),
        posexplode(col("topk")).as(Seq("rank0", "e")))
      .select(col("key"), col("session_start"), col("session_end"),
        (col("rank0") + 1).cast("long").as("rank"),
        col("e.item"), col("e.count"), col("e.fingerprint"))
  }
}
