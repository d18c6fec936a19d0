package graft.operators

import graft.core.SketchConfig
import org.apache.spark.sql.{Column, DataFrame}
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
}
