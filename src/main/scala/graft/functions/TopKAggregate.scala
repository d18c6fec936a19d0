package graft.functions

import graft.core.{Sketch, SketchConfig}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (item, weight) update — the exploded-token row shape fed to the
  * aggregators. Mirrors the reference's `Add(item, increment)` input
  * (reference: sketch.go:118-120).
  *
  * `weight` is boxed so a NULL weight column degrades to a no-op add (the
  * same null→0 contract as the native SQL path's ItemWeightReader) — as a
  * primitive Long, the input encoder's AssertNotNull would kill the whole
  * query on the first NULL row before `reduce` could guard it.
  */
final case class TokenUpdate(item: String, weight: java.lang.Long)

/** One emitted top-K row. `fingerprint` is the reference's uint32 fingerprint
  * widened to Long (reference: heap/heap.go:11-15).
  */
final case class TopKRow(item: String, count: Long, fingerprint: Long)

object TopKRow {
  /** The one emit/trim definition (fingerprint widening + take(k)) shared by
    * every rows-emitting aggregator finish. */
  private[functions] def fromSketch(buf: Sketch, k: Int): Seq[TopKRow] =
    buf.sortedSlice.iterator.take(k)
      .map(e => TopKRow(e.item, e.count, e.fingerprint.toLong & 0xffffffffL)).toSeq
}

/** Typed Spark aggregator around the plain HeavyKeeper sketch.
  *
  * This is the engine's centerpiece: Spark's partial aggregation runs
  * `reduce` per partition exactly like the reference's single-writer `Add`
  * loop (reference: sketch.go:118-170), then `merge` combines per-partition
  * sketches with the commutative union monoid (engine extension; the
  * reference has no union — SURVEY.md §2.1). On a cluster this is map-side
  * combine: each executor ships one ~O(d·w) sketch per group instead of its
  * raw token stream, so hot keys cannot skew the shuffle.
  *
  * The buffer travels through shuffle as compact codec bytes via the
  * Sketch's serialization proxy (SketchCodec).
  *
  * `oversample`: partial sketches track `k × oversample` candidate items and
  * the final result is trimmed back to k. Bucket counters are completely
  * unaffected by heap capacity (the heap only selects what gets *reported*,
  * reference: sketch.go:169), but a partition-local top-k heap can drop items
  * that are top-k only globally; oversampling the candidate set in the
  * partials recovers them. oversample = 1 reproduces the reference's exact
  * single-writer candidate retention.
  */
final class TopKAggregator(cfg: SketchConfig, oversample: Int = 4)
    extends Aggregator[TokenUpdate, Sketch, Seq[TopKRow]] {

  private val bufCfg = cfg.copy(k = cfg.k * math.max(1, oversample))

  override def zero: Sketch = new Sketch(bufCfg)

  override def reduce(buf: Sketch, in: TokenUpdate): Sketch = {
    if (in != null && in.item != null && in.weight != null)
      buf.add(in.item, in.weight.longValue)
    buf
  }

  override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)

  override def finish(buf: Sketch): Seq[TopKRow] = TopKRow.fromSketch(buf, cfg.k)

  override def bufferEncoder: Encoder[Sketch] = Encoders.javaSerialization[Sketch]

  override def outputEncoder: Encoder[Seq[TopKRow]] = ExpressionEncoder[Seq[TopKRow]]()
}

/** Aggregator variant that emits the serialized sketch itself instead of the
  * top-K rows — for sketch-as-a-value pipelines (store partial sketches per
  * partition/day, merge later; `topk_count`/`topk_query` lookups over the
  * blob without re-scanning the data).
  */
final class TopKSketchBytesAggregator(cfg: SketchConfig)
    extends Aggregator[TokenUpdate, Sketch, Array[Byte]] {
  override def zero: Sketch = new Sketch(cfg)
  override def reduce(buf: Sketch, in: TokenUpdate): Sketch = {
    if (in != null && in.item != null && in.weight != null)
      buf.add(in.item, in.weight.longValue)
    buf
  }
  override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
  override def finish(buf: Sketch): Array[Byte]    = graft.core.SketchCodec.encode(buf)
  override def bufferEncoder: Encoder[Sketch]      = Encoders.javaSerialization[Sketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Sketch-algebra aggregator: unions already-built sketch blobs (the
  * `TOPK.MERGE`-style operation the reference lacks) and emits the union's
  * top-K rows. Enables two-level pipelines: per-tick / per-day / per-source
  * partial sketches materialized once, then window-merged without rescanning
  * the raw data — the "ring of per-tick sub-sketches" sliding realization.
  */
final class MergeSketchesAggregator(cfg: SketchConfig, k: Int)
    extends Aggregator[Array[Byte], Sketch, Seq[TopKRow]] {

  override def zero: Sketch = new Sketch(cfg)

  override def reduce(buf: Sketch, blob: Array[Byte]): Sketch =
    if (blob == null) buf else buf.merge(graft.core.SketchCodec.decode(blob))

  override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)

  override def finish(buf: Sketch): Seq[TopKRow] = TopKRow.fromSketch(buf, k)

  override def bufferEncoder: Encoder[Sketch] = Encoders.javaSerialization[Sketch]

  override def outputEncoder: Encoder[Seq[TopKRow]] = ExpressionEncoder[Seq[TopKRow]]()
}
