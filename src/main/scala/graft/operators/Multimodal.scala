package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-batch transforms.
  *
  * The Spark-side plumbing — schemas, partition-parallel batch processing,
  * deterministic outputs — is real and tested. The *codec* step is a
  * clearly-marked deterministic STUB (`fakeDecode`): this container has no
  * image/audio libraries, so the stub derives a fake "decoded" representation
  * from the payload bytes (stable across runs/executors). Swapping in a real
  * codec is a one-function change; every schema and operator contract stays.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = false),     // e.g. jpeg/wav/mp4
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)
  ))

  /** The media table contract: (doc_id string, payload binary, meta struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMetaSchema, nullable = false)
  ))

  /** Derive a deterministic media table from any (id, text) table — the
    * sandbox stand-in for real blobs: payload = UTF-8 bytes, metadata derived
    * from deterministic hashes. Lets every downstream operator be exercised
    * end-to-end without external data.
    */
  def syntheticMediaTable(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.cast("string").as("doc_id"),
      text.cast("binary").as("payload"),
      struct(
        when(pmod(xxhash64(text), lit(3)) === 0, "image")
          .when(pmod(xxhash64(text), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        lit("fake").as("format"),
        (pmod(xxhash64(text, lit(1)), lit(512)) + 16).cast("int").as("width"),
        (pmod(xxhash64(text, lit(2)), lit(512)) + 16).cast("int").as("height"),
        (pmod(xxhash64(text, lit(3)), lit(60000)) + 1000).as("duration_ms")
      ).as("meta"))

  /** STUB codec: a real deployment replaces this with an actual image/audio
    * decode (e.g. via JNI codecs or columnar Arrow handoff). Marked stub per
    * the sandbox contract (no media libraries in this container).
    *
    * Deterministic and LINEAR in payload + n: one pass sums the payload bytes
    * into a seed (the same mod 2^31-1 checksum as [[mediaStats]]), then a
    * Lehmer-style integer stream generates the "pixels". All arithmetic stays
    * inside non-negative 63-bit longs and every emitted value is m/2^20 with
    * m < 2^20 — EXACTLY representable in float32 — so the whole stub is
    * recomputable in plain SQL (BIGINT ops, no wrap-around) and the driver
    * oracle can differentially verify feature extraction end-to-end.
    */
  /** Byte-sum mod 2^31-1 — the ONE checksum definition shared by
    * [[fakeDecode]]'s seed and [[mediaStats]]'s `byte_checksum` column; the
    * oracle's ability to recompute decode seeds from mediaStats output
    * depends on these never drifting apart.
    */
  private def byteChecksum(payload: Array[Byte]): Long = {
    var acc = 0L
    var i   = 0
    while (i < payload.length) { acc = (acc + (payload(i) & 0xff)) % 2147483647L; i += 1 }
    acc
  }

  private[operators] def fakeDecode(payload: Array[Byte], n: Int): Array[Float] = {
    val base = byteChecksum(payload)
    val out = new Array[Float](n)
    var i   = 0
    while (i < n) {
      // (base + i + 1) < 2^31 + n; * 2654435761 < 2^63 — no Long overflow,
      // and no BIGINT overflow in an oracle re-computation either
      val k = ((base + i + 1L) * 2654435761L + 40503L * i) % 2147483648L
      val w = (k * 48271L) % 2147483647L
      out(i) = (w >> 11).toFloat / 1048576.0f
      i += 1
    }
    out
  }

  /** Feature extraction: payload -> fixed-size float vector (deterministic;
    * decode step stubbed). Runs partition-parallel, one batch per task.
    */
  def extractFeatures(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(dim > 0, s"feature dimension must be positive, got $dim")
    udf((payload: Array[Byte]) => if (payload == null) null else fakeDecode(payload, dim))
  }

  /** "Resize": decode (stub) a fixed 4× oversampled stream, then downsample
    * to (w × h) values by strided mean pooling — the batch shape and column
    * contract of a real resize, at cost linear in payload + w·h.
    */
  def resize(w: Int, h: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(w > 0 && h > 0, s"resize dimensions must be positive, got ${w}x$h")
    val stride = 4
    // w*h*stride is Int arithmetic downstream (array sizes, loop indices):
    // fail at construction, not with a per-row NegativeArraySizeException
    require(w.toLong * h * stride <= Int.MaxValue,
      s"resize ${w}x$h x$stride oversample exceeds Int range (${w.toLong * h * stride})")
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val full = fakeDecode(payload, w * h * stride)
        val out  = new Array[Float](w * h)
        var i    = 0
        while (i < w * h) {
          var s = 0.0f
          var j = 0
          while (j < stride) { s += full(i * stride + j); j += 1 }
          out(i) = s / stride
          i += 1
        }
        out
      }
    }
  }

  /** Frame sampling for "video" payloads: split the payload into nFrames
    * deterministic byte chunks (the batch/offset arithmetic of real frame
    * extraction), emit one row per sampled frame.
    */
  def sampleFrames(df: DataFrame, nFrames: Int): DataFrame = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val frameUdf = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Array.empty[Array[Byte]]
      else {
        val size = math.max(1, payload.length / nFrames)
        (0 until math.min(nFrames, payload.length)).map { f =>
          val from = f * size
          java.util.Arrays.copyOfRange(payload, from, math.min(from + size, payload.length))
        }.toArray
      }
    }
    df.select(col("doc_id"), col("meta"), posexplode(frameUdf(col("payload")))
        .as(Seq("frame_idx", "frame_bytes")))
  }

  /** Per-media statistics usable against a SQL oracle: payload length and a
    * simple byte checksum (sum of unsigned bytes mod 2^31-1) — both exactly
    * computable in DuckDB for differential verification.
    */
  def mediaStats(df: DataFrame): DataFrame = {
    val checksum = udf { (payload: Array[Byte]) =>
      if (payload == null) 0L else byteChecksum(payload)
    }
    df.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("payload_len"),
      checksum(col("payload")).as("byte_checksum"),
      col("meta.media_type").as("media_type"))
  }
}
