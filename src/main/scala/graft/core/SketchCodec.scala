package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Compact versioned binary layout for sketches — the serialization boundary
  * between Spark's execution (partial-aggregate shuffles, state stores,
  * checkpoints) and the mutable in-memory sketch objects.
  *
  * The reference documents its structs as "serializable using any
  * serialization method" (reference: sketch.go:20, sliding/sketch.go:17-18);
  * this is our concrete layout: header (magic, version, config), RNG stream
  * position (for exact replay), cell arrays, heap entries.
  */
object SketchCodec {
  // "2" layouts: heap items are length-prefixed raw UTF-8 (writeUTF's 64 KB
  // modified-UTF-8 limit would crash serialization of any sketch tracking a
  // long item — item values are arbitrary user strings).
  // COMPATIBILITY: the v1 ("TKP1"/"TKS1") layout is pre-release-only and has
  // no read path — decode fails loudly on it. This is deliberate: no v1 blob
  // or streaming checkpoint exists outside this repo's own development
  // history. Post-release layout changes must keep a fallback reader.
  private final val MagicPlain: Int   = 0x544b5032 // "TKP2"
  private final val MagicSliding: Int = 0x544b5332 // "TKS2"

  /** Length-prefixed raw UTF-8 item framing (writeUTF would cap items at
    * 64 KB modified UTF-8) — shared with the streaming state codec so the
    * framing cannot drift between the two.
    */
  private[graft] def writeItem(out: DataOutputStream, item: String): Unit =
    writeBlock(out, item.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[graft] def readItem(in: DataInputStream): String =
    new String(readBlock(in), java.nio.charset.StandardCharsets.UTF_8)

  /** Length-prefixed raw byte block — THE framing primitive (items above,
    * nested sketch blobs in the aggregate buffers). All length-prefixed
    * writes go through here so the framing cannot drift between codecs.
    */
  private[graft] def writeBlock(out: DataOutputStream, bytes: Array[Byte]): Unit = {
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private[graft] def readBlock(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    // validate against the stream's remaining bytes BEFORE allocating: a
    // corrupted length prefix (state-store / shuffle blob damage) must fail
    // as a catchable decode error, not a negative-size crash or a 2 GB
    // allocation attempt that can OOM the executor. All decode paths wrap
    // in-memory byte arrays, so available() is the exact remainder.
    require(len >= 0 && len <= in.available(),
      s"corrupt sketch payload: block length $len with ${in.available()} bytes remaining")
    val b = new Array[Byte](len)
    in.readFully(b)
    b
  }

  // ---------- plain ----------

  def encode(s: Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64 + s.counts.length * 12)
    val out = new DataOutputStream(bos)
    out.writeInt(MagicPlain)
    out.writeInt(s.cfg.k); out.writeInt(s.cfg.width); out.writeInt(s.cfg.depth)
    out.writeFloat(s.cfg.decay); out.writeInt(s.cfg.lutSize); out.writeLong(s.cfg.seed)
    out.writeLong(s.rng.getState)
    writeCells(out, s.fingerprints, s.counts)
    writeHeap(out, s.heap)
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == MagicPlain, "not a plain sketch payload")
    val cfg = SketchConfig(in.readInt(), in.readInt(), in.readInt(),
      in.readFloat(), in.readInt(), in.readLong())
    val s = new Sketch(cfg)
    s.rng.setState(in.readLong())
    readCells(in, s.fingerprints, s.counts)
    readHeap(in, s.heap)
    s
  }

  // ---------- sliding ----------

  def encodeSliding(s: SlidingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream(96 + s.ring.length * 8 + s.countsSum.length * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(MagicSliding)
    out.writeInt(s.cfg.k); out.writeInt(s.cfg.width); out.writeInt(s.cfg.depth)
    out.writeInt(s.cfg.windowSize); out.writeInt(s.cfg.bucketHistoryLength)
    out.writeFloat(s.cfg.decay); out.writeInt(s.cfg.lutSize); out.writeLong(s.cfg.seed)
    out.writeLong(s.rng.getState)
    out.writeInt(s.nextBucketToExpire)
    val m = s.countsSum.length
    var i = 0
    while (i < m) {
      out.writeInt(s.fingerprints(i)); out.writeInt(s.first(i)); out.writeLong(s.countsSum(i))
      i += 1
    }
    i = 0
    while (i < s.ring.length) { out.writeLong(s.ring(i)); i += 1 }
    writeHeap(out, s.heap)
    out.flush()
    bos.toByteArray
  }

  def decodeSliding(bytes: Array[Byte]): SlidingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == MagicSliding, "not a sliding sketch payload")
    val cfg = SlidingConfig(in.readInt(), in.readInt(), in.readInt(),
      in.readInt(), in.readInt(), in.readFloat(), in.readInt(), in.readLong())
    val s = new SlidingSketch(cfg)
    s.rng.setState(in.readLong())
    s.nextBucketToExpire = in.readInt()
    val m = s.countsSum.length
    var i = 0
    while (i < m) {
      s.fingerprints(i) = in.readInt(); s.first(i) = in.readInt(); s.countsSum(i) = in.readLong()
      i += 1
    }
    i = 0
    while (i < s.ring.length) { s.ring(i) = in.readLong(); i += 1 }
    readHeap(in, s.heap)
    s
  }

  // ---------- shared pieces ----------

  private def writeCells(out: DataOutputStream, fps: Array[Int], counts: Array[Long]): Unit = {
    out.writeInt(counts.length)
    var i = 0
    while (i < counts.length) {
      out.writeInt(fps(i)); out.writeLong(counts(i))
      i += 1
    }
  }

  private def readCells(in: DataInputStream, fps: Array[Int], counts: Array[Long]): Unit = {
    val n = in.readInt()
    require(n == counts.length, "cell count mismatch")
    var i = 0
    while (i < n) {
      fps(i) = in.readInt(); counts(i) = in.readLong()
      i += 1
    }
  }

  private def writeHeap(out: DataOutputStream, heap: MinHeap): Unit = {
    out.writeInt(heap.size)
    var i = 0
    while (i < heap.size) {
      out.writeInt(heap.fingerprintAt(i))
      writeItem(out, heap.itemAt(i))
      out.writeLong(heap.countAt(i))
      i += 1
    }
  }

  private def readHeap(in: DataInputStream, heap: MinHeap): Unit = {
    val n = in.readInt()
    // every entry is >= 16 bytes (fp 4 + item length 4 + count 8): a count
    // that cannot fit the remaining payload is corruption, not data
    require(n >= 0 && n.toLong * 16 <= in.available(),
      s"corrupt sketch payload: heap count $n with ${in.available()} bytes remaining")
    var i = 0
    while (i < n) {
      val fp    = in.readInt()
      val item  = readItem(in)
      val count = in.readLong()
      heap.update(item, fp, count)
      i += 1
    }
  }
}

/** Java-serialization proxies so a Sketch travels through any JVM
  * serialization boundary (Spark closures, javaSerialization encoders) as its
  * compact codec bytes rather than object graphs.
  */
final class SerializedSketch(val bytes: Array[Byte]) extends Serializable {
  def readResolve(): AnyRef = SketchCodec.decode(bytes)
}
final class SerializedSlidingSketch(val bytes: Array[Byte]) extends Serializable {
  def readResolve(): AnyRef = SketchCodec.decodeSliding(bytes)
}
