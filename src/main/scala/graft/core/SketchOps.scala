package graft.core

import java.nio.charset.StandardCharsets

/** Logic shared verbatim by the plain and sliding sketches — factored out so
  * a fix to the decay extension or the merge tie-break cannot drift between
  * the two implementations.
  */
private[core] object SketchOps {

  /** Item tie-break comparison by Unicode CODE POINT — equivalent to
    * comparing the UTF-8 byte sequences (UTF-8 is order-preserving in code
    * points), which is the order used by Go's string `<` (the reference's
    * heap tie-break, heap/heap.go:65-72), Spark's UTF8String and DuckDB.
    * Java's String.compareTo compares UTF-16 units, which sorts
    * supplementary characters (surrogate pairs, 0xD800-0xDBFF) BEFORE
    * [U+E000, U+FFFF] — the opposite of byte order. Identical to compareTo
    * for BMP-only strings (all golden vectors).
    */
  def compareItems(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        // a high surrogate starts a code point >= U+10000: rank it above
        // every BMP char (low surrogates only follow highs in well-formed
        // strings, and two highs order consistently with their code points)
        val ra = if (ca >= 0xD800 && ca < 0xDC00) ca + 0x2800 else ca.toInt
        val rb = if (cb >= 0xD800 && cb < 0xDC00) cb + 0x2800 else cb.toInt
        return ra - rb
      }
      i += 1
    }
    a.length - b.length
  }

  /** (count desc, item asc-by-code-point) — the emission order. */
  @inline def entryOrder(x: TopKEntry, y: TopKEntry): Boolean =
    x.count > y.count || (x.count == y.count && compareItems(x.item, y.item) < 0)

  /** decay^count via LUT, with the reference's closed-form extension for
    * counts beyond the LUT (sketch.go:146-153).
    */
  @inline def decayAt(decayLUT: Array[Float], count: Long): Float = {
    val lutSize = decayLUT.length
    if (count < lutSize) decayLUT(count.toInt)
    else {
      val q = count / (lutSize - 1)
      val r = (count % (lutSize - 1)).toInt
      math.pow(decayLUT(lutSize - 1).toDouble, q.toDouble).toFloat * decayLUT(r)
    }
  }

  /** Merge's heap rebuild: union both candidate sets, re-estimate each item
    * against the merged cells (`countAt` abstracts counts vs countsSum), and
    * repopulate the heap with the top-k under (count desc, item asc).
    */
  def rebuildHeapFromUnion(heap: MinHeap, otherEntries: Array[TopKEntry], k: Int,
                           depth: Int, width: Int, fingerprints: Array[Int],
                           countAt: Int => Long): Unit = {
    val candidates = (heap.entries ++ otherEntries).map(_.item).distinct
    val estimated = candidates.map { it =>
      val bytes = it.getBytes(StandardCharsets.UTF_8)
      val fp    = Hashing.fingerprint(bytes)
      var mx    = 0L
      var row   = 0
      while (row < depth) {
        val idx = Hashing.bucketIndex(bytes, row, width)
        val c   = countAt(idx)
        if (fingerprints(idx) == fp && c > mx) mx = c
        row += 1
      }
      TopKEntry(fp, it, mx)
    }
    heap.reset()
    estimated.filter(_.count > 0).sortWith(entryOrder).take(k).foreach { e =>
      heap.update(e.item, e.fingerprint, e.count)
    }
  }
}
