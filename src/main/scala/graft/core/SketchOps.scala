package graft.core

import java.nio.charset.StandardCharsets

/** Logic shared verbatim by the plain and sliding sketches — factored out so
  * a fix to the decay extension or the merge tie-break cannot drift between
  * the two implementations.
  */
private[core] object SketchOps {

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
    estimated.filter(_.count > 0).sortBy(e => (-e.count, e.item)).take(k).foreach { e =>
      heap.update(e.item, e.fingerprint, e.count)
    }
  }
}
