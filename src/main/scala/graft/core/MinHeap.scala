package graft.core

import scala.collection.mutable

/** A top-K entry: fingerprint (raw 32-bit), item key, and tracked count.
  * Mirrors the reference's heap entry (reference: heap/heap.go:11-15); counts
  * are carried as Long (documented superset of the reference's uint32).
  */
final case class TopKEntry(fingerprint: Int, item: String, count: Long)

/** Bounded min-heap of the top-K items with an O(1) item→slot index.
  *
  * Semantics ported from the reference's heap (reference: heap/heap.go:19-178):
  *   - order: count ascending, ties broken by item string ascending
  *     (heap/heap.go:65-72) — a strict total order, so the evicted minimum is
  *     uniquely determined and any correct binary heap reproduces the same
  *     admission/eviction decisions;
  *   - `update`: reject only if the heap is full AND count is strictly below
  *     the minimum (count == min on a full heap DOES evict; heap/heap.go:137);
  *     an existing item's count may be updated downward as well as upward —
  *     EXCEPT that the reject guard runs BEFORE the existing-item lookup
  *     (faithful to heap.go:137-139), so on a full heap a tracked item is
  *     never updated below minCount; the stale higher count persists until
  *     the next admissible update or a reinit/recount;
  *   - `reinit`: re-heapify, then pop all zero-count entries (heap/heap.go:48-55).
  */
final class MinHeap(val k: Int) extends Serializable {
  private var _size                      = 0
  private val itemsArr: Array[String]    = new Array[String](math.max(k, 1))
  private val fpArr: Array[Int]          = new Array[Int](math.max(k, 1))
  private val countArr: Array[Long]      = new Array[Long](math.max(k, 1))
  private val index                      = new mutable.AnyRefMap[String, Int](k * 2)

  def size: Int      = _size
  def isFull: Boolean = _size == k
  def isEmpty: Boolean = _size == 0

  /** Minimum tracked count; 0 when empty (heap/heap.go:102-107). */
  def minCount: Long = if (_size == 0) 0L else countArr(0)

  def contains(item: String): Boolean = index.contains(item)
  def find(item: String): Int         = index.getOrElse(item, -1)

  def get(item: String): Option[TopKEntry] = {
    val i = find(item)
    if (i < 0) None else Some(TopKEntry(fpArr(i), itemsArr(i), countArr(i)))
  }

  def countOf(item: String): Long = {
    val i = find(item)
    if (i < 0) -1L else countArr(i)
  }

  def itemAt(i: Int): String     = itemsArr(i)
  def fingerprintAt(i: Int): Int = fpArr(i)
  def countAt(i: Int): Long      = countArr(i)
  def setCountAt(i: Int, c: Long): Unit = countArr(i) = c

  @inline private def less(i: Int, j: Int): Boolean = {
    val ci = countArr(i); val cj = countArr(j)
    // tie-break by code point (== UTF-8 byte order), matching the Go
    // reference's string `<`, Spark's UTF8String and DuckDB — NOT Java's
    // UTF-16-unit compareTo (diverges on supplementary characters)
    if (ci == cj) SketchOps.compareItems(itemsArr(i), itemsArr(j)) < 0 else ci < cj
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ti = itemsArr(i); itemsArr(i) = itemsArr(j); itemsArr(j) = ti
    val tf = fpArr(i); fpArr(i) = fpArr(j); fpArr(j) = tf
    val tc = countArr(i); countArr(i) = countArr(j); countArr(j) = tc
    index(itemsArr(i)) = i
    index(itemsArr(j)) = j
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val parent = (i - 1) / 2
      if (!less(i, parent)) return
      swap(i, parent)
      i = parent
    }
  }

  private def siftDown(start: Int): Boolean = {
    var i     = start
    var moved = false
    var done  = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= _size) done = true
      else {
        var m = l
        val r = l + 1
        if (r < _size && less(r, l)) m = r
        if (less(m, i)) { swap(i, m); i = m; moved = true }
        else done = true
      }
    }
    moved
  }

  private def fix(i: Int): Unit = if (!siftDown(i)) siftUp(i)

  /** Insert or update an item (reference: heap/heap.go:136-170).
    * Returns whether the item is (now) tracked in the top-K.
    */
  def update(item: String, fingerprint: Int, count: Long): Boolean = {
    if (count < minCount && isFull) return false // not in top-K: ignore

    val i = find(item)
    if (i >= 0) { // already tracked: overwrite count (up or down) and re-fix
      countArr(i) = count
      fix(i)
      return true
    }

    if (!isFull) { // room available: push
      itemsArr(_size) = item
      fpArr(_size) = fingerprint
      countArr(_size) = count
      index(item) = _size
      _size += 1
      siftUp(_size - 1)
      return true
    }

    // full: replace the minimum (root) and sift
    index.remove(itemsArr(0))
    itemsArr(0) = item
    fpArr(0) = fingerprint
    countArr(0) = count
    index(item) = 0
    fix(0)
    true
  }

  /** Re-heapify and drop all zero-count entries (reference: heap/heap.go:48-55). */
  def reinit(): Unit = {
    var i = _size / 2 - 1
    while (i >= 0) { siftDown(i); i -= 1 }
    while (_size > 0 && countArr(0) == 0) pop()
  }

  private def pop(): Unit = {
    index.remove(itemsArr(0))
    _size -= 1
    if (_size > 0) {
      itemsArr(0) = itemsArr(_size)
      fpArr(0) = fpArr(_size)
      countArr(0) = countArr(_size)
      index(itemsArr(0)) = 0
      siftDown(0)
    }
    itemsArr(_size) = null
  }

  def reset(): Unit = {
    var i = 0
    while (i < _size) { itemsArr(i) = null; i += 1 }
    index.clear()
    _size = 0
  }

  /** All tracked entries, heap (arbitrary) order, including zero-count ones. */
  def entries: Array[TopKEntry] = {
    val out = new Array[TopKEntry](_size)
    var i   = 0
    while (i < _size) { out(i) = TopKEntry(fpArr(i), itemsArr(i), countArr(i)); i += 1 }
    out
  }

  /** Entries sorted by (count desc, item asc), zero counts trimmed
    * (reference: sketch.go:189-209).
    */
  def sorted: Array[TopKEntry] =
    entries.filter(_.count > 0).sortWith(SketchOps.entryOrder)

  /** Approximate in-memory footprint in bytes (reference: heap/heap.go:40-45). */
  def sizeBytes: Long = {
    var keyBytes = 0L
    var i        = 0
    while (i < _size) { keyBytes += itemsArr(i).length; i += 1 }
    40L + k.toLong * 24 + keyBytes + index.size.toLong * 48
  }
}
