package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Plain-sketch golden vectors and statistical bounds ported from the
  * reference's tests (reference: sketch_test.go).
  */
class SketchSpec extends AnyFunSuite {

  private def newSketch(k: Int, width: Int = -1, depth: Int = -1, decay: Float = 0.9f) =
    new Sketch(SketchConfig.withDefaults(k, width = width, depth = depth, decay = decay))

  test("defaults: width=max(256,⌊k·ln k⌋), depth=max(3,⌊ln k⌋), decay=0.9, LUT=256 (sketch_test.go:14-52)") {
    val s10 = newSketch(10)
    assert(s10.width == 256) // 10*ln10 ≈ 23 -> 256
    assert(s10.depth == 3)   // ln10 ≈ 2.3 -> ⌊⌋=2 -> 3
    assert(s10.cfg.decay == 0.9f)
    assert(s10.decayLUT.length == 256)

    val s1000 = newSketch(1000)
    assert(s1000.width == (1000 * math.log(1000.0)).toInt) // 6907
    assert(s1000.depth == math.log(1000.0).toInt)          // 6

    val sCustom = newSketch(5, width = 42, depth = 7, decay = 0.5f)
    assert(sCustom.width == 42 && sCustom.depth == 7 && sCustom.cfg.decay == 0.5f)
  }

  test("decay LUT: LUT[i] = decay^i, closed-form extension beyond (sketch.go:69-73,146-153)") {
    val s = newSketch(10)
    assert(s.decayLUT(0) == 1.0f)
    assert(math.abs(s.decayLUT(1) - 0.9f) < 1e-7)
    assert(math.abs(s.decayLUT(255) - math.pow(0.9, 255).toFloat) < 1e-12)
  }

  test("AddIncrQuery: Incr then Add(5) -> count 6, in top-K (sketch_test.go:68-86)") {
    val s = newSketch(3)
    s.incr("item1")
    assert(s.count("item1") == 1)
    s.add("item1", 5)
    assert(s.query("item1"))
    assert(s.count("item1") == 6)
  }

  test("SortedSlice order and K-trim (sketch_test.go:88-111)") {
    val s     = newSketch(3)
    val items = Seq("item1", "item2", "item3", "item4")
    items.zipWithIndex.foreach { case (item, i) => s.add(item, i.toLong) }
    val topK = s.sortedSlice
    assert(topK.length == 3)
    assert(topK.map(_.item).toSeq == Seq("item4", "item3", "item2"))
    assert(topK.map(_.count).toSeq == Seq(3L, 2L, 1L))
    assert(topK.map(_.fingerprint).toSeq ==
      Seq(Hashing.fingerprint("item4"), Hashing.fingerprint("item3"), Hashing.fingerprint("item2")))
  }

  test("iterEntries: unsorted set, zero counts skipped (sketch_test.go:113-146)") {
    val s = newSketch(3)
    assert(s.iterEntries.isEmpty)
    Seq("item1", "item2", "item3", "item4").zipWithIndex.foreach { case (item, i) =>
      s.add(item, i.toLong)
    }
    assert(s.iterEntries.map(_.item).toSet == Set("item2", "item3", "item4"))
  }

  test("Reset zeroes counts and top-K (sketch_test.go:148-166)") {
    val s = newSketch(3)
    s.incr("item1"); s.incr("item2")
    s.reset()
    assert(s.count("item1") == 0)
    assert(s.sortedSlice.isEmpty)
    // reusable after reset
    s.add("item3", 7)
    assert(s.count("item3") == 7)
  }

  test("sizeBytes at least the counter array (sketch_test.go:54-66)") {
    val s = newSketch(10)
    assert(s.sizeBytes > s.width.toLong * s.depth * 2 * 4)
  }

  test("collisions: heavy noise evicts small flows from top-K (sketch_test.go:168-211)") {
    for (width <- Seq(4, 8)) {
      val s = newSketch(3, width = width, depth = 1)
      Seq("a" -> 50L, "b" -> 40L, "c" -> 30L).foreach { case (i, c) => s.add(i, c) }
      (0 until 100).foreach(i => s.add(s"n$i", 1000L))
      Seq("a", "b", "c").foreach { item =>
        assert(!s.query(item), s"width=$width: $item should not be in top-K")
      }
    }
  }

  test("error bounds: under-estimation only + decayed lower bound (sketch_test.go:213-282)") {
    val width = 32; val depth = 1; val decay = 0.9
    val s     = newSketch(10, width = width, depth = depth, decay = decay.toFloat)
    val planted = Seq("high_freq" -> 1000L, "medium_freq" -> 500L, "low_freq" -> 100L)
    val noiseItems = 1000; val noiseFreq = 50L
    val totalItems = noiseItems * noiseFreq + planted.map(_._2).sum

    planted.foreach { case (i, c) => s.add(i, c) }
    (0 until noiseItems).foreach(i => s.add(s"noise_item_$i", noiseFreq))

    var noiseInTopK = 0
    (0 until noiseItems).foreach { i =>
      val item = s"noise_item_$i"
      assert(s.count(item) <= noiseFreq, s"$item over-estimated")
      if (s.query(item)) noiseInTopK += 1
    }
    assert(noiseInTopK <= 10 - planted.size, s"$noiseInTopK noise items in top-K")

    planted.foreach { case (item, trueCount) =>
      val actual  = s.count(item)
      val epsilon = 1.0 / (width.toDouble * depth * trueCount * (1 - decay))
      val lower   = math.max(0.0, trueCount - math.ceil(epsilon * (totalItems - trueCount)))
      assert(actual <= trueCount, s"$item: estimate $actual > true $trueCount")
      assert(actual >= lower, s"$item: estimate $actual < lower bound $lower")
    }
  }

  test("merge: equals sequential when collision-free (engine extension)") {
    // Wide sketch + few items -> no collisions -> merge must be exact.
    val cfg = SketchConfig.withDefaults(10, width = 1024, depth = 3)
    val a   = new Sketch(cfg)
    val b   = new Sketch(cfg)
    val seq = new Sketch(cfg)
    val updatesA = Seq("X" -> 5L, "Y" -> 3L, "W" -> 7L)
    val updatesB = Seq("X" -> 2L, "Z" -> 9L, "Y" -> 1L)
    updatesA.foreach { case (i, c) => a.add(i, c) }
    updatesB.foreach { case (i, c) => b.add(i, c) }
    (updatesA ++ updatesB).foreach { case (i, c) => seq.add(i, c) }
    a.merge(b)
    for (item <- Seq("X", "Y", "Z", "W"))
      assert(a.count(item) == seq.count(item), s"count($item)")
    assert(a.sortedSlice.map(e => (e.item, e.count)).toSeq ==
      seq.sortedSlice.map(e => (e.item, e.count)).toSeq)
  }

  test("merge rejects config mismatches (k/decay/seed/lutSize), not just geometry") {
    // a k mismatch makes the union heap's CAPACITY depend on nondeterministic
    // blob arrival order after a shuffle — must fail fast, never vary
    val base = SketchConfig.withDefaults(5, width = 64, depth = 2)
    def sk(cfg: SketchConfig): Sketch = { val s = new Sketch(cfg); s.add("x", 1L); s }
    for (other <- Seq(
        base.copy(k = 7),
        base.copy(decay = 0.8f),
        base.copy(seed = 123L),
        base.copy(lutSize = 512))) {
      val ex = intercept[IllegalArgumentException](sk(base).merge(sk(other)))
      assert(ex.getMessage.contains("config mismatch"))
    }
    // geometry alone still rejected by its own guard
    val geo = intercept[IllegalArgumentException](
      sk(base).merge(sk(SketchConfig.withDefaults(5, width = 128, depth = 2))))
    assert(geo.getMessage.contains("geometry"))
  }

  test("merge is commutative") {
    val cfg = SketchConfig.withDefaults(5, width = 64, depth = 2)
    def mk(updates: Seq[(String, Long)]): Sketch = {
      val s = new Sketch(cfg)
      updates.foreach { case (i, c) => s.add(i, c) }
      s
    }
    val ua = (0 until 50).map(i => s"i$i" -> (i + 1).toLong)
    val ub = (25 until 75).map(i => s"i$i" -> (2 * i + 1).toLong)
    val ab = mk(ua).merge(mk(ub))
    val ba = mk(ub).merge(mk(ua))
    assert(ab.counts.toSeq == ba.counts.toSeq)
    assert(ab.fingerprints.toSeq == ba.fingerprints.toSeq)
    assert(ab.sortedSlice.toSeq == ba.sortedSlice.toSeq)
  }

  test("merge preserves under-estimation vs true counts (statistical)") {
    val cfg    = SketchConfig.withDefaults(10, width = 32, depth = 1)
    val rng    = new Rng(42L)
    val parts  = (0 until 4).map(_ => new Sketch(cfg))
    val truth  = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    (0 until 20000).foreach { _ =>
      val item = s"it${(rng.nextLong() >>> 33) % 500}"
      val part = ((rng.nextLong() >>> 33) % 4).toInt
      parts(part).add(item, 1L)
      truth(item) += 1L
    }
    val merged = parts.reduce((x, y) => x.merge(y))
    truth.foreach { case (item, t) =>
      assert(merged.count(item) <= t, s"$item over-estimated after merge")
    }
  }
}
