package graft.tools

import graft.core._
import scala.jdk.CollectionConverters._

/** Example / smoke driver for the core sketches (no Spark): feeds a skewed
  * token stream into the plain sketch, a tick-scheduled stream into the
  * sliding sketch, and prints top-K vs exact. Run: `sbt "runMain graft.tools.DriveCore"`.
  */
object DriveCore {
  def main(args: Array[String]): Unit = {
    // plain sketch over a skewed stream: 200k tokens, vocab 10k
    val sk    = new Sketch(SketchConfig.withDefaults(k = 10, width = 1024, depth = 3))
    val r     = new java.util.Random(42)
    val truth = new java.util.HashMap[String, Long]()
    var n     = 0
    while (n < 200000) {
      val u   = r.nextDouble()
      val tok = (10000 * u * u * u).toInt.toString // cubed -> heavy head
      sk.incr(tok)
      truth.merge(tok, 1L, (a, b) => a + b)
      n += 1
    }
    println("TOP10 sketch : " + sk.sortedSlice.map(e => s"${e.item}:${e.count}").mkString(" "))
    val exact = truth.asScala.toSeq.sortBy { case (i, c) => (-c, i) }.take(10)
    println("TOP10 exact  : " + exact.map { case (i, c) => s"$i:$c" }.mkString(" "))
    val recall = sk.sortedSlice.map(_.item).toSet.intersect(exact.map(_._1).toSet).size
    println(s"recall@10 = $recall/10")
    println("any overestimate? " + truth.asScala.exists { case (i, c) => sk.count(i) > c })

    // sliding sketch: 3-tick window over 6 ticks
    val sl = new SlidingSketch(SlidingConfig.withDefaults(k = 5, windowSize = 3, width = 512, depth = 3))
    for (t <- 0 until 6) {
      if (t < 3) { sl.add("hot", 100); sl.add("warm", 10L * (t + 1)) }
      sl.add(s"tick_only_$t", 5)
      println(s"t=$t window top: " + sl.sortedSlice.map(e => s"${e.item}:${e.count}").mkString(" "))
      sl.tick()
    }

    // probes
    println("probe empty-string item: incr=" + sk.incr("") + " count=" + sk.count(""))
    sk.add("日本語トークン🎌", 7)
    println("probe unicode item count=" + sk.count("日本語トークン🎌"))
    sk.add("huge", 1L << 33)
    println("probe >uint32 increment count=" + sk.count("huge"))
    println("probe unknown item: count=" + sk.count("never_seen_xyz") + " query=" + sk.query("never_seen_xyz"))
    println("sizeBytes plain=" + sk.sizeBytes + " sliding=" + sl.sizeBytes)
  }
}
