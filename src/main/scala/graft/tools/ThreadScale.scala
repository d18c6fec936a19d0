package graft.tools
import graft.core._
/** Pure-JVM thread-scaling probe: N independent sketches, N threads, no Spark. */
object ThreadScale {
  def run(threads: Int, addsPerThread: Int): Double = {
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val sk = new Sketch(SketchConfig.withDefaults(10, width = 1024, depth = 3))
        val rng = new Rng(t + 1)
        var i = 0
        while (i < addsPerThread) {
          val u = (rng.nextLong() >>> 11).toDouble / (1L << 53).toDouble
          sk.addToken((50000 * u * u * u).toInt, 1L)
          i += 1
        }
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    threads.toLong * addsPerThread / sec / 1e6
  }
  def main(args: Array[String]): Unit = {
    run(2, 2000000) // warmup
    for (n <- Seq(1, 2, 4, 8, 16, 32)) {
      val mps = run(n, 20000000 / math.max(1, n / 4))
      println(f"[threads] $n%2d threads: $mps%8.1f M adds/s total (${mps / n}%.2f M/s/thread)")
    }
  }
}
