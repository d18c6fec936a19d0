package graft.tools
import graft.core._

/** Pure-JVM thread-scaling probe: N independent sketches, N threads, no Spark.
  *
  * Two experiments:
  *  1. thread ladder at the light geometry (the classic scaling curve);
  *  2. FOOTPRINT ladder at fixed thread pairs (4 vs 16): same add loop, same
  *     instruction stream, only the per-thread sketch working set grows.
  *     The sandbox has no perf(1)/PMU access, so cache-capacity causality is
  *     established behaviorally: if 4->16 efficiency is high for L2-resident
  *     sketches and degrades monotonically as threads x footprint approaches
  *     the shared-cache capacity, the heavy-config falloff is a cache artifact
  *     of packing 16 threads into one box, not an algorithmic serialization —
  *     per-executor caches restore it on a real cluster.
  */
object ThreadScale {
  def run(threads: Int, addsPerThread: Int, cfg: SketchConfig): Double = {
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val sk = new Sketch(cfg.copy(seed = cfg.seed + t))
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

  private val light = SketchConfig.withDefaults(10, width = 1024, depth = 3)

  def main(args: Array[String]): Unit = {
    run(2, 2000000, light) // warmup
    println("[threads] light geometry (w1024 d3, ~12 KB/thread):")
    for (n <- Seq(1, 2, 4, 8, 16, 32)) {
      val mps = (1 to 3).map(_ => run(n, 20000000 / math.max(1, n / 4), light)).max
      println(f"[threads] $n%2d threads: $mps%8.1f M adds/s total (${mps / n}%.2f M/s/thread)")
    }

    // footprint ladder: cells*12B per thread; adds sized for ~constant wall
    println("[footprint] 4->16 thread efficiency vs per-thread sketch size" +
      " (min-of-3 per point, interleaved):")
    val ladder = Seq(
      ("w1024 d3  (~12 KB)", SketchConfig.withDefaults(10, width = 1024, depth = 3)),
      ("w2048 d4  (~96 KB)", SketchConfig.withDefaults(100, width = 2048, depth = 4)),
      ("w8192 d4 (~384 KB)", SketchConfig.withDefaults(100, width = 8192, depth = 4)),
      ("w32768 d4 (~1.5 MB)", SketchConfig.withDefaults(100, width = 32768, depth = 4)),
      ("w131072 d4 (~6 MB)", SketchConfig.withDefaults(100, width = 131072, depth = 4)))
    val adds = 8000000
    for ((name, cfg) <- ladder) {
      // interleave the 4- and 16-thread reps so a noise window hits both arms
      val pairs = (1 to 3).map(_ => (run(4, adds, cfg), run(16, adds, cfg)))
      val r4  = pairs.map(_._1).max
      val r16 = pairs.map(_._2).max
      val eff = r16 / (4.0 * r4)
      println(f"[footprint] $name%-22s 4t: $r4%7.1f M/s  16t: $r16%7.1f M/s  eff(4->16): $eff%.2f")
    }
  }
}
