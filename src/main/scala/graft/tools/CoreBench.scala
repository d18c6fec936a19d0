package graft.tools
import graft.core._
object CoreBench {
  def run(name: String, cfg: SketchConfig, n: Int): Unit = {
    val sk = new Sketch(cfg); val rng = new Rng(1)
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      val u = (rng.nextLong() >>> 11).toDouble / (1L << 53).toDouble
      sk.add(java.lang.Integer.toString((50000 * u * u * u).toInt), 1L)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[core] $name%-24s $sec%6.2f s  ${(n / sec / 1e6)}%.2f M/s")
  }
  def main(args: Array[String]): Unit = {
    val light = SketchConfig.withDefaults(10, width = 1024, depth = 3)
    val heavy = SketchConfig.withDefaults(100, width = 8192, depth = 4)
    run("warmup", light, 2000000)
    run("light k10 w1024 d3", light, 20000000)
    run("heavy k100 w8192 d4", heavy, 20000000)
    run("light again", light, 20000000)
  }
}
