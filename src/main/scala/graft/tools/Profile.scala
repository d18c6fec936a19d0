package graft.tools

import graft.core.{Sketch, SketchConfig}
import graft.operators.TopK
import graft.sources.TokenTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose token-pipeline cost: core loop vs scan vs explode vs agg. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 0. pure core loop, single thread, 20M adds over vocab 50k zipf-ish
    t("core add x20M (1 thread)") {
      val sk  = new Sketch(SketchConfig.withDefaults(10, width = 1024, depth = 3))
      val rng = new graft.core.Rng(1)
      var i   = 0
      while (i < 20000000) {
        val u   = (rng.nextLong() >>> 11).toDouble / (1L << 53).toDouble
        val tok = (50000 * u * u * u).toInt
        sk.add(java.lang.Integer.toString(tok), 1L)
        i += 1
      }
      sk.sortedSlice.length
    }

    val (dir, n) = graft.Bench.ensureBenchTable(spark)
    println(s"[prof] tokens = $n")
    val raw = spark.read.parquet(dir)

    t("scan count")(raw.count())
    t("explode count")(raw.select(explode($"tokens").as("t")).count())
    t("explode + cast string + count")(
      raw.select(explode($"tokens").as("t")).select($"t".cast("string")).count())
    t("exact groupBy(int) count")(
      raw.select(explode($"tokens").as("t")).groupBy($"t").count().orderBy(desc("count")).limit(10).collect())
    t("exact groupBy(string) count")(
      raw.select(explode($"tokens").as("t")).select($"t".cast("string").as("s"))
        .groupBy($"s").count().orderBy(desc("count")).limit(10).collect())
    val updates = TokenTables.tokenUpdates(raw)
    t("udaf topk k10 w1024 d3")(
      TopK.aggregate(updates, col("item"), col("weight"), graft.Bench.cfgLight).collect())
    t("udaf topk again")(
      TopK.aggregate(updates, col("item"), col("weight"), graft.Bench.cfgLight).collect())
    t("native array topk k10 w1024 d3")(
      TopK.tokensArray(raw, $"tokens", graft.Bench.cfgLight).collect())
    t("native array topk again")(
      TopK.tokensArray(raw, $"tokens", graft.Bench.cfgLight).collect())
    t("native array topk heavy")(
      TopK.tokensArray(raw, $"tokens", graft.Bench.cfgHeavy).collect())
    TopK.aggregate(updates, col("item"), col("weight"), graft.Bench.cfgLight).explain("formatted")
    spark.stop()
  }
}
