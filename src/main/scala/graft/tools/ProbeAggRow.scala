package graft.tools

import graft.operators.TopK
import graft.sources.TokenTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate ItemsTopKAgg's per-row cost at local[1]: the delta between
  * (explode+cast+count) and (explode+cast+ItemsTopKAgg) over the same rows is
  * the aggregate's marginal per-row price, free of parallel bandwidth effects.
  */
object ProbeAggRow {
  def t(name: String, n: Long)(f: => Any): Double = {
    val t0 = System.nanoTime(); f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $name%-36s $sec%7.2f s  ${n / sec / 1e6}%6.2f M rows/s")
    sec
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (dir, n) = graft.Bench.ensureBenchTable(spark)
    val raw      = spark.read.parquet(dir)
    val updates  = TokenTables.tokenUpdates(raw)
    println(s"[probe] cpus=$cpus tokens=$n")

    // warm everything once
    updates.count(); TopK.aggregate(updates, col("item"), col("weight"), graft.Bench.cfgLight).collect()
    raw.select(explode($"tokens").as("t")).select($"t".cast("string").as("item")).count()

    for (rep <- 1 to 3) {
      println(s"[probe] --- rep $rep ---")
      val base = t("explode+cast+count", n)(
        raw.select(explode($"tokens").as("t")).select($"t".cast("string").as("item")).count())
      val agg = t("explode+ItemsTopKAgg", n)(
        TopK.aggregate(updates, col("item"), col("weight"), graft.Bench.cfgLight).collect())
      val exact = t("explode+exact hashagg top100", n)(
        TopK.exact(updates, col("item"), col("weight"), 100).collect())
      println(f"[probe] agg marginal = ${(agg - base) * 1e9 / n}%6.1f ns/row; exact marginal = ${(exact - base) * 1e9 / n}%6.1f ns/row")
    }
    spark.stop()
  }
}
