package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 from N to 4N executors; sandbox stand-in = the identical
  * job at local[8] vs local[32] on identical input).
  *
  * Runs the token top-K job at both parallelism levels in one JVM
  * (sequential SparkSessions) and appends the measured table to BENCH.md.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // the bench table is small but many-filed; size scan splits for full
      // parallelism (at 100 TB the defaults already yield thousands of splits)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val lowCores  = if (args.length > 0) args(0).toInt else 8
    val highCores = if (args.length > 1) args(1).toInt else 32

    // generate (or reuse) a 10x table: scaling must be measured where compute
    // dominates fixed costs (scheduling, final merge, collect), mirroring the
    // 100 TB regime rather than a 1-second toy job
    var spark = session(highCores)
    val dir   = graft.sources.TokenTables.ensure(spark, "data/scaling_tokens",
      numDocs = 400000L, numPartitions = 256)
    val nTokens = spark.read.parquet(dir).agg(org.apache.spark.sql.functions.sum("n_tok"))
      .head().getLong(0)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = session(lowCores)

    def measure(s: SparkSession): (Double, Double) = {
      Bench.tokenTopK(s, dir, Bench.cfgLight) // warmup
      // min-of-3: the sandbox host carries background load; min approximates
      // the uncontended cost of the identical job
      val lightSec = (1 to 3).map(_ => Bench.time(Bench.tokenTopK(s, dir, Bench.cfgLight))._2).min
      val heavySec = (1 to 3).map(_ => Bench.time(Bench.tokenTopK(s, dir, Bench.cfgHeavy))._2).min
      (lightSec, heavySec)
    }

    val (light8, heavy8) = measure(spark)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    spark = session(highCores)
    val (light32, heavy32) = measure(spark)
    spark.stop()

    def thr(sec: Double): Double = nTokens / sec
    val effLight = (thr(light32) / thr(light8)) / (highCores.toDouble / lowCores)
    val effHeavy = (thr(heavy32) / thr(heavy8)) / (highCores.toDouble / lowCores)

    val md =
      f"""## Scaling evidence (local[$lowCores] vs local[$highCores], identical job + input)
         |
         |Input: deterministic synthetic sequence table (input_hint shape),
         |$nTokens%d tokens in 400000 docs. Job: scan -> array-native
         |HeavyKeeper partial aggregation -> sketch-union merge -> top-K.
         |
         || config | local[$lowCores] sec | local[$highCores] sec | tokens/s @$lowCores | tokens/s @$highCores | scaling efficiency |
         ||---|---|---|---|---|---|
         || K=10 w=1024 d=3 | $light8%.2f | $light32%.2f | ${thr(light8).toLong}%d | ${thr(light32).toLong}%d | $effLight%.2f |
         || K=100 w=8192 d=4 | $heavy8%.2f | $heavy32%.2f | ${thr(heavy8).toLong}%d | ${thr(heavy32).toLong}%d | $effHeavy%.2f |
         |
         |Efficiency = (throughput@$highCores / throughput@$lowCores) / ($highCores/$lowCores). North-rule bar: >= 0.8.
         |""".stripMargin

    Files.writeString(Paths.get("BENCH.md"), md)
    println(md)
    println(
      f"""{"light_eff":$effLight%.3f,"heavy_eff":$effHeavy%.3f,"tokens":$nTokens%d,"tps_light_8":${thr(light8).toLong}%d,"tps_light_32":${thr(light32).toLong}%d}""")
  }
}
