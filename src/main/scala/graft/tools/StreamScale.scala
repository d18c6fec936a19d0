package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Two-parallelism-level scaling evidence for the STREAMING tier (the batch
  * flagship has its own ladder in ScalingBench): the tumbling streaming
  * top-K job — file-stream source -> watermarked window -> array-native
  * sketch aggregate -> exactly-once parquet sink — run at local[4] and
  * local[16] (4x core ratio, both within the box's 16 physical cores) in
  * separate sessions, levels interleaved across reps, min-of-2 per level.
  */
object StreamScale {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"graft-streamscale-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def fresh(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def runTumbling(spark: SparkSession, dir: String, tag: String): Double = {
    val schema = spark.read.parquet(dir).schema
    val base   = java.nio.file.Files.createTempDirectory(s"graft_streamscale_$tag").toString
    val t0     = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 512).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.plans.TopKAggregates.tokensTopK(col("tokens"),
        graft.core.SketchConfig.withDefaults(40, width = 1024, depth = 3), 10).as("topk"))
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 16)
    var spark = session(levels.max)
    // the BIG table (820M tokens): per-batch fixed costs (state-store commits
    // scale with partition count, checkpoint fsyncs) must be dominated by
    // compute or the measurement shows machinery, not the engine — the same
    // round-1 lesson as the batch ladder
    val numDocs = sys.env.getOrElse("SPARK_GRAFT_SCALING_DOCS", "1600000").toLong
    val dir = graft.sources.TokenTables.ensure(spark, s"data/scaling_tokens_$numDocs",
      numDocs = numDocs, numPartitions = 256)
    val nTokens = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum("n_tok")).head().getLong(0)
    runTumbling(spark, dir, "warm") // JIT/page-cache warmup
    spark.stop(); fresh()

    val samples = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    (1 to 2).foreach { rep =>
      levels.foreach { cores =>
        val s   = session(cores)
        val sec = runTumbling(s, dir, s"c${cores}r$rep")
        samples(cores) = sec :: samples(cores)
        println(f"[streamscale] rep$rep local[$cores%d] tumbling=$sec%.2f s")
        s.stop(); fresh()
      }
    }
    val best = levels.map(c => c -> samples(c).min).toMap
    for {
      lo <- levels; hi <- levels if hi == lo * 4
    } {
      val eff = (nTokens / best(hi)) / (nTokens / best(lo)) / (hi.toDouble / lo)
      println(f"[streamscale] $lo%d -> $hi%d: ${best(lo)}%.2f s -> ${best(hi)}%.2f s, " +
        f"${(nTokens / best(lo)).toLong}%d -> ${(nTokens / best(hi)).toLong}%d tokens/s, eff=$eff%.2f")
    }
  }
}
