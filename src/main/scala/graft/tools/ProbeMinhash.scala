package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the MinHash dedup pipeline at scale: where do the
  * seconds go at 500k docs — signature UDFs (and how many evaluations), the
  * banded self-join, the pair distinct, or the exact-Jaccard verifier?
  *
  * Usage: runMain graft.tools.ProbeMinhash [nDocs] [reps]
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val n    = if (args.nonEmpty) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir  = graft.sources.ScaleCorpus.ensure(s"data/scale_docs_$n",
      () => graft.sources.ScaleCorpus.documents(spark, n))
    def docs = spark.read.parquet(dir)

    def stage(label: String)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[minhash] $label%-34s min=${times.map(_._1).min}%7.2f s  rows=${times.head._2}%d")
    }

    // 1. signature pipeline alone (one evaluation)
    stage("sig pipeline (1 eval)") {
      docs.select(col("doc_id"),
          Dedup.minhashSignature(128)(Dedup.shingleHashes(5)(col("text"))).as("sig"))
        .where(size(col("sig")) > 0).count()
    }
    // 2. shingles alone (the exactJaccard side recomputes these per join side)
    stage("shingles alone (1 eval)") {
      docs.select(Dedup.shingleHashes(5)(col("text")).as("sh")).count()
    }
    // 3. candidates: banding + self-join + distinct (sig eval inside)
    stage("lsh candidates (band join+distinct)") {
      Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 128, bands = 32, threshold = 0.7).count()
    }
    // 4. full pipeline incl. exact verify
    stage("full (+exactJaccard verify)") {
      val cand = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 128, bands = 32, threshold = 0.7)
      Dedup.exactJaccard(cand.select("a", "b"), docs, shingleSize = 5)
        .where(col("jaccard") >= 0.8).count()
    }
    // 5. full pipeline with the size filter pinned to the verify threshold
    // (the driver-query composition; lossless for the >= 0.8 final filter)
    stage("full (+sizeFilter 0.8)") {
      val cand = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        shingleSize = 5, numHashes = 128, bands = 32, threshold = 0.7,
        sizeFilter = Some(0.8))
      Dedup.exactJaccard(cand.select("a", "b"), docs, shingleSize = 5)
        .where(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
