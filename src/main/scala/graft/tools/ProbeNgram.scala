package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-off cost comparison for [[Dedup.ngramJaccardPairs]]'s verify-narrowing
  * strategy at the top rehearsal size: the default stats-cutover narrowing
  * derives candidate doc ids by RE-EXECUTING the candidate pipeline (ids =
  * pairs.a union pairs.b), which for this operator re-runs a 5-stage
  * agg/join/window/self-join plan; `narrow=false` shingles the whole corpus
  * instead. Which side wins decides the operator's default.
  *
  * Usage: runMain graft.tools.ProbeNgram [n]
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val n     = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = TrainingScaleBench.session(32, appName = "graft-probe-ngram")
    val docs  = spark.read.parquet(
      graft.sources.ScaleCorpus.ensure(s"data/scale_docs_$n",
        () => graft.sources.ScaleCorpus.documents(spark, n)))
    for (rep <- 1 to 2; narrow <- Seq(Some(true), Some(false))) {
      val (rows, sec) = graft.Bench.time(
        Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          n = 3, threshold = 0.8, narrowToCandidates = narrow).count())
      println(f"[ngramprobe] rep$rep narrow=${narrow.get}%-5s n=$n rows=$rows $sec%7.2f s")
    }
    spark.stop()
  }
}
