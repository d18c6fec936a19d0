package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Plan-shape check for [[Dedup.ngramJaccardPairs]] with forced candidate
  * narrowing: does the ids-derivation branch reuse the candidate subplan's
  * exchanges (ReusedExchange), or does the whole 5-stage pipeline execute
  * twice? Prints the final adaptive plan on the sf0.01 documents table.
  */
object ProbeNgramPlan {
  def main(args: Array[String]): Unit = {
    val spark = TrainingScaleBench.session(4, appName = "graft-probe-ngram-plan")
    val docs  = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.8, narrowToCandidates = Some(true))
    out.collect()
    val plan  = out.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    val windows = "Window".r.findAllIn(plan).length
    println(s"[ngramplan] scans=$scans reusedExchanges=$reused windowExecs=$windows")
    println(plan.linesIterator.take(120).mkString("\n"))
    spark.stop()
  }
}
