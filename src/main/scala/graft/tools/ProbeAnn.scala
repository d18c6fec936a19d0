package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where do ann_cosine_topk's seconds go? Bisect: scan, score, window. */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val emb = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ann] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
    }
    (1 to 2).foreach { _ =>
      t("scan count")(emb.count())
      t("norms only")(emb.select(sqrt(graft.plans.VecDot(col("embedding"), col("embedding")))).agg(sum("*")).count())
      t("full cosineTopK")(graft.operators.Similarity.cosineTopK(
        emb, col("vec_id"), col("embedding"),
        emb.where(col("vec_id") < 5), col("vec_id"), col("embedding"), 10).collect().length.toLong)
      t("full lshCosineTopK")(graft.operators.Similarity.lshCosineTopK(
        emb, col("vec_id"), col("embedding"),
        emb.where(col("vec_id") < 5), col("vec_id"), col("embedding"), 10, 64, 32).collect().length.toLong)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/ann_plan.txt"),
      graft.operators.Similarity.cosineTopK(
        emb, col("vec_id"), col("embedding"),
        emb.where(col("vec_id") < 5), col("vec_id"), col("embedding"), 10)
        .queryExecution.executedPlan.toString)
    s.stop()
  }
}
