package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pin IVF (nCells, nProbe) empirically: at which nProbe does the IVF result
  * equal exact brute-force top-10 for the driver's query set, per SF?
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Seq("0.01", "0.1").foreach { sf =>
      val emb = s.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val q   = emb.where(col("vec_id") < 5)
      val exact = graft.operators.Similarity.cosineTopK(
        emb, col("vec_id"), col("embedding"), q, col("vec_id"), col("embedding"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Seq(4, 6, 8, 10, 12).foreach { nProbe =>
        val ivf = graft.operators.Similarity.ivfCosineTopK(
          emb, col("vec_id"), col("embedding"), q, col("vec_id"), col("embedding"),
          10, nCells = 16, nProbe = nProbe)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        println(s"[ivf] sf$sf nCells=16 nProbe=$nProbe exact_match=${ivf == exact} " +
          s"missing=${(exact -- ivf).size}")
      }
    }
    s.stop()
  }
}
