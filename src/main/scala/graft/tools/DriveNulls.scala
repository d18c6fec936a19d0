package graft.tools
import graft.core.SketchConfig
import graft.operators.TopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Probe: null arrays / empty arrays / null elements through the native
  * array aggregate. */
object DriveNulls {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/tmp/null_tokens.parquet")
    TopK.tokensArray(df, col("tokens"), SketchConfig.withDefaults(5, width = 256, depth = 3))
      .collect().foreach(r => println(s"[nulls] $r"))
    spark.stop()
  }
}
