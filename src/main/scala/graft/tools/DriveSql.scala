package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke driver for the SQL surface: register functions, run plain SQL over
  * real testdata (documents table), print the results + the physical plan of
  * the codegen xxh32 expression.
  */
object DriveSql {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SqlFunctions.register(spark)

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")

    println("[sql] top-5 tokens via pure SQL:")
    spark.sql("""
      SELECT e.item, e.count FROM (
        SELECT explode(topk_items(tok, 1, 5, 1024, 3)) AS e FROM (
          SELECT explode(split(text, ' ')) AS tok FROM documents WHERE length(text) > 0
        ) WHERE length(tok) > 0
      )""").collect().foreach(r => println(s"[sql]   $r"))

    println("[sql] xxh32 over SQL (seeded fingerprint):")
    spark.sql("SELECT xxh32('X', 4848280) AS fp_x, xxh32(text, 0) AS h FROM documents LIMIT 2")
      .collect().foreach(r => println(s"[sql]   $r"))

    println("[sql] xxh32 plan (expect WholeStageCodegen):")
    spark.sql("SELECT xxh32(text, 7) FROM documents").explain()
    spark.stop()
  }
}
