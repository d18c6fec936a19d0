package graft.sources

import graft.core.Rng
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One pre-tokenized training sequence — the north-rule input shape
  * (BASELINE.json input_hint): Iceberg-schema table realized as Parquet in
  * this sandbox (no Iceberg runtime jar; the reader is format-parameterized
  * so `format("iceberg")` is a config swap where the jar exists).
  * `ts` is the deterministic event time used by the streaming engines.
  */
final case class SeqRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String,
    ts: java.sql.Timestamp
)

/** Deterministic synthetic sequence-table generator + readers.
  *
  * Token ids are drawn from a power-law over the vocabulary (u^3 inverse-CDF
  * — heavy head like natural token streams), token counts per doc uniform in
  * [1, 2·mean), all from per-doc SplitMix64 streams keyed by (seed, ordinal):
  * the table content is a pure function of (numDocs, vocab, meanTokens,
  * seed), independent of partitioning, Spark version, or wall clock.
  */
object TokenTables {

  final val Sources = Array("web", "books", "code")

  /** Deterministic rows as a Dataset, generated distributed via spark.range. */
  def synthetic(
      spark: SparkSession,
      numDocs: Long,
      vocab: Int = 50000,
      meanTokens: Int = 512,
      seed: Long = 42L,
      numPartitions: Int = 32
  ): Dataset[SeqRow] = {
    import spark.implicits._
    spark.range(0L, numDocs, 1L, numPartitions).map { ord =>
      val rng  = new Rng(seed ^ (ord * 0x9e3779b97f4a7c15L) ^ 0x70c3275L)
      val nTok = 1 + ((rng.nextLong() >>> 33) % (2L * meanTokens - 1)).toInt
      val toks = new Array[Int](nTok)
      var i    = 0
      while (i < nTok) {
        val u = (rng.nextLong() >>> 11).toDouble / (1L << 53).toDouble
        toks(i) = (vocab * u * u * u).toInt.min(vocab - 1)
        i += 1
      }
      SeqRow(
        doc_id = f"doc$ord%012d",
        tokens = toks,
        n_tok = nTok,
        source = Sources(((rng.nextLong() >>> 33) % Sources.length).toInt),
        ts = new java.sql.Timestamp(1700000000000L + ord * 1000L) // 1 doc/sec schedule
      )
    }
  }

  /** Write the synthetic table as parquet if absent (idempotent by _SUCCESS;
    * shares ScaleCorpus.ensure so the write-once cache logic lives once).
    */
  def ensure(
      spark: SparkSession,
      dir: String,
      numDocs: Long,
      vocab: Int = 50000,
      meanTokens: Int = 512,
      seed: Long = 42L,
      numPartitions: Int = 32
  ): String =
    ScaleCorpus.ensure(dir,
      () => synthetic(spark, numDocs, vocab, meanTokens, seed, numPartitions).toDF())

  /** Read a sequence table (parquet realization of the Iceberg contract). */
  def read(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(dir)

  /** Explode a sequence table into the (item, weight) token-update stream the
    * sketch consumes: one update of weight 1 per token occurrence. `item`
    * stays the RAW int token id; the canonical base-10 string form
    * (SURVEY.md §1.4) is produced by the consumer — TopK.aggregate casts
    * per row inside its projection (unchanged work), and TopK.exact groups
    * integral items natively and casts once per distinct item instead of
    * once per occurrence. Column pruning keeps the scan at `tokens`
    * (+ any requested passthrough columns) only.
    */
  def tokenUpdates(df: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val cols = passthrough.map(col) :+ explode(col("tokens")).as("token")
    df.select(cols: _*)
      .select((passthrough.map(col) :+ col("token").as("item")
        :+ lit(1L).as("weight")): _*)
  }

  /** Derive a deterministic tokenized table from the driver's `documents`
    * table (doc_id, text, lang, source, n_chars): whitespace-split, token id
    * = dictionary-free hash bucket. Used to exercise the engine against
    * non-synthetic text without external data.
    */
  def fromDocuments(documents: DataFrame, vocab: Int = 65536): DataFrame =
    documents.select(
      col("doc_id").cast("string").as("doc_id"),
      // filter the empty token split() yields on leading whitespace (it
      // would hash to a phantom id and inflate n_tok vs TextAnalysis's
      // filtered token counts); pmod, not abs: abs(Int.MinValue) is
      // negative and would emit a negative token id
      expr(s"transform(filter(split(text, '\\\\s+'), w -> w != ''), w -> pmod(hash(w), $vocab))")
        .as("tokens"),
      col("source")
    ).withColumn("n_tok", size(col("tokens")))
}
