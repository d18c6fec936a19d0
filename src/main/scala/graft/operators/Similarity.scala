package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-K is the exactness baseline (broadcast the query
  * set, score every row, per-query top-K — one scan, no shuffle of the corpus
  * side). The LSH variant (random-hyperplane signatures + Hamming blocking +
  * exact rerank) is the 100 TB path: candidates come from equality joins on
  * band keys, so the corpus is never all-pairs joined.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * left-to-right accumulation (deterministic, oracle-reproducible).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-K neighbors for each query row (brute force).
    * @param corpus  (id long, vec array<float>)
    * @param queries (id long, vec array<float>) — small; broadcast
    * Output: (query_id, rank, neighbor_id, similarity) — self-matches excluded.
    */
  def cosineTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                 queries: DataFrame, queryId: Column, queryVec: Column,
                 k: Int): DataFrame = {
    val c = corpus.select(corpusId.cast("long").as("neighbor_id"), corpusVec.as("cvec"))
    val q = queries.select(queryId.cast("long").as("query_id"), queryVec.as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("similarity", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("similarity"), 6).as("similarity"))
  }

  /** Deterministic random-hyperplane bit signature (sign of dot with seeded
    * pseudo-random planes), `nBits` bits packed into a long (nBits <= 64).
    */
  def hyperplaneSignature(nBits: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (vec: Array[Float]) =>
      if (vec == null) 0L
      else {
        var sig = 0L
        var b   = 0
        while (b < nBits) {
          var dot = 0.0
          var i   = 0
          while (i < vec.length) {
            // deterministic plane component from SplitMix64(bit, dim)
            var z = (b.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z ^= z >>> 31
            // map to [-1, 1)
            val r = (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
            dot += vec(i) * r
            i += 1
          }
          if (dot >= 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }

  /** Approximate top-K: hyperplane-LSH blocking (band equality on signature
    * quarters) + exact cosine rerank of the candidates. Recall vs brute force
    * depends on nBits/bands; verified statistically in tests.
    */
  def lshCosineTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    k: Int, nBits: Int = 64, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = nBits / bands
    val sigU  = hyperplaneSignature(nBits)
    def banded(df: DataFrame, idName: String, vecName: String) =
      df.withColumn("sig", sigU(col(vecName)))
        .select(col(idName), col(vecName), posexplode(
          array((0 until bands).map(q =>
            shiftright(col("sig"), q * width).bitwiseAND(lit((1L << width) - 1))): _*))
          .as(Seq("band", "block")))

    val c = banded(corpus.select(corpusId.cast("long").as("neighbor_id"), corpusVec.as("cvec")),
      "neighbor_id", "cvec")
    val q = banded(queries.select(queryId.cast("long").as("query_id"), queryVec.as("qvec")),
      "query_id", "qvec")

    val candidates = c.join(broadcast(q), Seq("band", "block"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("cvec"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    candidates
      .withColumn("similarity", cosine(col("cvec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("similarity"), 6).as("similarity"))
  }

  /** Exact (all-pairs) embedding near-duplicate pairs — the oracle-matched
    * variant; use `nearDupPairs` (LSH-blocked) at corpus scale.
    */
  def nearDupPairsBrute(df: DataFrame, id: Column, vec: Column,
                        threshold: Double): DataFrame = {
    val l = df.select(id.cast("long").as("a"), vec.as("va"))
    val r = df.select(id.cast("long").as("b"), vec.as("vb"))
    l.join(r, col("a") < col("b"))
      .withColumn("similarity", cosine(col("va"), col("vb")))
      .where(col("similarity") >= threshold)
      .select(col("a"), col("b"), round(col("similarity"), 6).as("similarity"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold via LSH blocking +
    * exact verify (the embedding-space analogue of MinHash dedup).
    */
  def nearDupPairs(df: DataFrame, id: Column, vec: Column,
                   threshold: Double = 0.95, bands: Int = 8): DataFrame = {
    val width = 64 / bands
    val withSig = df.select(id.cast("long").as("doc_id"), vec.as("v"))
      .withColumn("sig", hyperplaneSignature(64)(col("v")))
    val blocked = withSig.select(col("doc_id"), col("v"), posexplode(
      array((0 until bands).map(q =>
        shiftright(col("sig"), q * width).bitwiseAND(lit((1L << width) - 1))): _*))
      .as(Seq("band", "block")))
    val l = blocked.select(col("band"), col("block"), col("doc_id").as("a"), col("v").as("va"))
    val r = blocked.select(col("band"), col("block"), col("doc_id").as("b"), col("v").as("vb"))
    l.join(r, Seq("band", "block"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb")).distinct()
      .withColumn("similarity", cosine(col("va"), col("vb")))
      .where(col("similarity") >= threshold)
      .select(col("a"), col("b"), round(col("similarity"), 6).as("similarity"))
  }
}
