package graft.operators

import graft.core.XxHash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup groups on a 64-bit content hash (shuffles 8-byte
  * keys, never full documents); MinHash/SimHash emit fixed-size signatures so
  * the candidate join is banded equality (shuffle on small band keys) instead
  * of any all-pairs comparison. All signatures are deterministic (seeded
  * hashes), so re-runs and retries agree.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: one survivor (min id) per distinct text. */
  def exactSurvivors(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"), text.as("text"))
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"))

  /** Exact duplicate groups (only texts occurring more than once). */
  def exactDupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"), text.as("text"))
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("survivor_id"),
        sort_array(collect_list(col("doc_id"))).as("doc_ids"),
        count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .select(col("survivor_id"), col("doc_ids"), col("n_copies"))

  // ---------- character-shingle helpers ----------

  /** Character k-shingles of a text, each hashed to a 32-bit int (as long).
    * Uses the engine's seeded XXH32 so signatures are stable across runs.
    */
  def shingleHashes(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null || s.length < k) Array.empty[Long]
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // shingle over characters; for ASCII-ish corpora bytes == chars
        val n   = s.length - k + 1
        val out = new Array[Long](n)
        var i   = 0
        while (i < n) {
          val sub = s.substring(i, i + k)
          out(i) = XxHash32.hashString(sub, 0x5137a91e).toLong & 0xffffffffL
          i += 1
        }
        out.distinct
      }
    }

  /** MinHash signature (numHashes values) from a set of shingle hashes.
    * h_i(x) = xxh32-mix of (x, i) — one pass per shingle, min per slot.
    */
  def minhashSignature(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (shingles: Array[Long]) =>
      if (shingles == null || shingles.isEmpty) Array.empty[Long]
      else {
        val sig = Array.fill(numHashes)(Long.MaxValue)
        var i   = 0
        while (i < shingles.length) {
          val x = shingles(i)
          var h = 0
          while (h < numHashes) {
            // SplitMix-style mix of (x, h): cheap, well-distributed, seeded
            var z = x + (h + 1) * 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z ^= z >>> 31
            if (z < sig(h)) sig(h) = z
            h += 1
          }
          i += 1
        }
        sig
      }
    }

  /** MinHash + LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * Pipeline: shingle -> minhash signature -> band hashes -> self-join on
    * equal (band, bandHash) buckets -> dedup pairs -> estimate Jaccard as the
    * fraction of agreeing minhash slots -> threshold.
    * Output: (a, b, est_jaccard) with a < b.
    */
  def minhashLshPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleSize: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.7
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(id.cast("long").as("doc_id"), text.as("text"))
      .withColumn("sig", minhashSignature(numHashes)(shingleHashes(shingleSize)(col("text"))))
      .where(size(col("sig")) > 0)
      .select(col("doc_id"), col("sig"))

    // band key = xxhash64 over the band's slice of the signature
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "band_hash")))

    val l = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("b"), col("sig").as("sig_b"))

    // compute the estimate and threshold-filter BEFORE dedup, so the distinct
    // shuffles only (a, b, est_jaccard) — 24 bytes — instead of dragging two
    // 128-slot signatures per candidate row through the exchange
    l.join(r, Seq("band", "band_hash"))
      .where(col("a") < col("b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / numHashes)
      .where(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), col("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram (character shingle) Jaccard for given candidate pairs —
    * the verifier for the LSH estimates.
    */
  def exactJaccard(
      pairs: DataFrame, // (a, b)
      docs: DataFrame,  // (doc_id, text)
      shingleSize: Int = 5
  ): DataFrame = {
    val sh = docs.select(col("doc_id"),
      array_distinct(shingleHashes(shingleSize)(col("text"))).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("a"), col("b"), (col("inter") / col("uni")).as("jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens (weight = occurrence count). */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) 0L
      else {
        val acc = new Array[Int](64)
        s.split("\\s+").foreach { tok =>
          if (tok.nonEmpty) {
            val h = (XxHash32.hashString(tok, 1).toLong << 32) |
              (XxHash32.hashString(tok, 2).toLong & 0xffffffffL)
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
              b += 1
            }
          }
        }
        var out = 0L
        var b   = 0
        while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }

  /** SimHash near-duplicate pairs with Hamming distance <= maxDistance,
    * blocked on 16-bit quarters (any pair within distance <= 3 must agree on
    * at least one of 4 quarters — pigeonhole), so no all-pairs join.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
                   maxDistance: Int = 3): DataFrame = {
    val hashed = df.select(id.cast("long").as("doc_id"), simhash64(text).as("sh"))
    val blocked = hashed.select(col("doc_id"), col("sh"),
      posexplode(array((0 to 3).map(q => shiftright(col("sh"), q * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("quarter", "block")))
    val l = blocked.select(col("quarter"), col("block"), col("doc_id").as("a"), col("sh").as("sh_a"))
    val r = blocked.select(col("quarter"), col("block"), col("doc_id").as("b"), col("sh").as("sh_b"))
    l.join(r, Seq("quarter", "block"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxDistance)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
  }
}
