package graft.sources

import graft.core.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic at-scale corpora for rehearsing the training-data operators
  * (dedup, similarity, sessions) at 10-1000x the driver test tables — no
  * external data, pure functions of (seed, ordinal), partition-independent.
  *
  * Three tables:
  *  - documents: text corpus with PLANTED near-duplicate clusters — every run
  *    of 10 consecutive ordinals has a master (10m) and two perturbed copies
  *    (10m+1, 10m+2: ~3% word replacement), the rest independent. Gives
  *    MinHash/SimHash/Jaccard a known recall target at any size.
  *  - embeddings: clustered vectors (the regime ANN indexes exist for) with a
  *    planted TIGHT tier — cluster = ord % nClusters, centroid components
  *    uniform [-1,1); members jitter the centroid by 0.5 (loose, cos ~ 0.8 to
  *    the centroid's cluster-mates — below near-dup thresholds) except every
  *    member with (ord / nClusters) % 32 < 2, which jitters by 0.02 (tight,
  *    pairwise cos > 0.999 — the planted near-duplicates).
  *  - events: per-user event streams with gap-separated activity bursts for
  *    sessionization (inter-event gaps uniform in [1, 90] minutes; gaps over
  *    the 60-minute threshold split sessions).
  */
object ScaleCorpus {

  final val WordVocab = 4096

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  /** word(i): deterministic 3-9 letter token, pure function of (seed, i). */
  private def word(seed: Long, i: Int): String = {
    val rng = new Rng(seed ^ (i.toLong * 0x9e3779b97f4a7c15L) ^ 0x77abcL)
    val len = 3 + ((rng.nextLong() >>> 33) % 7).toInt
    val sb  = new java.lang.StringBuilder(len)
    var j = 0
    while (j < len) {
      sb.append(Alphabet.charAt(((rng.nextLong() >>> 33) % 26).toInt))
      j += 1
    }
    sb.toString
  }

  private def masterWordIds(seed: Long, master: Long): Array[Int] = {
    val rng = new Rng(seed ^ (master * 0x9e3779b97f4a7c15L) ^ 0x5c0eL)
    val n   = 80 + ((rng.nextLong() >>> 33) % 120).toInt
    Array.fill(n)(((rng.nextLong() >>> 33) % WordVocab).toInt)
  }

  /** The text of document `ord` — see the cluster layout in the object doc. */
  def docText(seed: Long, ord: Long, vocab: Array[String]): String = {
    val pos = ord % 10
    val ids =
      if (pos == 0 || pos > 2) masterWordIds(seed, ord)
      else {
        val base = masterWordIds(seed, ord - pos)
        val rng  = new Rng(seed ^ (ord * 0xbf58476d1ce4e5b9L) ^ 0xd0bL)
        val out  = base.clone()
        var i    = 0
        while (i < out.length) {
          if (((rng.nextLong() >>> 33) % 100) < 3)
            out(i) = ((rng.nextLong() >>> 33) % WordVocab).toInt
          i += 1
        }
        out
      }
    val sb = new java.lang.StringBuilder(ids.length * 8)
    var i  = 0
    while (i < ids.length) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(ids(i)))
      i += 1
    }
    sb.toString
  }

  /** (doc_id long, text string), generated distributed. */
  def documents(spark: SparkSession, n: Long, seed: Long = 101L,
                numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, numPartitions).mapPartitions { ords =>
      val vocab = Array.tabulate(WordVocab)(i => word(seed, i))
      ords.map(ord => (ord, docText(seed, ord, vocab)))
    }.toDF("doc_id", "text")
  }

  /** The embedding of row `ord` — see the cluster layout in the object doc. */
  def embeddingOf(seed: Long, ord: Long, dim: Int, nClusters: Int): Array[Float] = {
    val cluster = (ord % nClusters).toInt
    val member  = ord / nClusters
    val crng    = new Rng(seed ^ (cluster.toLong * 0x2545f4914f6cdd1dL) ^ 0xce11L)
    val jitter  = if (member % 32 < 2) 0.02f else 0.5f
    val mrng    = new Rng(seed ^ (ord * 0x9e3779b97f4a7c15L) ^ 0xe3bL)
    val out     = new Array[Float](dim)
    var i       = 0
    while (i < dim) {
      val c = crng.nextFloat() * 2f - 1f
      out(i) = c + (mrng.nextFloat() * 2f - 1f) * jitter
      i += 1
    }
    out
  }

  /** (vec_id long, embedding array<float>, cluster int), generated distributed. */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64, nClusters: Int = 4096,
                 seed: Long = 202L, numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, numPartitions)
      .map(ord => (ord, embeddingOf(seed, ord, dim, nClusters), (ord % nClusters).toInt))
      .toDF("vec_id", "embedding", "cluster")
  }

  /** (user_id long, ts timestamp, event_type string): `perUser` events per
    * user, inter-event gaps uniform in [1, 90] minutes from the user's own
    * stream — roughly a third of gaps exceed a 60-minute session threshold.
    */
  def events(spark: SparkSession, nUsers: Long, perUser: Int = 100,
             seed: Long = 303L, numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0L, nUsers, 1L, numPartitions).flatMap { u =>
      val rng = new Rng(seed ^ (u * 0x9e3779b97f4a7c15L) ^ 0x5e55L)
      var t   = 1700000000000L + (u % 86400L) * 1000L
      (0 until perUser).map { _ =>
        t += 60000L * (1L + ((rng.nextLong() >>> 33) % 90L))
        (u, new java.sql.Timestamp(t), "e" + ((rng.nextLong() >>> 33) % 20L))
      }
    }.toDF("user_id", "ts", "event_type")
  }

  /** Write-once cache under data/ (idempotent by _SUCCESS, like
    * TokenTables.ensure); returns the directory.
    *
    * LOCAL-ONLY by design (bench/rehearsal corpora): the _SUCCESS probe is
    * java.io.File, which cannot see hdfs://-style paths — a remote dir would
    * silently regenerate the corpus on every call, so it is rejected. The
    * cache keys on the directory name alone: callers MUST encode every
    * generator parameter that matters in the name (the in-repo callers
    * encode the size, and the other knobs are compile-time constants) —
    * changing a generator default while reusing a dir name serves stale data.
    */
  def ensure(dir: String, build: () => DataFrame): String = {
    require(!dir.contains("://"),
      s"ScaleCorpus.ensure caches via java.io.File and is local-only; got $dir")
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      build().write.mode("overwrite").parquet(dir)
      // the idempotence probe IS the committer's marker: if a session
      // disables _SUCCESS (marksuccessfuljobs=false), every call would
      // silently regenerate the corpus — and two CONCURRENT generators
      // racing this check-then-write corrupt the cache (bench methodology
      // already forbids concurrent runs; this makes the breach loud)
      require(success.exists(),
        s"ScaleCorpus.ensure: $dir was written but has no _SUCCESS marker " +
          "(committer configured with marksuccessfuljobs=false, or a " +
          "concurrent generator raced this write) — the cache cannot be " +
          "trusted; delete the directory and rerun with the marker enabled")
    }
    dir
  }
}
