package graft.spark

import graft.sources.ScaleCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-rehearsal corpora must actually contain the structure the
  * rehearsal's recall arithmetic assumes: partition-independent determinism,
  * near-duplicate doc clusters at verifiable similarity, a tight embedding
  * tier above the near-dup threshold with the loose tier below it, and
  * session-splitting event gaps.
  */
class ScaleCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("documents are partition-independent and deterministic") {
    val a = ScaleCorpus.documents(spark, 200, numPartitions = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = ScaleCorpus.documents(spark, 200, numPartitions = 7)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("planted doc clusters: copies are near-dups of the master, others are not") {
    val docs = ScaleCorpus.documents(spark, 100).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(s: String) = s.sliding(5).toSet
    def jaccard(x: String, y: String) = {
      val (a, b) = (shingles(x), shingles(y))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    // ordinals 10m+1, 10m+2 perturb master 10m (~3% word replacement)
    val planted = for (m <- 0L until 100L by 10; p <- 1 to 2)
      yield jaccard(docs(m), docs(m + p))
    assert(planted.forall(_ > 0.6), s"planted jaccards: $planted")
    // independent docs (position > 2 in the run) stay dissimilar
    val indep = for (m <- 0L until 100L by 10) yield jaccard(docs(m), docs(m + 5))
    assert(indep.forall(_ < 0.3), s"independent jaccards: $indep")
  }

  test("embeddings: tight tier above 0.95 cosine, loose tier below") {
    val nClusters = 16
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / math.sqrt(na * nb)
    }
    def emb(ord: Long) = ScaleCorpus.embeddingOf(202L, ord, 64, nClusters)
    // members m of cluster c sit at ordinal c + m * nClusters; m % 32 < 2 is
    // the tight tier
    for (c <- 0 until 4) {
      val tightPair = cos(emb(c), emb(c + nClusters)) // members m=0, m=1
      assert(tightPair > 0.95, s"cluster $c tight pair cos=$tightPair")
      val looseMate = cos(emb(c), emb(c + 5L * nClusters)) // m=0 vs m=5 (loose)
      assert(looseMate < 0.95 && looseMate > 0.5,
        s"cluster $c tight-loose cos=$looseMate")
      val crossCluster = cos(emb(c), emb(c + 1)) // different cluster
      assert(math.abs(crossCluster) < 0.5, s"cross-cluster cos=$crossCluster")
    }
  }

  test("events: per-user ordered timestamps with session-splitting gaps") {
    val ev = ScaleCorpus.events(spark, nUsers = 20, perUser = 50)
    assert(ev.count() == 1000L)
    val gaps = ev.withColumn("prev",
        lag("ts", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts")))
      .where($"prev".isNotNull)
      .select(((unix_timestamp($"ts") - unix_timestamp($"prev")) / 60).as("gap_min"))
      .collect().map(_.getDouble(0))
    assert(gaps.forall(g => g >= 1 && g <= 90), "gaps outside [1, 90] minutes")
    val splitFrac = gaps.count(_ > 60).toDouble / gaps.length
    assert(splitFrac > 0.2 && splitFrac < 0.45, s"session-split fraction $splitFrac")
  }
}
