package graft.spark

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.syntheticMediaTable(
    Seq((1L, "hello world payload"), (2L, "x"), (3L, "another longer media payload here"))
      .toDF("doc_id", "text"),
    $"doc_id", $"text")

  test("synthetic media table conforms to the media schema") {
    val m = media
    assert(m.schema.fieldNames.toSeq == Seq("doc_id", "payload", "meta"))
    assert(m.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = m.select("meta.*").head()
    assert(Set("image", "audio", "video").contains(meta.getString(0)))
  }

  test("feature extraction: fixed-dim deterministic vectors, null-safe") {
    val feats = media.select($"doc_id", Multimodal.extractFeatures(16)($"payload").as("f"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Float]]("f")).toMap
    assert(feats.values.forall(_.length == 16))
    // deterministic: same payload -> same features across evaluations
    val again = media.select($"doc_id", Multimodal.extractFeatures(16)($"payload").as("f"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Float]]("f")).toMap
    assert(feats == again)
    assert(feats("1") != feats("3"))
  }

  test("resize produces w*h pooled values") {
    val r = media.select(Multimodal.resize(4, 3)($"payload").as("px")).head()
    assert(r.getAs[scala.collection.Seq[Float]]("px").length == 12)
  }

  test("frame sampling: chunk arithmetic and per-frame rows") {
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
      .select($"doc_id", $"frame_idx", length($"frame_bytes").as("len"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // doc 2 has 1 byte -> exactly 1 frame of len 1
    assert(frames.filter(_._1 == "2").toSeq == Seq(("2", 0, 1)))
    // doc 1: len 19, size 4 -> frames of len 4,4,4,4 (first 16 bytes)
    assert(frames.filter(_._1 == "1").map(_._3).toSeq == Seq(4, 4, 4, 4))
  }

  test("mediaStats checksum matches a direct computation") {
    val s = Multimodal.mediaStats(media).where($"doc_id" === "2").head()
    assert(s.getLong(1) == 1L)          // payload_len of "x"
    assert(s.getLong(2) == 'x'.toLong)  // byte checksum
  }

  test("SQL registration: topk_tokens / topk_items / xxh32 usable from spark.sql") {
    graft.functions.SqlFunctions.register(spark)
    Seq((Array(1, 2, 2, 3), 1L)).toDF("tokens", "w").createOrReplaceTempView("seqs")
    val r = spark.sql("SELECT topk_tokens(tokens, 2, 256, 3) AS tk FROM seqs")
      .select(explode($"tk").as("e")).select("e.item", "e.count")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("2", 2L), ("1", 1L)))

    Seq(("a", 5L), ("b", 9L)).toDF("item", "w").createOrReplaceTempView("ups")
    val r2 = spark.sql("SELECT topk_items(item, w, 1, 256, 3) AS tk FROM ups")
      .select(explode($"tk").as("e")).select("e.item").head().getString(0)
    assert(r2 == "b")

    val h = spark.sql("SELECT xxh32('X', 4848280) AS h").head().getLong(0)
    assert(h == (graft.core.Hashing.fingerprint("X").toLong & 0xffffffffL))
  }

  test("SQL sketch blobs: topk_sketch + topk_count/topk_query round-trip in SQL") {
    graft.functions.SqlFunctions.register(spark)
    Seq(("a", 5L), ("b", 9L), ("c", 1L)).toDF("item", "w").createOrReplaceTempView("ups2")
    val row = spark.sql("""
      WITH sk AS (SELECT topk_sketch(item, w, 2, 256, 3) AS b FROM ups2)
      SELECT topk_count(b, 'b') AS cb, topk_query(b, 'b') AS qb,
             topk_query(b, 'c') AS qc FROM sk""").head()
    assert(row.getLong(0) == 9L)
    assert(row.getBoolean(1))
    assert(!row.getBoolean(2)) // c evicted from k=2 top set
  }
}
