package graft.spark

import java.sql.Timestamp

import graft.core.{SketchConfig, SlidingConfig}
import graft.streaming.TopKStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(millis: Long) = new Timestamp(millis)

  test("tumbling streaming windows finalize on watermark and match exact counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df    = input.toDF.toDF("ts", "item", "weight")
    val cfg   = SketchConfig.withDefaults(3, width = 256, depth = 3)
    val q = TopKStreams.tumbling(df, "10 seconds", "0 seconds", cfg)
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      // window [0,10): a=3, b=1 ; window [10,20): b=5
      input.addData((ts(1000), "a", 2L), (ts(2000), "b", 1L), (ts(3000), "a", 1L))
      q.processAllAvailable()
      input.addData((ts(12000), "b", 5L)) // pushes watermark past window 0
      q.processAllAvailable()
      input.addData((ts(25000), "c", 1L)) // pushes watermark past window 1
      q.processAllAvailable()
      val rows = spark.table("tumb")
        .select(col("window.start").cast("long"), col("rank"), col("item"), col("count"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      assert(rows.toSeq == Seq((0L, 1L, "a", 3L), (0L, 2L, "b", 1L), (10L, 1L, "b", 5L)))
    } finally q.stop()
  }

  test("sliding streaming reproduces the reference tick trace exactly once (sliding/sketch_test.go:167-296)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String, Long)]
    val df    = input.toDF.toDF("key", "ts", "item", "weight")
    val cfg   = SlidingConfig.withDefaults(2, 2, width = 10, depth = 2, bucketHistoryLength = 2)
    val out = TopKStreams.sliding(df, tickMillis = 1000L, watermarkDelay = "0 seconds",
      cfg = cfg, emitK = 2)
    val q = out.writeStream.format("memory").queryName("slide").outputMode("append").start()
    try {
      def add(tick: Int, item: String, w: Long): (String, Timestamp, String, Long) =
        ("g", ts(tick * 1000L + 1), item, w)
      // the golden schedule (FIXTURES.md §3.4)
      input.addData(add(0, "X", 3), add(0, "Y", 2), add(0, "Z", 1))
      input.addData(add(1, "X", 2), add(1, "Y", 2), add(1, "Z", 1))
      input.addData(add(2, "Y", 1), add(2, "Z", 3))
      input.addData(add(3, "Y", 1), add(3, "Z", 3))
      // t4 has no adds; t5 has X+1; sentinel at t7 completes t5
      input.addData(add(5, "X", 1))
      input.addData(add(7, "sentinel", 0))
      q.processAllAvailable()
      // one more batch so the final watermark is applied to the state op
      input.addData(add(8, "sentinel2", 0))
      q.processAllAvailable()

      val rows = spark.table("slide")
        .select("tick", "rank", "item", "count")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2.toLong))
        .filterNot(_._3.startsWith("sentinel"))
      val expected = Seq(
        (0L, 1, "X", 3L), (0L, 2, "Y", 2L),
        (1L, 1, "X", 5L), (1L, 2, "Y", 4L),
        (2L, 1, "Z", 4L), (2L, 2, "Y", 3L),
        (3L, 1, "Z", 6L), (3L, 2, "Y", 2L),
        (4L, 1, "Z", 3L), (4L, 2, "Y", 1L),
        (5L, 1, "X", 1L),
        (6L, 1, "X", 1L) // X (added t5) stays in the 2-tick window through t6
      )
      assert(rows.toSeq == expected)
    } finally q.stop()
  }

  test("sliding: a watermark plateauing EXACTLY on a tick boundary still emits the final tick") {
    // Tick completion counts equality (wm >= (t+1)*tick) but Spark fires
    // event-time timeouts strictly (timeout < wm): with the timeout set AT
    // the boundary, a final watermark of exactly (t+1)*tick never fired it
    // and the last completed tick was lost. The watermark here advances via
    // a DIFFERENT key, so key "g" can only emit through the timeout path —
    // the data path would mask the regression.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String, Long)]
    val df    = input.toDF.toDF("key", "ts", "item", "weight")
    val cfg   = SlidingConfig.withDefaults(2, 2, width = 256, depth = 3)
    val q = TopKStreams.sliding(df, 1000L, "0 seconds", cfg, emitK = 2)
      .writeStream.format("memory").queryName("slide_edge").outputMode("append").start()
    try {
      // first event at ts=1, not 0: rows at exactly the INITIAL watermark
      // (epoch 0) are dropped as late by Spark before the state op — an
      // epoch-boundary curiosity no real stream hits; the boundary under
      // test here is the tick-aligned FINAL watermark below
      input.addData(("g", ts(1L), "a", 3L))
      q.processAllAvailable()
      input.addData(("g", ts(1000L), "b", 2L))
      q.processAllAvailable()
      // tick-aligned watermark advance on another key; weight 0 rows are
      // filtered before the state op but still move the watermark to 2000
      input.addData(("h", ts(2000L), "wm", 0L))
      q.processAllAvailable()
      val rows = spark.table("slide_edge")
        .where(col("key") === "g")
        .select("tick", "rank", "item", "count")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2.toLong))
      // tick 1 completes at wm == 2000 exactly; window=2 keeps a in scope
      assert(rows.toSeq == Seq(
        (0L, 1, "a", 3L),
        (1L, 1, "a", 3L), (1L, 2, "b", 2L)))
    } finally q.stop()
  }

  test("map-side reduce cap: flushed partial groups merge to the same answer") {
    // reduceMaxEntries=2 forces the bounded reduce map to flush mid-batch
    // (7 distinct (key, tick, item) groups below); the state machine must
    // sum the partial flush rows back to the uncapped result
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.graft.stream.reduceMaxEntries", "2")
    try {
      val input = MemoryStream[(String, Timestamp, String, Long)]
      val df    = input.toDF.toDF("key", "ts", "item", "weight")
      val cfg   = SlidingConfig.withDefaults(3, 2, width = 256, depth = 3)
      val q = TopKStreams.sliding(df, 1000L, "0 seconds", cfg, emitK = 3)
        .writeStream.format("memory").queryName("slide_cap").outputMode("append").start()
      try {
        input.addData(
          ("g", ts(1L), "a", 1L), ("g", ts(2L), "a", 1L), ("g", ts(3L), "b", 5L),
          ("g", ts(4L), "c", 2L), ("h", ts(5L), "a", 7L), ("h", ts(6L), "b", 1L),
          ("g", ts(1001L), "a", 4L), ("h", ts(1002L), "c", 3L))
        q.processAllAvailable()
        input.addData(("z", ts(3000L), "wm", 0L)) // complete ticks 0 and 1
        q.processAllAvailable()
        val rows = spark.table("slide_cap")
          .where(col("key").isin("g", "h") && col("tick") === 0)
          .select("key", "rank", "item", "count")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2.toLong))
        // tick 0 exact counts: g: b=5, c=2, a=2 ; h: a=7, b=1
        assert(rows.toSeq == Seq(
          ("g", 1, "b", 5L), ("g", 2, "a", 2L), ("g", 3, "c", 2L),
          ("h", 1, "a", 7L), ("h", 2, "b", 1L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.graft.stream.reduceMaxEntries")
  }

  test("sliding streaming: independent keys, out-of-order arrivals within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String, Long)]
    val df    = input.toDF.toDF("key", "ts", "item", "weight")
    val cfg   = SlidingConfig.withDefaults(2, 3, width = 256, depth = 3)
    val q = TopKStreams.sliding(df, 1000L, "2 seconds", cfg, emitK = 2)
      .writeStream.format("memory").queryName("slide2").outputMode("append").start()
    try {
      // out-of-order inside the 2s lateness bound; two keys
      input.addData(("a", ts(1500), "x", 2L), ("b", ts(1200), "p", 7L))
      input.addData(("a", ts(300), "x", 1L), ("a", ts(800), "y", 5L)) // late but allowed
      input.addData(("a", ts(6000), "z", 1L), ("b", ts(6000), "q", 1L)) // advance wm to 4000
      q.processAllAvailable()
      input.addData(("a", ts(9000), "s", 0L))
      q.processAllAvailable()
      val rows = spark.table("slide2")
        .select("key", "tick", "rank", "item", "count")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
        .toSet
      // key a, tick 0: x=1 (ts 300), y=5 (ts 800) -> top: y:5, x:1
      assert(rows.contains(("a", 0L, 1, "y", 5L)))
      assert(rows.contains(("a", 0L, 2, "x", 1L)))
      // key a, tick 1: x=1+2=3
      assert(rows.contains(("a", 1L, 2, "x", 3L)))
      // key b, tick 1: p=7
      assert(rows.contains(("b", 1L, 1, "p", 7L)))
      // window size 3: tick 2's window is ticks 0..2, so tick-0 adds count
      assert(rows.contains(("a", 2L, 1, "y", 5L)))
      // at tick 3, tick-0 contributions expired (window = ticks 1..3) -> y gone
      assert(!rows.exists(r => r._1 == "a" && r._2 == 3L && r._4 == "y"))
    } finally q.stop()
  }

  test("session streaming windows merge across gaps and finalize on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String, Long)]
    val df    = input.toDF.toDF("key", "ts", "item", "weight")
    val cfg   = SketchConfig.withDefaults(2, width = 256, depth = 3)
    val q = TopKStreams.session(df, gap = "10 seconds", watermarkDelay = "0 seconds", cfg)
      .writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      // session A for u1: events at 1s and 5s (merged: one session [1, 15));
      // then silence past the gap, session B at 60s
      input.addData(("u1", ts(1000), "x", 1L), ("u1", ts(5000), "x", 1L),
        ("u1", ts(5000), "y", 1L))
      q.processAllAvailable()
      input.addData(("u1", ts(60000), "z", 1L)) // watermark 60s > 15s -> finalize A
      q.processAllAvailable()
      input.addData(("u2", ts(120000), "w", 1L)) // watermark 120s > 70s -> finalize B
      q.processAllAvailable()
      val rows = spark.table("sess_stream")
        .select(col("key"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("rank"), col("item"), col("count"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getLong(5)))
        .sortBy(t => (t._1, t._2, t._4))
      // session A: x=2 (rank 1), y=1 (rank 2), bounds [1, 15)
      assert(rows.toSeq == Seq(
        ("u1", 1L, 15L, 1L, "x", 2L), ("u1", 1L, 15L, 2L, "y", 1L),
        ("u1", 60L, 70L, 1L, "z", 1L)))
    } finally q.stop()
  }
}
