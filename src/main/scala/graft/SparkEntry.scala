package graft

import graft.core.SketchConfig
import graft.operators.{SlidingTopK, TopK}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here returns columns that match its `oracleSql` entry
  * name-for-name (the driver's compare sorts columns by name before hashing).
  * The sketch queries use collision-free geometries at the verification SF so
  * the HeavyKeeper estimates are exact and hash-match the DuckDB oracle;
  * statistical behavior under collisions is covered by the ScalaTest suite.
  */
object SparkEntry {

  private def events(s: SparkSession, dir: String)    = s.read.parquet(s"$dir/events.parquet")
  private def documents(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
  private def lineitem(s: SparkSession, dir: String)  = s.read.parquet(s"$dir/lineitem.parquet")

  // Collision-free geometry at verification scale: width >> distinct items.
  private val cfgWide  = SketchConfig.withDefaults(k = 5, width = 1024, depth = 3)
  private val cfgUsers = SketchConfig.withDefaults(k = 20, width = 4096, depth = 3)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("topk_event_types")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- top-K sketch: Add/Incr + SortedSlice surface (sketch.go:118-209) ---
    "topk_event_types" -> ((s, dir) =>
      TopK.aggregate(events(s, dir), col("event_type"), lit(1L), cfgWide)
        .select("item", "count")),

    "topk_users" -> ((s, dir) =>
      TopK.aggregate(events(s, dir), col("user_id"), lit(1L), cfgUsers, oversample = 8)
        .select("item", "count")),

    // weighted Add: increment = integer quantity (sketch.go:118-120)
    "topk_suppliers_by_qty" -> ((s, dir) =>
      TopK.aggregate(lineitem(s, dir), col("l_suppkey"),
          col("l_quantity").cast("long"),
          SketchConfig.withDefaults(k = 10, width = 4096, depth = 3), oversample = 8)
        .select("item", "count")),

    // token stream over text: explode -> sketch (the north-star shape)
    "topk_tokens" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      TopK.aggregate(toks, col("tok"), lit(1L),
          SketchConfig.withDefaults(k = 20, width = 1024, depth = 3))
        .select("item", "count")
    }),

    // tumbling window: per-day top-K = use-then-Reset pattern (sketch.go:211-215)
    "topk_event_types_daily" -> ((s, dir) =>
      TopK.aggregateBy(
          events(s, dir).withColumn("day", date_trunc("DAY", col("ts"))),
          Seq(col("day")), col("event_type"), lit(1L),
          SketchConfig.withDefaults(k = 3, width = 1024, depth = 3))
        .select("day", "rank", "item", "count")),

    // sliding window: 7-day window per day tick (sliding/sketch.go semantics,
    // realized as the distributed per-tick sketch ring)
    "topk_sliding_event_types" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("tick", datediff(to_date(col("ts")), lit("2024-01-01")))
      SlidingTopK.perTick(ev, col("tick"), col("event_type"), lit(1L),
          windowTicks = 7, cfg = SketchConfig.withDefaults(k = 5, width = 1024, depth = 3), k = 3)
        .select("tick", "rank", "item", "count")
    }),

    // Count(item) lookups over a sketch blob (sketch.go:90-111)
    "topk_count_lookup" -> ((s, dir) => {
      val ev   = events(s, dir)
      val blob = ev.select(col("event_type").as("item"))
        .agg(TopK.sketchUdafFor(cfgWide)(col("item"), lit(1L)).as("sk"))
      val items = ev.select(col("event_type").as("item")).distinct()
      items.crossJoin(broadcast(blob))
        .select(col("item"), TopK.countUdf(col("sk"), col("item")).as("count"))
    }),

    // relational sanity: aggregation pushdown/codegen baseline
    "q1_agg" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "topk_event_types" ->
      """SELECT event_type AS item, count(*) AS count
         FROM events GROUP BY 1 ORDER BY count DESC, item LIMIT 5""",

    "topk_users" ->
      """SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS count
         FROM events GROUP BY 1 ORDER BY count DESC, item LIMIT 20""",

    "topk_suppliers_by_qty" ->
      """SELECT CAST(l_suppkey AS VARCHAR) AS item,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS count
         FROM lineitem GROUP BY 1 ORDER BY count DESC, item LIMIT 10""",

    "topk_tokens" ->
      """SELECT tok AS item, count(*) AS count
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         WHERE len(tok) > 0
         GROUP BY 1 ORDER BY count DESC, item LIMIT 20""",

    "topk_event_types_daily" ->
      """WITH c AS (
           SELECT date_trunc('day', ts) AS day, event_type AS item, count(*) AS count
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT day, item, count,
                  row_number() OVER (PARTITION BY day ORDER BY count DESC, item) AS rank
           FROM c)
         SELECT day, rank, item, count FROM r WHERE rank <= 3 ORDER BY day, rank""",

    "topk_sliding_event_types" ->
      """WITH per AS (
           SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS tick,
                  event_type AS item, count(*) AS c
           FROM events GROUP BY 1, 2),
         ticks AS (SELECT DISTINCT tick FROM per),
         win AS (
           SELECT t.tick, p.item, CAST(sum(p.c) AS BIGINT) AS count
           FROM ticks t JOIN per p ON p.tick BETWEEN t.tick - 6 AND t.tick
           GROUP BY 1, 2),
         r AS (
           SELECT tick, item, count,
                  row_number() OVER (PARTITION BY tick ORDER BY count DESC, item) AS rank
           FROM win)
         SELECT tick, rank, item, count FROM r WHERE rank <= 3 ORDER BY tick, rank""",

    "topk_count_lookup" ->
      """SELECT event_type AS item, count(*) AS count
         FROM events GROUP BY 1 ORDER BY item""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
