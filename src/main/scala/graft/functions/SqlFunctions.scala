package graft.functions

import graft.core.SketchConfig
import graft.plans.{ItemsTopKAgg, TokensTopKAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL surface: registers the engine's aggregates and scalar helpers into the
  * session's FunctionRegistry so plain `spark.sql` can use them:
  *
  * {{{
  *   SELECT topk_tokens(tokens, 10, 1024, 3) FROM seqs                 -- array<int>
  *   SELECT topk_items(item, weight, 10, 1024, 3) FROM updates         -- generic
  *   SELECT xxh32(text, 4848280) FROM docs                             -- seeded hash
  * }}}
  *
  * Geometry arguments are literal ints: (k[, width, depth[, decay]]);
  * width/depth <= 0 fall back to the reference defaults
  * (width = max(256, k ln k), depth = max(3, ln k) — reference sketch.go:41-67).
  */
object SqlFunctions {

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  => v.toInt
    case other                => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def litFloat(e: Expression, default: Float): Float = e match {
    case Literal(v: Double, _)  => v.toFloat
    case Literal(v: Float, _)   => v
    case Literal(v: Int, _)     => v.toFloat
    case other                  => throw new IllegalArgumentException(
      s"decay must be a numeric literal, got $other")
  }

  private def cfgFrom(args: Seq[Expression], from: Int): SketchConfig = {
    val k     = litInt(args(from), "k")
    val width = if (args.length > from + 1) litInt(args(from + 1), "width") else -1
    val depth = if (args.length > from + 2) litInt(args(from + 2), "depth") else -1
    val decay = if (args.length > from + 3) litFloat(args(from + 3), 0.9f) else 0.9f
    SketchConfig.withDefaults(k, width = width, depth = depth, decay = decay)
  }

  /** Oversampling factor applied to partial candidate tracking (see
    * TopKAggregator docs); emitted rows stay at k.
    */
  private val Oversample = 4

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry

    registry.createOrReplaceTempFunction("topk_tokens", { args =>
      require(args.length >= 2 && args.length <= 5,
        "usage: topk_tokens(tokens_array, k[, width, depth[, decay]])")
      val cfg = cfgFrom(args, 1)
      TokensTopKAgg(args.head, cfg.copy(k = cfg.k * Oversample), cfg.k)
        .toAggregateExpression()
    }, "built-in")

    registry.createOrReplaceTempFunction("topk_items", { args =>
      require(args.length >= 3 && args.length <= 6,
        "usage: topk_items(item, weight, k[, width, depth[, decay]])")
      val cfg = cfgFrom(args, 2)
      // cast for SQL ergonomics (ints as items, int weights); the aggregate
      // itself validates strictly via checkInputDataTypes
      ItemsTopKAgg(Cast(args.head, StringType), Cast(args(1), LongType),
          cfg.copy(k = cfg.k * Oversample), cfg.k)
        .toAggregateExpression()
    }, "built-in")

    registry.createOrReplaceTempFunction("xxh32", { args =>
      require(args.length == 2, "usage: xxh32(str, seed)")
      graft.plans.XxHash32Expr(args.head, args(1))
    }, "built-in")

    // scalar lookups over serialized sketch blobs (reference: sketch.go:90-111,172-175)
    spark.udf.register("topk_count", (bytes: Array[Byte], item: String) =>
      if (bytes == null || item == null) 0L
      else graft.core.SketchCodec.decode(bytes).count(item))
    spark.udf.register("topk_query", (bytes: Array[Byte], item: String) =>
      bytes != null && item != null && graft.core.SketchCodec.decode(bytes).query(item))
    // sketch blob builder for CTE-style pipelines:
    //   WITH sk AS (SELECT topk_sketch(item, w, k, width, depth) b FROM t)
    //   SELECT topk_count(b, 'x') FROM sk
    registry.createOrReplaceTempFunction("topk_merge", { args =>
      require(args.length == 1, "usage: topk_merge(sketch_blob)")
      graft.plans.MergeSketchBlobsAgg(args.head).toAggregateExpression()
    }, "built-in")

    registry.createOrReplaceTempFunction("topk_rows", { args =>
      require(args.length == 2, "usage: topk_rows(sketch_blob, k)")
      graft.plans.SketchRowsExpr(args.head, args(1))
    }, "built-in")

    registry.createOrReplaceTempFunction("topk_sketch", { args =>
      require(args.length >= 3 && args.length <= 6,
        "usage: topk_sketch(item, weight, k[, width, depth[, decay]])")
      graft.plans.SketchBytesAgg(Cast(args.head, StringType), Cast(args(1), LongType),
          cfgFrom(args, 2))
        .toAggregateExpression()
    }, "built-in")
  }
}
