package graft

import graft.core.SketchConfig
import graft.plans.{ItemsTopKAgg, TokensTopKAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point — the idiomatic cluster deployment
  * path: `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
  * injects the engine's SQL functions into every session (no driver-side
  * registration call needed). Local sessions can equally call
  * `graft.functions.SqlFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  private def cfgFrom(args: Seq[Expression], from: Int): SketchConfig = {
    val k     = litInt(args(from), "k")
    val width = if (args.length > from + 1) litInt(args(from + 1), "width") else -1
    val depth = if (args.length > from + 2) litInt(args(from + 2), "depth") else -1
    SketchConfig.withDefaults(k, width = width, depth = depth)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("topk_tokens"),
      new ExpressionInfo(classOf[TokensTopKAgg].getName, "topk_tokens"),
      (args: Seq[Expression]) => {
        val cfg = cfgFrom(args, 1)
        TokensTopKAgg(args.head, cfg.copy(k = cfg.k * 4), cfg.k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_items"),
      new ExpressionInfo(classOf[ItemsTopKAgg].getName, "topk_items"),
      (args: Seq[Expression]) => {
        val cfg = cfgFrom(args, 2)
        ItemsTopKAgg(args.head, args(1), cfg.copy(k = cfg.k * 4), cfg.k).toAggregateExpression()
      }))
  }
}
