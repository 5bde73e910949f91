package graft.functions

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Opt-in optimizer rewrite: `count(DISTINCT <integral id>)` →
  * [[BitmapDistinct]].
  *
  * Why: Spark plans a distinct-count as EXPAND + two aggregations —
  * every distinct KEY crosses the shuffle. The paged bitmap ships bits
  * instead and merges page-wise, with identical (exact) results on the
  * id domain it supports. The rewrite fires BEFORE the optimizer's
  * RewriteDistinctAggregates batch, so the expand never materializes.
  *
  * Strictly opt-in (`spark.graft.rewrite.bitmapDistinct=true`):
  * the bitmap's domain contract is non-negative integral keys — a
  * negative id raises at runtime rather than miscounting, so the flag
  * belongs on pipelines that know their ids (fact-table ids, doc ids),
  * not on arbitrary SQL. Registered via
  * [[GraftExtensions]].injectOptimizerRule.
  */
case class BitmapDistinctRewrite(session: org.apache.spark.sql.SparkSession)
  extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewrite.bitmapDistinct", "false") == "true"

  private val integral = Set[Any](ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(child)), _, true, filter, _)
          if integral.contains(child.dataType) =>
        AggregateExpression(
          BitmapDistinct(Cast(child, LongType)),
          ae.mode, isDistinct = false, filter, ae.resultId)
    }
}
