package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** count(DISTINCT) → bitmap optimizer rewrite (RewriteRules.scala). */
class RewriteRulesSpec extends SparkSpec {
  import spark.implicits._

  private val flag = "spark.graft.rewrite.bitmapDistinct"

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.unset(flag)
  }

  private def df = (1 to 5000).map(i => (i % 7, (i * 31 % 997).toLong))
    .toDF("g", "id")

  test("flag on: plan carries the bitmap aggregate, results are exact") {
    withFlag(on = true) {
      val q = df.groupBy("g").agg(count_distinct(col("id")).as("nd"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_bitmap_distinct"),
        q.queryExecution.optimizedPlan.toString)
      // no distinct-expand survives
      assert(!q.queryExecution.executedPlan.toString.contains("Expand"))
      val got = q.orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val want = withFlag(on = false) {
        df.groupBy("g").agg(count_distinct(col("id")).as("nd"))
          .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      }
      assert(got == want)
    }
  }

  test("flag off (default): plan untouched") {
    val q = df.groupBy("g").agg(count_distinct(col("id")))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_bitmap_distinct"))
  }

  test("non-integral and non-distinct counts are never rewritten") {
    withFlag(on = true) {
      val s = Seq(("a", "x"), ("b", "x")).toDF("g", "name")
      assert(!s.groupBy("g").agg(count_distinct(col("name")))
        .queryExecution.optimizedPlan.toString.contains("graft_bitmap_distinct"))
      assert(!df.groupBy("g").agg(count(col("id")))
        .queryExecution.optimizedPlan.toString.contains("graft_bitmap_distinct"))
    }
  }

  test("the domain contract still raises on negative ids") {
    withFlag(on = true) {
      val e = intercept[Exception] {
        Seq(-1L).toDF("id").agg(count_distinct(col("id"))).head
      }
      def mentions(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("graft_bitmap_distinct"))
          || mentions(t.getCause))
      assert(mentions(e))
    }
  }
}
