package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join layout (LayoutOps.writeBucketed): the plan
  * contract — joining two tables bucketed on the join key runs with
  * ZERO Exchange above the scans.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[T](body: => T): T = {
    // sort-order reuse from single-file buckets is opt-in since
    // SPARK-28583 (multi-file buckets would interleave); writeBucketed
    // guarantees one file per bucket, making the opt-in safe
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed equi-join plans with no Exchange and no extra Sort") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-bktspec").toString
    val left = (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
    val right = (1 to 5000 by 3).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    LayoutOps.writeBucketed(left, "bkt_spec_left", s"$base/l", "id", 4)
    LayoutOps.writeBucketed(right, "bkt_spec_right", s"$base/r", "id", 4)
    withNoBroadcast {
      val joined = spark.table("bkt_spec_left")
        .join(spark.table("bkt_spec_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"shuffle survived bucketing:\n$plan")
      // sortBy at write time also drops the runtime Sort under SMJ
      assert(!plan.contains("Sort ["), s"runtime sort survived sortBy:\n$plan")
      // and the result is the plain join's
      assert(joined.count() == right.count())
    }
  }

  test("per-key aggregation on the bucket key also skips the shuffle") {
    withNoBroadcast {
      val agg = spark.table("bkt_spec_left").groupBy("id").agg(sum("x"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"groupBy(bucket key) shuffled:\n$plan")
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-bktspec2").toString
    val right = (1 to 100).map(i => (i.toLong, i)).toDF("id", "y")
    LayoutOps.writeBucketed(right, "bkt_spec_other", s"$base/o", "id", 7)
    withNoBroadcast {
      val joined = spark.table("bkt_spec_left")
        .join(spark.table("bkt_spec_other"), "id")
      assert(joined.count() == 100)
    }
  }
}
