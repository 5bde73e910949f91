package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom per-group top-k operator (plans/TopKPerGroup.scala):
  * equality with the window formulation (including ties), plan shape,
  * and partitioning reuse.
  */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 5000).map { i =>
    (s"g${i % 23}", (i * 2654435761L % 1000).toDouble, i.toLong)
  }.toDF("g", "v", "id")

  private def viaWindow(desc: Boolean) = {
    val ord = if (desc) Seq(col("v").desc, col("id").asc)
              else Seq(col("v").asc, col("id").asc)
    data.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
      .filter(col("rank") <= 3)
  }

  test("matches row_number window top-k, ties broken identically") {
    for (desc <- Seq(true, false)) {
      val native = TopKPerGroup(data, Seq("g"), "v", "id", 3, desc = desc)
        .select("g", "v", "id", "rank").orderBy("g", "rank")
        .collect().toSeq
      val window = viaWindow(desc)
        .select("g", "v", "id", "rank").orderBy("g", "rank")
        .collect().toSeq
      assert(native == window, s"desc=$desc")
    }
  }

  test("plans the custom exec node with one exchange, no sort") {
    val q = TopKPerGroup(data, Seq("g"), "v", "id", 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup "), plan) // Exec renders suffix-stripped
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "), plan)
  }

  test("reuses an upstream hash partitioning instead of re-shuffling") {
    val pre = data.repartition(col("g"))
    val plan = TopKPerGroup(pre, Seq("g"), "v", "id", 2)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("downstream operators consume the output (UnsafeRow contract)") {
    val out = TopKPerGroup(data, Seq("g"), "v", "id", 2)
      .groupBy("g").agg(sum("v").as("s"), max("rank").as("r"))
    assert(out.count() == 23)
    assert(out.agg(max("r")).head.getInt(0) == 2)
  }

  test("null order values are dropped, not ranked") {
    val withNulls = Seq(("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L))
      .toDF("g", "v", "id")
    val got = TopKPerGroup(withNulls, Seq("g"), "v", "id", 5)
      .select("id", "rank").orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((3L, 1), (1L, 2)))
  }

  test("global top-k (no group) uses a single partition") {
    val got = TopKPerGroup(data, Nil, "v", "id", 5)
      .select("v", "id").orderBy("id").collect()
    assert(got.length == 5)
  }
}
