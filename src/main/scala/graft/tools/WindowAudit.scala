package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: flag gate queries whose plan contains a GLOBAL window
  * (windowspecdefinition with no partition columns). A global window
  * moves every row to one partition — the parallelism ceiling the
  * 100 TB design must not hit on gated paths.
  */
object WindowAudit {

  /** Number of empty-partition Window operators in the optimized plan.
    * Tree inspection, not text matching: the plan's printed
    * `windowspecdefinition(…)` nests `unboundedpreceding$()`-style
    * frame bounds two parens deep, which defeats any fixed-depth regex
    * (the original regex here silently matched NOTHING — caught by
    * PlanGateSpec's deliberately-bad-plan test).
    */
  def globalWindows(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = globalWindows(fn(spark, sfDir).queryExecution.optimizedPlan)
        if (n > 0) { flagged += 1; println(s"GLOBAL-WINDOW $name: $n spec(s)") }
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(100)}") }
    }
    println(s"$flagged queries with global windows")
    spark.stop()
  }
}
