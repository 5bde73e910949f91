package graft.tools

import graft.dsl.Tsdb
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: verify that on the engine's own bucket store, `range()` +
  * tag filters reach the parquet scan (PushedFilters + dt partition
  * pruning) — the SURVEY §4 "free pushdown" claims.
  */
object ExplainStore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-explain").toString
    val tsdb = Tsdb(spark, wh)
    tsdb.catalog.createBucket("b", "org")
    val day = 86400L * 1000000000L
    val t0 = 1705276800L * 1000000000L
    tsdb.writeLp("b", (0 until 10).flatMap(d =>
      Seq(s"cpu,host=h$d usage=0.$d ${t0 + d * day}")))
    val q = tsdb.fromRaw("b")
      .range("2024-01-16 00:00:00", "2024-01-18 00:00:00")
      .where(col("measurement") === "cpu")
      .toDF
    println(q.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println("rows=" + q.count())
    spark.stop()
  }
}
