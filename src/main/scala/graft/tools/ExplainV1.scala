package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of a Grafana-style InfluxQL query
  * over the bucket store, to check that the WHERE time/tag bounds reach
  * the parquet scan (PushedFilters + dt PartitionFilters) through the
  * LWW dedup window and the fieldsAsCols pivot.
  */
object ExplainV1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-explain-v1")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("db", "greengrass")
    val t0 = 1704672000L * 1000000000L
    tsdb.writeLp("db", (0 until 1000).map(i =>
      s"cpu,host=h${i % 4} usage=${i % 97}.0 ${t0 + i * 60L * 1000000000L}"))
    val df = graft.influxql.InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu WHERE time >= '2024-01-08T02:00:00Z' " +
        "AND time < '2024-01-08T04:00:00Z' AND host = 'h1' GROUP BY time(1h)",
      graft.influxql.InfluxQLEval.tsdbSource(tsdb, "db"))
    df.explain("formatted")
    spark.stop()
  }
}
