package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay JVM/codegen/file-listing startup outside the timings
    // (whichever query ran first was otherwise charged ~6 s of session
    // warmup).
    spark.range(1000).selectExpr("sum(id)").foreach(_ => ())
    SparkEntry.queries.get("q1_agg").foreach(fn =>
      try fn(spark, sfDir).foreach(_ => ()) catch { case _: Throwable => () })
    // Force full evaluation of every output column (a bare .count() would
    // let Catalyst prune computed projections and benchmark only the scan):
    // a no-op foreach over the rows materializes the complete result.
    // streaming gate entries measure micro-batch orchestration (temp
    // warehouses, checkpoints), not query throughput — correctness-only
    val benchQueries = SparkEntry.queries -- SparkEntry.streamingOnly
    val results = benchQueries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).foreach(_ => ()) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("?")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sf"}""")
    spark.stop()
  }
}
