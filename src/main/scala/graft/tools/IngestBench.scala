package graft.tools

import graft.dsl.Tsdb
import graft.lineprotocol.LpIngest
import org.apache.spark.sql.SparkSession

/** Dev tool: line-protocol ingest throughput — parse-only and
  * parse+store paths, points/sec. Usage: runMain graft.tools.IngestBench
  * [nLines] [fieldsPerLine]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nLines = args.headOption.map(_.toInt).getOrElse(1000000)
    val nFields = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = 1705276800L * 1000000000L
    // generate distributed: 100 hosts x 10 measurements, ns-spaced points
    val lines = spark.range(nLines).map { i =>
      val fields = (0 until nFields).map(f => s"f$f=${(i * 31 + f) % 1000}.5").mkString(",")
      s"m${i % 10},host=h${i % 100},dc=dc${i % 4} $fields ${t0 + i * 1000L}"
    }.cache()
    lines.count() // materialize the input outside the timing

    val parseStart = System.nanoTime()
    val parsed = LpIngest.parse(lines, t0)
    val nPoints = parsed.count()
    val parseSec = (System.nanoTime() - parseStart) / 1e9

    val wh = java.nio.file.Files.createTempDirectory("graft-ingest-bench").toString
    val tsdb = Tsdb(spark, wh)
    tsdb.catalog.createBucket("bench", "org")
    val writeStart = System.nanoTime()
    tsdb.store.write("bench", LpIngest.parse(lines, t0))
    val writeSec = (System.nanoTime() - writeStart) / 1e9

    println(f"lines=$nLines points=$nPoints")
    println(f"parse-only:   $parseSec%.2f s  (${nPoints / parseSec}%.0f points/s)")
    println(f"parse+store:  $writeSec%.2f s  (${nPoints / writeSec}%.0f points/s)")
    spark.stop()
  }
}
