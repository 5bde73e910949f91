package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timing harness for the native-aggregate paths (quantiles +
  * distinct): run by hand, numbers recorded in PERF.md. Not part of
  * the driver bench.
  */
object QuantBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median=${ts.sorted.apply(1)}%.3f s")
    }

    val ev = graft.queries.QueryUtil.events(spark, "/tmp/graft_sf1")
      .select(col("user_id"), col("value")).cache()
    ev.count()
    time("percentile (exact)") {
      ev.groupBy("user_id").agg(percentile(col("value"), lit(0.9))).foreach(_ => ())
    }
    time("percentile_approx") {
      ev.groupBy("user_id").agg(percentile_approx(col("value"), lit(0.9), lit(10000))).foreach(_ => ())
    }
    time("graft_kll k=256") {
      ev.groupBy("user_id").agg(call_function("graft_kll_quantiles", col("value"),
        array(lit(0.9)), lit(256))).foreach(_ => ())
    }

    // distinct-count shape with real key cardinality: 40M rows,
    // 4M distinct ids, 32 groups
    val big = spark.range(0, 40000000L, 1, 32)
      .select((col("id") % 32).as("g"), ((col("id") * 2654435761L) % 4000000L).as("id"))
      .cache()
    big.count()
    time("count(DISTINCT) builtin") {
      big.groupBy("g").agg(count_distinct(col("id"))).foreach(_ => ())
    }
    time("bitmap rewrite on") {
      spark.conf.set("spark.graft.rewrite.bitmapDistinct", "true")
      try big.groupBy("g").agg(count_distinct(col("id"))).foreach(_ => ())
      finally spark.conf.unset("spark.graft.rewrite.bitmapDistinct")
    }

    // top-3 per group: WindowExec full sort vs the custom bounded-heap
    // operator, in two regimes — many tiny groups (sort is cheap-ish,
    // overhead-bound) and few huge groups (sort dominates, the
    // operator's target case)
    for ((label, groups) <- Seq("1M groups" -> 1000000L, "1k groups" -> 1000L)) {
      val tk = spark.range(0, 40000000L, 1, 32)
        .select((col("id") % groups).as("g"),
          ((col("id") * 2654435761L) % 1000003L).cast("double").as("v"),
          col("id"))
        .cache()
      tk.count()
      time(s"top-3 window [$label]") {
        import org.apache.spark.sql.expressions.Window
        tk.withColumn("rank", row_number().over(
            Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
          .filter(col("rank") <= 3).foreach(_ => ())
      }
      time(s"top-3 native [$label]") {
        graft.plans.TopKPerGroup(tk, Seq("g"), "v", "id", 3).foreach(_ => ())
      }
      tk.unpersist()
    }
    spark.stop()
  }
}
