package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile sketch (functions/KllSketch.scala): exact mode,
  * mergeability under arbitrary partitioning, and the approximation
  * path's rank-error bound (which the hash gate can't pin).
  */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic LCG so the "random" stream is reproducible. */
  private def lcg(n: Int): Array[Double] = {
    var x = 88172645463325252L
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
  }

  private def exactQ(sorted: Array[Double], q: Double): Double =
    sorted(math.max(1, math.ceil(q * sorted.length).toLong).toInt - 1)

  test("exact mode: k > n reproduces ceil(q*n)-th smallest per group") {
    val vals = lcg(3000)
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toSeq.toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("graft_kll_quantiles", col("v"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.875)), lit(4096)).as("qv"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sorted = vals.zipWithIndex.filter(_._2 % 3 == g.drop(1).toInt).map(_._1).sorted
      val want = Seq(0.25, 0.5, 0.75, 0.875).map(exactQ(sorted, _))
      assert(out(g) == want, s"group $g")
    }
  }

  test("merge: result is identical under 1, 4, and 13 partitions") {
    val df = lcg(5000).toSeq.toDF("v")
    val runs = Seq(1, 4, 13).map { p =>
      df.repartition(p)
        .agg(call_function("graft_kll_quantiles", col("v"),
          array(lit(0.5), lit(0.875)), lit(8192)))
        .head.getSeq[Double](0)
    }
    assert(runs.distinct.size == 1, s"partitioning changed exact-mode result: $runs")
  }

  test("compaction path: k=256 over 100k values keeps rank error <= 2%") {
    val n = 100000
    val vals = lcg(n)
    val sorted = vals.sorted
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = vals.toSeq.toDF("v").repartition(4)
      .agg(call_function("graft_kll_quantiles", col("v"),
        array(qs.map(lit): _*), lit(256)))
      .head.getSeq[Double](0)
    qs.zip(got).foreach { case (q, est) =>
      // measured rank of the estimate vs requested rank, as a fraction of n
      val rank = sorted.count(_ <= est)
      val err = math.abs(rank.toDouble / n - q)
      assert(err <= 0.02, s"q=$q: estimate $est has rank error $err")
    }
  }

  test("sketch state: serialize/deserialize round-trips after compaction") {
    val st = new KllState(64)
    lcg(10000).foreach(st.update)
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    val agg = KllQuantiles(Literal(0.0), CreateArray(Seq(Literal(0.5))), Literal(64))
    val back = agg.deserialize(agg.serialize(st))
    assert(back.totalN == st.totalN)
    assert(back.quantiles(Array(0.1, 0.5, 0.9)).toSeq ==
      st.quantiles(Array(0.1, 0.5, 0.9)).toSeq)
  }

  test("persisted sketches merge to the direct answer (exact mode)") {
    val df = lcg(4000).zipWithIndex.map { case (v, i) => (i % 3, v) }
      .toSeq.toDF("shard", "v")
    val dir = java.nio.file.Files.createTempDirectory("kll-wire").toString
    df.groupBy("shard")
      .agg(call_function("graft_kll_sketch", col("v"), lit(8192)).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(call_function("graft_kll_merge", col("sk"), array(lit(0.5), lit(0.875))))
      .head.getSeq[Double](0)
    val direct = df
      .agg(call_function("graft_kll_quantiles", col("v"), array(lit(0.5), lit(0.875)), lit(8192)))
      .head.getSeq[Double](0)
    assert(merged == direct)
  }

  test("merging compacted sketches stays within the rank-error bound") {
    val n = 60000
    val vals = lcg(n)
    val sorted = vals.sorted
    val df = vals.zipWithIndex.map { case (v, i) => (i % 8, v) }.toSeq.toDF("shard", "v")
    val merged = df.groupBy("shard")
      .agg(call_function("graft_kll_sketch", col("v"), lit(256)).as("sk"))
      .agg(call_function("graft_kll_merge", col("sk"), array(lit(0.25), lit(0.5), lit(0.9))))
      .head.getSeq[Double](0)
    Seq(0.25, 0.5, 0.9).zip(merged).foreach { case (q, est) =>
      val err = math.abs(sorted.count(_ <= est).toDouble / n - q)
      assert(err <= 0.03, s"q=$q err=$err")
    }
  }

  test("nulls are skipped, empty input yields NaN") {
    val df = Seq(Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("v")
    val got = df.agg(call_function("graft_kll_quantiles", col("v"),
      array(lit(0.5)), lit(64))).head.getSeq[Double](0)
    assert(got == Seq(2.0))
    val empty = spark.emptyDataset[Double].toDF("v")
      .agg(call_function("graft_kll_quantiles", col("v"), array(lit(0.5)), lit(64)))
      .head.getSeq[Double](0)
    assert(empty.head.isNaN)
  }
}
