package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperLogLog distinct sketch (functions/HllSketch.scala). */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within the p=12 error envelope") {
    // sigma ≈ 1.04/sqrt(4096) ≈ 1.6%; assert a generous 5% (3σ)
    val n = 10000
    val est = (1 to n).map(_.toString).toDF("k")
      .agg(call_function("graft_hll_count", col("k"), lit(12)))
      .head.getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"estimate $est for n=$n")
  }

  test("merged registers are identical to a direct build over the union") {
    val a = new HllState(12); (1 to 5000).foreach(i => a.add(i.toString))
    val b = new HllState(12); (2500 to 7500).foreach(i => b.add(i.toString))
    val direct = new HllState(12); (1 to 7500).foreach(i => direct.add(i.toString))
    a.merge(b)
    assert(java.util.Arrays.equals(a.registers, direct.registers))
    assert(a.estimate == direct.estimate)
  }

  test("partitioning-invariant: same estimate at 1, 4, and 13 partitions") {
    val df = (1 to 8000).map(i => (i % 3000).toString).toDF("k")
    val estimates = Seq(1, 4, 13).map { p =>
      df.repartition(p)
        .agg(call_function("graft_hll_count", col("k"), lit(12)))
        .head.getDouble(0)
    }
    assert(estimates.distinct.size == 1, estimates.toString)
  }

  test("bytes round-trip + merge_count equals the direct count") {
    val df = (1 to 6000).map(i => (i % 2000, i % 500)).toDF("g", "k")
    val direct = df.agg(call_function("graft_hll_count", col("k"), lit(12)))
      .head.getDouble(0)
    val merged = df
      .groupBy(col("g") % 7).agg(call_function("graft_hll_bytes", col("k"), lit(12)).as("sk"))
      .agg(call_function("graft_hll_merge_count", col("sk")))
      .head.getDouble(0)
    assert(merged == direct)
  }

  test("merge_bytes compaction: re-persisted merge keeps the exact registers") {
    val df = (1 to 6000).map(i => (i % 6, (i % 1500).toString)).toDF("d", "k")
    val direct = df.agg(call_function("graft_hll_count", col("k"), lit(12)))
      .head.getDouble(0)
    // daily sketches → compacted (merge_bytes) per 3-day window → final count
    val compacted = df
      .groupBy("d").agg(call_function("graft_hll_bytes", col("k"), lit(12)).as("sk"))
      .groupBy(col("d") % 2).agg(call_function("graft_hll_merge_bytes", col("sk")).as("sk"))
      .agg(call_function("graft_hll_merge_count", col("sk")))
      .head.getDouble(0)
    assert(compacted == direct)
  }

  test("small-m alpha constants and linear-counting branch") {
    // tiny precision: m=16 uses alpha=0.673; few keys → linear counting
    val st = new HllState(4)
    (1 to 5).foreach(i => st.add(i.toString))
    val zeros = st.registers.count(_ == 0)
    assert(zeros > 0)
    val expected = {
      var sum = 0.0
      st.registers.foreach(r => sum += math.pow(2.0, -r.toDouble))
      val raw = 0.673 * 16 * 16 / sum
      if (raw <= 2.5 * 16 && zeros > 0) 16 * math.log(16.0 / zeros) else raw
    }
    assert(st.estimate == expected)
  }

  test("precision bounds and merge-precision mismatch raise") {
    intercept[IllegalArgumentException](new HllState(3))
    intercept[IllegalArgumentException](new HllState(19))
    val a = new HllState(10); a.add("x")
    val b = new HllState(12); b.add("y")
    intercept[IllegalArgumentException](a.merge(b))
  }

  test("nulls are ignored, not hashed") {
    val est = Seq(Some("a"), None, Some("b"), None).toDF("k")
      .agg(call_function("graft_hll_count", col("k"), lit(12)))
      .head.getDouble(0)
    val est2 = Seq("a", "b").toDF("k")
      .agg(call_function("graft_hll_count", col("k"), lit(12)))
      .head.getDouble(0)
    assert(est == est2)
  }
}
