package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV bottom-k distinct / overlap sketch (functions/KmvSketch.scala). */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below capacity, estimator within 3 standard errors above") {
    val exact = (1 to 100).map(_.toString).toDF("k")
      .agg(call_function("graft_kmv_count", col("k"), lit(256)))
      .head.getDouble(0)
    assert(exact == 100.0)
    // n = 20000 >> k = 256: relative SE ≈ 1/sqrt(k-2) ≈ 6.3%
    val n = 20000
    val est = (1 to n).map(_.toString).toDF("k")
      .agg(call_function("graft_kmv_count", col("k"), lit(256)))
      .head.getDouble(0)
    assert(math.abs(est - n) / n < 0.19, s"estimate $est for n=$n")
  }

  test("bottom-k truncation is union-exact: merge ≡ direct build") {
    val a = new KmvState(64); (1 to 5000).foreach(i => a.addKey(i.toString))
    val b = new KmvState(64); (2500 to 9000).foreach(i => b.addKey(i.toString))
    val direct = new KmvState(64); (1 to 9000).foreach(i => direct.addKey(i.toString))
    a.merge(b)
    assert(a.hashes == direct.hashes)
    assert(a.estimate == direct.estimate)
  }

  test("partitioning-invariant and duplicate-insensitive") {
    val df = (1 to 9000).map(i => (i % 3000).toString).toDF("k")
    val estimates = Seq(1, 4, 13).map { p =>
      df.repartition(p)
        .agg(call_function("graft_kmv_count", col("k"), lit(64)))
        .head.getDouble(0)
    }
    assert(estimates.distinct.size == 1, estimates.toString)
  }

  test("bytes round-trip + merge_count equals the direct estimate") {
    val df = (1 to 6000).map(i => (i % 7, (i % 2000).toString)).toDF("g", "k")
    val direct = df.agg(call_function("graft_kmv_count", col("k"), lit(64)))
      .head.getDouble(0)
    val merged = df
      .groupBy("g").agg(call_function("graft_kmv_bytes", col("k"), lit(64)).as("sk"))
      .agg(call_function("graft_kmv_merge_count", col("sk")))
      .head.getDouble(0)
    assert(merged == direct)
  }

  test("merge_bytes compaction keeps the full KMV algebra downstream") {
    val df = (1 to 6000).map(i => (i % 7, (i % 2000).toString)).toDF("g", "k")
    val direct = df.agg(call_function("graft_kmv_count", col("k"), lit(64)))
      .head.getDouble(0)
    val compacted = df
      .groupBy("g").agg(call_function("graft_kmv_bytes", col("k"), lit(64)).as("sk"))
      .groupBy(col("g") % 2).agg(call_function("graft_kmv_merge_bytes", col("sk")).as("sk"))
      .agg(call_function("graft_kmv_merge_count", col("sk")))
      .head.getDouble(0)
    assert(compacted == direct)
  }

  test("jaccard estimate tracks true overlap") {
    def sketch(ids: Range): Array[Byte] =
      ids.map(_.toString).toDF("k")
        .agg(call_function("graft_kmv_bytes", col("k"), lit(256)))
        .head.getAs[Array[Byte]](0)
    val a = sketch(1 to 6000)
    val b = sketch(3001 to 9000)     // true J = 3000/9000 = 1/3
    val c = sketch(20000 to 26000)   // true J = 0
    def jac(x: Array[Byte], y: Array[Byte]): Double =
      Seq((x, y)).toDF("a", "b")
        .select(call_function("graft_kmv_jaccard", col("a"), col("b")))
        .head.getDouble(0)
    assert(math.abs(jac(a, b) - 1.0 / 3.0) < 0.12, s"got ${jac(a, b)}")
    assert(jac(a, c) == 0.0)
    // identical sets → exactly 1.0 (same hash sets)
    assert(jac(a, a) == 1.0)
  }

  test("identical-set jaccard is exact even below capacity") {
    val st = new KmvState(64); (1 to 10).foreach(i => st.addKey(i.toString))
    val bytes = KmvWire.write(st)
    val j = Seq((bytes, bytes)).toDF("a", "b")
      .select(call_function("graft_kmv_jaccard", col("a"), col("b")))
      .head.getDouble(0)
    assert(j == 1.0)
  }

  test("capacity contracts raise: k < 2, mixed-k merge and jaccard") {
    intercept[IllegalArgumentException](new KmvState(1))
    val a = new KmvState(64); a.addKey("x")
    val b = new KmvState(128); b.addKey("y")
    intercept[IllegalArgumentException](a.merge(b))
    val e = intercept[Exception] {
      Seq((KmvWire.write(a), KmvWire.write(b))).toDF("a", "b")
        .select(call_function("graft_kmv_jaccard", col("a"), col("b")))
        .head
    }
    assert(e.getMessage.contains("mixed capacities") ||
      e.getCause != null && e.getCause.getMessage.contains("mixed capacities"))
  }
}
