package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Segmentation verbs (operators/SegmentOps.scala): RFM quintiles on
  * integer-exact keys, basket pair support/confidence/lift, and the
  * Welch t-test against hand-computed statistics.
  */
class SegmentOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rfm: scores partition on integer keys, 1 = best") {
    // 4 customers over a 10-day corpus: c1 recent+frequent+big spender,
    // c4 stale single small order.
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (1L, "2024-01-09", 100.0), (1L, "2024-01-08", 100.0),
      (2L, "2024-01-06", 50.0), (2L, "2024-01-05", 50.0),
      (3L, "2024-01-03", 30.0),
      (4L, "2024-01-01", 10.0)
    ).toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))
    val out = SegmentOps.rfm(orders, "d", "cust", "amt", tiles = 4)
      .orderBy("custkey")
      .select("custkey", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 30000L, 1, 1, 1),
      (2L, 4L, 2L, 10000L, 2, 2, 2),
      (3L, 7L, 1L, 3000L, 3, 3, 3),
      (4L, 9L, 1L, 1000L, 4, 4, 4)))
  }

  test("rfm: frequency ties break by customer id") {
    val orders = Seq(
      (1L, "2024-01-02", 10.0), (2L, "2024-01-02", 10.0)
    ).toDF("cust", "d", "amt").withColumn("d", col("d").cast("timestamp"))
    val out = SegmentOps.rfm(orders, "d", "cust", "amt", tiles = 2)
      .orderBy("custkey").select("custkey", "f_score")
      .as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2))) // identical stats: id decides
  }

  test("basketRules: support, directional confidence, lift") {
    // 4 baskets: {a,b} ×2, {a} ×1, {b,c} ×1 — supp(a)=3, supp(b)=3,
    // supp(ab)=2, N=4 → conf(a→b)=2/3, lift=4·2/(3·3)=8/9
    val it = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c"),
      (1L, "a") // duplicate item in basket counts once
    ).toDF("basket", "item")
    val out = SegmentOps.basketRules(it, Seq("basket"), "item", minPairSupport = 2L)
      .select("item_a", "item_b", "supp_ab", "supp_a", "supp_b", "conf_a_b", "conf_b_a", "lift")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out.size == 1)
    val (a, b, sab, sa, sb, cab, cba, lift) = out.head
    assert((a, b, sab, sa, sb) == (("a", "b", 2L, 3L, 3L)))
    assert(math.abs(cab - 2.0 / 3) < 1e-12 && math.abs(cba - 2.0 / 3) < 1e-12)
    assert(math.abs(lift - 8.0 / 9) < 1e-12)
  }

  test("globalRank equals a single-sort row_number, including ties") {
    // deterministic pseudo-random longs with repeats; few buckets so
    // several values share a bucket and offsets matter
    val rows = (1L to 200L).map(i => (i, (i * 37) % 23)).toDF("id", "v")
    val got = SegmentOps.globalRank(rows, col("v"), "id", nBuckets = 7, as = "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val expected = (1L to 200L).map(i => (i, (i * 37) % 23))
      .sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == expected)
  }

  test("welchT matches hand-computed t and df") {
    // arm 0: (1,2,3)  mean 2, var 1; arm 1: (2,4,6,8) mean 5, var 20/3
    val df = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0),
      (1L, 2.0), (1L, 4.0), (1L, 6.0), (1L, 8.0)).toDF("arm", "v")
    val r = SegmentOps.welchT(df, col("arm"), col("v"))
      .as[(Long, Double, Double, Long, Double, Double, Double, Double)].head()
    val (na, ma, va, nb, mb, vb, t, dfw) = r
    assert((na, nb) == ((3L, 4L)))
    assert(math.abs(ma - 2.0) < 1e-12 && math.abs(mb - 5.0) < 1e-12)
    assert(math.abs(va - 1.0) < 1e-12 && math.abs(vb - 20.0 / 3) < 1e-12)
    val se2 = 1.0 / 3 + (20.0 / 3) / 4
    val expT = (2.0 - 5.0) / math.sqrt(se2)
    val expDf = se2 * se2 / ((1.0 / 3) * (1.0 / 3) / 2 + (20.0 / 3 / 4) * (20.0 / 3 / 4) / 3)
    assert(math.abs(t - expT) < 1e-12)
    assert(math.abs(dfw - expDf) < 1e-12)
  }
}
