package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharp (non-tolerance) invariants of the sketch aggregates under
  * random data — the definitional guarantees each structure must hold
  * for EVERY parameterization, complementing the gates' pinned
  * estimates:
  *
  *  - Bloom filters have NO false negatives: every inserted key probes
  *    true, at any width;
  *  - Count-Min never UNDERestimates: estimate ≥ true count for every
  *    key, at any (d, w);
  *  - paged-bitmap distinct is EXACT, and survives merge/set algebra:
  *    |A ∪ B| + |A ∩ B| = |A| + |B| (inclusion-exclusion, exact);
  *  - KLL quantile estimates are order-consistent (monotone in q) and
  *    bounded by the data's min/max;
  *  - KMV and HLL distinct estimates of an n-distinct set land within
  *    their configured error envelopes (loose sanity band, 3σ-ish).
  */
class SketchInvariantSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(53L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  test("Bloom: no false negatives for any inserted key (10 random corpora/widths)") {
    (0 until 10).foreach { i =>
      val n = next(Gen.chooseNum(50, 2000))
      val bits = pick(Seq(256, 1024, 8192, 65536))
      val ids = (0 until n).map(_ * next(Gen.chooseNum(1, 97)).toLong + i)
      val df = ids.toDF("id")
      val bloom = df.agg(
        call_function("graft_bloom_bytes", col("id"), lit(bits), lit(4)).as("b"))
      val misses = df.crossJoin(broadcast(bloom))
        .filter(!call_function("graft_bloom_contains", col("b"), col("id")))
        .count()
      assert(misses == 0, s"[$i] bloom(bits=$bits) false-negatived $misses of $n")
    }
  }

  test("Count-Min: estimates never underestimate any key's true count (10 random shapes)") {
    (0 until 10).foreach { i =>
      val d = next(Gen.chooseNum(1, 6))
      val w = pick(Seq(16, 64, 256, 2048))
      // skewed multiplicities: key k appears (k % 17) + 1 times
      val rows = (0 until next(Gen.chooseNum(100, 1500)))
        .flatMap(k => Seq.fill(k % 17 + 1)(k.toLong))
      val df = rows.toDF("id")
      val cms = df.agg(call_function("graft_cms_bytes", col("id"), lit(d), lit(w)).as("c"))
      val under = df.groupBy("id").agg(count(lit(1)).as("true_n"))
        .crossJoin(broadcast(cms))
        .filter(call_function("graft_cms_estimate", col("c"), col("id")) < col("true_n"))
        .count()
      assert(under == 0, s"[$i] cms(d=$d,w=$w) underestimated $under keys")
    }
  }

  test("bitmap distinct: exact, and inclusion-exclusion holds over set algebra (10 random splits)") {
    (0 until 10).foreach { i =>
      val n = next(Gen.chooseNum(100, 5000))
      val mod = next(Gen.chooseNum(2, 5))
      val ids = (0 until n).map(_.toLong * next(Gen.chooseNum(1, 13)))
      val a = ids.filter(_ % mod == 0)
      val b = ids.filter(_ % 2 == 0)
      def bm(xs: Seq[Long]) = xs.toDF("id")
        .agg(call_function("graft_bitmap_bytes", col("id")).as("bm"))
      // merge_count is an AGGREGATE over bitmap columns; and_count is scalar
      def cnt(d: org.apache.spark.sql.DataFrame, c: String): Long =
        d.agg(call_function("graft_bitmap_merge_count", col(c))).head.getLong(0)
      val joined = bm(a).crossJoin(bm(b).withColumnRenamed("bm", "bm2"))
        .localCheckpoint()
      val na = cnt(joined, "bm")
      val nb = cnt(joined, "bm2")
      val nab = joined.select(
        call_function("graft_bitmap_and_count", col("bm"), col("bm2")))
        .head.getLong(0)
      assert(na == a.distinct.size && nb == b.distinct.size,
        s"[$i] bitmap counts inexact: $na/$nb")
      assert(nab == a.toSet.intersect(b.toSet).size,
        s"[$i] bitmap intersection inexact")
      // inclusion-exclusion against the exact union
      assert((a.toSet ++ b.toSet).size == na + nb - nab, s"[$i] |A∪B| broke")
    }
  }

  test("KLL: quantile estimates are monotone in q and bounded by min/max (10 random corpora)") {
    (0 until 10).foreach { i =>
      val n = next(Gen.chooseNum(100, 5000))
      val vals = (0 until n).map(k => ((k * 2654435761L) % 10007).toDouble)
      val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      val est = vals.toDF("v")
        .agg(call_function("graft_kll_quantiles", col("v"),
          array(qs.map(lit): _*), lit(256)).as("q"))
        .head.getSeq[Double](0)
      assert(est == est.sorted, s"[$i] KLL quantiles not monotone: $est")
      assert(est.head >= vals.min && est.last <= vals.max,
        s"[$i] KLL out of [min,max]")
    }
  }

  test("KMV and HLL distinct estimates land inside loose error envelopes (10 random n)") {
    (0 until 10).foreach { i =>
      val n = next(Gen.chooseNum(500, 20000))
      val df = (0 until n).map(_.toLong * 1000003L).toDF("id")
      val kmv = df.agg(call_function("graft_kmv_count", col("id"), lit(1024))
        .cast("double").as("e")).head.getDouble(0)
      val hll = df.agg(call_function("graft_hll_count", col("id"), lit(12))
        .cast("double").as("e")).head.getDouble(0)
      // KMV k=1024 rse ≈ 1/√1022 ≈ 3.1%; HLL p=12 rse ≈ 1.04/√4096 ≈ 1.6%.
      // 5× envelopes: a broken hash/merge misses by far more than this.
      assert(math.abs(kmv - n) <= 0.16 * n, s"[$i] KMV $kmv vs $n")
      assert(math.abs(hll - n) <= 0.09 * n, s"[$i] HLL $hll vs $n")
    }
  }
}
