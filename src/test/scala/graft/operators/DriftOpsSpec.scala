package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI drift (operators/DriftOps.scala): closed-form bucket math,
  * under/overflow clamping, born/died categories through the Eps
  * floor, and the PSI = Σ contrib identity.
  */
class DriftOpsSpec extends SparkSpec {
  import spark.implicits._

  test("numericDrift: closed-form two-bucket PSI with clamped tails") {
    // ref: 8 in bucket 0, 2 in bucket 1; cur: 5 and 5; plus one
    // underflow (-3.0 -> bucket -1) and one overflow (99.0 -> bucket 2)
    val ref = (Seq.fill(8)(1.0) ++ Seq.fill(2)(11.0) :+ -3.0).toDF("v")
    val cur = (Seq.fill(5)(1.0) ++ Seq.fill(5)(11.0) :+ 99.0).toDF("v")
    val rows = DriftOps.numericDrift(ref, cur, "v", 0.0, 10.0, 2)
      .orderBy("bucket")
      .select("bucket", "n_ref", "n_cur", "p_ref", "p_cur", "contrib")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq((-1L, 1L, 0L), (0L, 8L, 5L), (1L, 2L, 5L), (2L, 0L, 1L)))
    val b0 = rows.find(_._1 == 0L).get
    val p_r = 8.0 / 11.0
    val p_c = 5.0 / 11.0
    assert(math.abs(b0._4 - p_r) < 1e-12 && math.abs(b0._5 - p_c) < 1e-12)
    assert(math.abs(b0._6 - (p_c - p_r) * math.log(p_c / p_r)) < 1e-12)
    // died bucket (-1): p_cur = 0 floors to Eps inside the log only
    val dead = rows.find(_._1 == -1L).get
    val dr = 1.0 / 11.0
    assert(math.abs(dead._6 - (0.0 - dr) * math.log(DriftOps.Eps / dr)) < 1e-12)
    // identical snapshots -> PSI exactly 0 on every bucket
    val zero = DriftOps.numericDrift(ref, ref, "v", 0.0, 10.0, 2)
      .agg(sum(abs(col("contrib")))).as[Double].head()
    assert(zero == 0.0)
  }

  test("categoricalDrift: born category contributes, shared ones shift") {
    val ref = Seq("en", "en", "en", "de").toDF("lang")
    val cur = Seq("en", "de", "de", "fr").toDF("lang")
    val rows = DriftOps.categoricalDrift(ref, cur, "lang")
      .orderBy("bucket")
      .select("bucket", "n_ref", "n_cur", "contrib")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq(("de", 1L, 2L), ("en", 3L, 1L), ("fr", 0L, 1L)))
    val fr = rows.find(_._1 == "fr").get._4
    assert(math.abs(fr - (0.25 - 0.0) * math.log(0.25 / DriftOps.Eps)) < 1e-12)
    // the standard read: this mix shift is "drifted" (> 0.25)
    val psi = rows.map(_._4).sum
    assert(psi > 0.25)
  }

  test("jsDivergence: symmetric, ln2-bounded, zero on identical") {
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("y", "y", "y", "z").toDF("k")
    def jsd(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      DriftOps.categoricalDrift(r, c, "k")
        .agg(sum(col("contrib_js"))).as[Double].head()
    val ab = jsd(a, b)
    assert(math.abs(ab - jsd(b, a)) < 1e-12)        // symmetric (PSI is too, but JSD by term)
    assert(ab > 0.0 && ab <= math.log(2.0) + 1e-12) // bounded
    assert(jsd(a, a) == 0.0)
    // disjoint supports saturate at exactly ln 2
    val d1 = Seq("x").toDF("k")
    val d2 = Seq("y").toDF("k")
    assert(math.abs(jsd(d1, d2) - math.log(2.0)) < 1e-12)
  }
}
