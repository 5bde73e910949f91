package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Anomaly detectors (operators/AnomalyOps.scala): MAD flags exactly
  * the planted outliers (and is robust to them — the medians don't
  * move), CUSUM alarms on a sustained small shift that per-point
  * thresholds miss, and neither fires on the clean series.
  */
class AnomalyOpsSpec extends SparkSpec {
  import spark.implicits._

  // 100 points oscillating tightly around 10, plus two gross outliers
  private def spiky = ((1 to 100).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) ++
    Seq(("a", 101L, 500.0), ("a", 102L, -500.0))).toDF("k", "t", "v")

  test("madFlags catches exactly the planted outliers") {
    val out = AnomalyOps.madFlags(spiky, Seq("k"), "v", 3.0)
    val flagged = out.filter(col("is_anom")).select("v").as[Double].collect().sorted
    assert(flagged.toSeq == Seq(-500.0, 500.0))
    // robustness: the outliers must not drag the center estimate
    val med = out.select("med").head.getDouble(0)
    assert(med >= 10.0 && med <= 10.5)
  }

  test("madFlags sketch mode (exact=false) finds the same planted outliers") {
    // 4096-capacity KLL over <4096 values runs in its EXACT mode, so
    // the bounded-state path reproduces the exact answer here; at
    // scale it degrades gracefully to ~1.7% rank error instead of
    // buffering the series
    val out = AnomalyOps.madFlags(spiky, Seq("k"), "v", 3.0, exact = false)
    val flagged = out.filter(col("is_anom")).select("v").as[Double].collect().sorted
    assert(flagged.toSeq == Seq(-500.0, 500.0))
  }

  test("madFlags flags nothing on a clean series") {
    val clean = (1 to 50).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)).toDF("k", "t", "v")
    assert(AnomalyOps.madFlags(clean, Seq("k"), "v", 3.0)
      .filter(col("is_anom")).count() == 0)
  }

  test("cusum alarms on a sustained small shift, not on the stable prefix") {
    // 200 points at 10±0.2, then 100 points shifted up by ~1.5σ — each
    // shifted point alone is inside any per-point band, but the drift
    // accumulates
    val rows = (1 to 200).map(i => ("a", i.toLong, 10.0 + (i % 5 - 2) * 0.1)) ++
      (201 to 300).map(i => ("a", i.toLong, 10.6 + (i % 5 - 2) * 0.1))
    val out = AnomalyOps.cusum(rows.toDF("k", "t", "v"), Seq("k"), "t", "v")
    val alarms = out.filter(col("alarm")).select("t").as[Long].collect()
    assert(alarms.nonEmpty, "sustained shift must raise an alarm")
    assert(alarms.min > 200, s"no alarm may fire before the shift, got ${alarms.min}")
  }

  test("cusum stays quiet on a stationary series") {
    val rows = (1 to 300).map(i => ("a", i.toLong, 10.0 + (i % 7 - 3) * 0.1))
    assert(AnomalyOps.cusum(rows.toDF("k", "t", "v"), Seq("k"), "t", "v")
      .filter(col("alarm")).count() == 0)
  }

  test("winsorize clamps exactly the tail rows, interior untouched") {
    val rows = ((1 to 98).map(i => ("a", 10.0 + (i % 7) * 0.1)) ++
      Seq(("a", 1000.0), ("a", -1000.0))).toDF("k", "v")
    val out = AnomalyOps.winsorize(rows, Seq("k"), "v", 0.05, 0.95)
    // the planted extremes clamp to the band edges
    val ext = out.filter(abs(col("v")) === 1000.0)
      .select("v", "clamped").as[(Double, Double)].collect().toMap
    assert(ext(1000.0) < 11.0 && ext(-1000.0) > 9.0)
    // interior values pass through identical
    val interior = out.filter(col("v") > 10.05 && col("v") < 10.55)
    assert(interior.filter(col("v") =!= col("clamped")).count() == 0)
    // bad band rejected
    assertThrows[IllegalArgumentException](
      AnomalyOps.winsorize(rows, Seq("k"), "v", 0.9, 0.1))
  }

  test("burstFlags hysteresis bridges a dip a single threshold splits") {
    // Flat base at 10, one burst 50..54 with a mid-burst dip that stays
    // above the low threshold: hysteresis keeps it ONE episode.
    val vals = (1 to 100).map {
      case i if i >= 50 && i <= 54 => if (i == 52) 14.0 else 30.0
      case _ => 10.0
    }
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "t", "v")
    val out = AnomalyOps.burstFlags(df, Seq("k"), "t", "v", 2.0, 0.5)
      .orderBy("t").select("in_burst").as[Double].collect()
    val burstIdx = out.zipWithIndex.filter(_._1 == 1.0).map(_._2)
    assert(burstIdx.toSeq == (49 to 53).toSeq, burstIdx.mkString(","))
    // exactly one rising edge = one episode
    val rises = out.indices.count(i => out(i) == 1.0 && (i == 0 || out(i - 1) == 0.0))
    assert(rises == 1)
    // below-lo value never sustains a burst: values at base are flat 0
    assert(out.take(49).forall(_ == 0.0) && out.drop(54).forall(_ == 0.0))
  }

  test("both detectors keep series independent") {
    val rows = (1 to 100).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) ++
      (1 to 100).map(i => ("b", i.toLong, 1000.0 + (i % 5) * 10.0))
    val mad = AnomalyOps.madFlags(rows.toDF("k", "t", "v"), Seq("k"), "v", 3.0)
    // b's scale is 100× a's: neither series may flag the other's rows
    assert(mad.filter(col("is_anom")).count() == 0)
    val meds = mad.groupBy("k").agg(min("med")).as[(String, Double)].collect().toMap
    assert(meds("a") < 11 && meds("b") > 999)
  }
}
