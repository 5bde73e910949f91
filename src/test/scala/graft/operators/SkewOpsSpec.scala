package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted skew join (operators/SkewOps.scala): result equality with the
  * plain join, left-join null preservation, and the property salting
  * exists for — a hot key's rows spread across many salt values.
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  private def probe = (1 to 1000).map { i =>
    // heavy skew: 90% of rows share key 7
    (if (i % 10 == 0) i % 5 else 7, s"p$i")
  }.toDF("k", "pv")

  private def build = Seq((7, "hot"), (0, "a"), (1, "b"), (2, "c"), (99, "x"))
    .toDF("bk", "bv")

  test("salted inner join equals the plain join") {
    val plain = probe.join(build, col("k") === col("bk")).select("k", "pv", "bv")
    val salted = SkewOps.saltedJoin(probe, build, col("k"), col("bk"), 8)
      .select("k", "pv", "bv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched probe rows") {
    val withMiss = probe.union(Seq((12345, "miss")).toDF("k", "pv"))
    val out = SkewOps.saltedJoin(withMiss, build, col("k"), col("bk"), 4, "left")
    assert(out.filter(col("pv") === "miss").count() == 1)
    assert(out.filter(col("pv") === "miss").select("bv").head.isNullAt(0))
    assert(out.count() == withMiss.join(build, col("k") === col("bk"), "left").count())
  }

  test("bloom-prefiltered join equals the plain join; prefilter prunes") {
    val bigProbe = (1 to 5000).map(i => (i.toLong, s"p$i")).toDF("k", "pv")
    val sparse = (1 to 5000 by 25).map(i => (i.toLong, s"b$i")).toDF("bk", "bv")
    val plain = bigProbe.join(sparse, col("k") === col("bk"))
      .select("k", "pv", "bv")
    val bloomed = SkewOps.bloomFilteredJoin(
      bigProbe, sparse, col("k"), col("bk"), mBits = 65536, kHashes = 4)
      .select("k", "pv", "bv")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // the prefilter alone keeps the 200 true partners + rare FPs —
    // a small fraction of the 5000 probe rows ever reaches the join
    val bloomRow = sparse.agg(call_function("graft_bloom_bytes",
      col("bk"), lit(65536), lit(4)).as("_bloom"))
    val survivors = bigProbe.crossJoin(broadcast(bloomRow))
      .filter(call_function("graft_bloom_contains", col("_bloom"), col("k")))
      .count()
    assert(survivors >= 200 && survivors < 500,
      s"prefilter kept $survivors of 5000")
  }

  test("the hot key fans out across salt values") {
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(8)))
    val spread = salted.filter(col("k") === 7)
      .groupBy("_salt").count().collect()
    assert(spread.length == 8, s"hot key used only ${spread.length}/8 salts")
    // no salt bucket holds more than a third of the hot rows
    val total = spread.map(_.getLong(1)).sum
    assert(spread.map(_.getLong(1)).max < total / 3)
  }
}
