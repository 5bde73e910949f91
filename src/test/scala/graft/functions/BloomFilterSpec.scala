package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom filter aggregate + membership probe (functions/BloomFilter.scala). */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; FP rate near the design point") {
    val st = new BloomState(65536, 4)
    val members = (1 to 5000).map(i => s"member-$i")
    members.foreach(st.add)
    assert(members.forall(st.contains))
    // ~5000 keys in 65536 bits, k=4 → FP ≈ (1 − e^(−4·5000/65536))^4 ≈ 1.6%
    val fp = (1 to 10000).count(i => st.contains(s"other-$i"))
    assert(fp > 0 && fp < 500, s"fp=$fp of 10000")
  }

  test("merge ORs words; merged filter contains both sides") {
    val a = new BloomState(4096, 3); a.add("left")
    val b = new BloomState(4096, 3); b.add("right")
    a.merge(b)
    assert(a.contains("left") && a.contains("right"))
    intercept[IllegalArgumentException](a.merge(new BloomState(8192, 3)))
  }

  test("aggregate builds partition-invariantly; probe filters a frame") {
    val evalDf = (1 to 500).map(i => s"eval-$i").toDF("k")
    val blooms = Seq(1, 4, 13).map { p =>
      evalDf.repartition(p)
        .agg(call_function("graft_bloom_bytes", col("k"), lit(65536), lit(4)))
        .head.getAs[Array[Byte]](0)
    }
    assert(blooms.forall(b => java.util.Arrays.equals(b, blooms.head)))
    val probe = ((1 to 500).map(i => s"eval-$i") ++ Seq("novel-a", "novel-b"))
      .toDF("k")
      .crossJoin(Seq(Tuple1(blooms.head)).toDF("bloom"))
      .filter(call_function("graft_bloom_contains", col("bloom"), col("k")))
    // all members survive; the two novels survive only as (rare) FPs
    val kept = probe.select("k").as[String].collect().toSet
    assert((1 to 500).forall(i => kept(s"eval-$i")))
    assert(kept.size <= 502)
  }

  test("serde round-trip preserves words and params") {
    val st = new BloomState(1024, 2)
    Seq("x", "y", "z").foreach(st.add)
    val back = BloomWire.read(BloomWire.write(st))
    assert(back.mBits == 1024 && back.kHashes == 2)
    assert(java.util.Arrays.equals(back.words, st.words))
  }

  test("parameter contracts raise") {
    intercept[IllegalArgumentException](new BloomState(100, 4)) // not mult of 64
    intercept[IllegalArgumentException](new BloomState(0, 4))
    intercept[IllegalArgumentException](new BloomState(1024, 0))
    intercept[IllegalArgumentException](new BloomState(1024, 17))
  }

  test("bloomContamination flags every exact hit (FPs only add)") {
    import graft.llmops.DedupOps
    val mk = (id: Int, words: Seq[String]) => (id.toLong, words.mkString(" "))
    val evalDoc = mk(1, (1 to 30).map(i => s"w$i"))
    val contaminated = mk(100, (1 to 30).map(i => s"w$i") ++ Seq("tail"))
    val clean = mk(101, (1 to 40).map(i => s"z$i"))
    val docs = Seq(evalDoc, contaminated, clean).toDF("doc_id", "text")
    val out = DedupOps.bloomContamination(
      docs.filter(col("doc_id") >= 100), docs.filter(col("doc_id") < 100),
      "doc_id", "text", 3, 65536, 4, 15)
      .select("corp_id").as[Long].collect().toSet
    assert(out.contains(100L))
    assert(!out.contains(101L)) // 38 shingles × ~1.6% FP ≪ 15-hit threshold
  }
}
