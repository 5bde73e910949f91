package graft.operators

import graft.SparkSpec
import graft.llmops.DedupOps
import org.apache.spark.sql.functions._

/** Specs for the diagnostic/linkage verbs that previously had only
  * hash gates: key-skew profiling, Benford screening, fuzzy record
  * linkage.
  */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewProfile: uniform keys reach max entropy, a hot key shows") {
    val uniform = (1L to 100L).map(i => (i % 10, i)).toDF("k", "x")
    val u = SkewOps.keySkewProfile(uniform, "k")
      .select("n_rows", "n_keys", "max_key_rows", "max_share", "entropy", "max_entropy")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(u._1 == 100L && u._2 == 10L && u._3 == 10L)
    assert(math.abs(u._4 - 0.1) < 1e-12)
    assert(math.abs(u._5 - u._6) < 1e-9) // uniform: H = ln(n_keys)

    val hot = ((1L to 91L).map(_ => 0L) ++ (1L to 9L)).map((_, 1)).toDF("k", "x")
    val h = SkewOps.keySkewProfile(hot, "k")
      .select("max_share", "entropy", "max_entropy")
      .as[(Double, Double, Double)].head()
    assert(h._1 == 0.91)
    assert(h._2 < 0.5 * h._3) // far below uniform entropy
  }

  test("benfordProfile: a perfect Benford sample has near-zero chi-square") {
    // counts proportional to log10(1+1/d) over 1000 rows, synthesized
    // as d.0 values repeated round(1000·p_d) times
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(1000 * math.log10(1 + 1.0 / d)).toInt
      Seq.fill(n)(d.toDouble)
    }.toDF("v")
    val prof = DataQualityOps.benfordProfile(rows, col("v"))
      .select("digit", "n_obs", "contrib")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(prof.map(_._1) == (1L to 9L))
    assert(prof.map(_._3).sum < 0.1) // rounding residue only
    // digit comes from cents: 0.05 → 5, 123.45 → 1
    val dg = DataQualityOps.benfordProfile(Seq(0.05, 123.45).toDF("v"), col("v"))
      .select("digit").as[Long].collect().toSet
    assert(dg == Set(5L, 1L))
  }

  test("editDistanceLink: matches within the block at maxDist, not beyond") {
    val a = Seq((1L, "alphabet soup"), (2L, "zebra crossing")).toDF("id", "nm")
    val b = Seq(
      (10L, "alphabet soupx"),  // dist 1, same 8-prefix → match
      (11L, "alphabet puos"),   // dist > 2 → no
      (12L, "zebra crossing"),  // dist 0 → match
      (13L, "aelphabet soup")   // dist 1 but different 8-prefix → blocked out
    ).toDF("id", "nm")
    val out = DedupOps.editDistanceLink(a, "id", "nm", b, "id", "nm",
        blockLen = 8, maxDist = 2)
      .select("id_a", "id_b", "lev").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 10L, 1), (2L, 12L, 0)))
  }

  test("blocked linkage purges stopword-grade blocks, keeps discriminative ones") {
    // one mega-block ("the rest…", 40×40 = 1600 pairs) over a tight
    // budget, one small block under it: the r16 100×-probe failure
    // shape in miniature — the mega-block must drop LOUDLY, the small
    // block's matches must be exactly what the un-purged path finds
    val a = ((1L to 40L).map(i => (i, s"the rest of doc $i")) :+
      (100L, "unique prefix here")).toDF("id", "nm")
    val b = ((1L to 40L).map(i => (i + 1000L, s"the rest of doc $i")) :+
      (1100L, "unique prefix herex")).toDF("id", "nm")
    val purged = DedupOps.editDistanceLink(a, "id", "nm", b, "id", "nm",
        blockLen = 8, maxDist = 2, maxBlockPairs = 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(purged == Set((100L, 1100L)),
      "only the discriminative block's match survives a purge")
    // with the default budget nothing purges and the mega-block links
    val full = DedupOps.editDistanceLink(a, "id", "nm", b, "id", "nm",
        blockLen = 8, maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.contains((100L, 1100L)) && full.size > 40,
      "the default budget keeps the mega-block's matches")
  }

  test("blockedPairs fast path ≡ purge accounting: 10 random corpora, random budgets") {
    // the r17 fast path skips the full purge accounting on an EXACT
    // one-job bound — this pins the equivalence the skip relies on:
    // for random corpora, block lengths, and budgets (some under, some
    // straddling, some over the max block product) the operator must
    // equal a driver-side reference that counts blocks, drops the
    // over-budget ones, and brute-forces Levenshtein in the rest
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val rng = new scala.util.Random(17L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsil", "zetaq")
    (0 until 10).foreach { trial =>
      def corpus(base: Long, n: Int) = (0 until n).map { i =>
        val w = words(rng.nextInt(words.size))
        val tail = (0 until 2 + rng.nextInt(4))
          .map(_ => ('a' + rng.nextInt(4)).toChar).mkString
        (base + i, s"$w $tail")
      }
      val aRows = corpus(0L, 20 + rng.nextInt(40))
      val bRows = corpus(1000L, 20 + rng.nextInt(40))
      val blockLen = 3 + rng.nextInt(4)
      val maxDist = 1 + rng.nextInt(2)
      val budget = Seq(2L, 25L, 100L, 1000000L)(rng.nextInt(4))
      // driver-side reference
      val blkA = aRows.groupBy(_._2.take(blockLen))
      val blkB = bRows.groupBy(_._2.take(blockLen))
      val keptBlocks = (blkA.keySet & blkB.keySet).filter(k =>
        blkA(k).size.toLong * blkB(k).size <= budget)
      val want = (for {
        k <- keptBlocks.toSeq
        (ia, na) <- blkA(k); (ib, nb) <- blkB(k)
        d = lev(na, nb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      val got = DedupOps.editDistanceLink(
        aRows.toDF("id", "nm"), "id", "nm",
        bRows.toDF("id", "nm"), "id", "nm",
        blockLen = blockLen, maxDist = maxDist, maxBlockPairs = budget)
        .select("id_a", "id_b", "lev").as[(Long, Long, Int)].collect().toSet
      assert(got == want,
        s"trial $trial (blockLen=$blockLen maxDist=$maxDist budget=$budget): " +
          s"got ${got.size} pairs, want ${want.size}")
    }
  }

  test("null-name rows never inflate the fast-path budget nor reach the pair set") {
    // an equi-join can't match null keys, so a corpus whose largest
    // "block" is the null group must take the FAST path (r17 counted
    // the null group, sending a healthy corpus down the purge
    // accounting for blocks that do no join work) — and produce the
    // same pairs either way
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("nm", StringType)))
    def side(base: Long, nulls: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until nulls).map(i => org.apache.spark.sql.Row(base + i, null)) ++
          Seq(org.apache.spark.sql.Row(base + 900L, "match me"),
            org.apache.spark.sql.Row(base + 901L, "match mex"))),
      schema)
    // null-group product 30×30 = 900 > budget 100; real blocks are tiny
    val a = side(0L, 30)
    val b = side(1000L, 30)
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val got =
      try {
        System.setErr(new java.io.PrintStream(errBuf))
        DedupOps.editDistanceLink(a, "id", "nm", b, "id", "nm",
          blockLen = 8, maxDist = 2, maxBlockPairs = 100L)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      } finally System.setErr(realErr)
    assert(got == Set((900L, 1900L), (900L, 1901L), (901L, 1900L), (901L, 1901L)))
    // fast path taken: no purge warning was printed for the null group
    assert(!errBuf.toString.contains("purging"),
      s"null group tripped the purge path: ${errBuf.toString.take(200)}")
  }
}
