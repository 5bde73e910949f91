package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit checks for the LLM-pipeline operators on tiny hand-built data. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  // Near-dup pair sits at trigram-jaccard 9/11 ≈ 0.82 — the regime LSH
  // (16 bands × 4 rows) detects with P(miss) ~ 1e-4. A pair at j ≈ 0.5
  // would be a coin flip by design (the S-curve is centered there), so
  // the corpus avoids the threshold knife-edge like real dedup configs do.
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river"),
    (1L, "the quick brown fox jumps over the lazy dog near the river"),  // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the bridge"), // near dup (last word)
    (3L, "completely different words here entirely unrelated content"),
    (4L, "river the near dog lazy the over jumps fox brown quick the")   // shuffle of 0 (same token set)
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams") {
    val sh = DedupOps.shingles(docs.filter(col("doc_id") === 0), "doc_id", "text", 3)
    assert(sh.count() == 10) // 12 tokens -> 10 trigrams, all distinct
  }

  test("exact jaccard pairs find dup and near-dup") {
    val sh = DedupOps.shingles(docs, "doc_id", "text", 3)
    val pairs = DedupOps.exactJaccardPairs(sh, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical: j=1
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // j = 9/11
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-lsh reproduces exact jaccard pairs on dups") {
    val exact = DedupOps.exactJaccardPairs(
      DedupOps.shingles(docs, "doc_id", "text", 3), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minHashLshPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("token-set fingerprint collapses shuffled duplicates") {
    val fps = docs.withColumn("fp", TextOps.tokenSetFingerprint(col("text")))
      .select("doc_id", "fp").as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) == fps(4L)) // word order ignored
    assert(fps(0L) != fps(3L))
    val groups = DedupOps.dupGroups(
      docs.withColumn("fp", TextOps.tokenSetFingerprint(col("text"))), "doc_id", "fp")
    assert(groups.select("n_members").as[Long].collect().toSeq == Seq(3L))
  }

  test("simhash: identical docs at distance 0, disjoint docs far apart") {
    val chunks = SimHashOps.simHashChunks(docs, "doc_id", "text")
    val pairs = SimHashOps.simHashPairs(chunks, 3)
      .select("id_a", "id_b", "hd").as[(Long, Long, Long)].collect()
    val hd01 = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(hd01.exists(_._3 == 0L))
    assert(!pairs.exists(p => (p._1, p._2) == (0L, 3L)))
  }

  test("language-id picks the stopword-dominant language") {
    val multi = Seq(
      (1L, "the cat and the dog of it is"),
      (2L, "der hund und die katze ist nicht"),
      (3L, "le chien et le chat est dans"),
      (4L, "el perro y el gato es con")).toDF("doc_id", "text")
    val out = multi.withColumn("pred", TextOps.langId(col("text")))
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es"))
  }

  test("fleschScore: counts words / sentence runs / vowel groups") {
    // "See the dog. It runs!" → 5 words, 2 sentences ([.] and [!] runs),
    // syllables = vowel groups: see(1) the(1) dog(1) it(1) runs(1) = 5
    val df = Seq((1L, "See the dog. It runs!")).toDF("doc_id", "text")
    val got = df.select(TextOps.fleschScore(col("text"))).as[Double].head()
    val exp = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    assert(math.abs(got - exp) < 1e-9)
    // no terminator → sentence count floors at 1
    val one = Seq((1L, "no end here")).toDF("doc_id", "text")
      .select(TextOps.fleschScore(col("text"))).as[Double].head()
    val expOne = 206.835 - 1.015 * 3.0 - 84.6 * (4.0 / 3.0) // o,e,ee,e... vowel runs = 4
    assert(math.abs(one - expOne) < 1e-9)
  }

  test("native graft_cosine expression is bit-identical to the HOF folds and codegens") {
    val rnd = new scala.util.Random(11)
    val vs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian()))).toDF("id", "v")
    val paired = vs.as("a").crossJoin(vs.as("b"))
      .filter(col("a.id") < col("b.id")).limit(500)
    val both = paired.select(
      VectorOps.cosine(col("a.v"), col("b.v")).as("native"),
      VectorOps.cosineHof(col("a.v"), col("b.v")).as("hof"))
    // bit-identical: same fold order per accumulator
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // the expression must run inside whole-stage codegen, not fall back —
    // checked on a native-only projection (the HOF column above is
    // CodegenFallback and would disable codegen for any shared stage)
    // (a literal local table would be constant-folded away, so derive
    // the arrays from a runtime range source)
    val ranged = spark.range(100).select(
      array((0 until 8).map(i => (col("id") * (i + 1)).cast("double") / 7.0): _*).as("v"))
    val nativeOnly = ranged.select(VectorOps.cosine(col("v"), col("v")).as("c"))
      .filter(col("c") > 0.5)
    nativeOnly.foreach(_ => ())
    val plan = nativeOnly.queryExecution.executedPlan.toString
    // "*(n) Project [graft_cosine(...)" = the expression inside
    // whole-stage-codegen stage n (a CodegenFallback would render a
    // bare Project with no stage marker)
    assert(plan.linesIterator.exists(l => l.contains("graft_cosine") && l.trim.startsWith("*(")), plan)
  }

  test("cosine falls back to the HOF form when graft_cosine is unregistered") {
    import org.apache.spark.sql.SparkSession
    // With no active session (a library caller that never installed
    // GraftExtensions), building the column must not bake in an
    // unresolvable call_function("graft_cosine").
    SparkSession.clearActiveSession()
    val fallback =
      try VectorOps.cosine(col("a"), col("b"))
      finally SparkSession.setActiveSession(spark)
    assert(!fallback.toString.contains("graft_cosine"))
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val viaFallback = df.select(fallback.as("c")).as[Double].head()
    val viaNative = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(viaFallback == viaNative) // bit-identical fold order
  }

  test("cosine: orthogonal 0, identical 1; top-k ranks by angle") {
    val vs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(1.0, 1.0)), (3L, Array(-1.0, 0.0)))
      .toDF("id", "v")
    val top = VectorOps.bruteForceTopK(vs, vs.filter(col("id") === 0), 3)
      .orderBy("rank").select("nbr").as[Long].collect()
    assert(top.toSeq == Seq(2L, 1L, 3L)) // cos: 0.707, 0, -1
  }

  test("int8 quantization: codes bounded, tinyint-typed, cosine-faithful") {
    val vs = Seq(
      (0L, Array(0.5, -0.25, 1.0)), (1L, Array(0.5, -0.25, 1.0)),
      (2L, Array(-2.0, 4.0, 0.0)), (3L, Array(0.0, 0.0, 0.0)))
      .toDF("id", "v")
    val q = VectorOps.int8Quantize(vs)
    // stored codes are bytes — the 8× memory cut is real, not cosmetic
    assert(q.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true))
    val codes = q.orderBy("id").select("codes").as[Seq[Byte]].collect()
    // max-|coordinate| maps to ±127 exactly; others scale linearly
    assert(codes(0) == Seq[Byte](64, -32, 127)) // round(63.5)=64 half-up
    assert(codes(2) == Seq[Byte](-64, 127, 0))
    assert(codes(3) == Seq[Byte](0, 0, 0)) // zero vector: no div-by-zero
    assert(codes.flatten.forall(c => c >= -127 && c <= 127))
    // cosine over codes preserves exact-duplicate detection (scale
    // cancels): ids 0/1 are identical → their code cosine is exactly 1
    val top = VectorOps.int8TopK(vs.filter(col("id") < 3), vs.filter(col("id") === 0), 2)
    val best = top.filter(col("rank") === 1).select("nbr", "cos")
      .as[(Long, Double)].head()
    // d/(√d·√d) rounds within one ulp of 1, not to exactly 1
    assert(best._1 == 1L && math.abs(best._2 - 1.0) < 1e-12)
  }

  test("duplicate-chunk removal: boilerplate vanishes everywhere, tails survive") {
    // k=2 chunks; "cookie banner" is shared boilerplate in docs 0/1
    val corpus = Seq(
      (0L, "cookie banner real content one extra"),  // chunks: [cookie banner][real content][one extra]
      (1L, "cookie banner other text"),              // [cookie banner][other text]
      (2L, "totally unique words")).toDF("doc_id", "text") // [totally unique][words]
    val out = TextOps.removeDuplicateChunks(corpus, "doc_id", "text", k = 2)
      .orderBy("id").select("id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) == ((0L, 2L, "real content one extra")))
    assert(out(1) == ((1L, 1L, "other text")))
    // odd token count: the 1-token tail chunk survives reconstruction
    assert(out(2) == ((2L, 2L, "totally unique words")))
    // a fully-boilerplate doc returns empty, not a dropped row
    val all = Seq((0L, "dup text"), (1L, "dup text")).toDF("doc_id", "text")
    val cleaned = TextOps.removeDuplicateChunks(all, "doc_id", "text", k = 2)
      .orderBy("id").select("n_kept", "clean_text").as[(Long, String)].collect()
    assert(cleaned.toSeq == Seq((0L, ""), (0L, "")))
  }

  test("blocklist: leet folding on both sides, word boundaries, clean docs empty") {
    val d = Seq(
      (0L, "the b1g bad w0lf was very BIG"),   // b1g + BIG both fold to big
      (1L, "bigger things are not matches"),   // boundary: 'bigger' must not hit
      (2L, "a perfectly clean document")
    ).toDF("doc_id", "text")
    val hits = d.select(col("doc_id"),
        TextOps.blocklistHits(col("text"), Seq("BIG", "b1g", "wolf")).as("h"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(hits(0)._2 == Seq("big", "wolf", "big")) // w0lf folds too; occurrence order
    assert(hits(1)._2.isEmpty && hits(2)._2.isEmpty)
    intercept[IllegalArgumentException] {
      d.select(TextOps.blocklistHits(col("text"), Seq("two words")))
    }
  }

  test("substring spans: keep-first survives, later copies merge into maximal spans") {
    // run of 8 tokens duplicated across three docs at different offsets;
    // doc 0 holds the globally-first occurrence and must be untouched
    val run = "a1 a2 a3 a4 a5 a6 a7 a8"
    val corpus = Seq(
      (0L, s"$run t0 t1 t2"),        // first occurrence (doc 0, pos 1) — keeper
      (1L, s"l0 $run t3"),           // copy at offset 2 — removable
      (2L, s"l1 l2 $run"),           // copy at offset 3 — removable
      (3L, "totally unrelated words flow here beyond reproach always")
    ).toDF("doc_id", "text")
    val spans = DedupOps.substringSpans(corpus, "doc_id", "text", w = 4)
      .orderBy("doc_id", "ms").as[(Long, Int, Int)].collect().toSeq
    // w=4 windows chain across the 8-token run -> ONE merged span per copy
    assert(spans == Seq((1L, 2, 9), (2L, 3, 10)))

    val trimmed = DedupOps.substringTrim(corpus, "doc_id", "text", w = 4)
      .orderBy("doc_id").select("doc_id", "trimmed", "kept_tokens")
      .as[(Long, String, Long)].collect().toSeq
    // doc 0 is the keeper: not in the affected set at all
    assert(trimmed == Seq((1L, "l0 t3", 2L), (2L, "l1 l2", 2L)))
  }

  test("substring spans: within-doc-only repeats are not spans; full coverage deletes the doc") {
    // the repeated run lives in ONE doc only -> countDistinct(doc)=1, no span
    val selfOnly = Seq(
      (0L, "x1 x2 x3 x4 gap x1 x2 x3 x4"),
      (1L, "other words entirely here")).toDF("doc_id", "text")
    assert(DedupOps.substringSpans(selfOnly, "doc_id", "text", w = 4).isEmpty)

    // identical docs: doc 0 keeps everything, doc 1 is fully covered ->
    // it disappears from the trim output (delete, don't rewrite)
    val dup = Seq(
      (0L, "b1 b2 b3 b4 b5"),
      (1L, "b1 b2 b3 b4 b5")).toDF("doc_id", "text")
    val spans = DedupOps.substringSpans(dup, "doc_id", "text", w = 5)
      .as[(Long, Int, Int)].collect().toSeq
    assert(spans == Seq((1L, 1, 5)))
    assert(DedupOps.substringTrim(dup, "doc_id", "text", w = 5).isEmpty)

    // cross-doc dup hash ALSO repeated inside the keeper doc: the
    // keeper's second occurrence is removable too (only the globally
    // first survives)
    val mixed = Seq(
      (0L, "c1 c2 c3 c4 mid c1 c2 c3 c4"),
      (1L, "pad c1 c2 c3 c4 tail")).toDF("doc_id", "text")
    val sp = DedupOps.substringSpans(mixed, "doc_id", "text", w = 4)
      .orderBy("doc_id", "ms").as[(Long, Int, Int)].collect().toSeq
    assert(sp == Seq((0L, 6, 9), (1L, 2, 5)))
  }

  test("substring spans: disjoint spans in one doc stay separate, adjacent ones merge") {
    val r1 = "d1 d2 d3 d4"
    val r2 = "e1 e2 e3 e4"
    val corpus = Seq(
      (0L, s"$r1 spacer word $r2"), // keepers
      (1L, s"$r1 unrelated middle section goes on $r2"), // two DISJOINT spans
      (2L, s"$r1 $r2 x")            // spans [1,4] and [5,8]: ADJACENT -> merge
    ).toDF("doc_id", "text")
    val sp = DedupOps.substringSpans(corpus, "doc_id", "text", w = 4)
      .orderBy("doc_id", "ms").as[(Long, Int, Int)].collect().toSeq
    assert(sp == Seq((1L, 1, 4), (1L, 10, 13), (2L, 1, 8)))
  }

  test("duplicate-span removal catches runs at ANY alignment") {
    // a 6-token run duplicated at DIFFERENT offsets (1 vs 3) — the
    // non-overlapping chunk pass can miss this; sliding windows can't
    val run = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (0L, s"$run tail0 tail1"),             // run at offset 1
      (1L, s"lead0 lead1 $run other stuff"), // run at offset 3
      (2L, "fully unique document body here")).toDF("doc_id", "text")
    val out = TextOps.removeDuplicateSpans(corpus, "doc_id", "text", spanLen = 6)
      .orderBy("id").select("id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) == ((0L, 2L, "tail0 tail1")))
    assert(out(1) == ((1L, 4L, "lead0 lead1 other stuff")))
    assert(out(2) == ((2L, 5L, "fully unique document body here")))
    // within-doc repetition counts as duplication too
    val selfDup = Seq((0L, s"$run and then $run again")).toDF("doc_id", "text")
    val sd = TextOps.removeDuplicateSpans(selfDup, "doc_id", "text", spanLen = 6)
      .select("clean_text").as[String].head()
    assert(sd == "and then again")
    // docs shorter than the span are untouched; identical docs empty out
    val shortAndDup = Seq(
      (0L, "tiny doc"), (1L, run), (2L, run)).toDF("doc_id", "text")
    val res = TextOps.removeDuplicateSpans(shortAndDup, "doc_id", "text", spanLen = 6)
      .orderBy("id").select("clean_text").as[String].collect()
    assert(res.toSeq == Seq("tiny doc", "", ""))
  }

  test("gopher rules: measurements and keep thresholds") {
    val short = "the quick brown fox jumps over the lazy dog today" // 10 toks, mean wlen 4.0
    val longDoc = (short + " ") * 5 + short // 60 toks: passes length
    val numeric = Array.fill(60)("12345").mkString(" ") // no alpha, no stops
    val corpus = Seq((0L, longDoc), (1L, short), (2L, numeric)).toDF("doc_id", "text")
    val out = TextOps.gopherFilter(corpus, "doc_id", "text")
      .orderBy("id").select("id", "n_tok", "mean_wlen", "alpha_frac", "stop_hits", "keep")
      .as[(Long, Long, Double, Double, Long, Boolean)].collect()
    assert(out(0)._2 == 60L && out(0)._4 == 1.0 && out(0)._5 >= 2 && out(0)._6)
    assert(out(1)._2 == 10L && !out(1)._6) // too short
    assert(out(2)._4 == 0.0 && out(2)._5 == 0L && !out(2)._6) // no alpha/stops
    // mean word length closed-form for the numeric doc: all tokens len 5
    assert(out(2)._3 == 5.0)
  }

  test("slice KL and vocab stats: closed-form on a two-slice corpus") {
    val corpus = Seq((0L, "x x y", "a"), (1L, "x z", "b")).toDF("doc_id", "text", "src")
    // corpus dist: x 3/5, y 1/5, z 1/5
    val kl = TextOps.sliceKlDivergence(corpus, "src", "text")
      .orderBy("slice").select("slice", "n_tok", "kl")
      .as[(String, Long, Double)].collect()
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (3.0 / 5)) +
      1.0 / 3 * math.log((1.0 / 3) / (1.0 / 5))
    assert(kl(0)._1 == "a" && kl(0)._2 == 3L && math.abs(kl(0)._3 - klA) < 1e-12)
    assert(kl(1)._2 == 2L && kl(1)._3 > 0)
    val vs = TextOps.vocabStats(corpus, "src", "text")
      .orderBy("slice").select("slice", "n_tok", "n_types", "hapax", "ttr")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(vs(0) == (("a", 3L, 2L, 1L, 0.6667))) // y is the hapax
    assert(vs(1) == (("b", 2L, 2L, 2L, 1.0)))
  }

  test("rrf fusion: consensus ids beat single-ranking tops") {
    val r1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val r2 = Seq((40L, 1L), (20L, 2L), (10L, 3L)).toDF("id", "rank")
    val out = VectorOps.rrfFuse(Seq(r1, r2), 4)
      .select("id", "score").as[(Long, Double)].collect()
    // 10: 1/61+1/63; 20: 1/62+1/62; 40: 1/61; 30: 1/63 — consensus first
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 40L, 30L))
    assert(math.abs(out(0)._2 - (1.0 / 61 + 1.0 / 63)) < 1e-15)
    // ids in both rankings outrank any single-ranking id
    assert(out(1)._2 > out(2)._2)
  }

  test("mixture fractions: most-under-represented slice keeps all, others scale, unlisted drop") {
    // corpus shares: a 50%, b 25%, c 25%; target: a 25%, b 75%
    // r: a 0.5, b 3.0 (max), c 0 → fractions a 1/6, b 1, c 0
    val rows = (0 until 8).map(i => (i.toLong, if (i < 4) "a" else if (i < 6) "b" else "c"))
      .toDF("id", "src")
    val fr = SampleOps.mixtureFractions(rows, "src", Map("a" -> 0.25, "b" -> 0.75))
      .orderBy("src").select("src", "n_docs", "fraction")
      .as[(String, Long, Double)].collect()
    assert(fr.map(t => (t._1, t._2)).toSeq == Seq(("a", 4L), ("b", 2L), ("c", 2L)))
    assert(math.abs(fr(0)._3 - 1.0 / 6.0) < 1e-12)
    assert(fr(1)._3 == 1.0 && fr(2)._3 == 0.0)
    // resample membership is the stratified hash predicate: b all kept,
    // c all dropped
    val kept = SampleOps.resampleToMixture(rows, "id", "src", Map("a" -> 0.25, "b" -> 0.75))
      .select("src").as[String].collect()
    assert(kept.count(_ == "b") == 2 && !kept.contains("c"))
  }

  test("unigram NLL: common-token docs score lower than rare-token docs") {
    val corpus = Seq(
      (0L, "a a a a"), (1L, "a a a b"), (2L, "b c d e")).toDF("doc_id", "text")
    val out = TextOps.unigramNll(corpus, "doc_id", "text")
      .orderBy("id").select("id", "n_tok", "nll")
      .as[(Long, Long, Double)].collect()
    // corpus: a×7, b×2, c/d/e×1 of 12 → doc 0 (all 'a') most likely
    assert(out.map(_._2).toSeq == Seq(4L, 4L, 4L))
    assert(out(0)._3 < out(1)._3 && out(1)._3 < out(2)._3)
    // doc 0 exactly: −ln(7/12)
    assert(math.abs(out(0)._3 - -math.log(7.0 / 12.0)) < 1e-12)
  }

  test("bigram NLL: closed-form value and in-context ranking") {
    // corpus transitions: (a,a)×4, (a,b)×2, (b,a)×2  — context a:6, b:2
    val corpus = Seq(
      (0L, "a a a"), (1L, "a a a"), (2L, "a b a b a")).toDF("doc_id", "text")
    val out = TextOps.bigramNll(corpus, "doc_id", "text")
      .orderBy("id").select("id", "n_bi", "nll")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 2L, 4L))
    // unigrams: a×9, b×2 of 11; doc 0 = two (a,a) transitions:
    // −ln(0.5·(4/6) + 0.5·(9/11))
    val exp0 = -math.log(0.5 * (4.0 / 6.0) + 0.5 * (9.0 / 11.0))
    assert(math.abs(out(0)._3 - exp0) < 1e-12)
    // (a,a) is the likelier transition, so doc 0 scores below doc 2
    assert(out(0)._3 < out(2)._3)
    // single-token docs have no transitions and drop
    val one = TextOps.bigramNll(Seq((0L, "solo"), (1L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(one.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("urls: extraction order, host lowercasing, query/fragment drop") {
    val df = Seq(
      "read HTTPS nope, see https://Ex.COM:8080/A/b?q=1#f then http://ex.com/A/b and https://ex.com/a/B",
      "no links").toDF("text")
    val out = df.select(
      TextOps.extractUrls(col("text")).as("u"),
      TextOps.canonicalizeUrl(get(TextOps.extractUrls(col("text")), lit(0))).as("c"),
      TextOps.urlDomain(get(TextOps.extractUrls(col("text")), lit(0))).as("d"))
      .as[(Seq[String], String, String)].collect()
    assert(out(0)._1.size == 3)
    // host+scheme lowercase, port kept, path case preserved, ?/# gone
    assert(out(0)._2 == "https://ex.com:8080/A/b")
    assert(out(0)._3 == "ex.com") // domain = host, port not included
    assert(out(1)._1.isEmpty && out(1)._2 == null && out(1)._3 == null)
    // canonicalization distinguishes path case but not host case
    val c2 = df.limit(1).select(
      TextOps.canonicalizeUrl(get(TextOps.extractUrls(col("text")), lit(2))).as("c"))
      .as[String].head()
    assert(c2 == "https://ex.com/a/B")
  }

  test("sequence packing: contiguous intervals, straddle detection, exact cuts") {
    // 4 docs of 3/4/2/5 tokens, seqLen 4: stream cuts at 4, 8, 12
    val corpus = Seq(
      (0L, "a b c"), (1L, "a b c d"), (2L, "a b"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = TextOps.packSequences(corpus, "doc_id", "text", 4, numParts = 2)
      .orderBy("id")
      .select("id", "n_tok", "tok_start", "seq_first", "seq_last", "straddles")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out(0) == ((0L, 3L, 0L, 0L, 0L, false)))  // [0,3) in seq 0
    assert(out(1) == ((1L, 4L, 3L, 0L, 1L, true)))   // [3,7) straddles 0/1
    assert(out(2) == ((2L, 2L, 7L, 1L, 2L, true)))   // [7,9) straddles 1/2
    assert(out(3) == ((3L, 5L, 9L, 2L, 3L, true)))   // [9,14) straddles 2/3
    // intervals tile the stream: each start = previous start + length
    assert(out.sliding(2).forall { case Array(a, b) => b._3 == a._3 + a._2 })
  }

  test("pii: emails, IPs, and phones are counted and redacted in order") {
    val df = Seq(
      "reach a.b+c@ex.co or x@y.org, host 10.0.0.1, call +123456789012",
      "no pii here at all").toDF("text")
    val out = df.select(
      TextOps.piiCount(col("text"), TextOps.EmailRe).as("e"),
      TextOps.piiCount(col("text"), TextOps.Ipv4Re).as("i"),
      TextOps.piiCount(col("text"), TextOps.PhoneRe).as("p"),
      TextOps.redactPii(col("text")).as("r"))
      .as[(Int, Int, Int, String)].collect()
    assert(out(0) == ((2, 1, 1,
      "reach <EMAIL> or <EMAIL>, host <IP>, call <PHONE>")))
    assert(out(1) == ((0, 0, 0, "no pii here at all")))
  }

  test("binary signatures pack sign bits; Hamming shortlist + rescore finds dups") {
    val vs = Seq(
      (0L, Array(1.0, -1.0, 0.5, -0.2)), (1L, Array(1.0, -1.0, 0.5, -0.2)),
      (2L, Array(-1.0, 1.0, -0.5, 0.2)), (3L, Array(1.0, 1.0, 0.0, 0.0)))
      .toDF("id", "v")
    val sigs = VectorOps.signSignatures(vs, 4).orderBy("id")
      .select("sig").as[Long].collect()
    assert(sigs(0) == 5L && sigs(1) == 5L) // bits 0 and 2 (positives)
    assert(sigs(2) == 10L) // exact complement: bits 1 and 3
    assert(sigs(3) == 3L)  // 0.0 is NOT positive: bits 0 and 1 only
    val top = VectorOps.binaryTopK(vs, vs.filter(col("id") === 0), 3, 4, 4)
      .orderBy("rank").select("nbr", "cos").as[(Long, Double)].collect()
    // identical vector first (cos ~1), complement last (cos -1)
    assert(top.head._1 == 1L && math.abs(top.head._2 - 1.0) < 1e-12)
    assert(top.last._1 == 2L && math.abs(top.last._2 + 1.0) < 1e-12)
  }

  test("bm25: term-frequency ranks, absent-term docs drop, ties break by id") {
    val corpus = Seq(
      (0L, "spark spark spark"), (1L, "spark data"),
      (2L, "data data"), (3L, "spark data")).toDF("doc_id", "text")
    val top = TextOps.bm25TopK(corpus, "doc_id", "text", Seq("spark"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
    // doc 2 has no query term → not retrieved
    assert(top.map(_._1).toSeq == Seq(0L, 1L, 3L))
    // higher tf wins; identical docs 1/3 score identically (tie broken by id)
    assert(top(0)._2 > top(1)._2 && top(1)._2 == top(2)._2)
    assert(top.forall(_._2 > 0.0)) // Lucene idf form stays non-negative
  }

  test("winnowing: shared substring >= k+w-1 guarantees a common fingerprint") {
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Seq[Long])].collect().toMap
    // exact dups select identical sets; the winnowing guarantee: any
    // shared substring of length >= k+w-1 (11 chars) yields an overlap
    assert(fp(0L) == fp(1L))
    assert(fp(0L).toSet.intersect(fp(2L).toSet).nonEmpty) // long shared prefix
    assert(fp(0L).toSet.intersect(fp(3L).toSet).isEmpty ||
      fp(0L).toSet.intersect(fp(3L).toSet).size < fp(0L).size / 2)
    // density: ~1/w of the k-gram positions get selected (far fewer
    // fingerprints than k-grams), sets are sorted ascending
    val m = "the quick brown fox jumps over the lazy dog near the river".length - 8 + 1
    assert(fp(0L).size < m && fp(0L) == fp(0L).sorted)
    // a doc shorter than k has no fingerprints (no crash)
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(TextOps.winnowFingerprints(short, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().head._2.isEmpty)
  }

  test("winnow shared pairs: dups pair up, unrelated docs do not") {
    val pairs = TextOps.winnowSharedPairs(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 5, maxDf = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("df-cap drops hot shingles and bounds the skewed self-join") {
    // 1000 docs all share one stopword-grade shingle ("common phrase here",
    // df=1000 -> 10^6 join rows uncapped) plus unique filler; one true
    // near-dup pair (9000/9001) shares only rare shingles.
    val skewed = ((0 until 1000).map { i =>
      (i.toLong, s"common phrase here u${i}a u${i}b u${i}c u${i}d")
    } ++ Seq(
      (9000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9001L, "alpha beta gamma delta epsilon zeta eta iota"))).toDF("doc_id", "text")
    val sh = DedupOps.shingles(skewed, "doc_id", "text", 3)
    val capped = DedupOps.capShingles(sh, maxDf = 10)
    // exactly the one hot shingle (1000 occurrences) is dropped
    assert(sh.count() - capped.count() == 1000)
    assert(capped.filter(col("shingle") === "common phrase here").count() == 0)
    val pairs = DedupOps.exactJaccardPairs(sh, 0.5, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((9000L, 9001L)))
    // on an un-skewed corpus the cap is a no-op: same pairs either way
    val base = DedupOps.shingles(docs, "doc_id", "text", 3)
    val withCap = DedupOps.exactJaccardPairs(base, 0.5).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val noCap = DedupOps.exactJaccardPairs(base, 0.5, maxDf = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(withCap == noCap)
  }

  test("cosine threshold pairs: distributed block join matches direct computation") {
    val rnd = new scala.util.Random(42)
    val vs = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextGaussian()))).toSeq
    def cosOf(a: Array[Double], b: Array[Double]): Double = {
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      ab / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      (ia, va) <- vs; (ib, vb) <- vs if ia < ib
      c = cosOf(va, vb) if c >= 0.3
    } yield (ia, ib)).toSet
    // numBlocks=3 exercises both intra-block and cross-block pair groups
    val got = VectorOps.cosineThresholdPairs(vs.toDF("id", "v"), 0.3, numBlocks = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("cosine threshold pairs refuses an over-bound corpus, pointing at the ANN family") {
    val rnd = new scala.util.Random(17)
    val vs = (0L until 40L).map(i => (i, Array.fill(4)(rnd.nextGaussian()))).toDF("id", "v")
    // explicit bound below the corpus size -> fail fast, no job for the pair join
    val ex = intercept[IllegalArgumentException] {
      VectorOps.cosineThresholdPairs(vs, 0.3, numBlocks = 2, maxCorpusRows = 10L)
    }
    assert(ex.getMessage.contains("lshTopK") && ex.getMessage.contains("ivfTopK"))
    assert(ex.getMessage.contains("40 rows"))
    // same call below the bound still runs
    assert(VectorOps.cosineThresholdPairs(vs, 0.3, numBlocks = 2, maxCorpusRows = 40L)
      .count() > 0)
    // session-conf form of the bound guards the default-argument path
    spark.conf.set("spark.graft.cosPairs.maxCorpusRows", "10")
    try {
      val ex2 = intercept[IllegalArgumentException] {
        VectorOps.cosineThresholdPairs(vs, 0.3)
      }
      assert(ex2.getMessage.contains("bound of 10"))
    } finally spark.conf.unset("spark.graft.cosPairs.maxCorpusRows")
  }

  test("product quantization: codebooks per subspace, codes compress, ADC ranks cluster-mates first") {
    val vs = Seq(
      (0L, Array(1.0, 0.1, 0.9, 0.1)), (1L, Array(0.95, 0.12, 1.0, 0.08)),
      (2L, Array(1.05, 0.09, 0.92, 0.11)),
      (10L, Array(0.1, 1.0, 0.12, 0.95)), (11L, Array(0.12, 0.9, 0.1, 1.0)),
      (12L, Array(0.09, 1.05, 0.11, 0.9)))
      .toDF("id", "v")
    val cb = VectorOps.pqTrain(vs, m = 2, dim = 4, k = 2, iters = 2)
    assert(cb.count() == 4) // 2 subspaces × 2 codes — metadata-sized
    val codes = VectorOps.pqEncode(vs, cb, 2, 4)
    assert(codes.count() == 12) // every vector → one code per subspace
    assert(codes.select("cid").distinct().count() <= 2)
    // ADC from codes alone: query 0's neighbors are its cluster-mates,
    // tie-broken by id (cluster members share codes → equal ADC score)
    val top = VectorOps.pqTopK(codes, cb, vs.filter(col("id") === 0), 2, 2, 4)
      .orderBy("rank").select("nbr").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L), top.toString)
  }

  test("ivf+pq composition scores pruned candidates from codes alone") {
    val vs = Seq(
      (0L, Array(1.0, 0.1, 0.9, 0.1)), (1L, Array(0.95, 0.12, 1.0, 0.08)),
      (2L, Array(1.05, 0.09, 0.92, 0.11)),
      (10L, Array(0.1, 1.0, 0.12, 0.95)), (11L, Array(0.12, 0.9, 0.1, 1.0)),
      (12L, Array(0.09, 1.05, 0.11, 0.9)))
      .toDF("id", "v")
    val coarse = VectorOps.trainIvfCentroids(vs, 2, 2)
    val index = VectorOps.ivfAssign(vs, coarse).select("id", "cid")
    val cb = VectorOps.pqTrain(vs, 2, 4, 2, 2)
    val codes = VectorOps.pqEncode(vs, cb, 2, 4)
    // nprobe=1: only query 0's own coarse list is scanned; its
    // cluster-mates surface from codes alone, tie-broken by id
    val top = VectorOps.ivfPqTopK(index, coarse, codes, cb,
      vs.filter(col("id") === 0), 2, 1, 2, 4)
      .orderBy("rank").select("nbr").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L), top.toString)
  }

  test("pq index (codes + codebooks) persists to parquet and scores identically") {
    val rnd = new scala.util.Random(23)
    val vs = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
    val cb = VectorOps.pqTrain(vs, m = 2, dim = 8, k = 4, iters = 2)
    val codes = VectorOps.pqEncode(vs, cb, 2, 8)
    val qs = vs.filter(col("id") < 3)
    val direct = VectorOps.pqTopK(codes, cb, qs, 3, 2, 8)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    // build once, persist both halves, reload, probe — the serving shape
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-index")
    codes.write.parquet(s"$dir/codes")
    cb.write.parquet(s"$dir/codebooks")
    val reloaded = VectorOps.pqTopK(
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebooks"), qs, 3, 2, 8)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(reloaded == direct && direct.size == 9)
  }

  test("int8 and binary signature indexes persist to parquet and score identically") {
    val rnd = new scala.util.Random(29)
    val vs = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
    val qs = vs.filter(col("id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-q-index")
    // int8: persist codes (the 8×-smaller index), reload, score —
    // identical top-k to quantize-on-the-fly
    val direct8 = VectorOps.int8TopK(vs, qs, 3)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    VectorOps.int8Quantize(vs).write.parquet(s"$dir/int8")
    val re8 = VectorOps.bruteForceTopK(
      VectorOps.int8AsVecs(spark.read.parquet(s"$dir/int8")),
      VectorOps.int8AsVecs(VectorOps.int8Quantize(qs)), 3)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(re8 == direct8 && direct8.size == 9)
    // binary: persist (id, sig) — 8 bytes a vector — and probe the
    // reloaded index against the separate vector store, exactly like
    // production (signature index + vector table are different
    // artifacts)
    val directB = VectorOps.binaryTopK(vs, qs, 3, 10, 8)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    VectorOps.signSignatures(vs, 8).select("id", "sig").write.parquet(s"$dir/sigs")
    val reB = VectorOps.binaryProbe(
      spark.read.parquet(s"$dir/sigs"), vs, qs, 3, 10, 8)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(reB == directB && directB.size == 9)
  }

  test("lsh ann with full multiprobe coverage equals brute force") {
    val rnd = new scala.util.Random(7)
    val vs = (0L until 12L).map(i => (i, Array.fill(4)(rnd.nextGaussian()))).toDF("id", "v")
    // nBits=1 with Hamming-1 multiprobe covers both buckets -> exact
    val lsh = VectorOps.lshTopK(vs, vs.filter(col("id") < 3), 2, 1, 4)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(vs, vs.filter(col("id") < 3), 2)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(lsh == brute && lsh.size == 6)
  }

  test("random projection: linear, deterministic, JL-preserves gross angles") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextGaussian())
    val vs = Seq(
      (0L, base), (1L, base.map(_ * 2.0)), (2L, base.map(-_)),
      (3L, Array.fill(64)(rnd.nextGaussian())))
      .toDF("id", "v")
    val p = VectorOps.randomProject(vs, 64, 16)
      .select("id", "p").as[(Long, Seq[Double])].collect().toMap
    assert(p(0).size == 16)
    // linearity: scaling and negation pass through exactly
    (0 until 16).foreach { j =>
      assert(math.abs(p(1)(j) - 2.0 * p(0)(j)) < 1e-9)
      assert(math.abs(p(2)(j) + p(0)(j)) < 1e-9)
    }
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // identical direction stays cos=1; opposite stays −1; an unrelated
    // vector stays far from ±1 (JL distortion, loose bound)
    assert(math.abs(cos(p(0), p(1)) - 1.0) < 1e-9)
    assert(math.abs(cos(p(0), p(2)) + 1.0) < 1e-9)
    assert(math.abs(cos(p(0), p(3))) < 0.8)
    // determinism: a second run projects identically
    val p2 = VectorOps.randomProject(vs, 64, 16)
      .select("id", "p").as[(Long, Seq[Double])].collect().toMap
    assert(p2(3) == p(3))
  }

  test("stripHtml removes chrome, resolves entities once, survives inline '<'") {
    val df = Seq(
      "<html><head><style>p{a:b}</style><script>if (1<2) { x(); }</script></head>" +
        "<body> <p>Hello &amp;amp; <b>world</b>&nbsp;&lt;ok&gt;</p> </body></html>",
      "no markup at all",
      "<SCRIPT src=\"x.js\">var y = \"</p>\";</SCRIPT>tail").toDF("h")
    val out = df.select(TextOps.stripHtml(col("h")).as("c")).as[String].collect()
    // one entity level resolves: &amp;amp; -> &amp;
    assert(out(0) == "Hello &amp; world <ok>")
    assert(out(1) == "no markup at all")
    // script bodies go even when they contain quotes and tags
    assert(out(2) == "tail")
  }

  test("shardShuffle: exact cover, stable under re-runs and partitioning") {
    val df = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "t")
    val a = SampleOps.shardShuffle(df, "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // every doc exactly once, shards in range, positions dense 1..n
    assert(a.length == 200 && a.map(_._1).distinct.length == 200)
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // deterministic: same assignment from a differently-partitioned input
    val b = SampleOps.shardShuffle(df.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // the shuffle decorrelates: consecutive ids don't stay adjacent
    val posOfId = a.map(r => r._1 -> (r._2, r._3)).toMap
    val adjacent = (0L until 199L).count(i =>
      posOfId(i)._1 == posOfId(i + 1)._1 &&
        math.abs(posOfId(i)._2 - posOfId(i + 1)._2) == 1)
    assert(adjacent < 20)
  }

  test("standardize: zero mean, unit variance per dim, zero-variance guard") {
    val rnd = new scala.util.Random(5)
    val vs = (0L until 50L).map { i =>
      // dim 0: scale 100, dim 1: scale 0.01, dim 2: constant
      (i, Array(rnd.nextGaussian() * 100, rnd.nextGaussian() * 0.01, 7.0, rnd.nextGaussian()))
    }.toDF("id", "v")
    val z = VectorOps.standardize(vs, 4).select("z").as[Seq[Double]].collect()
    (0 until 4).foreach { d =>
      val col = z.map(_(d))
      if (d == 2) assert(col.forall(_ == 0.0)) // constant dim → 0, not NaN
      else {
        val m = col.sum / col.length
        val v = col.map(x => (x - m) * (x - m)).sum / col.length
        // moments round to 6dp before the transform, so a dim at scale
        // 0.01 re-centers only to ~0.5e-6/σ ≈ 5e-5 — bound accordingly
        assert(math.abs(m) < 1e-3 && math.abs(v - 1.0) < 1e-3,
          s"dim $d mean=$m var=$v")
      }
    }
  }

  test("logistic regression separates hash-distinct vocab; training is deterministic") {
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      ((((h(0) >> 4) & 0xf) * 16 + (h(0) & 0xf)) * 256 +
        ((h(1) >> 4) & 0xf) * 16 + (h(1) & 0xf)) % 32
    }
    // two marker words guaranteed to land in different feature buckets
    val words = Seq("alpha", "bravo", "carbon", "delta", "ember", "flint")
    val w1 = words.head
    val w2 = words.find(bucket(_) != bucket(w1)).get
    val docs = ((0L until 10L).map(i => (i, s"$w1 $w1 filler", 1.0)) ++
      (10L until 20L).map(i => (i, s"$w2 $w2 filler", 0.0)))
      .toDF("doc_id", "text", "y")
    val feat = ClassifierOps.hashFeatures(docs, "doc_id", "text", 32)
    val labels = docs.select(col("doc_id").as("id"), col("y"))
    val wv = ClassifierOps.lrTrain(feat, labels, 32, 30, 1.0)
    val scored = ClassifierOps.lrScore(feat, wv)
      .join(labels, "id")
      .withColumn("ok", (col("p") > 0.5) === (col("y") === 1.0))
    assert(scored.filter(!col("ok")).count() == 0, "separable corpus must classify cleanly")
    // positive-class marker weight above the negative-class marker's
    assert(wv(bucket(w1)) > 0 && wv(bucket(w2)) < 0)
    // bit-exact determinism across training runs
    val wv2 = ClassifierOps.lrTrain(feat, labels, 32, 30, 1.0)
    assert(wv.toSeq == wv2.toSeq)
    // intercept feature present exactly once per doc
    val icpt = feat.filter(col("f") === 32)
    assert(icpt.count() == 20 && icpt.select("x").distinct().count() == 1)
  }

  test("pca recovers the dominant variance direction; projections center") {
    val rnd = new scala.util.Random(3)
    // variance 100× larger along axis 0 than anywhere else, offset mean
    val vs = (0L until 60L).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian() * 0.1)
      v(0) += rnd.nextGaussian() * 10.0 + 5.0
      (i, v)
    }.toDF("id", "v")
    val (mean, comps, eig) = VectorOps.pcaTrain(vs, 8, 2, 8)
    // component 0 is ±e0 up to noise; eigenvalue ordering strict
    assert(math.abs(math.abs(comps(0)(0)) - 1.0) < 0.01)
    assert(eig(0) > 50.0 && eig(1) < 1.0 && eig(0) > eig(1))
    assert(math.abs(mean(0) - 5.0) < 3.0)
    // unit components
    assert(math.abs(comps(0).map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(comps(1).map(x => x * x).sum - 1.0) < 1e-9)
    // projections are mean-centered: component scores sum to ~0
    val p = VectorOps.pcaProject(vs, mean, comps)
      .select("p").as[Seq[Double]].collect()
    val s0 = p.map(_.head).sum / p.length
    assert(math.abs(s0) < 0.5)
    // orthogonality of the two components after deflation
    val dot = comps(0).zip(comps(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6)
  }

  test("matryoshka prefix shortlist + full rescore equals brute force when wide") {
    val rnd = new scala.util.Random(17)
    val vs = (0L until 20L).map(i => (i, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
    // shortlist covering the whole corpus → exact-rescore == brute force
    val m = VectorOps.matryoshkaTopK(vs, vs.filter(col("id") < 3), 3, 20, 4)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(vs, vs.filter(col("id") < 3), 3)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(m == brute && m.size == 9)
    // narrow shortlist returns k rows per query, ranked by FULL cosine
    val narrow = VectorOps.matryoshkaTopK(vs, vs.filter(col("id") < 3), 3, 5, 4)
      .groupBy("qid").count().select("count").as[Long].collect()
    assert(narrow.toSeq == Seq(3L, 3L, 3L))
  }

  test("ivf probes only nearest centroid lists but finds in-list neighbors") {
    val vs = Seq(
      (0L, Array(1.0, 0.05)), (1L, Array(1.0, -0.05)), (2L, Array(0.9, 0.1)),
      (10L, Array(-1.0, 0.05)), (11L, Array(-1.0, -0.05)))
      .toDF("id", "v")
    val cents = Seq((100L, Array(1.0, 0.0)), (101L, Array(-1.0, 0.0))).toDF("id", "v")
    val out = VectorOps.ivfTopK(vs, cents, vs.filter(col("id") === 0), 2, 1)
      .orderBy("rank").select("nbr").as[Long].collect()
    assert(out.toSeq == Seq(2L, 1L)) // only the +x list is probed
  }

  test("ivf index persists to parquet and probes identically") {
    val rnd = new scala.util.Random(11)
    val vs = (0L until 30L).map(i => (i, Array.fill(4)(rnd.nextGaussian()))).toDF("id", "v")
    val cents = VectorOps.trainIvfCentroids(vs.filter(col("id") % 3 === 0), 4, 2)
    val qs = vs.filter(col("id") < 3)
    val direct = VectorOps.ivfTopK(vs, cents, qs, 2, 2)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    // build once, write the inverted file, read it back, probe
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index")
    VectorOps.ivfAssign(vs, cents).write
      .partitionBy("cid").parquet(dir.resolve("ivf").toString)
    val index = spark.read.parquet(dir.resolve("ivf").toString)
    val probed = VectorOps.ivfProbe(index, cents, qs, 2, 2)
      .select("qid", "rank", "nbr").as[(Long, Int, Long)].collect().toSet
    assert(probed == direct && direct.size == 6)
  }

  test("chunkDupStats matches brute-force on random corpora (property)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (0L until 40L).map { i =>
      val len = rnd.nextInt(20)
      (i, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val c = 3
    // brute force: chunk each doc, count corpus-wide frequencies
    val chunksOf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(c).filter(_.length == c).map(_.mkString(" ")).toVector
    }.toMap
    val freq = chunksOf.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expect = docs.map { case (id, _) =>
      val ch = chunksOf(id)
      (id, ch.size.toLong, ch.count(freq(_) > 1).toLong)
    }.toSet
    val got = TextOps.chunkDupStats(docs.toDF("doc_id", "text"), "doc_id", "text", c)
      .select("id", "n_chunks", "dup_chunks").as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("trainIvfCentroids is invariant to corpus partitioning") {
    val rnd = new scala.util.Random(3)
    val vs = (0L until 60L).map(i => (i, Array.fill(6)(rnd.nextGaussian())))
    def train(parts: Int) = VectorOps.trainIvfCentroids(
      vs.toDF("id", "v").repartition(parts), 5, 2)
      .select("id", "v").as[(Long, Seq[Double])].collect().toMap
    val a = train(2)
    val b = train(11)
    assert(a.keySet == b.keySet)
    // elementwise-mean sums are partition-order sensitive in the last
    // ulp; assignment and near-exact equality must still hold
    a.foreach { case (cid, v) =>
      v.zip(b(cid)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("tfidf top terms rank slice-signature words first") {
    val docs = Seq(
      (1L, "a", "alpha alpha alpha shared shared"),
      (2L, "a", "alpha shared common common"),
      (3L, "b", "beta beta shared common"),
      (4L, "b", "beta shared shared common")).toDF("doc_id", "src", "text")
    val top = TextOps.tfidfTopTerms(docs, "doc_id", "src", "text", 1)
      .select("slice", "term").as[(String, String)].collect().toMap
    // "shared"/"common" appear in (nearly) all docs -> low idf; the
    // slice-exclusive terms win
    assert(top == Map("a" -> "alpha", "b" -> "beta"))
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupOps.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("connected components: chain, clique, and separate pair") {
    // chain 1-2-3-4 forces multi-round star contraction; 10-11-12 is a
    // clique; (20,21) an isolated pair; singletons never appear
    val cc = ccOf(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components contract a long chain in O(log² n) rounds") {
    // a 300-node path graph has diameter 299: min-label propagation
    // would need ~300 rounds; star contraction must finish in ≤ 12 —
    // the property that makes chained near-dups tractable at 100 TB
    // (maxIter throws if exceeded, so convergence speed IS asserted)
    val chain = (0L until 299L).map(i => (i, i + 1))
    val cc = DedupOps.connectedComponents(chain.toDF("id_a", "id_b"), maxIter = 12)
      .as[(Long, Long)].collect()
    assert(cc.length == 300 && cc.forall(_._2 == 0L))
  }

  test("connected components match brute-force closure on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3) {
      val n = 30
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      // brute force: repeated min-label relaxation to fixpoint
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      var lab = nodes.map(x => x -> x).toMap
      var changed = true
      while (changed) {
        changed = false
        pairs.foreach { case (a, b) =>
          val m = math.min(lab(a), lab(b))
          if (lab(a) != m || lab(b) != m) { lab += a -> m; lab += b -> m; changed = true }
        }
      }
      assert(ccOf(pairs) == lab)
    }
  }

  test("trigram repetition stats flag boilerplate") {
    val rows = Seq(
      (0L, "a b c a b c a b c a b c"),
      (1L, "one two three four five six"),
      (2L, "just two"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.trigramTotal(col("text")).as("tt"),
        TextOps.trigramDistinct(col("text")).as("td"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0L) == ((10L, 3L))) // abc/bca/cab only
    assert(rows(1L) == ((4L, 4L)))
    assert(rows(2L) == ((0L, 0L))) // < 3 tokens: no trigrams
  }

  test("compiled trigramStats matches the Column forms bit-for-bit") {
    val sample = Seq(
      (0L, "a b c a b c a b c a b c"),
      (1L, "one two three four five six"),
      (2L, "just two"),
      (3L, ""),
      (4L, "  Mixed   CASE\ttabs\nand  newlines repeated repeated repeated "),
      (5L, "x y x y x y x y z"))
      .toDF("doc_id", "text")
    val viaColumns = sample
      .select(col("doc_id"), TextOps.trigramTotal(col("text")).as("tt"),
        TextOps.trigramDistinct(col("text")).as("td"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val viaCompiled = TextOps.trigramStats(sample, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1.toLong -> ((r._2, r._3))).toMap
    assert(viaCompiled == viaColumns)
  }

  test("contamination pairs find eval overlap via broadcast join") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "totally unrelated corpus document text here now")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "the quick brown fox jumps over a sleeping dog")).toDF("doc_id", "text")
    val hits = DedupOps.contaminationPairs(corpus, eval, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits == Seq((100L, 1L, 4L))) // 4 shared leading trigrams
  }

  test("incremental dedup probes the corpus index without corpus text") {
    val corpus = docs.filter(col("doc_id").isin(0L, 2L, 3L))
    val idx = TextOps.winnowFingerprints(corpus, "doc_id", "text")
    val hits = TextOps.incrementalDedupPairs(
      docs.filter(col("doc_id") === 1L), "doc_id", "text", idx, minShared = 3)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((1L, 0L)))  // exact dup of doc 0 found
    assert(!hits.exists(_._2 == 3L)) // unrelated corpus doc not matched
  }

  test("hash split: exhaustive, weight-proportional, re-run-stable") {
    val ids = spark.range(0, 2000).toDF("id")
    val split = SampleOps.assignSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)             // every row labeled
    assert(counts("train") > 1500 && counts("val") > 130 && counts("test") > 130)
    // determinism: a second independent evaluation assigns identically
    val again = SampleOps.assignSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("id", "split").as[(Long, String)].collect().toSet ==
      again.select("id", "split").as[(Long, String)].collect().toSet)
  }

  test("stratified sample: per-stratum fraction, deterministic membership") {
    val rows = spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val sampled = SampleOps.stratifiedSample(rows, "id", "s",
      Map("0" -> 0.5, "1" -> 0.1), default = 0.0)
    val by = sampled.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(!by.contains("2"))                       // default 0 drops stratum
    assert(by("0") > 380 && by("0") < 620)          // ~500 of 1000
    assert(by("1") > 60 && by("1") < 140)           // ~100 of 1000
    // membership is a subset of the split's u-ordering: sampling at a
    // higher fraction strictly contains the lower-fraction sample
    val wider = SampleOps.stratifiedSample(rows, "id", "s",
      Map("0" -> 0.8, "1" -> 0.3), default = 0.0)
    val narrowSet = sampled.select("id").as[Long].collect().toSet
    val widerSet = wider.select("id").as[Long].collect().toSet
    assert(narrowSet.subsetOf(widerSet))
  }

  test("bottomKSample: exactly k per group, partition-stable, reservoir under appends") {
    val rows = spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val sample = SampleOps.bottomKSample(rows, Seq("s"), "id", 10)
    val by = sample.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(by.values.forall(_ == 10L), by.toString)
    val ids = sample.select("id").as[Long].collect().toSet
    // same membership regardless of physical partitioning
    val re = SampleOps.bottomKSample(rows.repartition(13), Seq("s"), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(re == ids)
    // appending rows only ever DISPLACES members (reservoir
    // semantics): the new sample is not a re-deal
    val grown = spark.range(0, 6000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val grownIds = SampleOps.bottomKSample(grown, Seq("s"), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(grownIds.intersect(ids).size >= 15,
      s"append re-dealt the sample: kept ${grownIds.intersect(ids).size}/30")
  }

  test("weightedBottomK: exactly k, weight-proportional, excludes w <= 0") {
    // two strata of weights: ids 0..99 weight 100, ids 100..999 weight 1
    val rows = spark.range(0, 1000)
      .select(col("id"), lit("g").as("s"),
        when(col("id") < 100, 100.0).otherwise(1.0).as("w"))
    val picked = SampleOps.weightedBottomK(rows, Seq("s"), "id", "w", 50)
      .select("id").as[Long].collect()
    assert(picked.length == 50)
    // heavy ids are 10% of rows but ~92% of total weight; expect a
    // clear majority of the sample (loose bound, deterministic data)
    val heavy = picked.count(_ < 100)
    assert(heavy > 25, s"only $heavy/50 heavy-weight rows sampled")
    // zero/negative weights never appear
    val withBad = rows.union(
      spark.range(5000, 5100).select(col("id"), lit("g").as("s"), lit(-1.0).as("w")))
    val noBad = SampleOps.weightedBottomK(withBad, Seq("s"), "id", "w", 50)
      .select("id").as[Long].collect()
    assert(noBad.forall(_ < 5000))
  }

  test("dedupSurvivors keeps cluster minima and all singletons") {
    val out = DedupOps.dedupSurvivors(docs, "doc_id", Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b"))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 3L, 4L)) // 1,2 collapse into 0; 3,4 untouched
  }

  test("winnowDedupPipeline shares one index; outputs match the independent paths") {
    val p = DedupOps.winnowDedupPipeline(docs, "doc_id", "text", minShared = 3)
    val pairsAlone = TextOps.winnowSharedPairs(docs, "doc_id", "text", minShared = 3)
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)].collect().toSet
    assert(p.pairs.select("id_a", "id_b", "shared")
      .as[(Long, Long, Long)].collect().toSet == pairsAlone)
    val clustersAlone = DedupOps.connectedComponents(
      TextOps.winnowSharedPairs(docs, "doc_id", "text", minShared = 3))
      .as[(Long, Long)].collect().toSet
    assert(p.clusters.as[(Long, Long)].collect().toSet == clustersAlone)
    val survAlone = DedupOps.dedupSurvivors(docs, "doc_id",
      TextOps.winnowSharedPairs(docs, "doc_id", "text", minShared = 3))
      .select("doc_id").as[Long].collect().toSet
    assert(p.survivors.select("doc_id").as[Long].collect().toSet == survAlone)
  }

  test("temperature fractions: closed-form α-flattening, α=1 keeps everything") {
    // shares .8/.2 at α=.5: r ∝ share^-.5 → fractions (√(.2/.8), 1) = (.5, 1)
    val df = ((1L to 8L).map(i => (i, "big")) ++ Seq((9L, "small"), (10L, "small")))
      .toDF("id", "src")
    val fr = SampleOps.temperatureFractions(df, "src", 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(fr("big")._1 == 8L && fr("small")._1 == 2L)
    assert(math.abs(fr("big")._2 - 0.5) < 1e-12 && fr("small")._2 == 1.0)
    // α=1: the corpus mixture is already the target — every slice keeps all
    val keepAll = SampleOps.temperatureFractions(df, "src", 1.0)
      .collect().map(_.getDouble(2))
    assert(keepAll.forall(f => math.abs(f - 1.0) < 1e-12))
    // realized sample is a subset honoring the per-slice predicate
    val got = SampleOps.resampleToTemperature(df, "id", "src", 0.5)
      .select("id").as[Long].collect().toSet
    val u = SampleOps.hashU(col("id"))
    val expect = df.withColumn("u", u)
      .filter((col("src") === "big" && col("u") < fr("big")._2) ||
        (col("src") === "small" && col("u") < fr("small")._2))
      .select("id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("clusterExtremes ranks farthest and closest members per cluster, never globally") {
    // one dominant axis per cluster; member angle controlled by a
    // second component — cos to centroid is monotone in it
    def v(axis: Int, off: Double) =
      Array.tabulate(4)(i => if (i == axis) 1.0 else if (i == 3) off else 0.0)
    val vs = Seq(
      (1L, v(0, 0.0)), (2L, v(0, 0.2)), (3L, v(0, 0.5)), (4L, v(0, 1.0)),
      (5L, v(1, 0.0)), (6L, v(1, 0.8))
    ).toDF("id", "v")
    val cent = Seq((0L, v(0, 0.0)), (1L, v(1, 0.0))).toDF("id", "v")
    val got = VectorOps.clusterExtremes(VectorOps.ivfAssign(vs, cent), cent, 1)
      .select("cid", "id", "r_out", "r_proto")
      .as[(Long, Long, Int, Int)].collect().toSet
    // cluster 0: id 4 farthest (largest off), id 1 closest (cos = 1)
    assert(got.contains((0L, 4L, 1, 4)) && got.contains((0L, 1L, 4, 1)))
    // cluster 1: both members are extremes of their OWN cluster — the
    // ranking never mixes clusters
    assert(got.contains((1L, 6L, 1, 2)) && got.contains((1L, 5L, 2, 1)))
    assert(got.size == 4)
  }

  test("dsirWeights: closed-form log-ratio, target-like docs score higher") {
    val df = Seq((1L, true, "a a b"), (2L, false, "b c")).toDF("id", "t", "text")
    val got = TextOps.dsirWeights(df, "id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: a:2 b:2 c:1 (ct=5, V=3); target: a:2 b:1 (tt=3)
    // p_t: a=3/6 b=2/6 c=1/6; p_c: a=2/5 b=2/5 c=1/5
    def lr(pt: Double, pc: Double) = math.log(pt) - math.log(pc)
    val w1 = (2 * lr(0.5, 0.4) + lr(2.0 / 6, 0.4)) / 3
    val w2 = (lr(2.0 / 6, 0.4) + lr(1.0 / 6, 0.2)) / 2
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - w1) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - w2) < 1e-12)
    assert(got(1L)._2 > got(2L)._2) // the target doc is more target-like
  }

  test("nbClassify: closed-form posteriors, OOV docs fall back to the prior argmax") {
    val train = Seq(
      (1L, "a", "x x y"), (2L, "a", "x y"),
      (3L, "b", "z z"), (4L, "b", "z y")
    ).toDF("doc_id", "label", "text")
    val score = Seq(
      (10L, "a", "x x"),   // class-a evidence
      (11L, "b", "z"),     // class-b evidence
      (12L, "a", "q q")    // fully out-of-vocabulary → prior-only
    ).toDF("doc_id", "label", "text")
    val got = TextOps.nbClassify(train, score, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3)))).toMap
    // vocab {x,y,z} V=3; class a: x:3 y:2 tot 5; class b: z:3 y:1 tot 4;
    // priors ln(1/2) each. "x x": logp_a = ln(.5) + 2·ln(4/8) = 3·ln(.5)
    assert(got(10L)._2 == "a")
    assert(math.abs(got(10L)._3 - 3 * math.log(0.5)) < 1e-12)
    assert(got(11L)._2 == "b")
    // equal priors → tie broken by label order → "a", score = the prior
    assert(got(12L)._2 == "a")
    assert(math.abs(got(12L)._3 - math.log(0.5)) < 1e-12)
    assert(got(10L)._1 == "a" && got(12L)._1 == "a") // label_true carried
  }

  test("semDedup: within-cluster near-dups collapse to min id, distinct vectors survive") {
    // Two well-separated axis clusters with a planted near-dup pair in
    // each; the pair search never crosses a cluster boundary (the n²/k
    // approximation SemDeDup trades for its scale bound — asserted via
    // the pair list's cid column).
    def unit(dim: Int, axis: Int, eps: Double, seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.tabulate(dim)(i => (if (i == axis) 1.0 else 0.0) + eps * r.nextGaussian())
    }
    val vs = Seq(
      (10L, unit(8, 0, 0.01, 1)), (11L, unit(8, 0, 0.01, 2)),
      (12L, unit(8, 0, 0.45, 3)),
      (20L, unit(8, 4, 0.01, 4)), (21L, unit(8, 4, 0.01, 5)),
      (22L, unit(8, 4, 0.45, 6))
    ).toDF("id", "v")
    val cent = Seq((0L, Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)),
      (1L, Array.tabulate(8)(i => if (i == 4) 1.0 else 0.0))).toDF("id", "v")
    val decided = VectorOps.semDedup(vs, cent, 0.95)
    val byId = decided.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // near-dup pairs collapse to min id within each cluster...
    assert(byId(10L)._3 && !byId(11L)._3 && byId(11L)._2 == 10L)
    assert(byId(20L)._3 && !byId(21L)._3 && byId(21L)._2 == 20L)
    // ...the noisy singletons survive, and the decision table is total
    assert(byId(12L)._3 && byId(22L)._3 && byId.size == 6)
    // every candidate pair carries the cluster it was found in
    val pairs = VectorOps.semDedupPairs(
      VectorOps.ivfAssign(vs, cent), 0.95)
      .select("cid", "id_a", "id_b").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (cid, a, b) =>
      a < b && byId(a)._1 == cid && byId(b)._1 == cid })
  }

  test("semDedup derived-k default: k tracks n/targetClusterSize, pair work stays ~n·target") {
    // 2000 deterministic pseudo-random unit-ish vectors: the auto path
    // must derive k = ceil(n / target) = 40, which bounds the published
    // algorithm's n²/k pair work to ~n·target — the scale-safe default
    // a caller gets without naming any parameter (fixed k is quadratic
    // in the corpus; the paper's shape holds cluster SIZE constant).
    def vec(id: Long): Array[Double] = {
      val r = new scala.util.Random(id)
      Array.fill(8)(r.nextGaussian())
    }
    val n = 2000
    val target = 50
    val vs = (0 until n).map(i => (i.toLong, vec(i.toLong)))
      .toDF("id", "v").localCheckpoint()
    val auto = VectorOps.semDedup(vs, 0.99, targetClusterSize = target)
      .localCheckpoint()
    // equivalence: the derived path IS the pinned path at k = ceil(n/t)
    // with the same sample/schedule — same decision table, row for row
    val k = (n + target - 1) / target
    val pinned = VectorOps.semDedup(vs,
      VectorOps.trainIvfCentroids(vs.filter(col("id") % 5 === 0), k, 2), 0.99)
    assert(auto.orderBy("id").collect().toSeq ==
      pinned.orderBy("id").collect().toSeq)
    assert(auto.select("cid").distinct().count() <= k)
    // pair-work bound: Σ sᵢ(sᵢ−1)/2 over the derived clustering stays
    // within a small constant of n·target (perfectly balanced = n·(t−1)/2;
    // the constant absorbs k-means imbalance, not a different asymptote)
    val pairWork = auto.groupBy("cid").agg(count(lit(1)).as("s"))
      .select(sum(col("s") * (col("s") - 1)).cast("long").as("pw"))
      .head.getLong(0) / 2
    assert(pairWork <= 4L * n * target,
      s"derived-k pair work $pairWork exceeds ~n·targetClusterSize (${4L * n * target})")
    // kMin floor engages on tiny corpora
    val tiny = (0 until 40).map(i => (i.toLong, vec(i.toLong))).toDF("id", "v")
    assert(VectorOps.semDedup(tiny, 0.99, targetClusterSize = 1000)
      .select("cid").distinct().count() <= 8)
  }
}
