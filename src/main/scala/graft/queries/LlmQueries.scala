package graft.queries

import graft.llmops.{BpeOps, ClassifierOps, DedupOps, MultimodalOps, SampleOps, SimHashOps, TextOps, UnigramLm, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the documents/embeddings
  * tables: deduplication (exact, n-gram Jaccard, MinHash-LSH, SimHash),
  * text analysis (language-ID, quality, token stats), and similarity
  * search (brute-force + IVF cosine top-k).
  *
  * Oracle discipline: approximate operators are exact-verified — the
  * MinHash-LSH pipeline is checked against the all-pairs exact Jaccard
  * (LSH recall at these similarity levels is ~1, so candidates +
  * verification reproduce the exact answer); algorithmic operators
  * (SimHash, IVF, language-ID) are replicated step-for-step in SQL, so
  * the gate verifies the algorithm, not a weaker row count.
  */
object LlmQueries {
  import QueryUtil.{documents, embeddings, r4}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup on the order/repetition-invariant token-set
    // fingerprint (raw texts are all unique; shuffled near-dups
    // collapse under the canonical form).
    "exact_dedup" -> ((s, dir) =>
      DedupOps.dupGroups(
        documents(s, dir).withColumn("fp", TextOps.tokenSetFingerprint(col("text"))),
        "doc_id", "fp")
        .orderBy("fp")),

    // Exact word-3gram Jaccard >= 0.5 via the inverted shingle index.
    "ngram_jaccard" -> ((s, dir) =>
      DedupOps.exactJaccardPairs(
        DedupOps.shingles(documents(s, dir), "doc_id", "text", 3), 0.5)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("j"))
        .orderBy("id_a", "id_b")),

    // MinHash(64) + LSH(16 bands × 4) + exact verification >= 0.5 —
    // must reproduce the exact all-pairs answer (recall ~1 here).
    "minhash_lsh" -> ((s, dir) =>
      DedupOps.minHashLshPairs(documents(s, dir), "doc_id", "text", 3, 0.5)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("j"))
        .orderBy("id_a", "id_b")),

    // SimHash(60-bit, md5-derived) pairs within Hamming distance 3.
    "simhash" -> ((s, dir) =>
      SimHashOps.simHashPairs(
        SimHashOps.simHashChunks(documents(s, dir), "doc_id", "text"), 3)
        .orderBy("id_a", "id_b")),

    // Blocked fuzzy record linkage: documents matched against a
    // deterministically-perturbed copy (one char deleted at a
    // key-dependent position >= 10) via 8-char prefix blocking + Levenshtein
    // <= 2 verification — the classic entity-resolution block→compare→
    // match shape; edit distance is engine-identical so matches replay
    // exactly. 550 matches at sf0.01: every doc recovers its perturbed
    // twin, plus the near-dup cross matches.
    "record_linkage" -> ((s, dir) => {
      val base = documents(s, dir).select(col("doc_id"),
        substring(TextOps.normalize(col("text")), 1, 40).as("nm"))
      val dirty = base.select((col("doc_id") + 10000L).as("did"),
        expr("concat(substring(nm, 1, cast(doc_id % 20 + 10 as int)), " +
          "substring(nm, cast(doc_id % 20 + 12 as int), 100))").as("dn"))
      DedupOps.editDistanceLink(base, "doc_id", "nm", dirty, "did", "dn",
          blockLen = 8, maxDist = 2)
        .orderBy("id_a", "id_b")
    }),

    // Jaro-Winkler linkage over the same blocked candidates: the
    // native codegen'd graft_jaro_winkler expression (byte-level,
    // 0.7-boost semantics pinned to the oracle engine's builtin)
    // scores each block pair; ≥0.9 links survive.
    "jw_linkage" -> ((s, dir) => {
      val base = documents(s, dir).select(col("doc_id"),
        substring(TextOps.normalize(col("text")), 1, 40).as("nm"))
      val dirty = base.select((col("doc_id") + 10000L).as("did"),
        expr("concat(substring(nm, 1, cast(doc_id % 20 + 10 as int)), " +
          "substring(nm, cast(doc_id % 20 + 12 as int), 100))").as("dn"))
      // same bounded block enumeration as editDistanceLink (r16: block
      // purging — a stopword-grade prefix block is dropped loudly
      // instead of going quadratic at scale)
      DedupOps.blockedPairs(base, "doc_id", "nm", dirty, "did", "dn", blockLen = 8)
        .withColumn("jw",
          call_function("graft_jaro_winkler", col("name_a"), col("name_b")))
        .where(col("jw") >= 0.9)
        .select(col("id_a"), col("id_b"), r4(col("jw")).as("jw"))
        .orderBy("id_a", "id_b")
    }),

    // Linkage quality vs the planted truth (twin = id + 10000):
    // precision counts near-dup cross matches as "wrong" — the honest
    // penalty of a corpus with real duplicates — recall is against the
    // 500 planted twins.
    "linkage_eval" -> ((s, dir) => {
      val base = documents(s, dir).select(col("doc_id"),
        substring(TextOps.normalize(col("text")), 1, 40).as("nm"))
      val dirty = base.select((col("doc_id") + 10000L).as("did"),
        expr("concat(substring(nm, 1, cast(doc_id % 20 + 10 as int)), " +
          "substring(nm, cast(doc_id % 20 + 12 as int), 100))").as("dn"))
      val links = DedupOps.editDistanceLink(base, "doc_id", "nm",
        dirty, "did", "dn", blockLen = 8, maxDist = 2)
      val total = base.agg(count(lit(1)).as("n_truth"))
      links.agg(count(lit(1)).as("n_links"),
          sum(when(col("id_b") - 10000L === col("id_a"), 1L).otherwise(0L))
            .as("tp"))
        .crossJoin(broadcast(total))
        .select(col("n_links"), col("tp"), col("n_truth"),
          r4(col("tp").cast("double") / col("n_links")).as("precision"),
          r4(col("tp").cast("double") / col("n_truth")).as("recall"))
    }),

    // Sorted-neighborhood near-dup pairs: the third blocking modality
    // (prefix-sort order + w-window compare, exact token-set Jaccard
    // verification) beside LSH's hash bands and SimHash's pigeonholes.
    // Distributed rank + binned adjacency join — no global sort.
    "sorted_neighbor" -> ((s, dir) =>
      DedupOps.sortedNeighborPairs(documents(s, dir), "doc_id", "text",
          w = 8, threshold = 0.5)
        .select(least(col("id_a"), col("id_b")).as("ia"),
          greatest(col("id_a"), col("id_b")).as("ib"), r4(col("j")).as("j"))
        .withColumnsRenamed(Map("ia" -> "id_a", "ib" -> "id_b"))
        .orderBy("id_a", "id_b")),

    // Dedup-method evaluation: SimHash(≤3) pairs scored against the
    // exact Jaccard ≥ 0.5 truth — measured precision/recall for the
    // approximate near-dup path, the dedup analogue of ann_recall.
    "dedup_eval" -> ((s, dir) => {
      val exact = DedupOps.exactJaccardPairs(
          DedupOps.shingles(documents(s, dir), "doc_id", "text", 3), 0.5)
        .select(col("id_a"), col("id_b"), lit(1L).as("t"))
      val pred = SimHashOps.simHashPairs(
          SimHashOps.simHashChunks(documents(s, dir), "doc_id", "text"), 3)
        .select(col("id_a"), col("id_b"), lit(1L).as("p"))
      exact.join(pred, Seq("id_a", "id_b"), "full")
        .agg(sum(coalesce(col("t"), lit(0L))).as("n_true"),
          sum(coalesce(col("p"), lit(0L))).as("n_pred"),
          sum(when(col("t").isNotNull && col("p").isNotNull, 1L)
            .otherwise(0L)).as("tp"))
        .select(col("n_true"), col("n_pred"), col("tp"),
          r4(col("tp").cast("double") / col("n_pred")).as("precision"),
          r4(col("tp").cast("double") / col("n_true")).as("recall"))
    }),

    // Language-ID heuristic vs the labeled lang column (confusion
    // counts; the synthetic text is English-vocab for every label).
    "lang_id" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("pred", TextOps.langId(col("text")))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")),

    // Per-class precision/recall/F1 of the language-ID heuristic vs the
    // labeled lang column — the classification companion of the
    // retrieval_metrics gate. Classes with zero predictions get NULL
    // precision (undefined) and F1 = 0.
    "classifier_prf" -> ((s, dir) => {
      val pl = documents(s, dir)
        .select(col("lang"), TextOps.langId(col("text")).as("pred"))
      val cls = pl.groupBy(col("lang").as("cls"))
        .agg(count(lit(1)).as("support"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("tp"))
      val pc = pl.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("predicted"))
      val j = cls.join(pc, Seq("cls"), "left")
        .withColumn("predicted", coalesce(col("predicted"), lit(0L)))
      val p = when(col("predicted") > 0,
        col("tp").cast("double") / col("predicted"))
      val r = col("tp").cast("double") / col("support")
      j.select(col("cls"), col("support"), col("predicted"), col("tp"),
          r4(p).as("precision"), r4(r).as("recall"),
          r4(when(col("predicted") > 0 && (p + r) > 0,
              lit(2.0) * p * r / (p + r))
            .otherwise(lit(0.0))).as("f1"))
        .orderBy("cls")
    }),

    // Cohen's kappa of the same prediction vs label: chance-corrected
    // agreement from the confusion-matrix margins — one row of longs +
    // three rounded ratios.
    "cohen_kappa" -> ((s, dir) => {
      val pl = documents(s, dir)
        .select(col("lang"), TextOps.langId(col("text")).as("pred"))
      val cls = pl.groupBy(col("lang").as("cls"))
        .agg(count(lit(1)).as("support"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("tp"))
      val pc = pl.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("predicted"))
      val j = cls.join(pc, Seq("cls"), "left")
        .withColumn("predicted", coalesce(col("predicted"), lit(0L)))
      val t = j.agg(sum(col("support")).as("n"), sum(col("tp")).as("diag"),
        sum(col("support") * col("predicted")).as("xsum"))
      val po = col("diag").cast("double") / col("n")
      val pe = col("xsum").cast("double") / (col("n") * col("n"))
      t.select(col("n"), r4(po).as("po"), r4(pe).as("pe"),
        r4((po - pe) / (lit(1.0) - pe)).as("kappa"))
    }),

    // Reliability diagram of the LR quality classifier: decile buckets
    // of predicted probability vs empirical positive rate — is 0.8
    // really 80%? The calibration check beside classifier_prf's
    // discrimination metrics.
    "lr_calibration" -> ((s, dir) => {
      val docs = documents(s, dir)
      val feat = ClassifierOps.hashFeatures(docs, "doc_id", "text", 32)
        .localCheckpoint()
      val labels = docs.select(col("doc_id").as("id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      val wv = ClassifierOps.lrTrain(feat, labels, 32, 3, 0.1)
      ClassifierOps.lrScore(feat, wv)
        .join(labels, "id")
        .withColumn("b", least(floor(col("p") * 10), lit(9)).cast("long"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), r4(avg(col("p"))).as("mean_p"),
          r4(avg(col("y"))).as("pos_rate"))
        .orderBy("b")
    }),

    // Sliding-window retrieval chunking: 64-token windows at stride 32
    // per document (trailing partials kept), fingerprinted — the
    // passage-builder stage ahead of embedding; chunk_dedup's fixed
    // blocks measure repetition, these overlapping windows feed a
    // retrieval index. Pure per-row array ops: no shuffle at all.
    "chunk_windows" -> ((s, dir) => {
      val chunkTok = 64; val strideTok = 32
      documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .where(col("n") >= 1)
        .select(col("doc_id"), col("toks"),
          explode(expr(s"sequence(0, n - 1, $strideTok)")).as("start"))
        .select(col("doc_id"), col("start").cast("long").as("start"),
          expr(s"slice(toks, start + 1, $chunkTok)").as("chunk"))
        .select(col("doc_id"), col("start"),
          size(col("chunk")).cast("long").as("n_tok"),
          md5(concat_ws(" ", col("chunk"))).as("fp"))
        .orderBy("doc_id", "start")
    }),

    // Quality scoring rolled up per source.
    "quality_score" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("qs", TextOps.qualityScore(col("text")))
        .groupBy("source")
        .agg(r4(avg(col("qs"))).as("avg_qs"), r4(min(col("qs"))).as("min_qs"),
          r4(max(col("qs"))).as("max_qs"), count(lit(1)).as("n"))
        .orderBy("source")),

    // Token statistics + distinct content fingerprints per source.
    // Per-row expressions are projected once (a tokenize per aggregate
    // would re-run the regex splits three times per row).
    "token_stats" -> ((s, dir) =>
      documents(s, dir)
        .select(col("source"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe"),
          TextOps.fingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(
          sum(col("n_tok")).as("sum_tok"),
          sum(col("n_bpe")).as("sum_bpe"),
          max(col("n_tok")).cast("long").as("max_tok"),
          count_distinct(col("fp")).as("nd_fp"))
        .orderBy("source")),

    // Winnowing (rolling-hash) document fingerprints — per-doc
    // signature stats; the XOR checksum pins the exact selected set.
    "winnow_fp" -> ((s, dir) =>
      TextOps.winnowFingerprints(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("fp_min"),
          aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor"))
        .orderBy("doc_id")),

    // Near-dup pairs sharing >= 15 df-capped winnow fingerprints.
    "winnow_pairs" -> ((s, dir) =>
      TextOps.winnowSharedPairs(documents(s, dir), "doc_id", "text",
        k = 8, w = 4, minShared = 15, maxDf = 25)
        .orderBy("id_a", "id_b")),

    // Incremental dedup: the "new batch" (doc_id % 10 >= 8) probes the
    // persisted corpus fingerprint index (doc_id % 10 < 8) — corpus
    // text is never re-read, the batch fingerprints broadcast.
    "incremental_dedup" -> ((s, dir) => {
      val docs = documents(s, dir)
      val corpusIdx = TextOps.winnowFingerprints(
        docs.filter(col("doc_id") % 10 < 8), "doc_id", "text")
      TextOps.incrementalDedupPairs(
        docs.filter(col("doc_id") % 10 >= 8), "doc_id", "text",
        corpusIdx, minShared = 15, maxDf = 25)
        .orderBy("new_id", "corpus_id")
    }),

    // Cluster assignment over the winnowing near-dup pairs: alternating
    // large-star/small-star connected components (min-id representative).
    // Runs through the shared-index pipeline entry (fingerprint once).
    "dedup_clusters" -> ((s, dir) =>
      DedupOps.winnowDedupPipeline(documents(s, dir), "doc_id", "text",
        k = 8, w = 4, minShared = 15, maxDf = 25)
        .clusters
        .orderBy("id")),

    // Corpus after near-dup collapse (cluster minimum survives), rolled
    // up per source — the end-to-end "dedup the training set" answer.
    "dedup_keep" -> ((s, dir) =>
      DedupOps.winnowDedupPipeline(documents(s, dir), "doc_id", "text",
        k = 8, w = 4, minShared = 15, maxDf = 25)
        .survivors
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .orderBy("source")),

    // Gopher-style repetition rule: per-source duplicate-trigram mass
    // (integer sums — hash-exact) + count of documents whose duplicate
    // fraction exceeds 0.2.
    "repetition_stats" -> ((s, dir) =>
      TextOps.trigramStats(documents(s, dir), "source", "text")
        .groupBy("source")
        .agg(sum(col("tt")).as("total_tg"), sum(col("td")).as("distinct_tg"),
          count(when(col("tt") > 0 &&
            (lit(1.0) - col("td") / col("tt")) > 0.2, 1)).as("n_repetitive"))
        .orderBy("source")),

    // Benchmark decontamination: corpus docs (id >= 25) sharing >= 15
    // distinct trigrams with an eval doc (id < 25); eval shingles
    // broadcast, corpus never shuffles.
    "contamination" -> ((s, dir) => {
      val docs = documents(s, dir)
      DedupOps.contaminationPairs(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", 3, 15)
        .orderBy("corp_id", "eval_id")
    }),

    // Bloom-filter decontamination (scale path of `contamination`):
    // the eval shingle set compressed to a 64 Kbit broadcast blob,
    // corpus probed executor-side — false positives are part of the
    // deterministic contract and replay in the oracle's position-set
    // joins, making even the FP noise hash-gated.
    "bloom_contamination" -> ((s, dir) => {
      val docs = documents(s, dir)
      DedupOps.bloomContamination(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", 3, 65536, 4, 15)
        .orderBy("corp_id")
    }),

    // Deterministic train/val/test assignment by content-key hash —
    // membership counts per (source, split) pin every row's label.
    "split_assign" -> ((s, dir) =>
      SampleOps.assignSplit(documents(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("source", "split").agg(count(lit(1)).as("n"))
        .orderBy("source", "split")),

    // Z-order (Morton) layout key: rank-normalize (value → 16-bit
    // grid) and interleave with user_id — the write-path clustering
    // key that lets parquet row-group stats prune on EITHER dimension
    // at 100 TB (llmops/LayoutOps.scala). The gate pins the bit
    // network; locality of the laid-out files is spec-asserted.
    "zorder_values" -> ((s, dir) => {
      import graft.llmops.LayoutOps
      QueryUtil.events(s, dir).select(col("event_id"),
        LayoutOps.zvalue16(
          LayoutOps.quantizeMinMax(col("value"), 0.0, 100.0),
          col("user_id")).as("z"))
        .orderBy("event_id")
    }),

    // Length-bucketed batching stats: 16-token fixed-width buckets,
    // per-bucket doc count / token mass / extremes / padding waste —
    // the pre-training batcher's efficiency view.
    "length_buckets" -> ((s, dir) =>
      SampleOps.lengthBuckets(documents(s, dir), "text", 16)
        .orderBy("bucket_lo")),

    // Deterministic stratified downsampling (domain mixing): exact
    // sampled membership is the gate (doc_id listing, not counts).
    "stratified_sample" -> ((s, dir) =>
      SampleOps.stratifiedSample(documents(s, dir), "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), default = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    // Domain-mixture reweighting: fractions that reshape the 20
    // uniform sources to a skewed 4-source target by downsampling
    // (unlisted sources drop), plus the realized sample counts.
    "mix_sample" -> ((s, dir) => {
      val target = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
      val fr = SampleOps.mixtureFractions(documents(s, dir), "source", target)
      val sampled = SampleOps
        .resampleToMixture(documents(s, dir), "doc_id", "source", target)
        .groupBy("source").agg(count(lit(1)).as("n_sampled"))
      fr.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"), r4(col("fraction")).as("fraction"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // Temperature (α = 0.5) mixture flattening over the naturally
    // skewed lang column: the rarest language keeps everything,
    // over-represented ones downsample by share^(α−1) — plus the
    // realized hash-membership counts.
    "temp_mix" -> ((s, dir) => {
      val fr = SampleOps.temperatureFractions(documents(s, dir), "lang", 0.5)
      val sampled = SampleOps
        .resampleToTemperature(documents(s, dir), "doc_id", "lang", 0.5)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      fr.join(sampled, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), r4(col("fraction")).as("fraction"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("lang")
    }),

    // CCNet-style passage dedup: per-document fraction of 8-word
    // chunks that occur more than once corpus-wide.
    "chunk_dedup" -> ((s, dir) =>
      TextOps.chunkDupStats(documents(s, dir), "doc_id", "text", 8)
        .select(col("id").as("doc_id"), col("n_chunks"), col("dup_chunks"),
          r4(col("dup_frac")).as("dup_frac"))
        .orderBy("doc_id")),

    // Corpus vocabulary statistics: top-20 word bigrams by frequency
    // (ties broken lexicographically — the cut is deterministic).
    "ngram_topk" -> ((s, dir) =>
      TextOps.topBigrams(documents(s, dir), "text", 20)
        .select(col("ngram"), col("n"))
        .orderBy(col("n").desc, col("ngram"))),

    // C4/CCNet cleanup applied (not just measured): duplicated 8-token
    // chunks removed everywhere, text reassembled; md5 pins the
    // reconstruction byte-for-byte.
    "chunk_clean" -> ((s, dir) =>
      TextOps.removeDuplicateChunks(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_kept"),
          length(col("clean_text")).cast("long").as("len_clean"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")),

    // Unigram-LM subword tokenizer (SentencePiece family, Kudo 2018)
    // trained by hard EM — candidate substrings, 2 Viterbi-E /
    // add-one-M iterations, then every distinct word segmented under
    // the final model. The oracle unrolls all THREE Viterbi passes as
    // generated per-position DP CTEs.
    "unigram_segment" -> ((s, dir) => {
      val words = UnigramLm.wordCounts(documents(s, dir), "text").localCheckpoint()
      val model = UnigramLm.train(words, topMulti = 30, iters = 2)
      UnigramLm.segmentWords(words, model)
        .select(col("w"), col("n"), col("pieces"),
          col("n_pieces").cast("long").as("n_pieces"))
        .orderBy("w")
    }),

    // The trained tokenizer APPLIED corpus-wide: per-source fertility
    // (subword pieces per word — the metric tokenizers are judged by).
    // Doc tokens join the distinct-word segmentation table: the corpus
    // never re-runs Viterbi, it joins the 31-row model output.
    "unigram_fertility" -> ((s, dir) => {
      val d = documents(s, dir)
      val words = UnigramLm.wordCounts(d, "text").localCheckpoint()
      val model = UnigramLm.train(words, topMulti = 30, iters = 2)
      val seg = UnigramLm.segmentWords(words, model)
        .select(col("w"), col("n_pieces").cast("long").as("np"))
      d.select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .join(seg, Seq("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"),
          r4(sum(col("np")) / count(lit(1))).as("fertility"))
        .orderBy("source")
    }),

    // The trained model itself: final token log-probs.
    "unigram_vocab" -> ((s, dir) => {
      val words = UnigramLm.wordCounts(documents(s, dir), "text").localCheckpoint()
      val model = UnigramLm.train(words, topMulti = 30, iters = 2)
      import s.implicits._
      model.toDF("tok", "lp")
        .select(col("tok"), r4(col("lp")).as("lp")).orderBy("tok")
    }),

    // Wordlist safety screen with leet folding ("b1g" ≡ "big"): the
    // cheap first-pass filter before the learned classifiers. Flagged
    // docs only, with their sorted distinct hit terms.
    "blocklist_filter" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("hits",
          TextOps.blocklistHits(col("text"), Seq("slow", "b1g", "vector")))
        .filter(size(col("hits")) > 0)
        .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"),
          array_join(array_sort(array_distinct(col("hits"))), ",").as("terms"))
        .orderBy("doc_id")),

    // Exact substring dedup (Lee et al. 2022 shape): OVERLAPPING
    // 12-token rolling windows (vs chunk_clean's aligned 8-token
    // chunks), keep-first across the corpus, overlapping hits merged
    // into maximal spans. Per affected doc: span count + tokens to cut.
    "substr_spans" -> ((s, dir) =>
      DedupOps.substringSpans(documents(s, dir), "doc_id", "text",
          SubstrW, c => md5(c))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("me") - col("ms") + 1).as("dup_tokens"))
        .orderBy("doc_id")),

    // The rewrite side of substr_spans: affected documents with their
    // duplicated spans cut out, pinned byte-for-byte by md5. Documents
    // whose every token sat in a span vanish (delete, don't rewrite).
    "substr_trim" -> ((s, dir) =>
      DedupOps.substringTrim(documents(s, dir), "doc_id", "text",
          SubstrW, c => md5(c))
        .select(col("doc_id"), md5(col("trimmed")).as("trimmed_md5"),
          col("kept_tokens"))
        .orderBy("doc_id")),

    // Sliding-window duplicate-SPAN removal (the Lee et al. substring
    // modality): a duplicated 20-token run is caught at ANY alignment,
    // not just on chunk boundaries; covered tokens drop, md5 pins the
    // rebuilt text byte-for-byte.
    "span_clean" -> ((s, dir) =>
      TextOps.removeDuplicateSpans(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")),

    // Gopher document-shape rules: per-rule measurements + fused keep.
    "gopher_filter" -> ((s, dir) =>
      TextOps.gopherFilter(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tok"),
          r4(col("mean_wlen")).as("mean_wlen"),
          r4(col("alpha_frac")).as("alpha_frac"),
          col("stop_hits"), col("keep"))
        .orderBy("doc_id")),

    // Domain-shift diagnostic: per-source KL divergence from the
    // corpus unigram distribution (no smoothing needed — the corpus
    // contains every slice's support).
    "slice_kl" -> ((s, dir) =>
      TextOps.sliceKlDivergence(documents(s, dir), "source", "text")
        .select(col("slice").as("source"), col("n_tok"), r4(col("kl")).as("kl"))
        .orderBy("source")),

    // Corpus-health vocabulary stats per source: tokens, types, hapax
    // legomena, type/token ratio.
    "vocab_stats" -> ((s, dir) =>
      TextOps.vocabStats(documents(s, dir), "source", "text")
        .select(col("slice").as("source"), col("n_tok"), col("n_types"),
          col("hapax"), col("ttr"))
        .orderBy("source")),

    // BPE tokenizer training, iteration 0: char-level merge-candidate
    // pair counts weighted by word frequency (one corpus pass, then
    // vocab-sized work — llmops/BpeOps.scala).
    "bpe_pairs" -> ((s, dir) =>
      BpeOps.initialPairCounts(documents(s, dir), "text")
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(50)),

    // Greedy BPE training, three merges: the gate pins the full
    // iterate-count-argmax-remerge loop (each step's chosen pair AND
    // its selection-time frequency) against an unrolled SQL replay.
    "bpe_merges" -> ((s, dir) =>
      BpeOps.train(documents(s, dir), "text", 3).orderBy("step")),

    // Perplexity-style quality scoring: unigram-LM negative
    // log-likelihood per document (train on the corpus, score every
    // doc — the CCNet/Gopher filter shape with exact arithmetic).
    "unigram_nll" -> ((s, dir) =>
      TextOps.unigramNll(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tok"), r4(col("nll")).as("nll"))
        .orderBy("doc_id")),

    // Interpolated bigram LM (λ=0.5 bigram + unigram backstop) trained
    // on the corpus, every doc scored by mean transition −ln P — the
    // KenLM-shaped filter one order up from unigram_nll; the bigram
    // model is a JOINED table, not a broadcast (it doesn't fit one at
    // scale), which is what this gate exercises.
    "bigram_nll" -> ((s, dir) =>
      TextOps.bigramNll(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bi"), r4(col("nll")).as("nll"))
        .orderBy("doc_id")),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank on
    // the undirected word co-occurrence graph (adjacent content words,
    // length ≥ 4), top-20 by rounded rank. Same GraphOps.pagerank the
    // session graph uses — the edge aggregation is the only corpus
    // pass; iteration runs on the vocabulary-sized edge table.
    "textrank_keywords" -> ((s, dir) => {
      val toks = graft.SparkTuning.spreadSmallScan(documents(s, dir))
        .select(TextOps.tokens(col("text")).as("arr"))
        .filter(size(col("arr")) >= 2)
      val pairs = toks.select(explode(zip_with(
        slice(col("arr"), lit(1), size(col("arr")) - 1),
        slice(col("arr"), lit(2), size(col("arr")) - 1),
        (p, w) => struct(p.as("p"), w.as("w")))).as("b"))
        .select(col("b.p").as("p"), col("b.w").as("w"))
        .filter(length(col("p")) >= 4 && length(col("w")) >= 4 &&
          col("p") =!= col("w"))
      val und = pairs.select(col("p").as("src"), col("w").as("dst"))
        .unionAll(pairs.select(col("w").as("src"), col("p").as("dst")))
      val e = und.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      graft.operators.GraphOps.pagerank(e, "src", "dst", "n", d = 0.85, iters = 5)
        .select(col("node"), r4(col("r")).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
        .orderBy("node")
    }),

    // k-NN classification over the embedding space: majority label of
    // the brute-force top-3 (ties to the smaller label) — retrieval
    // reused as a classifier, the standard weak-labeler baseline.
    "knn_classify" -> ((s, dir) => {
      val raw = embeddings(s, dir)
      val e = VectorOps.vecs(raw, "vec_id", "embedding")
      val nn = VectorOps.bruteForceTopK(e, e.filter(col("id") < 5), 3)
        .select("qid", "nbr")
      val votes = nn
        .join(raw.select(col("vec_id").as("nbr"), col("label")), "nbr")
        .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("votes").desc, col("label"))
      votes.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("qid"), col("label").cast("long").as("pred"), col("votes"))
        .orderBy("qid")
    }),

    // Kneser–Ney smoothed bigram LM (D=0.75 absolute discount +
    // continuation-probability backoff) — the KenLM-default smoothing;
    // same joined-model scale shape as bigram_nll.
    "kneser_ney_nll" -> ((s, dir) =>
      TextOps.kneserNeyNll(documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bi"), r4(col("nll")).as("nll"))
        .orderBy("doc_id")),

    // URL-level dedup: extract → canonicalize (drop query/fragment,
    // lowercase scheme+host) → group by canonical URL with a min-id
    // survivor — the first (cheapest) dedup stage of a crawl pipeline.
    // URLs are synthesized from doc_id on both sides, mixed-case and
    // query-string-decorated to exercise the canonicalization.
    "url_dedup" -> ((s, dir) => {
      def aug = concat(col("text"),
        lit(" see https://Src"), (col("doc_id") % 7).cast("string"),
        lit(".Example.COM/page/"), (col("doc_id") % 50).cast("string"),
        lit("?utm=x#frag"),
        when(col("doc_id") % 3 === 0,
          lit(" and https://mirror.example.net/x")).otherwise(lit("")))
      val urls = TextOps.extractUrls(aug)
      val first = get(urls, lit(0))
      documents(s, dir)
        .select(col("doc_id"), size(urls).cast("long").as("n_urls"),
          TextOps.urlDomain(first).as("domain"),
          TextOps.canonicalizeUrl(first).as("canon"))
        .groupBy("domain", "canon")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"),
          sum("n_urls").as("n_urls"))
        .orderBy("canon")
    }),

    // Sequence packing (concat-then-split, 512-token sequences): each
    // doc's interval in the packed token stream — the pretraining batch
    // prep op; the corpus-wide running sum is the audited two-pass
    // prefix scan, not a global window.
    "seq_pack" -> ((s, dir) =>
      TextOps.packSequences(documents(s, dir), "doc_id", "text", 512)
        .orderBy("id")),

    // PII scrub: detect + redact synthesized emails/IPs/phones (the
    // corpus itself is PII-free, so both sides append deterministic
    // PII derived from doc_id and the gate checks detection counts and
    // the md5 of the redacted text).
    "pii_redact" -> ((s, dir) => {
      def aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com via 10.1.2."), (col("doc_id") % 256).cast("string"),
        lit(" or +14155550"), lpad((col("doc_id") % 100).cast("string"), 3, "0"))
      documents(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"),
          TextOps.piiCount(aug, TextOps.EmailRe).cast("long").as("n_email"),
          TextOps.piiCount(aug, TextOps.Ipv4Re).cast("long").as("n_ip"),
          TextOps.piiCount(aug, TextOps.PhoneRe).cast("long").as("n_phone"),
          md5(TextOps.redactPii(aug)).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // BM25 keyword retrieval: top-10 documents for a fixed query —
    // keyword-targeted corpus slicing without an embedding model.
    "bm25_topk" -> ((s, dir) =>
      TextOps.bm25TopK(documents(s, dir), "doc_id", "text",
        Seq("spark", "vector", "query"), 10)
        .select(col("doc_id"), r4(col("score")).as("score"))
        .orderBy(col("doc_id"))),

    // Keyword extraction: top-5 TF-IDF terms per source slice.
    "tfidf_terms" -> ((s, dir) =>
      TextOps.tfidfTopTerms(documents(s, dir), "doc_id", "source", "text", 5)
        .select(col("slice").as("source"), col("rank"), col("term"),
          r4(col("tfidf")).as("tfidf"))
        .orderBy("source", "rank")),

    // Brute-force cosine top-3 for query vectors 0..4.
    "ann_brute" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.bruteForceTopK(e, e.filter(col("id") < 5), 3)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Filtered vector search: metadata predicate (label = 1) prunes the
    // corpus BEFORE similarity ranking — the filter-then-rank serving
    // shape (attribute filters push to the scan; only survivors are
    // scored). Composes existing pieces: relational filter + broadcast
    // query × candidate cosine top-k.
    "ann_filtered" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val lbl = embeddings(s, dir).select(col("vec_id").as("id"), col("label"))
      val corpus = e.join(lbl, "id").filter(col("label") === 1).select("id", "v")
      VectorOps.bruteForceTopK(corpus, e.filter(col("id") < 5), 3)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Hard-negative mining: per query the 5 most-similar CROSS-label
    // vectors under a 0.95 ceiling — the contrastive-training
    // counterpart of ann_filtered's same-label serving shape.
    "hard_negatives" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
        .join(embeddings(s, dir).select(col("vec_id").as("id"), col("label")),
          "id")
      VectorOps.hardNegatives(e, e.filter(col("id") < 5), k = 5,
          maxCos = 0.95)
        .select(col("qid"), col("rank"), col("nbr"), col("nbr_label"),
          r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Canonical doc per near-dup cluster: the winnow-CC clusters keep
    // their LONGEST member (tie: min doc id) instead of dedup_keep's
    // min-id rule — the curation policy that keeps the most complete
    // copy of a duplicated page.
    "cluster_canonical" -> ((s, dir) => {
      val cl = DedupOps.winnowDedupPipeline(documents(s, dir), "doc_id",
        "text", k = 8, w = 4, minShared = 15, maxDf = 25).clusters
      cl.join(documents(s, dir), cl("id") === col("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          max(struct(col("n_chars").as("q"), (-col("doc_id")).as("nid")))
            .as("m"))
        .select(col("cluster_id"), (-col("m.nid")).as("kept_doc"),
          col("m.q").as("kept_chars"), col("size"))
        .orderBy("cluster_id")
    }),

    // IVF top-3 (8 seed centroids, nprobe 2) — the bucketed scale path;
    // oracle replicates the same assignment + probing.
    "ann_ivf" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.ivfTopK(e, e.filter(col("id") < 8), e.filter(col("id") < 5), 3, 2)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // IVF with k-means-TRAINED centroids (deterministic sample
    // id % 5 = 0, k = 8, 2 Lloyd iterations) — the full 100 TB ANN
    // path: train on a sample → bucket the corpus → probe. The oracle
    // unrolls the same two Lloyd iterations in SQL.
    "ann_ivf_trained" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val cent = VectorOps.trainIvfCentroids(e.filter(col("id") % 5 === 0), 8, 2)
      VectorOps.ivfTopK(e, cent, e.filter(col("id") < 5), 3, 2)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Product-quantization ANN (4 subspaces × 8 codes, cosine-ADC):
    // vectors compress to 4 code bytes and queries score the corpus
    // through a broadcast lookup table without touching any original
    // vector — the 100 TB MEMORY path (128× compression here). The
    // oracle replays the per-subspace Lloyd schedule and the fixed-
    // association ADC sum bit-for-bit.
    "ann_pq" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val cb = VectorOps.pqTrain(e.filter(col("id") % 5 === 0), 4, 64, 8, 2)
      val codes = VectorOps.pqEncode(e, cb, 4, 64)
      VectorOps.pqTopK(codes, cb, e.filter(col("id") < 5), 3, 4, 64)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // IVFADC: coarse IVF pruning composed with PQ/ADC rescoring — the
    // trillion-vector production shape. Queries touch only the pruned
    // lists' codes + two metadata-sized broadcasts; original vectors
    // never enter the scoring path.
    "ann_ivf_pq" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val sample = e.filter(col("id") % 5 === 0)
      val coarse = VectorOps.trainIvfCentroids(sample, 8, 2)
      val index = VectorOps.ivfAssign(e, coarse).select("id", "cid")
      val cb = VectorOps.pqTrain(sample, 4, 64, 8, 2)
      val codes = VectorOps.pqEncode(e, cb, 4, 64)
      VectorOps.ivfPqTopK(index, coarse, codes, cb, e.filter(col("id") < 5), 3, 2, 4, 64)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Dataset card: the one-row corpus summary a curation pipeline
    // publishes with a release — size, token mass, near-dup rate via
    // canonical fingerprints, language-distribution entropy (nats,
    // lang-ordered fold), mean heuristic quality. Pure composition of
    // gated pieces; every number exact or 4dp-pinned.
    "dataset_card" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
        TextOps.tokenSetFingerprint(col("text")).as("fp"),
        TextOps.qualityScore(col("text")).as("qs"))
      val lc = d.groupBy("lang").agg(count(lit(1)).cast("double").as("n"))
      val tot = lc.agg(sum("n").as("nn"))
      val ent = lc.crossJoin(broadcast(tot))
        .withColumn("t", -(col("n") / col("nn")) * log(col("n") / col("nn")))
        .agg(aggregate(
          array_sort(collect_list(struct(col("lang"), col("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("lang_entropy"))
      d.agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        count_distinct(col("fp")).as("n_unique"),
        r4(avg(col("qs"))).as("avg_quality"))
        .crossJoin(ent)
        .select(col("n_docs"), col("n_tokens"), col("n_unique"),
          r4(lit(1.0) - col("n_unique") / col("n_docs")).as("dup_rate"),
          col("avg_quality"), r4(col("lang_entropy")).as("lang_entropy"))
    }),

    // Deterministic global shuffle into 8 shards: md5-uniform shard +
    // within-shard rank — the trainer-facing corpus ordering step.
    // Full (doc, shard, pos) listing keeps the gate order-exact.
    "shard_shuffle" -> ((s, dir) =>
      SampleOps.shardShuffle(documents(s, dir), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")),

    // HTML boilerplate strip: synthesized page chrome (script/style/
    // tags/entities) around each doc must come back out byte-exact.
    "html_strip" -> ((s, dir) => {
      val page = concat(
        lit("<HTML><head><title>T</title><style type=\"text/css\">p { color: red; }</style></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><script>var x = 1 < 2 && doc;</script><p>&amp; more &lt;tags&gt;&nbsp;end</p></body></html>"))
      documents(s, dir)
        .select(col("doc_id"), TextOps.stripHtml(page).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("h"),
          length(col("clean")).cast("long").as("len"))
        .orderBy("doc_id")
    }),

    // Per-dimension embedding standardization (6dp-rounded moments as
    // plan literals; zero-variance dims → 0) — whitening-lite.
    "embed_standardize" -> ((s, dir) =>
      VectorOps.standardize(
        VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding"), 64)
        .select(col("id").as("vec_id"), posexplode(col("z")).as(Seq("i", "z")))
        // + 0.0 collapses −0.0 (a rounded tiny negative) to +0.0 —
        // the family's signed-zero normalization, both sides
        .select(col("vec_id"), col("i"), (r4(col("z")) + lit(0.0)).as("z"))
        .orderBy("vec_id", "i")),

    // Composed curation pipeline: unigram-LM scores → corpus 0.9
    // quantile threshold → keep the fluent 90%, rolled up per source —
    // the score-then-threshold filter shape end to end.
    "quality_filter" -> ((s, dir) => {
      val nll = TextOps.unigramNll(documents(s, dir), "doc_id", "text")
      val thr = nll.agg(percentile(col("nll"), lit(0.9)).as("thr"))
      val kept = nll.crossJoin(broadcast(thr)).filter(col("nll") < col("thr"))
      kept.join(documents(s, dir).select(col("doc_id").as("id"), col("source")), "id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          r4(aggregate(
            array_sort(collect_list(struct(col("id"), col("nll")))),
            lit(0.0), (a, x) => a + x.getField("nll")) / count(lit(1)))
            .as("avg_nll"))
        .orderBy("source")
    }),

    // Logistic-regression quality classifier: md5-hashed bag-of-words
    // (32 buckets + intercept), 3 full-batch GD iterations at lr=0.1
    // against the lang='en' label, every doc scored with the trained
    // weights — the fastText-filter shape with exact arithmetic. The
    // oracle unrolls all three iterations (margin fold, sigmoid
    // residual, 6dp-rounded gradient, weight update) in SQL.
    "lr_quality" -> ((s, dir) => {
      val docs = documents(s, dir)
      val feat = ClassifierOps.hashFeatures(docs, "doc_id", "text", 32)
        .localCheckpoint()
      val labels = docs.select(col("doc_id").as("id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      val wv = ClassifierOps.lrTrain(feat, labels, 32, 3, 0.1)
      ClassifierOps.lrScore(feat, wv)
        .select(col("id").as("doc_id"), r4(col("p")).as("p"),
          (col("p") > 0.5).as("pred"))
        .orderBy("doc_id")
    }),

    // PCA projection: covariance pass + 8 deterministic power
    // iterations × 2 Hotelling-deflated components, then per-vector
    // scores — the data-aware reduction next to rp_project. The
    // oracle regenerates means/covariance (rounded 6dp, the moment-
    // rounding trick) and unrolls every iteration in SQL.
    "pca_project" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val (mean, comps, _) = VectorOps.pcaTrain(e, 64, 2, 8)
      VectorOps.pcaProject(e, mean, comps)
        .select(col("id").as("vec_id"), posexplode(col("p")).as(Seq("k", "s")))
        .select(col("vec_id"), col("k"), r4(col("s")).as("s"))
        .orderBy("vec_id", "k")
    }),

    // Signed random projection (JL): 64 → 16 dims through the
    // md5-derived ±1 matrix — training-free reduction feeding the ANN
    // family; scan-stage HOFs only, no shuffle. Oracle rebuilds the
    // matrix and folds each coordinate in the same i order.
    "rp_project" -> ((s, dir) =>
      VectorOps.randomProject(
        VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding"), 64, 16)
        .select(col("id").as("vec_id"), posexplode(col("p")).as(Seq("j", "pv")))
        .select(col("vec_id"), col("j"), r4(col("pv")).as("pv"))
        .orderBy("vec_id", "j")),

    // Matryoshka prefix ANN: 16-dim prefix index ranks a shortlist of
    // 30, full vectors fetched by id-join and exact-rescored — the
    // training-free 4× scan cut for MRL-style embeddings.
    "ann_matryoshka" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.matryoshkaTopK(e, e.filter(col("id") < 5), 3, 30, 16)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // LSH-bucketed ANN (4 random hyperplanes, Hamming-1 multiprobe) —
    // oracle replicates the md5-derived hyperplane family bit-for-bit.
    "ann_lsh" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.lshTopK(e, e.filter(col("id") < 5), 3, 4, 64)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Int8 scalar quantization ANN: the 8×-memory-cut serving path
    // (codes replace doubles; cosine is per-vector-scale-invariant so
    // scoring runs on raw codes). Oracle replays the same
    // quantize-then-score arithmetic.
    "ann_int8" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.int8TopK(e, e.filter(col("id") < 5), 3)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Binary-hash ANN: packed sign-bit signatures, Hamming shortlist of
    // 30, exact cosine rescore — the 64× compression extreme. Oracle
    // replays the (integer-exact) sign/Hamming chain unpacked.
    "ann_binary" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.binaryTopK(e, e.filter(col("id") < 5), 3, 30, 64)
        .select(col("qid"), col("rank"), col("nbr"), r4(col("cos")).as("cos"))
        .orderBy("qid", "rank")
    }),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    // ranking and a cosine ANN ranking — rank-space combination needs
    // no score calibration between the two retrievers. The bm25 rank
    // derives from a broadcast better-than self-join (20 rows), not a
    // global window.
    "hybrid_rrf" -> ((s, dir) => {
      val bm = TextOps.bm25TopK(documents(s, dir), "doc_id", "text",
        Seq("spark", "vector", "query"), 20)
      val a = bm.select(col("doc_id").as("id"), col("score"))
      val b = a.select(col("id").as("id2"), col("score").as("score2"))
      val bmRank = a.join(broadcast(b),
          col("score2") > col("score") ||
            (col("score2") === col("score") && col("id2") < col("id")), "left")
        .groupBy("id").agg((count(col("id2")) + 1).as("rank"))
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val ann = VectorOps.bruteForceTopK(e, e.filter(col("id") === 0), 20)
        .select(col("nbr").as("id"), col("rank"))
      VectorOps.rrfFuse(Seq(bmRank, ann), 10)
        .select(col("id"), r4(col("score")).as("score"))
        .orderBy("id")
    }),

    // DSIR importance weights: per-doc target-vs-corpus unigram
    // log-likelihood ratio (target = the en slice), length-normalized —
    // the select-like-the-target curation knob, exact arithmetic.
    "dsir_weights" -> ((s, dir) =>
      TextOps.dsirWeights(documents(s, dir), "doc_id", "text",
        col("lang") === "en")
        .select(col("id").as("doc_id"), col("n_tok"), r4(col("w")).as("w"))
        .orderBy("doc_id")),

    // Multinomial Naive Bayes curation classifier: train class token
    // models on the hash-split train docs, score the val docs — exact
    // smoothed-log-likelihood arithmetic with term-ordered folds, so
    // the oracle reproduces every posterior to the bit.
    "nb_classify" -> ((s, dir) => {
      val sp = SampleOps.assignSplit(documents(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.2))
      TextOps.nbClassify(
        sp.filter(col("split") === "train"), sp.filter(col("split") === "val"),
        "doc_id", "source", "text")
        .select(col("id").as("doc_id"), col("label_true").as("source"),
          col("pred"), r4(col("logp")).as("logp"))
        .orderBy("doc_id")
    }),

    // SemDeDup (cluster-then-dedup): semantic near-dup removal with the
    // pair search bounded to WITHIN k-means clusters — n²/k instead of
    // n², the published semantic-dedup scale shape. Same trained
    // centroids as ann_ivf_trained (the oracle replays the two Lloyd
    // iterations), pairs ≥ 0.4 connect into components, min-id survives.
    "semantic_dedup" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val cent = VectorOps.trainIvfCentroids(e.filter(col("id") % 5 === 0), 8, 2)
      VectorOps.semDedup(e, cent, 0.4).orderBy("id")
    }),

    // Sampled mean-silhouette of the trained IVF clustering: per probe
    // point, own-cluster cohesion a vs nearest-other-cluster
    // separation b — the internal clustering validation beside
    // ann_recall's retrieval truth (same centroid training as
    // embed_drift: id%10 sample, k=8, 2 Lloyd iterations).
    "silhouette" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val cent = VectorOps.trainIvfCentroids(e.filter(col("id") % 10 === 0), 8, 2)
      val assigned = VectorOps.ivfAssign(e, cent)
      val probe = assigned.where(col("id") < 100)
      VectorOps.silhouette(assigned, probe)
        // + 0.0 AFTER rounding: a ratio in (−5e-5, 0) rounds to −0.0,
        // and the two engines can land on opposite zero signs
        .select(col("pid").as("id"), r4(col("a")).as("a"),
          r4(col("b")).as("b"), (r4(col("s")) + lit(0.0)).as("s"))
        .orderBy("id")
    }),

    // SEMANTIC drift: the PSI monitor lifted to embedding space —
    // train centroids on the reference half, assign BOTH halves with
    // the compiled kernel, score the cluster-occupancy shift as a
    // categorical PSI. Catches topic drift that no per-column
    // histogram sees; the monitor state is k cluster counters.
    "embed_drift" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val ref = e.filter(col("id") % 2 === 0)
      val cur = e.filter(col("id") % 2 === 1)
      val cent = VectorOps.trainIvfCentroids(e.filter(col("id") % 10 === 0), 8, 2)
      graft.operators.DriftOps.categoricalDrift(
        VectorOps.ivfAssign(ref, cent).select("cid"),
        VectorOps.ivfAssign(cur, cent).select("cid"), "cid")
        .select(col("bucket").as("cid"), col("n_ref"), col("n_cur"),
          r4(col("p_ref")).as("p_ref"), r4(col("p_cur")).as("p_cur"),
          r4(col("contrib")).as("contrib"))
        .orderBy("cid")
    }),

    // Embedding-space pruning extremes: per trained cluster, the 3
    // farthest-from-centroid members (outlier/noise screen) and the 3
    // closest (SSL-prototype redundancy screen) — rank-based, so
    // integer-deterministic and SQL-exact.
    "embed_extremes" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      val cent = VectorOps.trainIvfCentroids(e.filter(col("id") % 5 === 0), 8, 2)
      VectorOps.clusterExtremes(VectorOps.ivfAssign(e, cent), cent, 3)
        .select(col("cid"), col("id"), r4(col("ccos")).as("ccos"),
          col("r_out"), col("r_proto"))
        .orderBy("cid", "id")
    }),

    // Approximation-quality measurement for every approximate ANN path
    // against the exact brute scan: strict recall@3 (top-3 set overlap)
    // AND shortlist recall (true top-3 found in the 30-length ADC/
    // bucket shortlist — the serving metric: PQ shortlists, exact
    // rescoring recovers order). A 32-code PQ variant pins the
    // codebook-size knob a real deployment turns. The oracle replays
    // each approximate chain bit-exactly (the same SQL the per-method
    // gates pin), so the recall numbers are hash-gated measurements:
    // the 100 TB serving paths don't just "work", they are exactly
    // this good on the gate corpus.
    "ann_recall" -> ((s, dir) => {
      // the corpus and training sample are read by EVERY method chain
      // (8 index builds + 3 trainings + the brute truth): persist both
      // so the 11 consumers scan memory instead of re-reading parquet
      // and re-casting to array<double> each time (A/B at sf0.1:
      // 15.6 s → 6.0 s min-rep). Spark's cache manager dedupes by
      // plan, so bench reps don't re-cache.
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding").persist()
      val q = e.filter(col("id") < 5)
      val sample = e.filter(col("id") % 5 === 0).persist()
      val brute = VectorOps.bruteForceTopK(e, q, 3).select("qid", "nbr")
        .localCheckpoint() // 15 rows; consumed by all 10 aggregations
      // the three trainings, then the eight method chains, are fully
      // independent driver-side job sequences — run each on its own
      // thread so the wall is the slowest CHAIN, not the sum of ~11
      // sequential small jobs (the post-kernel profile was pure
      // job-launch latency; results are unchanged — every chain is
      // deterministic on its own)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      e.count() // materialize the shared cache once, before the fan-out
      val fCoarse = Future(VectorOps.trainIvfCentroids(sample, 8, 2))
      val fCb = Future(VectorOps.pqTrain(sample, 4, 64, 8, 2))
      val fCb32 = Future(VectorOps.pqTrain(sample, 4, 64, 32, 2))
      val coarse = Await.result(fCoarse, Duration.Inf)
      val cb = Await.result(fCb, Duration.Inf)
      val cb32 = Await.result(fCb32, Duration.Inf)
      val codes = VectorOps.pqEncode(e, cb, 4, 64)
      val codes32 = VectorOps.pqEncode(e, cb32, 4, 64)
      val index = VectorOps.ivfAssign(e, coarse).select("id", "cid")
      // one top-30 per method (ranking is deterministic, so top-3 is
      // its prefix); checkpointed — ≤150 rows — so the two k-consumers
      // don't re-run the training chains
      val methods = Await.result(Future.sequence(Seq(
        "ivf" -> VectorOps.ivfTopK(e, e.filter(col("id") < 8), q, 30, 2),
        "ivf_pq" -> VectorOps.ivfPqTopK(index, coarse, codes, cb, q, 30, 2, 4, 64),
        "lsh" -> VectorOps.lshTopK(e, q, 30, 4, 64),
        "pq" -> VectorOps.pqTopK(codes, cb, q, 30, 4, 64),
        "pq32" -> VectorOps.pqTopK(codes32, cb32, q, 30, 4, 64),
        "int8" -> VectorOps.int8TopK(e, q, 30),
        "binary" -> VectorOps.binaryTopK(e, q, 30, 30, 64),
        "matryoshka" -> VectorOps.matryoshkaTopK(e, q, 30, 30, 16))
        .map { case (n, df) => Future(
          n -> df.select("qid", "nbr", "rank").localCheckpoint()) }),
        Duration.Inf)
      (for ((name, df) <- methods; k <- Seq(3, 30)) yield {
        df.filter(col("rank") <= k).select("qid", "nbr")
          .join(brute, Seq("qid", "nbr"))
          .agg(count(lit(1)).as("hits")) // global agg: 0-hit still yields a row
          .select(lit(name).as("method"), lit(k.toLong).as("k"), col("hits"),
            lit(15L).as("total"), r4(col("hits") / 15.0).as("recall"))
      }).reduce(_ unionAll _).orderBy("method", "k")
    }),

    // Rank-quality metrics beyond recall: MRR and NDCG@10 against the
    // brute-force truth (binary relevance = membership in the true
    // top-3) for the three training-free compressed serving paths.
    // NDCG uses the natural-log discount — the DCG/IDCG ratio is
    // log-base-invariant, and ln avoids pairing two engines' log2
    // implementations. Truth is 15 rows, localCheckpointed once.
    "retrieval_metrics" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding").persist()
      val q = e.filter(col("id") < 5)
      val brute = VectorOps.bruteForceTopK(e, q, 3).select("qid", "nbr")
        .withColumn("rel", lit(1.0)).localCheckpoint()
      val idcg = lit(1.0) / log(lit(2.0)) + lit(1.0) / log(lit(3.0)) +
        lit(1.0) / log(lit(4.0))
      Seq(
        "binary" -> VectorOps.binaryTopK(e, q, 10, 30, 64),
        "int8" -> VectorOps.int8TopK(e, q, 10),
        "lsh" -> VectorOps.lshTopK(e, q, 10, 4, 64))
        .map { case (name, df) =>
          df.filter(col("rank") <= 10)
            .join(brute, Seq("qid", "nbr"), "left")
            .na.fill(0.0, Seq("rel"))
            .groupBy("qid")
            .agg(sum(col("rel") / log(col("rank") + lit(1.0))).as("dcg"),
              max(when(col("rel") === 1.0, lit(1.0) / col("rank"))
                .otherwise(lit(0.0))).as("rr"))
            .agg(avg(col("rr")).as("a_rr"), avg(col("dcg") / idcg).as("a_ndcg"))
            .select(lit(name).as("method"), r4(col("a_rr")).as("mrr"),
              r4(col("a_ndcg")).as("ndcg"))
        }.reduce(_ unionAll _).orderBy("method")
    }),

    // Embedding near-dup: all pairs with cosine >= 0.45.
    "cos_threshold" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      VectorOps.cosineThresholdPairs(e, 0.45)
        .select(col("id_a"), col("id_b"), r4(col("cos")).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // Embedding-space near-dup clusters: connected components over the
    // cosine-threshold pair list — the same star-contraction operator
    // the text path uses, composed with the block-pair cosine join.
    "embedding_clusters" -> ((s, dir) => {
      val e = VectorOps.vecs(embeddings(s, dir), "vec_id", "embedding")
      DedupOps.connectedComponents(
        VectorOps.cosineThresholdPairs(e, 0.45))
        .orderBy("id")
    }),

    // Multimodal plumbing (deterministic synthetic media; stub codec —
    // no SQL oracle, rows-only check; full assertions live in
    // MultimodalSpec).
    "media_frames" -> ((s, _) =>
      MultimodalOps.sampleFrames(MultimodalOps.syntheticMedia(s, 60), 250)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")),

    // sum/max, not avg: the stub features live on a 1e-3 grid, so an
    // avg over 20 assets lands exactly on r4's .00005 half-boundary for
    // half the possible sums — sum (1e-3 grid) and max (single value)
    // never touch a boundary.
    "media_features" -> ((s, _) =>
      MultimodalOps.extractFeatures(MultimodalOps.syntheticMedia(s, 60), 8)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          r4(sum(element_at(col("features"), 1))).as("sum_f0"),
          r4(max(element_at(col("features"), 1))).as("max_f0"))
        .orderBy("kind")),

    // REAL image decode: payloads are genuine PNG bytes (encoded from a
    // closed-form pixel formula), decoded executor-side with the JRE's
    // javax.imageio; the oracle recomputes the same stats from the
    // formula — PNG losslessness makes them equal exactly.
    "media_decode" -> ((s, _) =>
      MultimodalOps.decodeImageStats(MultimodalOps.syntheticImages(s, 24))
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("r_mean")).as("r_mean"),
          r4(col("g_mean")).as("g_mean"),
          r4(col("b_mean")).as("b_mean"))
        .orderBy("media_id")),
    // audio twin of media_decode: REAL WAV bytes (16-bit PCM encodings
    // of a closed-form integer waveform), decoded executor-side with
    // the JRE's javax.sound.sampled; the oracle recomputes the stats
    // from the waveform formula — PCM losslessness makes them equal.
    "media_audio" -> ((s, _) =>
      MultimodalOps.decodeAudioStats(MultimodalOps.syntheticAudio(s, 18))
        .select(col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("frames").as("frames"),
          col("duration_ms").as("duration_ms"),
          r4(col("rms")).as("rms"),
          col("peak").cast("long").as("peak"))
        .orderBy("media_id")),

    // video container-header parse: payloads are genuine MP4 moov /
    // AVI avih header bytes built from a closed-form formula; Spark
    // walks the real container structure executor-side, the oracle
    // recomputes the fields from the formula (the header encode is
    // lossless for every parsed field). Frame decode stays stubbed —
    // this is the metadata pass a curation pipeline runs first.
    "media_video" -> ((s, _) =>
      MultimodalOps.decodeVideoStats(MultimodalOps.syntheticVideo(s, 20))
        .select(col("media_id"), col("container"),
          col("duration_ms"),
          col("tracks").cast("long").as("tracks"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy("media_id")),

    // REAL video frame decode: payloads are complete uncompressed AVI
    // files (RIFF hdrl/strl/strf + movi 00db DIB frames) rendered from
    // a closed-form pixel formula; Spark walks the real container and
    // decodes real BGR bottom-up pixel rows executor-side, the oracle
    // recomputes the per-frame channel means from the formula (BI_RGB
    // is lossless). Compressed codecs remain on the documented stub.
    "media_video_frames" -> ((s, _) =>
      MultimodalOps.decodeVideoFrames(MultimodalOps.syntheticVideoFrames(s, 12))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("r_mean")).as("r_mean"),
          r4(col("g_mean")).as("g_mean"),
          r4(col("b_mean")).as("b_mean"))
        .orderBy("media_id", "frame_idx")),

    // REAL MJPEG frame decode: `00dc` chunks carry genuine JPEGs
    // (JRE ImageIO both ways) inside the same RIFF walker — the most
    // common legacy-AVI codec, previously the stub's biggest slice.
    // JPEG is lossy, so there is no formula-replay SQL oracle: this
    // gate is rows-plus-structure (frame counts and extents are
    // container facts), and MultimodalSpec pins decode determinism
    // and closeness to the flat source colors.
    "media_mjpeg_frames" -> ((s, _) =>
      MultimodalOps.decodeVideoFrames(MultimodalOps.syntheticMjpegVideos(s, 12))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          max(col("width").cast("long")).as("width"),
          max(col("height").cast("long")).as("height"))
        .orderBy("media_id")),

    // REAL H.264 keyframe decode: payloads are conformant Annex B
    // baseline streams (SPS/PPS/IDR, I_PCM seed + Intra_16x16 DC
    // prediction + CAVLC-coded DC residuals) authored by construction;
    // Spark runs the cleanroom decoder (NAL → CAVLC → dequant → IDCT →
    // prediction) executor-side, and the oracle recomputes every
    // expected mean from the SPEC'S OWN integer dequant arithmetic in
    // SQL — the decoder and the oracle share no code.
    // the same streams carried in a REAL MP4 (ISO-BMFF) container:
    // avcC holds SPS/PPS, samples are 4-byte-length-prefixed NALs
    // indexed by stsz/stco — the demuxer walks genuine box structure
    // back to the elementary stream; same spec-arithmetic oracle
    "media_mp4_h264" -> ((s, _) =>
      MultimodalOps.decodeH264Frames(
        MultimodalOps.syntheticH264Videos(s, 12, mp4 = true))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("y_mean")).as("y_mean"),
          r4(col("cb_mean")).as("cb_mean"),
          r4(col("cr_mean")).as("cr_mean"))
        .orderBy("media_id", "frame_idx")),

    // Intra_4x4 prediction (r14, the r13 verdict's codec-boundary
    // expansion): MB1 decodes block-by-block through the I_NxN path —
    // most-probable-mode syntax, H/V/DC per-block prediction from
    // RECONSTRUCTED neighbours, me()-coded CBP, full 16-coeff CAVLC
    // residuals. The oracle replays the per-block value recurrence
    // v = pred + ((c·normAdjust) << (qp/6) + 32) >> 6 with a recursive
    // CTE — zero decoder code in the loop.
    "media_h264_i4x4" -> ((s, _) =>
      MultimodalOps.decodeH264Frames(MultimodalOps.syntheticH264I4x4Videos(s, 12))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("y_mean")).as("y_mean"),
          r4(col("cb_mean")).as("cb_mean"),
          r4(col("cr_mean")).as("cr_mean"))
        .orderBy("media_id", "frame_idx")),

    // Intra16x16 PLANE + chroma PLANE prediction (r14): the gradient
    // fit over linear PCM seeds continues the plane exactly, so the
    // oracle is the plane's own mean — base + 15.5(sx+sy) — with zero
    // codec arithmetic at all.
    "media_h264_plane" -> ((s, _) =>
      MultimodalOps.decodeH264Frames(MultimodalOps.syntheticH264PlaneVideos(s, 12))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("y_mean")).as("y_mean"),
          r4(col("cb_mean")).as("cb_mean"),
          r4(col("cr_mean")).as("cr_mean"))
        .orderBy("media_id", "frame_idx")),

    // the same I_4x4 streams carried in real MP4 boxes — demux x I_NxN
    // composition; identical oracle (the container is lossless)
    "media_mp4_i4x4" -> ((s, _) =>
      MultimodalOps.decodeH264Frames(
        MultimodalOps.syntheticH264I4x4Videos(s, 12, mp4 = true))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("y_mean")).as("y_mean"),
          r4(col("cb_mean")).as("cb_mean"),
          r4(col("cr_mean")).as("cr_mean"))
        .orderBy("media_id", "frame_idx")),

    "media_h264_frames" -> ((s, _) =>
      MultimodalOps.decodeH264Frames(MultimodalOps.syntheticH264Videos(s, 12))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          r4(col("y_mean")).as("y_mean"),
          r4(col("cb_mean")).as("cb_mean"),
          r4(col("cr_mean")).as("cr_mean"))
        .orderBy("media_id", "frame_idx")),

    // Perceptual image fingerprints: REAL PNG decode → integer 8×8
    // block-luma aHash (no floats anywhere), pinned bit-for-bit — the
    // oracle recomputes every block sum from the generator's pixel
    // formula and packs the same 64 bits.
    "image_phash" -> ((s, _) =>
      MultimodalOps.imageAHash(MultimodalOps.syntheticImageDups(s, 24))
        .select(col("media_id"), col("phash"))
        .orderBy("media_id")),

    // Perceptual near-dup pairs: brightness-shifted re-renders hash
    // identically (hd 0) and surface through the pigeonhole chunk join;
    // the oracle brute-forces Hamming over the formula bits — equal by
    // the pigeonhole exactness argument (hd ≤ 3 ⇒ some 16-bit chunk
    // agrees), the minhash_lsh-style oracle discipline.
    "image_phash_pairs" -> ((s, _) =>
      MultimodalOps.aHashPairs(
        MultimodalOps.imageAHash(MultimodalOps.syntheticImageDups(s, 24))
          .select(col("media_id").as("id"), col("phash")), 3)
        .orderBy("id_a", "id_b"))
  )

  private def w(s: String) = s.stripMargin

  /** The lr_quality oracle, generated: md5-bucketed count features
    * (+ intercept row f=32), then 3 gradient-descent iterations
    * unrolled as (margin, residual, gradient, weight) CTE quadruples —
    * gradients rounded 6dp exactly like ClassifierOps.lrTrain.
    */
  private def lrOracleSql: String = {
    val iters = 3
    val fold = "(a, b) -> a + b"
    val hx = "strpos('0123456789abcdef', substring(md5(term), %d, 1)) - 1"
    val sb = new StringBuilder
    sb ++= "WITH lab AS MATERIALIZED (SELECT doc_id AS id, " +
      "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents),\n"
    sb ++= "feat AS MATERIALIZED (\n" +
      "  SELECT id, f, CAST(count(*) AS DOUBLE) AS x FROM (\n" +
      s"    SELECT doc_id AS id, CAST(((((${hx.format(1)}) * 16 + (${hx.format(2)})) * 16 + (${hx.format(3)})) * 16 + (${hx.format(4)})) AS INTEGER) % 32 AS f\n" +
      s"    FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents))\n" +
      "  GROUP BY 1, 2\n" +
      "  UNION ALL SELECT doc_id AS id, 32 AS f, 1.0 AS x FROM documents),\n"
    sb ++= "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),\n"
    sb ++= "wr0 AS (SELECT unnest(range(0, 33)) AS f, 0.0 AS w)"
    for (t <- 1 to iters) {
      sb ++= s",\nz$t AS MATERIALIZED (SELECT d.id, list_reduce(list_prepend(0.0," +
        s" list(d.x * w.w ORDER BY d.f)), $fold) AS z" +
        s" FROM feat d JOIN wr${t - 1} w ON w.f = d.f GROUP BY d.id)"
      sb ++= s",\nr$t AS MATERIALIZED (SELECT z.id," +
        s" 1.0 / (1.0 + exp(-z.z)) - y.y AS r" +
        s" FROM z$t z JOIN lab y ON y.id = z.id)"
      sb ++= s",\ng$t AS MATERIALIZED (SELECT d.f," +
        s" round(sum(r.r * d.x) / (SELECT n FROM nn), 6) AS g" +
        s" FROM feat d JOIN r$t r ON r.id = d.id GROUP BY d.f)"
      sb ++= s",\nwr$t AS MATERIALIZED (SELECT w.f, w.w - 0.1 * coalesce(g.g, 0.0) AS w" +
        s" FROM wr${t - 1} w LEFT JOIN g$t g ON g.f = w.f)"
    }
    sb ++= s",\nzf AS (SELECT d.id, list_reduce(list_prepend(0.0," +
      s" list(d.x * w.w ORDER BY d.f)), $fold) AS z" +
      s" FROM feat d JOIN wr$iters w ON w.f = d.f GROUP BY d.id)"
    sb ++= "\nSELECT id AS doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS p," +
      " 1.0 / (1.0 + exp(-z)) > 0.5 AS pred FROM zf ORDER BY doc_id"
    sb.toString
  }

  /** lr_calibration oracle: the same generated training replay, with a
    * reliability-diagram tail — decile buckets of the predicted
    * probability vs the empirical positive rate.
    */
  private def lrCalibrationSql: String = {
    val core = lrOracleSql
    val cut = core.lastIndexOf("\nSELECT id AS doc_id")
    core.substring(0, cut) +
      """
        |SELECT b, count(*) AS n, round(avg(p), 4) AS mean_p,
        |  round(avg(y), 4) AS pos_rate
        |FROM (
        |  SELECT z.id, 1.0 / (1.0 + exp(-z.z)) AS p, y.y,
        |    CAST(least(floor((1.0 / (1.0 + exp(-z.z))) * 10), 9) AS BIGINT)
        |      AS b
        |  FROM zf z JOIN lab y ON y.id = z.id)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The pca_project oracle, generated: 2 components × 8 power
    * iterations unrolled as (matvec, norm, normalize) CTE triples over
    * the 6dp-rounded moment tables, Hotelling deflation between the
    * components, ascending-index list_reduce folds throughout —
    * mirroring VectorOps.pcaTrain's driver arithmetic step for step.
    */
  private def pcaOracleSql: String = {
    val iters = 8
    val fold = "(a, b) -> a + b"
    val sb = new StringBuilder
    sb ++= "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n"
    sb ++= "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),\n"
    sb ++= "m AS MATERIALIZED (SELECT idx.i, round(avg(e.v[idx.i + 1]), 6) AS m\n" +
      "  FROM e CROSS JOIN (SELECT unnest(range(0, 64)) AS i) idx GROUP BY idx.i),\n"
    sb ++= "c0 AS MATERIALIZED (SELECT mi.i AS i, mj.i AS j,\n" +
      "    round(sum((e.v[mi.i + 1] - mi.m) * (e.v[mj.i + 1] - mj.m))\n" +
      "      / (SELECT n FROM nn), 6) AS c\n" +
      "  FROM e CROSS JOIN m mi CROSS JOIN m mj GROUP BY mi.i, mj.i)"
    for (k <- 0 until 2) {
      sb ++= s",\nv${k}_0 AS MATERIALIZED (SELECT i, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS x" +
        " FROM (SELECT unnest(range(0, 64)) AS i))"
      for (t <- 1 to iters) {
        sb ++= s",\nw${k}_$t AS MATERIALIZED (SELECT c.i, list_reduce(list_prepend(0.0," +
          s" list(c.c * v.x ORDER BY c.j)), $fold) AS w" +
          s" FROM c$k c JOIN v${k}_${t - 1} v ON v.i = c.j GROUP BY c.i)"
        sb ++= s",\nnm${k}_$t AS MATERIALIZED (SELECT sqrt(list_reduce(list_prepend(0.0," +
          s" list(w * w ORDER BY i)), $fold)) AS nm FROM w${k}_$t)"
        sb ++= s",\nv${k}_$t AS MATERIALIZED (SELECT i, w / (SELECT nm FROM nm${k}_$t) AS x" +
          s" FROM w${k}_$t)"
      }
      sb ++= s",\nwf$k AS MATERIALIZED (SELECT c.i, list_reduce(list_prepend(0.0," +
        s" list(c.c * v.x ORDER BY c.j)), $fold) AS w" +
        s" FROM c$k c JOIN v${k}_$iters v ON v.i = c.j GROUP BY c.i)"
      sb ++= s",\nlam$k AS MATERIALIZED (SELECT list_reduce(list_prepend(0.0," +
        s" list(v.x * w.w ORDER BY v.i)), $fold) AS lam" +
        s" FROM v${k}_$iters v JOIN wf$k w ON w.i = v.i)"
      if (k == 0)
        sb ++= s",\nc1 AS MATERIALIZED (SELECT c.i, c.j, c.c - (SELECT lam FROM lam0) * a.x * b.x AS c" +
          s" FROM c0 c JOIN v0_$iters a ON a.i = c.i JOIN v0_$iters b ON b.i = c.j)"
    }
    sb ++= ",\nproj AS (\n"
    sb ++= (0 until 2).map { k =>
      s"  SELECT e.vec_id, $k AS k, list_reduce(list_prepend(0.0," +
        s" list((e.v[v.i + 1] - m.m) * v.x ORDER BY v.i)), $fold) AS s\n" +
        s"  FROM e CROSS JOIN v${k}_$iters v JOIN m ON m.i = v.i GROUP BY e.vec_id"
    }.mkString("\n  UNION ALL\n")
    sb ++= ")\nSELECT vec_id, k, round(s, 4) AS s FROM proj ORDER BY vec_id, k"
    sb.toString
  }

  /** Winnowing CTE chain replicating [[TextOps.winnowFingerprints]]
    * (k=8, w=4) exactly: Horner k-gram hash mod 2^64 (HUGEINT, mapped
    * into signed BIGINT = Long wraparound), window minima by signed
    * value, distinct. Ends with the `fp(doc_id, fps)` CTE.
    */
  private[queries] val winnowBase = w(
    """WITH norm AS MATERIALIZED (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      |  FROM documents
      |), kg AS MATERIALIZED (
      |  SELECT doc_id, length(t) - 8 + 1 AS m, t FROM norm
      |), hs AS MATERIALIZED (
      |  SELECT doc_id, m, list_transform(range(1, m + 1), i ->
      |    list_reduce(
      |      list_transform(range(0, 8),
      |        j -> CAST(ord(substr(t, CAST(i + j AS INTEGER), 1)) AS HUGEINT)),
      |      (a, b) -> (a * 257 + b) % 18446744073709551616)) AS hl
      |  FROM kg WHERE m >= 1
      |), fp AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(m - 4 + 1, 1) + 1), i ->
      |      list_min(list_transform(
      |        list_slice(hl, CAST(i AS INTEGER), CAST(least(i + 3, m) AS INTEGER)),
      |        v -> CASE WHEN v >= 9223372036854775808
      |                  THEN CAST(v - 18446744073709551616 AS BIGINT)
      |                  ELSE CAST(v AS BIGINT) END)))) AS fps
      |  FROM hs
      |)
      |""")

  // Shared SQL fragments (DuckDB): normalized tokens and 3-gram shingles.
  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val toksSql = s"string_split($norm, ' ')"

  /** Generated Viterbi DP for the unigram tokenizer oracle: pass `k`
    * segments every distinct word under vocab CTE `vcte`, unrolled per
    * character position (maxLen bounds the corpus's longest word; the
    * WHERE len(w) >= i guard makes extra steps harmless). Best state
    * per position = lexicographic struct max on (score, −j) — equal
    * scores break toward the smaller predecessor (longer last token),
    * exactly [[graft.llmops.UnigramLm.viterbi]]'s rule — with the
    * piece path riding in the struct (no backtracking pass).
    */
  private def unigramViterbiSql(k: Int, vcte: String, maxLen: Int): String = {
    val steps = (1 to maxLen).map { i =>
      val js = (math.max(0, i - graft.llmops.UnigramLm.MaxTok) until i)
        .map(j => s"SELECT * FROM p${k}_$j").mkString(" UNION ALL ")
      w(s"""p${k}_$i AS MATERIALIZED (
           |  SELECT q.w, q.n, $i AS i, q.m.s AS s, q.m.path AS path FROM (
           |    SELECT pj.w, max(pj.n) AS n,
           |      max(struct_pack(
           |        s := pj.s + v.lp, negj := -pj.i,
           |        path := CASE WHEN pj.path = '' THEN substring(pj.w, pj.i + 1, $i - pj.i)
           |                     ELSE pj.path || ',' || substring(pj.w, pj.i + 1, $i - pj.i) END)) AS m
           |    FROM ($js) pj
           |    JOIN $vcte v ON v.tok = substring(pj.w, pj.i + 1, $i - pj.i)
           |    WHERE len(pj.w) >= $i
           |    GROUP BY pj.w) q)""")
    }
    val segsrc = (1 to maxLen).map(i => s"SELECT * FROM p${k}_$i").mkString(" UNION ALL ")
    s"p${k}_0 AS MATERIALIZED (SELECT w, n, 0 AS i, 0.0 AS s, '' AS path FROM wrd),\n" +
      steps.mkString(",\n") +
      s",\nseg$k AS MATERIALIZED (SELECT w, n, path FROM ($segsrc) WHERE i = len(w))"
  }

  /** Shared prefix of the unigram oracle: word counts, weighted
    * candidate substrings, the alphabet ∪ top-30 vocab, v0 init, and
    * the 2 hard-EM iterations (Viterbi pass k → counts → v_k), ending
    * with the final model v2 and the final segmentation seg3.
    * MATERIALIZED keeps DuckDB from re-opening the parquet once per DP
    * step. maxLen 8 covers the corpus (longest normalized word).
    */
  private def unigramCte: String = {
    def m(k: Int): String = w(
      s"""cnt$k AS MATERIALIZED (SELECT t AS tok, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT n, unnest(string_split(path, ',')) AS t FROM seg$k) GROUP BY 1),
         |v$k AS MATERIALIZED (SELECT v.tok,
         |    ln((COALESCE(c.c, 0) + 1) / ((SELECT CAST(sum(c) AS DOUBLE) FROM cnt$k) + (SELECT count(*) FROM vocab0))) AS lp
         |  FROM v0 v LEFT JOIN cnt$k c ON v.tok = c.tok)""")
    w(s"""WITH wrd AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
         |cand AS MATERIALIZED (
         |  SELECT substring(w, i, l) AS tok, CAST(sum(n) AS BIGINT) AS c FROM (
         |    SELECT w, n, l, unnest(range(1, len(w) - l + 2)) AS i FROM (
         |      SELECT w, n, unnest(range(1, least(${graft.llmops.UnigramLm.MaxTok}, len(w)) + 1)) AS l FROM wrd))
         |  GROUP BY 1),
         |vocab0 AS MATERIALIZED (
         |  SELECT tok, c FROM cand WHERE len(tok) = 1
         |  UNION ALL
         |  SELECT tok, c FROM (SELECT tok, c FROM cand WHERE len(tok) > 1 ORDER BY c DESC, tok LIMIT 30)),
         |v0 AS MATERIALIZED (SELECT tok, ln(c / (SELECT CAST(sum(c) AS DOUBLE) FROM vocab0)) AS lp FROM vocab0),""") +
      "\n" + unigramViterbiSql(1, "v0", 8) + ",\n" + m(1) + ",\n" +
      unigramViterbiSql(2, "v1", 8) + ",\n" + m(2) + ",\n" +
      unigramViterbiSql(3, "v2", 8) + "\n"
  }

  // Exact substring dedup: window length and the (doc, pos) encoding
  // cap — both must match DedupOps.{substringSpans,SpanPosCap}.
  private val SubstrW = 12
  private val substrCte = w(
    s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
       |win AS (SELECT doc_id, i, md5(array_to_string(arr[i:i+$SubstrW-1], ' ')) AS h
       |        FROM (SELECT doc_id, arr, unnest(range(1, len(arr)-$SubstrW+2)) AS i FROM toks)),
       |dup AS (SELECT h, min(doc_id * 1000000000000 + i) AS keep
       |        FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |spans AS (SELECT win.doc_id, win.i AS s, win.i + $SubstrW - 1 AS e
       |          FROM win JOIN dup ON win.h = dup.h
       |          WHERE win.doc_id * 1000000000000 + win.i <> dup.keep),
       |m AS (SELECT doc_id, s, e,
       |        CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |        THEN 1 ELSE 0 END AS brk
       |      FROM spans),
       |g AS (SELECT doc_id, s, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS gid FROM m),
       |merged AS (SELECT doc_id, gid, min(s) AS ms, max(e) AS me FROM g GROUP BY 1, 2)
       |""")
  private val shinglesCte = w(
    s"""toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
       |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr) - 1)) AS i FROM toks),
       |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle FROM idx),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jac AS (
       |  SELECT d1 AS id_a, d2 AS id_b,
       |    CAST(i AS DOUBLE) / CAST(s1.n + s2.n - i AS DOUBLE) AS j
       |  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)""")

  private lazy val simhashSql = w(
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |), bits AS (
         |  SELECT doc_id, i,
         |    CAST(floor((strpos('0123456789abcdef', substring(h, CAST(i // 4 AS INT) + 1, 1)) - 1)
         |      / pow(2, i % 4)) AS BIGINT) % 2 AS bit
         |  FROM (SELECT doc_id, md5(tok) AS h, unnest(range(0, 60)) AS i FROM toks)
         |), signs AS (
         |  SELECT doc_id, i, CASE WHEN sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS b
         |  FROM bits GROUP BY 1, 2
         |), chunks AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN i // 15 = 0 THEN b * CAST(pow(2, i % 15) AS BIGINT) ELSE 0 END) AS c0,
         |    sum(CASE WHEN i // 15 = 1 THEN b * CAST(pow(2, i % 15) AS BIGINT) ELSE 0 END) AS c1,
         |    sum(CASE WHEN i // 15 = 2 THEN b * CAST(pow(2, i % 15) AS BIGINT) ELSE 0 END) AS c2,
         |    sum(CASE WHEN i // 15 = 3 THEN b * CAST(pow(2, i % 15) AS BIGINT) ELSE 0 END) AS c3
         |  FROM signs GROUP BY 1
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
         |  bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS hd
         |FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
         |  bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3
         |ORDER BY 1, 2""")

  private val jaccardSql = w(
    s"""WITH $shinglesCte
       |SELECT id_a, id_b, round(j, 4) AS j FROM jac WHERE j >= 0.5 ORDER BY 1, 2""")

  // Language scores (must mirror TextOps.langId / qualityScore exactly).
  private def hits(words: Seq[String]) =
    s"len(list_filter(arr, t -> t IN (${words.map(q => s"'$q'").mkString(", ")})))"
  private val enS = hits(TextOps.EnStop)
  private val deS = hits(TextOps.DeStop)
  private val frS = hits(TextOps.FrStop)
  private val esS = hits(TextOps.EsStop)
  private val zhS = "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))"

  /** Shared scored+argmax prediction CTE pair for the lang-classifier
    * evaluation oracles (classifier_prf, cohen_kappa) — identical
    * tie-break order to TextOps.langId and the lang_id oracle.
    */
  private lazy val langPredCte =
    s"""scored AS (
       |  SELECT lang, $enS AS en, $deS AS de, $frS AS fr, $esS AS es, $zhS AS zh
       |  FROM (SELECT lang, text, $toksSql AS arr FROM documents)
       |),
       |pl AS (
       |  SELECT lang,
       |    CASE WHEN en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
       |         WHEN de >= fr AND de >= es AND de >= zh THEN 'de'
       |         WHEN fr >= es AND fr >= zh THEN 'fr'
       |         WHEN es >= zh THEN 'es'
       |         ELSE 'zh' END AS pred
       |  FROM scored)""".stripMargin

  /** Recursive-CTE transitive closure over the winnowing near-dup pairs:
    * min reachable id per node = the component representative (DuckDB's
    * UNION-dedup recursion terminates on the finite reach set). Ends
    * with the `comp(id, cid)` CTE; prefixed to the winnow chain, which
    * must become WITH RECURSIVE and have its list-lambda CTEs
    * materialized (DuckDB cannot inline them into a recursive plan).
    */
  private val ccBase = "WITH RECURSIVE " +
    winnowBase.stripPrefix("WITH ").stripSuffix("\n") + w(
    """, ex AS MATERIALIZED (SELECT doc_id, unnest(fps) AS f FROM fp),
      |capped AS MATERIALIZED (
      |  SELECT * FROM ex
      |  WHERE f IN (SELECT f FROM ex GROUP BY f HAVING count(*) <= 25)),
      |pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM capped a JOIN capped b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 15),
      |nodes AS MATERIALIZED (
      |  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
      |edges AS MATERIALIZED (
      |  SELECT id_a AS u, id_b AS v FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.u, re.r FROM edges e JOIN reach re ON re.id = e.v),
      |comp AS (SELECT id, min(r) AS cid FROM reach GROUP BY 1)
      |""")

  /** [[graft.llmops.SampleOps.hashU]] replicated digit-for-digit: the
    * first 8 hex chars of md5(key) Horner-folded to a 32-bit int,
    * scaled to [0,1). Ends with the `hu(doc_id, source, u)` CTE.
    */
  private val hashUCte = w(
    """WITH hu AS (
      |  SELECT doc_id, source,
      |    list_reduce(list_transform(range(1, 9), i ->
      |      CAST(strpos('0123456789abcdef',
      |        substring(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
      |        AS BIGINT)),
      |      (a, b) -> a * 16 + b) / 4294967296.0 AS u
      |  FROM documents
      |)
      |""")

  /** One unrolled Lloyd iteration for the ann_ivf_trained oracle:
    * assign (max-cosine, ties → smaller cid) then elementwise-mean
    * update with empty clusters keeping their previous centroid —
    * mirrors [[graft.llmops.VectorOps.trainIvfCentroids]] exactly
    * (v[i] is 1-based in DuckDB ≙ posexplode pos + 1).
    */
  private def kmeansIterSql(n: Int): String = {
    val prev = s"c${n - 1}"
    w(s"""a$n AS (SELECT id, v, cid FROM (
         |  SELECT s.id, s.v, c.cid,
         |    row_number() OVER (PARTITION BY s.id
         |      ORDER BY ${cos("s.v", "c.cv")} DESC, c.cid) AS r
         |  FROM samp s CROSS JOIN $prev c) WHERE r = 1),
         |m$n AS (SELECT cid, list(sx / cnt ORDER BY i) AS cv FROM (
         |  SELECT a.cid, t.i, sum(a.v[t.i]) AS sx, count(*) AS cnt
         |  FROM a$n a CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
         |  GROUP BY a.cid, t.i) GROUP BY cid),
         |c$n AS (SELECT p.cid, COALESCE(m$n.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN m$n ON p.cid = m$n.cid),""")
  }

  private val cosExpr =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"
  private def cos(a: String, b: String) = cosExpr.format(a, b, a, a, b, b)

  /** Per-subspace Lloyd iteration for the ann_pq oracle — the dim-16
    * twin of [[kmeansIterSql]] over `samp<s>` (subvector slices),
    * mirroring [[graft.llmops.VectorOps.pqTrain]]'s reuse of the same
    * deterministic schedule.
    */
  private def pqKmeansIterSql(s: Int, n: Int): String = {
    val prev = s"c${s}_${n - 1}"
    w(s"""a${s}_$n AS (SELECT id, v, cid FROM (
         |  SELECT t.id, t.v, c.cid,
         |    row_number() OVER (PARTITION BY t.id
         |      ORDER BY ${cos("t.v", "c.cv")} DESC, c.cid) AS r
         |  FROM samp$s t CROSS JOIN $prev c) WHERE r = 1),
         |m${s}_$n AS (SELECT cid, list(sx / cnt ORDER BY i) AS cv FROM (
         |  SELECT a.cid, t.i, sum(a.v[t.i]) AS sx, count(*) AS cnt
         |  FROM a${s}_$n a CROSS JOIN (SELECT unnest(range(1, 17)) AS i) t
         |  GROUP BY a.cid, t.i) GROUP BY cid),
         |c${s}_$n AS (SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN m${s}_$n m ON p.cid = m.cid),""")
  }

  /** Per-(image, block) aHash bits recomputed from the
    * [[graft.llmops.MultimodalOps.syntheticImageDups]] pixel formula:
    * 32×24 grid, block (j = y÷3·8 + x÷4) milli-luma sums, bit =
    * 64·blockSum > totalSum — integer arithmetic end to end, mirroring
    * `ImageCodec.aHash64`. Ends with the `bits(i, j, bit)` CTE.
    */
  private val phashBitsCte = w(
    """WITH px AS (
      |  SELECT ii.i, xs.x, ys.y,
      |    299 * ((xs.x * 7 + ys.y * 13 + (ii.i % 12) * 31) % 200 + (ii.i // 12) * 7)
      |  + 587 * ((xs.x * 3 + ys.y * 5 + (ii.i % 12) * 17) % 200 + (ii.i // 12) * 7)
      |  + 114 * ((xs.x * 11 + ys.y * 2 + (ii.i % 12) * 23) % 200 + (ii.i // 12) * 7) AS l
      |  FROM (SELECT unnest(range(0, 24)) AS i) ii,
      |    (SELECT unnest(range(0, 32)) AS x) xs,
      |    (SELECT unnest(range(0, 24)) AS y) ys
      |), blk AS (
      |  SELECT i, (y // 3) * 8 + (x // 4) AS j, sum(l) AS bs
      |  FROM px GROUP BY 1, 2
      |), tot AS (SELECT i, sum(bs) AS ts FROM blk GROUP BY 1),
      |bits AS (
      |  SELECT b.i, b.j, CASE WHEN 64 * b.bs > t.ts THEN 1 ELSE 0 END AS bit
      |  FROM blk b JOIN tot t USING (i))
      |""")

  private val oracleCore: Map[String, String] = Map(
    "exact_dedup" -> w(
      s"""SELECT md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fp,
         |  min(doc_id) AS canonical_id, count(*) AS n_members
         |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1"""),
    "ngram_jaccard" -> jaccardSql,
    "minhash_lsh" -> jaccardSql,
    "winnow_fp" -> (winnowBase + w(
      """SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS fp_min,
        |  list_reduce(fps, (a, b) -> xor(a, b)) AS fp_xor
        |FROM fp ORDER BY doc_id""")),
    "winnow_pairs" -> (winnowBase + w(
      """, ex AS (SELECT doc_id, unnest(fps) AS f FROM fp),
        |capped AS (
        |  SELECT * FROM ex
        |  WHERE f IN (SELECT f FROM ex GROUP BY f HAVING count(*) <= 25))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM capped a JOIN capped b ON a.f = b.f AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 15 ORDER BY 1, 2""")),
    "repetition_stats" -> w(
      s"""WITH tg AS (
         |  SELECT source, greatest(len(arr) - 2, 0) AS tt,
         |    CASE WHEN len(arr) >= 3 THEN len(list_distinct(
         |      list_transform(range(1, len(arr) - 1),
         |        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])))
         |    ELSE 0 END AS td
         |  FROM (SELECT source, $toksSql AS arr FROM documents)
         |)
         |SELECT source, CAST(sum(tt) AS BIGINT) AS total_tg,
         |  CAST(sum(td) AS BIGINT) AS distinct_tg,
         |  count(CASE WHEN tt > 0 AND 1.0 - td / CAST(tt AS DOUBLE) > 0.2
         |             THEN 1 END) AS n_repetitive
         |FROM tg GROUP BY 1 ORDER BY 1"""),
    "contamination" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr) - 1)) AS i FROM toks),
         |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle FROM idx)
         |SELECT c.doc_id AS corp_id, e.doc_id AS eval_id, count(*) AS shared
         |FROM sh c JOIN sh e ON c.shingle = e.shingle
         |WHERE c.doc_id >= 25 AND e.doc_id < 25
         |GROUP BY 1, 2 HAVING count(*) >= 15 ORDER BY 1, 2"""),
    // Bloom probe replayed positionally: (h1, h2) = md5 hex folds
    // 1..8 and 9..16 of each distinct shingle; positions (h1 + i·h2)
    // mod 65536 for i in 0..3. Eval docs (< 25) define the set-bit
    // positions; a corpus shingle is bloom-positive iff NONE of its 4
    // positions is missing from that set (anti-join emptiness) — the
    // exact bit-array semantics without materializing a bit array.
    "bloom_contamination" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr) - 1)) AS i FROM toks),
         |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle FROM idx),
         |hh AS (
         |  SELECT doc_id, shingle,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      CAST(strpos('0123456789abcdef',
         |        substring(md5(shingle), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)),
         |      (a, b) -> a * 16 + b) AS h1,
         |    list_reduce(list_transform(range(9, 17), i ->
         |      CAST(strpos('0123456789abcdef',
         |        substring(md5(shingle), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)),
         |      (a, b) -> a * 16 + b) AS h2
         |  FROM sh),
         |ep AS (
         |  SELECT DISTINCT (h1 + t.i * h2) % 65536 AS pos
         |  FROM hh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
         |  WHERE doc_id < 25),
         |cp AS (
         |  SELECT doc_id, shingle, (h1 + t.i * h2) % 65536 AS pos
         |  FROM hh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
         |  WHERE doc_id >= 25),
         |miss AS (
         |  SELECT DISTINCT doc_id, shingle FROM cp
         |  WHERE pos NOT IN (SELECT pos FROM ep)),
         |hit AS (
         |  SELECT c.doc_id, count(*) AS hits FROM (
         |    SELECT DISTINCT doc_id, shingle FROM cp) c
         |  ANTI JOIN miss m ON c.doc_id = m.doc_id AND c.shingle = m.shingle
         |  GROUP BY 1)
         |SELECT doc_id AS corp_id, hits FROM hit
         |WHERE hits >= 15 ORDER BY corp_id"""),
    "incremental_dedup" -> (winnowBase.stripSuffix("\n") + w(
      """, cex AS (SELECT doc_id, unnest(fps) AS f FROM fp WHERE doc_id % 10 < 8),
        |ccap AS (
        |  SELECT * FROM cex
        |  WHERE f IN (SELECT f FROM cex GROUP BY f HAVING count(*) <= 25)),
        |nex AS (SELECT doc_id, unnest(fps) AS f FROM fp WHERE doc_id % 10 >= 8)
        |SELECT n.doc_id AS new_id, c.doc_id AS corpus_id, count(*) AS shared
        |FROM ccap c JOIN nex n ON c.f = n.f
        |GROUP BY 1, 2 HAVING count(*) >= 15 ORDER BY 1, 2""")),
    "split_assign" -> (hashUCte + w(
      """SELECT source,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM hu GROUP BY 1, 2 ORDER BY 1, 2""")),
    "stratified_sample" -> (hashUCte + w(
      """SELECT doc_id, source FROM hu
        |WHERE u < CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
        |                      WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""")),
    // zorder_values: the same mask-shift doubling network unrolled —
    // quantize to 16 bits, spread each dimension to even bits, OR the
    // odd-shifted second dimension.
    "zorder_values" -> w(
      """WITH q AS (SELECT event_id,
        |    CAST(least(greatest(floor((value / 100.0) * 65536.0), 0.0), 65535.0) AS BIGINT) AS x,
        |    user_id AS y
        |  FROM events),
        |sx AS (SELECT event_id, y,
        |    ((x | (x << 8)) & 16711935) AS x1 FROM q),
        |sx2 AS (SELECT event_id, y,
        |    ((x1 | (x1 << 4)) & 252645135) AS x2 FROM sx),
        |sx3 AS (SELECT event_id, y,
        |    ((x2 | (x2 << 2)) & 858993459) AS x3 FROM sx2),
        |sx4 AS (SELECT event_id, y,
        |    ((x3 | (x3 << 1)) & 1431655765) AS xs FROM sx3),
        |sy AS (SELECT event_id, xs,
        |    ((y | (y << 8)) & 16711935) AS y1 FROM sx4),
        |sy2 AS (SELECT event_id, xs,
        |    ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sy),
        |sy3 AS (SELECT event_id, xs,
        |    ((y2 | (y2 << 2)) & 858993459) AS y3 FROM sy2),
        |sy4 AS (SELECT event_id, xs,
        |    ((y3 | (y3 << 1)) & 1431655765) AS ys FROM sy3)
        |SELECT event_id, (xs | (ys << 1)) AS z FROM sy4 ORDER BY event_id"""),

    // length_buckets: integer bucket floor (n − n mod 16); pad_waste =
    // n_docs·max − sum, all integer arithmetic.
    "length_buckets" -> w(
      s"""WITH n AS (SELECT CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents)
         |SELECT n_tok - (n_tok % 16) AS bucket_lo,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
         |  count(*) * max(n_tok) - CAST(sum(n_tok) AS BIGINT) AS pad_waste
         |FROM n GROUP BY 1 ORDER BY 1"""),
    // mix_sample: same ratio/normalize tree (target literals identical),
    // membership via the digit-replicated hashU.
    "mix_sample" -> (hashUCte + w(
      """, c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn FROM c),
        |r AS (SELECT source, n,
        |    (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
        |                 WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 ELSE 0.0 END)
        |      / (n / tot.nn) AS rr
        |  FROM c CROSS JOIN tot),
        |m AS (SELECT max(rr) AS mx FROM r),
        |f AS (SELECT source, n, rr / m.mx AS frac FROM r CROSS JOIN m),
        |smp AS (SELECT hu.source, count(*) AS ns
        |  FROM hu JOIN f USING (source) WHERE hu.u < f.frac GROUP BY 1)
        |SELECT f.source, CAST(f.n AS BIGINT) AS n_docs, round(f.frac, 4) AS fraction,
        |  COALESCE(smp.ns, 0) AS n_sampled
        |FROM f LEFT JOIN smp USING (source) ORDER BY f.source""")),
    // temp_mix: share^(α−1) ratio tree with the same normalize-by-max,
    // membership via the digit-replicated hashU joined back to lang.
    "temp_mix" -> (hashUCte + w(
      """, dl AS (SELECT d.doc_id, d.lang, hu.u
        |  FROM documents d JOIN hu ON d.doc_id = hu.doc_id),
        |c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn FROM c),
        |r AS (SELECT lang, n, pow(n / tot.nn, -0.5) AS rr FROM c CROSS JOIN tot),
        |m AS (SELECT max(rr) AS mx FROM r),
        |f AS (SELECT lang, n, rr / m.mx AS frac FROM r CROSS JOIN m),
        |smp AS (SELECT dl.lang, count(*) AS ns
        |  FROM dl JOIN f USING (lang) WHERE dl.u < f.frac GROUP BY 1)
        |SELECT f.lang, CAST(f.n AS BIGINT) AS n_docs, round(f.frac, 4) AS fraction,
        |  COALESCE(smp.ns, 0) AS n_sampled
        |FROM f LEFT JOIN smp USING (lang) ORDER BY f.lang""")),
    "dedup_clusters" -> (ccBase + w(
      """SELECT id, cid AS cluster_id FROM comp ORDER BY id""")),
    "dedup_keep" -> (ccBase + w(
      """SELECT source, count(*) AS n_kept FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cid)
        |GROUP BY 1 ORDER BY 1""")),
    "cluster_canonical" -> (ccBase + w(
      """SELECT cid AS cluster_id,
        |  -(max(struct_pack(q := n_chars, nid := -doc_id)).nid) AS kept_doc,
        |  max(struct_pack(q := n_chars, nid := -doc_id)).q AS kept_chars,
        |  count(*) AS size
        |FROM comp JOIN documents ON doc_id = id
        |GROUP BY 1 ORDER BY 1""")),
    "simhash" -> simhashSql,
    "jw_linkage" -> w(
      s"""WITH d AS (SELECT doc_id, substring($norm, 1, 40) AS nm FROM documents),
         |dd AS (SELECT doc_id + 10000 AS did,
         |    concat(substring(nm, 1, (doc_id % 20) + 10),
         |      substring(nm, (doc_id % 20) + 12, 100)) AS dn
         |  FROM d)
         |SELECT d.doc_id AS id_a, dd.did AS id_b,
         |  round(jaro_winkler_similarity(d.nm, dd.dn), 4) AS jw
         |FROM d JOIN dd ON substring(d.nm, 1, 8) = substring(dd.dn, 1, 8)
         |WHERE jaro_winkler_similarity(d.nm, dd.dn) >= 0.9
         |ORDER BY 1, 2"""),
    "record_linkage" -> w(
      s"""WITH d AS (SELECT doc_id, substring($norm, 1, 40) AS nm FROM documents),
         |dd AS (SELECT doc_id + 10000 AS did,
         |    concat(substring(nm, 1, (doc_id % 20) + 10),
         |      substring(nm, (doc_id % 20) + 12, 100)) AS dn
         |  FROM d)
         |SELECT d.doc_id AS id_a, dd.did AS id_b,
         |  CAST(levenshtein(d.nm, dd.dn) AS INTEGER) AS lev
         |FROM d JOIN dd ON substring(d.nm, 1, 8) = substring(dd.dn, 1, 8)
         |  AND levenshtein(d.nm, dd.dn) <= 2
         |ORDER BY 1, 2"""),

    "linkage_eval" -> w(
      s"""WITH d AS (SELECT doc_id, substring($norm, 1, 40) AS nm FROM documents),
         |dd AS (SELECT doc_id + 10000 AS did,
         |    concat(substring(nm, 1, (doc_id % 20) + 10),
         |      substring(nm, (doc_id % 20) + 12, 100)) AS dn
         |  FROM d),
         |l AS (SELECT d.doc_id AS id_a, dd.did AS id_b
         |  FROM d JOIN dd ON substring(d.nm, 1, 8) = substring(dd.dn, 1, 8)
         |    AND levenshtein(d.nm, dd.dn) <= 2),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_links,
         |    CAST(sum(CASE WHEN id_b - 10000 = id_a THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    (SELECT count(*) FROM d) AS n_truth
         |  FROM l)
         |SELECT n_links, tp, n_truth,
         |  round(CAST(tp AS DOUBLE) / n_links, 4) AS precision,
         |  round(CAST(tp AS DOUBLE) / n_truth, 4) AS recall
         |FROM t"""),

    "sorted_neighbor" -> w(
      s"""WITH t0 AS (SELECT doc_id, $norm AS nt, $toksSql AS arr FROM documents),
         |t AS (SELECT doc_id, nt,
         |    CASE WHEN len(arr) >= 3 THEN list_sort(list_distinct(
         |      [array_to_string(arr[i : i + 2], ' ')
         |       FOR i IN range(1, len(arr) - 1)]))
         |    ELSE [] END AS sa
         |  FROM t0),
         |k AS (SELECT doc_id, sa,
         |    ${(0 until 8).map(i =>
               s"least(ascii(substring(rpad(nt, 8, ' '), ${i + 1}, 1)), 127)" +
                 s" * ${math.pow(128, 7 - i).toLong}").mkString(" + ")} AS pk
         |  FROM t),
         |r AS (SELECT doc_id, sa,
         |    row_number() OVER (ORDER BY pk, doc_id) AS rn FROM k),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, a.sa AS saa, b.sa AS sab
         |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 8),
         |jj AS (SELECT ia, ib,
         |    CAST(len(list_filter(saa, x -> list_contains(sab, x))) AS DOUBLE)
         |      / (len(saa) + len(sab)
         |         - len(list_filter(saa, x -> list_contains(sab, x)))) AS j
         |  FROM p
         |  WHERE len(saa) + len(sab)
         |    - len(list_filter(saa, x -> list_contains(sab, x))) > 0)
         |SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
         |  round(j, 4) AS j
         |FROM jj WHERE j >= 0.5 ORDER BY 1, 2"""),

    "dedup_eval" -> w(
      s"""WITH ex AS (SELECT id_a, id_b FROM ($jaccardSql)),
         |sp AS (SELECT id_a, id_b FROM ($simhashSql))
         |SELECT CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
         |  round(CAST(tp AS DOUBLE) / n_pred, 4) AS precision,
         |  round(CAST(tp AS DOUBLE) / n_true, 4) AS recall
         |FROM (SELECT (SELECT count(*) FROM ex) AS n_true,
         |  (SELECT count(*) FROM sp) AS n_pred,
         |  (SELECT count(*) FROM ex JOIN sp USING (id_a, id_b)) AS tp)"""),

    "lang_id" -> w(
      s"""WITH scored AS (
         |  SELECT lang, $enS AS en, $deS AS de, $frS AS fr, $esS AS es, $zhS AS zh
         |  FROM (SELECT lang, text, $toksSql AS arr FROM documents)
         |)
         |SELECT lang,
         |  CASE WHEN en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
         |       WHEN de >= fr AND de >= es AND de >= zh THEN 'de'
         |       WHEN fr >= es AND fr >= zh THEN 'fr'
         |       WHEN es >= zh THEN 'es'
         |       ELSE 'zh' END AS pred,
         |  count(*) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY 1, 2"""),
    "classifier_prf" -> w(
      s"""WITH $langPredCte,
         |cls AS (SELECT lang AS cls, count(*) AS support,
         |    sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS tp
         |  FROM pl GROUP BY 1),
         |pc AS (SELECT pred AS cls, count(*) AS predicted FROM pl GROUP BY 1),
         |j AS (SELECT cls.cls, CAST(support AS BIGINT) AS support,
         |    CAST(coalesce(predicted, 0) AS BIGINT) AS predicted,
         |    CAST(tp AS BIGINT) AS tp
         |  FROM cls LEFT JOIN pc ON pc.cls = cls.cls)
         |SELECT cls, support, predicted, tp,
         |  CASE WHEN predicted > 0
         |    THEN round(CAST(tp AS DOUBLE) / predicted, 4) END AS precision,
         |  round(CAST(tp AS DOUBLE) / support, 4) AS recall,
         |  CASE WHEN predicted > 0 AND
         |      (CAST(tp AS DOUBLE) / predicted + CAST(tp AS DOUBLE) / support) > 0
         |    THEN round(2.0 * (CAST(tp AS DOUBLE) / predicted)
         |      * (CAST(tp AS DOUBLE) / support)
         |      / (CAST(tp AS DOUBLE) / predicted + CAST(tp AS DOUBLE) / support), 4)
         |    ELSE 0.0 END AS f1
         |FROM j ORDER BY cls"""),
    "cohen_kappa" -> w(
      s"""WITH $langPredCte,
         |cls AS (SELECT lang AS cls, count(*) AS support,
         |    sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS tp
         |  FROM pl GROUP BY 1),
         |pc AS (SELECT pred AS cls, count(*) AS predicted FROM pl GROUP BY 1),
         |j AS (SELECT cls.cls, support, tp, coalesce(predicted, 0) AS predicted
         |  FROM cls LEFT JOIN pc ON pc.cls = cls.cls),
         |t AS (SELECT CAST(sum(support) AS BIGINT) AS n,
         |    CAST(sum(tp) AS BIGINT) AS diag,
         |    CAST(sum(support * predicted) AS BIGINT) AS xsum FROM j)
         |SELECT n, round(CAST(diag AS DOUBLE) / n, 4) AS po,
         |  round(CAST(xsum AS DOUBLE) / (n * n), 4) AS pe,
         |  round((CAST(diag AS DOUBLE) / n - CAST(xsum AS DOUBLE) / (n * n))
         |    / (1.0 - CAST(xsum AS DOUBLE) / (n * n)), 4) AS kappa
         |FROM t"""),
    "chunk_windows" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |st AS (SELECT doc_id, arr, unnest(range(0, len(arr), 32)) AS start
         |  FROM toks WHERE len(arr) >= 1),
         |ch AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
         |    arr[start + 1 : start + 64] AS chunk
         |  FROM st)
         |SELECT doc_id, start, CAST(len(chunk) AS BIGINT) AS n_tok,
         |  md5(array_to_string(chunk, ' ')) AS fp
         |FROM ch ORDER BY doc_id, start"""),
    "quality_score" -> w(
      s"""WITH q AS (
         |  SELECT source,
         |    0.4 * least(CAST(len(arr) AS DOUBLE) / 50, 1.0) +
         |    0.3 * least(CAST($enS AS DOUBLE) / CAST(len(arr) AS DOUBLE) * 5, 1.0) +
         |    0.3 * (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) * 10, 1.0)) AS qs
         |  FROM (SELECT source, text, $toksSql AS arr FROM documents)
         |)
         |SELECT source, round(avg(qs), 4) AS avg_qs, round(min(qs), 4) AS min_qs,
         |  round(max(qs), 4) AS max_qs, count(*) AS n
         |FROM q GROUP BY 1 ORDER BY 1"""),
    "token_stats" -> w(
      s"""SELECT source,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS sum_tok,
         |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_bpe,
         |  CAST(max(len($toksSql)) AS BIGINT) AS max_tok,
         |  count(DISTINCT md5($norm)) AS nd_fp
         |FROM documents GROUP BY 1 ORDER BY 1"""),
    "chunk_dedup" -> w(
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ch AS (SELECT doc_id, array_to_string(toks[i*8+1:(i+1)*8], ' ') AS chunk
         |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks)//8)) AS i FROM d)),
         |freq AS (SELECT chunk, count(*) AS df FROM ch GROUP BY 1),
         |per AS (SELECT doc_id, count(*) AS n_chunks,
         |    count(*) FILTER (WHERE f.df > 1) AS dup_chunks
         |  FROM ch JOIN freq f USING (chunk) GROUP BY 1)
         |SELECT doc.doc_id, COALESCE(per.n_chunks, 0) AS n_chunks,
         |  COALESCE(per.dup_chunks, 0) AS dup_chunks,
         |  round(CASE WHEN COALESCE(per.n_chunks, 0) > 0
         |    THEN per.dup_chunks * 1.0 / per.n_chunks ELSE 0.0 END, 4) AS dup_frac
         |FROM documents doc LEFT JOIN per USING (doc_id) ORDER BY doc_id"""),
    "ngram_topk" -> w(
      s"""WITH toks AS (SELECT $toksSql AS arr FROM documents),
         |bg AS (SELECT arr[i] || ' ' || arr[i+1] AS ngram
         |  FROM (SELECT arr, unnest(range(1, len(arr))) AS i FROM toks))
         |SELECT ngram, count(*) AS n FROM bg GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20"""),
    "unigram_segment" -> (unigramCte + w(
      """SELECT w, n, path AS pieces,
        |  CAST(len(string_split(path, ',')) AS BIGINT) AS n_pieces
        |FROM seg3 ORDER BY w""")),
    "unigram_vocab" -> (unigramCte +
      "SELECT tok, round(lp, 4) AS lp FROM v2 ORDER BY tok"),
    "unigram_fertility" -> (unigramCte + w(
      s""", segn AS (SELECT w, CAST(len(string_split(path, ',')) AS BIGINT) AS np FROM seg3),
         |tok AS (SELECT source, unnest($toksSql) AS w FROM documents)
         |SELECT source, count(*) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(np) AS DOUBLE) / count(*), 4) AS fertility
         |FROM tok JOIN segn USING (w)
         |GROUP BY 1 ORDER BY 1""")),
    "blocklist_filter" -> w(
      """SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
        |  array_to_string(list_sort(list_distinct(hits)), ',') AS terms
        |FROM (SELECT doc_id,
        |        regexp_extract_all(translate(lower(text), '013457$@', 'oieastsa'),
        |          '\b(big|slow|vector)\b', 1) AS hits
        |      FROM documents)
        |WHERE len(hits) > 0 ORDER BY doc_id"""),
    "substr_spans" -> (substrCte + w(
      """SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(me - ms + 1) AS BIGINT) AS dup_tokens
        |FROM merged GROUP BY 1 ORDER BY 1""")),
    "substr_trim" -> (substrCte + w(
      """, pos AS (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS p FROM toks
        |          WHERE doc_id IN (SELECT DISTINCT doc_id FROM merged)),
        |kept AS (SELECT pos.doc_id, p, arr[p] AS tok FROM pos
        |         WHERE NOT EXISTS (SELECT 1 FROM merged mm
        |                           WHERE mm.doc_id = pos.doc_id AND p BETWEEN mm.ms AND mm.me))
        |SELECT doc_id, md5(array_to_string(list(tok ORDER BY p), ' ')) AS trimmed_md5,
        |  count(*) AS kept_tokens
        |FROM kept GROUP BY 1 ORDER BY 1""")),
    // chunk_clean: same chunking (tail partial included), df-filter,
    // and ordered reassembly.
    // windows compared as strings (engine's xxhash64 is an 8-byte
    // stand-in for the same equality); covered positions = union of
    // [start, start+20) over duplicated windows, anti-joined away
    "span_clean" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |win AS (
         |  SELECT doc_id, i AS start,
         |    array_to_string(arr[i:i+19], ' ') AS wtext
         |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) - 18)) AS i FROM toks)),
         |freq AS (SELECT wtext FROM win GROUP BY 1 HAVING count(*) >= 2),
         |dup AS (SELECT DISTINCT w.doc_id, w.start FROM win w JOIN freq f USING (wtext)),
         |cov AS (SELECT DISTINCT d.doc_id, d.start + t.o AS pos
         |  FROM dup d CROSS JOIN (SELECT unnest(range(0, 20)) AS o) t),
         |pos AS (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS p FROM toks),
         |kept AS (SELECT pos.doc_id, pos.p, arr[pos.p] AS tok
         |  FROM pos ANTI JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.pos),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY p) AS clean FROM kept GROUP BY 1)
         |SELECT t.doc_id, COALESCE(reb.n_kept, 0) AS n_kept,
         |  md5(COALESCE(reb.clean, '')) AS clean_md5
         |FROM toks t LEFT JOIN reb USING (doc_id)
         |ORDER BY t.doc_id"""),
    "chunk_clean" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
         |    array_to_string(arr[i*8+1:(i+1)*8], ' ') AS chunk
         |  FROM (SELECT doc_id, arr, unnest(range(0, (len(arr)+7)//8)) AS i FROM toks)),
         |freq AS (SELECT chunk, count(*) AS df FROM ch GROUP BY 1),
         |kept AS (SELECT doc_id, idx, chunk FROM ch JOIN freq USING (chunk) WHERE df <= 1),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(chunk, ' ' ORDER BY idx) AS clean FROM kept GROUP BY 1)
         |SELECT d.doc_id, COALESCE(reb.n_kept, 0) AS n_kept,
         |  CAST(length(COALESCE(reb.clean, '')) AS BIGINT) AS len_clean,
         |  md5(COALESCE(reb.clean, '')) AS clean_md5
         |FROM documents d LEFT JOIN reb USING (doc_id) ORDER BY doc_id"""),

    // gopher_filter: same per-rule expressions; list folds mirror the
    // Column HOFs, thresholds on full-precision values.
    "gopher_filter" -> w(
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |    CAST(len(toks) AS DOUBLE) AS n,
         |    list_reduce(list_prepend(0, list_transform(toks, x -> len(x))),
         |      (a, b) -> a + b) / CAST(len(toks) AS DOUBLE) AS mean_wlen,
         |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
         |      / CAST(len(toks) AS DOUBLE) AS alpha_frac,
         |    CAST(len(list_filter(toks, x -> x IN
         |      ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'it'))) AS BIGINT) AS stop_hits
         |  FROM t)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
         |  round(mean_wlen, 4) AS mean_wlen, round(alpha_frac, 4) AS alpha_frac,
         |  stop_hits,
         |  (CAST(n AS BIGINT) >= 50 AND CAST(n AS BIGINT) <= 100000
         |    AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
         |    AND alpha_frac > 0.8 AND stop_hits >= 2) AS keep
         |FROM m ORDER BY doc_id"""),

    // slice_kl: same ratio/log tree, slice sums folded term-ordered.
    "slice_kl" -> w(
      s"""WITH tf AS (SELECT source AS slice, term, CAST(count(*) AS DOUBLE) AS cnt FROM (
         |    SELECT source, unnest($toksSql) AS term FROM documents) GROUP BY 1, 2),
         |st AS (SELECT slice, sum(cnt) AS stot FROM tf GROUP BY 1),
         |ct AS (SELECT term, sum(cnt) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(ctf) AS t FROM ct),
         |per AS (SELECT tf.slice, tf.term, tf.cnt,
         |    (tf.cnt / st.stot) * ln((tf.cnt / st.stot) / (ct.ctf / tot.t)) AS s
         |  FROM tf JOIN st USING (slice) JOIN ct USING (term) CROSS JOIN tot),
         |agg AS (SELECT slice, CAST(sum(cnt) AS BIGINT) AS n_tok,
         |    list_reduce(list_prepend(0.0, list(s ORDER BY term)), (a, b) -> a + b) AS kl
         |  FROM per GROUP BY 1)
         |SELECT slice AS source, n_tok, round(kl, 4) AS kl FROM agg ORDER BY source"""),

    // vocab_stats: two-level integer aggregation; HUGEINT sums cast out.
    "vocab_stats" -> w(
      s"""WITH tf AS (SELECT source, term, count(*) AS cnt FROM (
         |    SELECT source, unnest($toksSql) AS term FROM documents) GROUP BY 1, 2)
         |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tok,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         |  round(count(*) / sum(cnt), 4) AS ttr
         |FROM tf GROUP BY 1 ORDER BY 1"""),

    // bpe_pairs: char-split each vocab word (codepoint regex — the
    // corpus is ASCII; both engines agree), adjacent pairs weighted by
    // word count.
    "bpe_pairs" -> w(
      s"""WITH words AS (SELECT unnest($toksSql) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY w),
         |v0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, c FROM wc),
         |a0 AS (SELECT string_split(s, ' ') AS a, c FROM v0),
         |x0 AS (SELECT a, c, unnest(range(1, len(a))) AS i FROM a0),
         |p0 AS (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM x0 GROUP BY 1, 2)
         |SELECT l, r, cnt FROM p0 ORDER BY cnt DESC, l, r LIMIT 50"""),

    // bpe_merges: the 3-step greedy loop unrolled — pair-count CTE,
    // single-row argmax (count desc, pair asc), literal space-padded
    // replace (left-to-right non-overlapping = greedy BPE), repeat.
    "bpe_merges" -> w(
      s"""WITH words AS (SELECT unnest($toksSql) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY w),
         |v0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, c FROM wc),
         |a1 AS (SELECT string_split(s, ' ') AS a, c FROM v0),
         |x1 AS (SELECT a, c, unnest(range(1, len(a))) AS i FROM a1),
         |p1 AS (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM x1 GROUP BY 1, 2),
         |b1 AS (SELECT 1 AS step, l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
         |v1 AS (SELECT trim(replace(' ' || s || ' ',
         |    ' ' || (SELECT l FROM b1) || ' ' || (SELECT r FROM b1) || ' ',
         |    ' ' || (SELECT l || r FROM b1) || ' ')) AS s, c FROM v0),
         |a2 AS (SELECT string_split(s, ' ') AS a, c FROM v1),
         |x2 AS (SELECT a, c, unnest(range(1, len(a))) AS i FROM a2),
         |p2 AS (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM x2 GROUP BY 1, 2),
         |b2 AS (SELECT 2 AS step, l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
         |v2 AS (SELECT trim(replace(' ' || s || ' ',
         |    ' ' || (SELECT l FROM b2) || ' ' || (SELECT r FROM b2) || ' ',
         |    ' ' || (SELECT l || r FROM b2) || ' ')) AS s, c FROM v1),
         |a3 AS (SELECT string_split(s, ' ') AS a, c FROM v2),
         |x3 AS (SELECT a, c, unnest(range(1, len(a))) AS i FROM a3),
         |p3 AS (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM x3 GROUP BY 1, 2),
         |b3 AS (SELECT 3 AS step, l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1)
         |SELECT step, l, r, cnt FROM b1
         |UNION ALL SELECT step, l, r, cnt FROM b2
         |UNION ALL SELECT step, l, r, cnt FROM b3 ORDER BY step"""),

    // unigram_nll: same op tree (cnt · −ln(ctf/T)), per-doc sum folded
    // in term order with a 0.0 init — bm25's determinism pattern.
    "unigram_nll" -> w(
      s"""WITH tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS cnt FROM (
         |    SELECT doc_id, unnest($toksSql) AS term FROM documents) GROUP BY 1, 2),
         |ctf AS (SELECT term, sum(cnt) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(ctf) AS t FROM ctf),
         |per AS (SELECT tf.doc_id, tf.term, tf.cnt,
         |    tf.cnt * -ln(c.ctf / tot.t) AS s
         |  FROM tf JOIN ctf c USING (term) CROSS JOIN tot),
         |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
         |    list_reduce(list_prepend(0.0, list(s ORDER BY term)), (a, b) -> a + b)
         |      / sum(cnt) AS nll
         |  FROM per GROUP BY 1)
         |SELECT doc_id, n_tok, round(nll, 4) AS nll FROM agg ORDER BY doc_id"""),

    // bigram_nll: both LMs rebuilt from the same token stream; the
    // interpolation literal pair (0.5, 1 − 0.5) written exactly as the
    // engine computes it, fold ordered by (p, w)
    "bigram_nll" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i
         |  FROM toks WHERE len(arr) >= 2),
         |pairs AS (SELECT doc_id, arr[i] AS p, arr[i+1] AS w FROM idx),
         |dbf AS (SELECT doc_id, p, w, CAST(count(*) AS DOUBLE) AS cnt
         |  FROM pairs GROUP BY 1, 2, 3),
         |bc AS (SELECT p, w, sum(cnt) AS bcnt FROM dbf GROUP BY 1, 2),
         |pc AS (SELECT p, sum(bcnt) AS pcnt FROM bc GROUP BY 1),
         |uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS ucnt FROM (
         |    SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
         |ut AS (SELECT sum(ucnt) AS ut FROM uni),
         |per AS (SELECT d.doc_id, d.p, d.w, d.cnt,
         |    d.cnt * -ln(0.5 * (bc.bcnt / pc.pcnt)
         |      + (1 - 0.5) * (uni.ucnt / ut.ut)) AS s
         |  FROM dbf d JOIN bc ON bc.p = d.p AND bc.w = d.w
         |  JOIN pc ON pc.p = d.p JOIN uni ON uni.w = d.w CROSS JOIN ut),
         |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bi,
         |    list_reduce(list_prepend(0.0, list(s ORDER BY p, w)), (a, b) -> a + b)
         |      / sum(cnt) AS nll
         |  FROM per GROUP BY 1)
         |SELECT doc_id, n_bi, round(nll, 4) AS nll FROM agg ORDER BY doc_id"""),

    "textrank_keywords" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i
         |  FROM toks WHERE len(arr) >= 2),
         |prs AS (SELECT arr[i] AS p, arr[i+1] AS w FROM idx
         |  WHERE len(arr[i]) >= 4 AND len(arr[i+1]) >= 4 AND arr[i] <> arr[i+1]),
         |e AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
         |    SELECT p AS src, w AS dst FROM prs
         |    UNION ALL SELECT w AS src, p AS dst FROM prs)
         |  GROUP BY 1, 2
         |), ${MiningQueries.pagerankIterCtes(5)},
         |top AS (SELECT node, round(r, 4) AS rank FROM r5
         |  ORDER BY round(r, 4) DESC, node LIMIT 20)
         |SELECT node, rank FROM top ORDER BY node"""),

    "knn_classify" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE id < 5),
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nbr, ${cos("q.v", "c.v")} AS cos
         |  FROM q JOIN e c ON c.id <> q.id),
         |r AS (SELECT qid, nbr,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank
         |  FROM scored),
         |nn AS (SELECT qid, nbr FROM r WHERE rank <= 3),
         |v AS (SELECT nn.qid, emb.label, count(*) AS votes
         |  FROM nn JOIN embeddings emb ON emb.vec_id = nn.nbr GROUP BY 1, 2),
         |p AS (SELECT *, row_number() OVER
         |    (PARTITION BY qid ORDER BY votes DESC, label) AS rk FROM v)
         |SELECT qid, CAST(label AS BIGINT) AS pred, votes
         |FROM p WHERE rk = 1 ORDER BY qid"""),

    "kneser_ney_nll" -> w(
      s"""WITH toks AS (SELECT doc_id, $toksSql AS arr FROM documents),
         |idx AS (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i
         |  FROM toks WHERE len(arr) >= 2),
         |pairs AS (SELECT doc_id, arr[i] AS p, arr[i+1] AS w FROM idx),
         |dbf AS (SELECT doc_id, p, w, CAST(count(*) AS DOUBLE) AS cnt
         |  FROM pairs GROUP BY 1, 2, 3),
         |bc AS MATERIALIZED (SELECT p, w, sum(cnt) AS bcnt FROM dbf GROUP BY 1, 2),
         |pc AS (SELECT p, sum(bcnt) AS pcnt, CAST(count(*) AS DOUBLE) AS ntypes
         |  FROM bc GROUP BY 1),
         |co AS (SELECT w, CAST(count(*) AS DOUBLE) AS nprec FROM bc GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS DOUBLE) AS tb FROM bc),
         |per AS (SELECT d.doc_id, d.p, d.w, d.cnt,
         |    d.cnt * -ln(greatest(bc.bcnt - 0.75, 0.0) / pc.pcnt
         |      + 0.75 * pc.ntypes / pc.pcnt * (co.nprec / tt.tb)) AS s
         |  FROM dbf d JOIN bc ON bc.p = d.p AND bc.w = d.w
         |  JOIN pc ON pc.p = d.p JOIN co ON co.w = d.w CROSS JOIN tt),
         |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bi,
         |    list_reduce(list_prepend(0.0, list(s ORDER BY p, w)), (a, b) -> a + b)
         |      / sum(cnt) AS nll
         |  FROM per GROUP BY 1)
         |SELECT doc_id, n_bi, round(nll, 4) AS nll FROM agg ORDER BY doc_id"""),

    // url_dedup: same synthesized URLs, same extract/canonicalize
    // regex trees; sums cast out of DuckDB's HUGEINT.
    "url_dedup" -> w(
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' see https://Src' || CAST(doc_id % 7 AS VARCHAR)
         |      || '.Example.COM/page/' || CAST(doc_id % 50 AS VARCHAR)
         |      || '?utm=x#frag'
         |      || CASE WHEN doc_id % 3 = 0
         |           THEN ' and https://mirror.example.net/x' ELSE '' END AS t
         |  FROM documents),
         |u AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '${TextOps.UrlRe}')) AS BIGINT) AS n_urls,
         |    regexp_extract_all(t, '${TextOps.UrlRe}')[1] AS f
         |  FROM aug)
         |SELECT
         |  lower(regexp_extract(f, '^https?://([A-Za-z0-9.-]+)', 1)) AS domain,
         |  lower(regexp_extract(f, '^(https?://[A-Za-z0-9.-]+(?::[0-9]+)?)', 1))
         |    || regexp_extract(f, '^https?://[A-Za-z0-9.-]+(?::[0-9]+)?([^#?]*)', 1) AS canon,
         |  CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id,
         |  CAST(sum(n_urls) AS BIGINT) AS n_urls
         |FROM u GROUP BY 1, 2 ORDER BY canon"""),

    // seq_pack: integer window cumsum reproduces the two-pass prefix
    // scan exactly; sum(BIGINT) is HUGEINT in DuckDB, hence the cast.
    "seq_pack" -> w(
      s"""WITH t AS (SELECT doc_id AS id, CAST(len($toksSql) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (SELECT id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      - n_tok AS tok_start FROM t)
         |SELECT id, n_tok, tok_start,
         |  tok_start // 512 AS seq_first,
         |  (tok_start + greatest(n_tok, 1) - 1) // 512 AS seq_last,
         |  (tok_start // 512) != ((tok_start + greatest(n_tok, 1) - 1) // 512) AS straddles
         |FROM c ORDER BY id"""),

    // pii_redact: same augmented text, same shared-subset regexes (the
    // patterns avoid Java/RE2 divergences), same replace order; 'g'
    // matches Spark's replace-all default.
    "pii_redact" -> w(
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com via 10.1.2.' || CAST(doc_id % 256 AS VARCHAR)
         |      || ' or +14155550' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0') AS t
         |  FROM documents WHERE doc_id < 20)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextOps.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(t, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phone,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${TextOps.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.Ipv4Re}', '<IP>', 'g'),
         |    '${TextOps.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
         |FROM aug ORDER BY doc_id"""),

    // bm25_topk: mirrors TextOps.bm25TopK op-for-op — same idf/tf
    // formula tree (k1 = 1.2, b = 0.75 as the same literals), and the
    // per-doc sum folds in term order with a 0.0 init so FP addition
    // order matches the Spark aggregate() exactly.
    "bm25_topk" -> w(
      s"""WITH docs AS (SELECT doc_id, CAST(len($toksSql) AS DOUBLE) AS dl,
         |    $toksSql AS toks FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM docs),
         |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf FROM (
         |    SELECT doc_id, dl, unnest(toks) AS term FROM docs)
         |  WHERE term IN ('spark', 'vector', 'query') GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |per AS (SELECT tf.doc_id, tf.term,
         |    ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
         |      * (tf.tf * (1.2 + 1.0))
         |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
         |  FROM tf JOIN dfreq f USING (term) CROSS JOIN stats s),
         |sc AS (SELECT doc_id, list_reduce(
         |    list_prepend(0.0, list(sc ORDER BY term)), (a, b) -> a + b) AS score
         |  FROM per GROUP BY 1),
         |top AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT doc_id, round(score, 4) AS score FROM top ORDER BY doc_id"""),
    "tfidf_terms" -> w(
      s"""WITH dt AS (SELECT doc_id, source, term, count(*) AS cnt
         |  FROM (SELECT doc_id, source, unnest($toksSql) AS term FROM documents)
         |  GROUP BY 1, 2, 3),
         |tf AS (SELECT source, term, sum(cnt) AS tf FROM dt GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.source, tf.term, tf.tf * ln(n.n * 1.0 / dfq.df) AS tfidf
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (SELECT source, term, tfidf,
         |  row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |SELECT source, rank, term, round(tfidf, 4) AS tfidf
         |FROM r WHERE rank <= 5 ORDER BY source, rank"""),
    "ann_brute" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE id < 5),
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nbr, ${cos("q.v", "c.v")} AS cos
         |  FROM q JOIN e c ON c.id <> q.id),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // hard negatives: cross-label candidates under the 0.95 ceiling
    "hard_negatives" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings),
         |q AS (SELECT * FROM e WHERE id < 5),
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nbr, c.label AS nbr_label,
         |    ${cos("q.v", "c.v")} AS cos
         |  FROM q JOIN e c ON c.id <> q.id AND c.label <> q.label),
         |r AS (SELECT qid, nbr, nbr_label, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank
         |  FROM scored WHERE cos < 0.95)
         |SELECT qid, rank, nbr, nbr_label, round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY qid, rank"""),
    // ann_filtered: the label predicate applies to candidates only
    // (queries are unfiltered by construction)
    "ann_filtered" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings),
         |q AS (SELECT * FROM e WHERE id < 5),
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nbr, ${cos("q.v", "c.v")} AS cos
         |  FROM q JOIN e c ON c.id <> q.id AND c.label = 1),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // ann_binary: sign/Hamming arithmetic is integer-exact, so the
    // oracle needs no packed words — mismatched-sign counts ARE the
    // Hamming distances; rescore reuses the standard cosine tail.
    "ann_binary" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE id < 5),
         |ham AS (
         |  SELECT q.id AS qid, c.id AS nbr,
         |    len(list_filter(range(1, 65), i -> (q.v[i] > 0) != (c.v[i] > 0))) AS ham
         |  FROM q JOIN e c ON c.id <> q.id),
         |short AS (SELECT qid, nbr FROM (
         |    SELECT qid, nbr, row_number() OVER (PARTITION BY qid ORDER BY ham, nbr) AS hr
         |    FROM ham) WHERE hr <= 30),
         |scored AS (
         |  SELECT s.qid, s.nbr, ${cos("q.v", "c.v")} AS cos
         |  FROM short s JOIN q ON q.id = s.qid JOIN e c ON c.id = s.nbr),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // ann_int8: the quantization expression mirrors VectorOps.int8Quantize
    // op-for-op (round(x / (greatest(max|v|, 1e-30) / 127.0)) — same IEEE
    // rounding points), then the standard cosine/rank tail over the codes.
    "ann_int8" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |e8 AS (SELECT id, list_transform(v, x ->
         |    round(x / (greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0))) AS c
         |  FROM e),
         |q AS (SELECT id, c FROM e8 WHERE id < 5),
         |scored AS (
         |  SELECT q.id AS qid, c8.id AS nbr, ${cos("q.c", "c8.c")} AS cos
         |  FROM q JOIN e8 c8 ON c8.id <> q.id),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    "ann_ivf" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
         |assign AS (
         |  SELECT id, v, cid FROM (
         |    SELECT c.id, c.v, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN cent) WHERE r = 1),
         |probes AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT q.id AS qid, q.v AS qv, cent.cid,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY ${cos("q.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e q CROSS JOIN cent WHERE q.id < 5) WHERE r <= 2),
         |scored AS (
         |  SELECT p.qid, a.id AS nbr, ${cos("p.qv", "a.v")} AS cos
         |  FROM probes p JOIN assign a ON p.cid = a.cid AND a.id <> p.qid),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    "ann_ivf_trained" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 5 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |assign AS (
         |  SELECT id, v, cid FROM (
         |    SELECT c.id, c.v, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |probes AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT q.id AS qid, q.v AS qv, cent.cid,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY ${cos("q.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e q CROSS JOIN c2 cent WHERE q.id < 5) WHERE r <= 2),
         |scored AS (
         |  SELECT p.qid, a.id AS nbr, ${cos("p.qv", "a.v")} AS cos
         |  FROM probes p JOIN assign a ON p.cid = a.cid AND a.id <> p.qid),
         |r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // dsir_weights: same two unigram LMs (target add-one over the
    // corpus vocabulary, corpus raw MLE), same log-ratio op tree,
    // per-doc sum folded in term order.
    "dsir_weights" -> w(
      s"""WITH tf AS (SELECT doc_id, lang = 'en' AS is_t, term,
         |    CAST(count(*) AS DOUBLE) AS cnt
         |  FROM (SELECT doc_id, lang, unnest($toksSql) AS term FROM documents)
         |  GROUP BY 1, 2, 3),
         |ctf AS (SELECT term, sum(cnt) AS ctf FROM tf GROUP BY 1),
         |cs AS (SELECT sum(ctf) AS ct, CAST(count(*) AS DOUBLE) AS vn FROM ctf),
         |ttf AS (SELECT term, sum(cnt) AS ttf FROM tf WHERE is_t GROUP BY 1),
         |tt AS (SELECT sum(ttf) AS tt FROM ttf),
         |per AS (SELECT tf.doc_id, tf.term, tf.cnt,
         |    tf.cnt * (ln((COALESCE(ttf.ttf, 0.0) + 1.0) / (tt.tt + cs.vn))
         |      - ln(ctf.ctf / cs.ct)) AS s
         |  FROM tf JOIN ctf USING (term) LEFT JOIN ttf USING (term)
         |  CROSS JOIN cs CROSS JOIN tt)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
         |  round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
         |    (a, b) -> a + b) / sum(cnt), 4) + 0.0 AS w
         |FROM per GROUP BY 1 ORDER BY doc_id"""),
         // ^ + 0.0 folds DuckDB's signed -0.0 into +0.0 — Spark's
         // BigDecimal round can never emit -0.0, so a doc whose ratio
         // rounds to zero would otherwise hash-mismatch on the sign bit.
    // nb_classify: the full NB train/score chain restated — hash split
    // via the digit-replicated hashU, class models as (label, term)
    // counts, smoothed log-likelihoods with the SAME op tree, per-doc
    // evidence folded in term order, argmax ties by label.
    "nb_classify" -> (hashUCte + w(
      s""", tr AS (SELECT d.doc_id, d.source, d.text
         |  FROM documents d JOIN hu ON d.doc_id = hu.doc_id WHERE hu.u < 0.8),
         |va AS (SELECT d.doc_id, d.source, d.text
         |  FROM documents d JOIN hu ON d.doc_id = hu.doc_id WHERE hu.u >= 0.8),
         |ttf AS (SELECT label, term, CAST(count(*) AS DOUBLE) AS ct FROM (
         |    SELECT source AS label, unnest($toksSql) AS term FROM tr) GROUP BY 1, 2),
         |ctot AS (SELECT label, sum(ct) AS tot FROM ttf GROUP BY 1),
         |voc AS (SELECT DISTINCT term FROM ttf),
         |vn AS (SELECT CAST(count(*) AS DOUBLE) AS vn FROM voc),
         |nd AS (SELECT source AS label, CAST(count(*) AS DOUBLE) AS nd
         |  FROM tr GROUP BY 1),
         |nn AS (SELECT sum(nd) AS nn FROM nd),
         |cls AS (SELECT label, ln(nd / nn.nn) AS prior, tot, vn.vn
         |  FROM nd JOIN ctot USING (label) CROSS JOIN nn CROSS JOIN vn),
         |stf AS (SELECT doc_id, label_true, term, CAST(count(*) AS DOUBLE) AS cd
         |  FROM (SELECT doc_id, source AS label_true, unnest($toksSql) AS term
         |        FROM va) GROUP BY 1, 2, 3),
         |stv AS (SELECT * FROM stf WHERE term IN (SELECT term FROM voc)),
         |per AS (SELECT s.doc_id, s.label_true, c.label, s.term,
         |    s.cd * ln((COALESCE(t.ct, 0.0) + 1.0) / (c.tot + c.vn)) AS sc
         |  FROM stv s CROSS JOIN cls c
         |  LEFT JOIN ttf t ON t.label = c.label AND t.term = s.term),
         |ev AS (SELECT doc_id, label_true, label,
         |    list_reduce(list_prepend(0.0, list(sc ORDER BY term)), (a, b) -> a + b) AS ev
         |  FROM per GROUP BY 1, 2, 3),
         |post AS (SELECT ev.doc_id, ev.label_true, ev.label,
         |    cls.prior + ev.ev AS logp FROM ev JOIN cls USING (label)),
         |best AS (SELECT doc_id, label AS pred, logp FROM (
         |    SELECT doc_id, label, logp,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY logp DESC, label) AS rk
         |    FROM post) WHERE rk = 1),
         |po AS (SELECT label AS pred0, prior AS logp0 FROM cls
         |  ORDER BY prior DESC, label LIMIT 1)
         |SELECT v.doc_id, v.source, COALESCE(b.pred, po.pred0) AS pred,
         |  round(COALESCE(b.logp, po.logp0), 4) AS logp
         |FROM va v LEFT JOIN best b ON v.doc_id = b.doc_id
         |CROSS JOIN po ORDER BY v.doc_id""")),
    // silhouette: same trained-assignment chain as embed_drift, then
    // probe×corpus mean distances per cluster and the (b−a)/max ratio
    "silhouette" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 10 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |assign AS (
         |  SELECT id, cid FROM (
         |    SELECT c.id, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |al AS (SELECT a.id, a.cid, e.v FROM assign a JOIN e USING (id)),
         |pr AS (SELECT * FROM al WHERE id < 100),
         |pd AS (
         |  SELECT p.id AS pid, p.cid AS pcid, c.cid AS ccid,
         |    1.0 - ${cos("p.v", "c.v")} AS d
         |  FROM pr p JOIN al c ON c.id <> p.id),
         |bc AS (SELECT pid, pcid, ccid, sum(d) / count(*) AS md
         |  FROM pd GROUP BY 1, 2, 3),
         |aa AS (SELECT pid, md AS a FROM bc WHERE ccid = pcid),
         |bb AS (SELECT pid, min(md) AS b FROM bc WHERE ccid <> pcid GROUP BY 1)
         |SELECT aa.pid AS id, round(a, 4) AS a, round(b, 4) AS b,
         |  round((b - a) / greatest(a, b), 4) + 0.0 AS s
         |FROM aa JOIN bb USING (pid) ORDER BY 1"""),

    // embed_extremes: the trained-assignment chain scored against the
    // final centroids, double-ranked per cluster (+0.0 folds DuckDB's
    // possible signed zero on a ccos that rounds to 0).
    "embed_drift" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 10 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |assign AS (
         |  SELECT id, cid FROM (
         |    SELECT c.id, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |rh AS (SELECT cid, count(*) AS n_ref FROM assign WHERE id % 2 = 0 GROUP BY 1),
         |ch AS (SELECT cid, count(*) AS n_cur FROM assign WHERE id % 2 = 1 GROUP BY 1),
         |j AS (SELECT COALESCE(rh.cid, ch.cid) AS cid,
         |        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
         |      FROM rh FULL OUTER JOIN ch ON rh.cid = ch.cid),
         |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr, CAST(sum(n_cur) AS DOUBLE) AS tc FROM j)
         |SELECT cid, n_ref, n_cur,
         |  round(n_ref / tr, 4) AS p_ref, round(n_cur / tc, 4) AS p_cur,
         |  round((n_cur / tc - n_ref / tr) *
         |    ln(greatest(n_cur / tc, 1e-6) / greatest(n_ref / tr, 1e-6)), 4) AS contrib
         |FROM j, t ORDER BY cid"""),
    "embed_extremes" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 5 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |assign AS (
         |  SELECT id, v, cid FROM (
         |    SELECT c.id, c.v, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |scored AS (
         |  SELECT a.cid, a.id, ${cos("a.v", "cc.cv")} AS ccos
         |  FROM assign a JOIN c2 cc ON a.cid = cc.cid),
         |rk AS (SELECT cid, id, ccos,
         |    row_number() OVER (PARTITION BY cid ORDER BY ccos ASC, id) AS r_out,
         |    row_number() OVER (PARTITION BY cid ORDER BY ccos DESC, id) AS r_proto
         |  FROM scored)
         |SELECT cid, id, round(ccos, 4) + 0.0 AS ccos, r_out, r_proto
         |FROM rk WHERE r_out <= 3 OR r_proto <= 3 ORDER BY cid, id"""),
    // semantic_dedup: the ann_ivf_trained k-means chain (two unrolled
    // Lloyd iterations) assigns every vector, pairs form WITHIN
    // clusters only, and the recursive closure reproduces the
    // min-id-representative components exactly.
    "semantic_dedup" -> w(
      s"""WITH RECURSIVE e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 5 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |assign AS MATERIALIZED (
         |  SELECT id, v, cid FROM (
         |    SELECT c.id, c.v, cent.cid,
         |      row_number() OVER (PARTITION BY c.id
         |        ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |    FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |pairs AS MATERIALIZED (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.id < b.id
         |  WHERE ${cos("a.v", "b.v")} >= 0.4),
         |nodes AS MATERIALIZED (
         |  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
         |edges AS MATERIALIZED (
         |  SELECT id_a AS s, id_b AS t FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT ed.s, re.r FROM edges ed JOIN reach re ON re.id = ed.t),
         |comp AS (SELECT id, min(r) AS rep FROM reach GROUP BY 1)
         |SELECT a.id, a.cid, COALESCE(c.rep, a.id) AS rep,
         |  COALESCE(c.rep, a.id) = a.id AS keep
         |FROM assign a LEFT JOIN comp c ON a.id = c.id ORDER BY a.id"""),
    // ann_ivf_pq: the ann_ivf_trained coarse chain (full-dim k-means,
    // assignment, nprobe=2 probes) pruning candidates, then the ann_pq
    // fine chain (per-subspace k-means, codes, LUT) rescoring them —
    // same bit-exact pieces, composed.
    "ann_ivf_pq" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 5 = 0),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp ORDER BY id LIMIT 8)),
         |${kmeansIterSql(1)}
         |${kmeansIterSql(2)}
         |cassign AS (SELECT id, cid FROM (
         |  SELECT c.id, cent.cid,
         |    row_number() OVER (PARTITION BY c.id
         |      ORDER BY ${cos("c.v", "cent.cv")} DESC, cent.cid) AS r
         |  FROM e c CROSS JOIN c2 cent) WHERE r = 1),
         |cprobes AS (SELECT qid, cid FROM (
         |  SELECT q.id AS qid, cent.cid,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY ${cos("q.v", "cent.cv")} DESC, cent.cid) AS r
         |  FROM e q CROSS JOIN c2 cent WHERE q.id < 5) WHERE r <= 2),
         |cands AS (
         |  SELECT p.qid, a.id FROM cprobes p
         |  JOIN cassign a ON p.cid = a.cid AND a.id <> p.qid),
         |samp0 AS (SELECT id, v[1:16] AS v FROM samp),
         |samp1 AS (SELECT id, v[17:32] AS v FROM samp),
         |samp2 AS (SELECT id, v[33:48] AS v FROM samp),
         |samp3 AS (SELECT id, v[49:64] AS v FROM samp),
         |c0_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp0 ORDER BY id LIMIT 8)),
         |c1_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp1 ORDER BY id LIMIT 8)),
         |c2_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp2 ORDER BY id LIMIT 8)),
         |c3_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp3 ORDER BY id LIMIT 8)),
         |${pqKmeansIterSql(0, 1)}
         |${pqKmeansIterSql(0, 2)}
         |${pqKmeansIterSql(1, 1)}
         |${pqKmeansIterSql(1, 2)}
         |${pqKmeansIterSql(2, 1)}
         |${pqKmeansIterSql(2, 2)}
         |${pqKmeansIterSql(3, 1)}
         |${pqKmeansIterSql(3, 2)}
         |cb AS (
         |  SELECT 0 AS sub, cid, cv FROM c0_2 UNION ALL
         |  SELECT 1, cid, cv FROM c1_2 UNION ALL
         |  SELECT 2, cid, cv FROM c2_2 UNION ALL
         |  SELECT 3, cid, cv FROM c3_2),
         |esub AS (
         |  SELECT id, s.sub,
         |    CASE s.sub WHEN 0 THEN v[1:16] WHEN 1 THEN v[17:32]
         |               WHEN 2 THEN v[33:48] ELSE v[49:64] END AS sv
         |  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) s(sub)),
         |codes AS (SELECT id, sub, cid FROM (
         |  SELECT es.id, es.sub, cb.cid,
         |    row_number() OVER (PARTITION BY es.id, es.sub
         |      ORDER BY ${cos("es.sv", "cb.cv")} DESC, cb.cid) AS r
         |  FROM esub es JOIN cb ON es.sub = cb.sub) WHERE r = 1),
         |lut AS (
         |  SELECT q.id AS qid, q.sub, cb.cid,
         |    list_dot_product(q.sv, cb.cv) AS pd,
         |    list_dot_product(cb.cv, cb.cv) AS pc,
         |    list_dot_product(q.sv, q.sv) AS pq
         |  FROM esub q JOIN cb ON q.sub = cb.sub WHERE q.id < 5),
         |scored AS (
         |  SELECT x.qid, x.id AS nbr,
         |    max(CASE WHEN c.sub = 0 THEN l.pd END) AS pd0,
         |    max(CASE WHEN c.sub = 1 THEN l.pd END) AS pd1,
         |    max(CASE WHEN c.sub = 2 THEN l.pd END) AS pd2,
         |    max(CASE WHEN c.sub = 3 THEN l.pd END) AS pd3,
         |    max(CASE WHEN c.sub = 0 THEN l.pc END) AS pc0,
         |    max(CASE WHEN c.sub = 1 THEN l.pc END) AS pc1,
         |    max(CASE WHEN c.sub = 2 THEN l.pc END) AS pc2,
         |    max(CASE WHEN c.sub = 3 THEN l.pc END) AS pc3,
         |    max(CASE WHEN c.sub = 0 THEN l.pq END) AS pq0,
         |    max(CASE WHEN c.sub = 1 THEN l.pq END) AS pq1,
         |    max(CASE WHEN c.sub = 2 THEN l.pq END) AS pq2,
         |    max(CASE WHEN c.sub = 3 THEN l.pq END) AS pq3
         |  FROM cands x
         |  JOIN codes c ON c.id = x.id
         |  JOIN lut l ON l.qid = x.qid AND l.sub = c.sub AND l.cid = c.cid
         |  GROUP BY 1, 2),
         |r AS (SELECT qid, nbr,
         |  (pd0 + pd1 + pd2 + pd3)
         |    / (sqrt(pq0 + pq1 + pq2 + pq3) * sqrt(pc0 + pc1 + pc2 + pc3)) AS cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY
         |    (pd0 + pd1 + pd2 + pd3)
         |      / (sqrt(pq0 + pq1 + pq2 + pq3) * sqrt(pc0 + pc1 + pc2 + pc3)) DESC,
         |    nbr) AS rank
         |  FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // ann_pq: per-subspace k-means (the kmeansIterSql schedule at dim
    // 16), code assignment, then the ADC score — partial dots pivot
    // into FIXED columns and sum left-to-right in both engines, so the
    // approximate cosine is bit-identical before round-4.
    "ann_pq" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |samp AS (SELECT id, v FROM e WHERE id % 5 = 0),
         |samp0 AS (SELECT id, v[1:16] AS v FROM samp),
         |samp1 AS (SELECT id, v[17:32] AS v FROM samp),
         |samp2 AS (SELECT id, v[33:48] AS v FROM samp),
         |samp3 AS (SELECT id, v[49:64] AS v FROM samp),
         |c0_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp0 ORDER BY id LIMIT 8)),
         |c1_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp1 ORDER BY id LIMIT 8)),
         |c2_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp2 ORDER BY id LIMIT 8)),
         |c3_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, v AS cv
         |  FROM (SELECT id, v FROM samp3 ORDER BY id LIMIT 8)),
         |${pqKmeansIterSql(0, 1)}
         |${pqKmeansIterSql(0, 2)}
         |${pqKmeansIterSql(1, 1)}
         |${pqKmeansIterSql(1, 2)}
         |${pqKmeansIterSql(2, 1)}
         |${pqKmeansIterSql(2, 2)}
         |${pqKmeansIterSql(3, 1)}
         |${pqKmeansIterSql(3, 2)}
         |cb AS (
         |  SELECT 0 AS sub, cid, cv FROM c0_2 UNION ALL
         |  SELECT 1, cid, cv FROM c1_2 UNION ALL
         |  SELECT 2, cid, cv FROM c2_2 UNION ALL
         |  SELECT 3, cid, cv FROM c3_2),
         |esub AS (
         |  SELECT id, s.sub,
         |    CASE s.sub WHEN 0 THEN v[1:16] WHEN 1 THEN v[17:32]
         |               WHEN 2 THEN v[33:48] ELSE v[49:64] END AS sv
         |  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) s(sub)),
         |codes AS (SELECT id, sub, cid FROM (
         |  SELECT es.id, es.sub, cb.cid,
         |    row_number() OVER (PARTITION BY es.id, es.sub
         |      ORDER BY ${cos("es.sv", "cb.cv")} DESC, cb.cid) AS r
         |  FROM esub es JOIN cb ON es.sub = cb.sub) WHERE r = 1),
         |lut AS (
         |  SELECT q.id AS qid, q.sub, cb.cid,
         |    list_dot_product(q.sv, cb.cv) AS pd,
         |    list_dot_product(cb.cv, cb.cv) AS pc,
         |    list_dot_product(q.sv, q.sv) AS pq
         |  FROM esub q JOIN cb ON q.sub = cb.sub WHERE q.id < 5),
         |scored AS (
         |  SELECT l.qid, c.id AS nbr,
         |    max(CASE WHEN c.sub = 0 THEN l.pd END) AS pd0,
         |    max(CASE WHEN c.sub = 1 THEN l.pd END) AS pd1,
         |    max(CASE WHEN c.sub = 2 THEN l.pd END) AS pd2,
         |    max(CASE WHEN c.sub = 3 THEN l.pd END) AS pd3,
         |    max(CASE WHEN c.sub = 0 THEN l.pc END) AS pc0,
         |    max(CASE WHEN c.sub = 1 THEN l.pc END) AS pc1,
         |    max(CASE WHEN c.sub = 2 THEN l.pc END) AS pc2,
         |    max(CASE WHEN c.sub = 3 THEN l.pc END) AS pc3,
         |    max(CASE WHEN c.sub = 0 THEN l.pq END) AS pq0,
         |    max(CASE WHEN c.sub = 1 THEN l.pq END) AS pq1,
         |    max(CASE WHEN c.sub = 2 THEN l.pq END) AS pq2,
         |    max(CASE WHEN c.sub = 3 THEN l.pq END) AS pq3
         |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.cid = l.cid
         |  WHERE c.id <> l.qid
         |  GROUP BY 1, 2),
         |r AS (SELECT qid, nbr,
         |  (pd0 + pd1 + pd2 + pd3)
         |    / (sqrt(pq0 + pq1 + pq2 + pq3) * sqrt(pc0 + pc1 + pc2 + pc3)) AS cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY
         |    (pd0 + pd1 + pd2 + pd3)
         |      / (sqrt(pq0 + pq1 + pq2 + pq3) * sqrt(pc0 + pc1 + pc2 + pc3)) DESC,
         |    nbr) AS rank
         |  FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    // dataset_card: the same fingerprint/quality/entropy trees; the
    // entropy fold orders by lang like the engine's struct sort
    "dataset_card" -> w(
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(len(arr) AS BIGINT) AS n_tok,
         |    md5(array_to_string(list_sort(list_distinct(arr)), ' ')) AS fp,
         |    0.4 * least(CAST(len(arr) AS DOUBLE) / 50, 1.0) +
         |    0.3 * least(CAST($enS AS DOUBLE) / CAST(len(arr) AS DOUBLE) * 5, 1.0) +
         |    0.3 * (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) * 10, 1.0)) AS qs
         |  FROM (SELECT doc_id, lang, text, $toksSql AS arr FROM documents)),
         |lc AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM d GROUP BY 1),
         |tot AS (SELECT sum(n) AS nn FROM lc),
         |ent AS (SELECT list_reduce(list_prepend(0.0,
         |    list(-(n / nn) * ln(n / nn) ORDER BY lang)), (a, b) -> a + b) AS e
         |  FROM lc CROSS JOIN tot)
         |SELECT count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  count(DISTINCT fp) AS n_unique,
         |  round(1.0 - count(DISTINCT fp) / count(*), 4) AS dup_rate,
         |  round(avg(qs), 4) AS avg_quality,
         |  round((SELECT e FROM ent), 4) AS lang_entropy
         |FROM d"""),

    // shard_shuffle: the hashU digit fold, floor(u·8) clamped, rank
    // by (u, doc_id) within the shard
    "shard_shuffle" -> (hashUCte + w(
      """SELECT doc_id,
        |  CAST(least(floor(u * 8), 7) AS INTEGER) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY CAST(least(floor(u * 8), 7) AS INTEGER)
        |    ORDER BY u, doc_id) AS INTEGER) AS pos
        |FROM hu ORDER BY shard, pos""")),

    // html_strip: identical regex chain in the same order (script,
    // style, tags, five entities, &amp; last, whitespace collapse);
    // nesting generated so the paren depth can't drift from the list
    "html_strip" -> {
      val chain = Seq(
        ("""(?is)<script\b[^>]*>.*?</script>""", "' '"),
        ("""(?is)<style\b[^>]*>.*?</style>""", "' '"),
        ("""<[^>]*>""", "' '"),
        ("""&nbsp;""", "' '"),
        ("""&lt;""", "'<'"),
        ("""&gt;""", "'>'"),
        ("""&quot;""", "'\"'"),
        ("""&#39;""", "CHR(39)"),
        ("""&amp;""", "'&'"),
        ("""\s+""", "' '"))
        .foldLeft("h") { case (acc, (pat, rep)) =>
          s"regexp_replace($acc, '$pat', $rep, 'g')"
        }
      w(s"""WITH page AS (
         |  SELECT doc_id,
         |    '<HTML><head><title>T</title><style type="text/css">p { color: red; }</style></head><body><h1>Doc '
         |    || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
         |    '</p><script>var x = 1 < 2 && doc;</script><p>&amp; more &lt;tags&gt;&nbsp;end</p></body></html>'
         |      AS h
         |  FROM documents),
         |c AS (SELECT doc_id, trim($chain) AS clean FROM page)
         |SELECT doc_id, md5(clean) AS h, CAST(len(clean) AS BIGINT) AS len
         |FROM c ORDER BY doc_id""")
    },

    // embed_standardize: 6dp moments, zero-variance guard, same
    // (x − m)/s tree
    "embed_standardize" -> w(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |st AS (
        |  SELECT idx.i, round(avg(e.v[idx.i + 1]), 6) AS m,
        |    round(stddev_pop(e.v[idx.i + 1]), 6) AS s
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 64)) AS i) idx
        |  GROUP BY idx.i)
        |SELECT e.vec_id, CAST(st.i AS INTEGER) AS i,
        |  round(CASE WHEN st.s = 0 THEN 0.0
        |             ELSE (e.v[st.i + 1] - st.m) / st.s END, 4) + 0.0 AS z
        |FROM e CROSS JOIN st ORDER BY vec_id, i"""),

    // quality_filter: the unigram chain unrounded feeds quantile_cont
    // (same interpolation as percentile) and a strict < keep
    "quality_filter" -> w(
      s"""WITH tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS cnt FROM (
         |    SELECT doc_id, unnest($toksSql) AS term FROM documents) GROUP BY 1, 2),
         |ctf AS (SELECT term, sum(cnt) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(ctf) AS t FROM ctf),
         |per AS (SELECT tf.doc_id, tf.term, tf.cnt,
         |    tf.cnt * -ln(c.ctf / tot.t) AS s
         |  FROM tf JOIN ctf c USING (term) CROSS JOIN tot),
         |agg AS (SELECT doc_id,
         |    list_reduce(list_prepend(0.0, list(s ORDER BY term)), (a, b) -> a + b)
         |      / sum(cnt) AS nll
         |  FROM per GROUP BY 1),
         |thr AS (SELECT quantile_cont(nll, 0.9) AS thr FROM agg),
         |kept AS (SELECT a.doc_id, a.nll FROM agg a CROSS JOIN thr
         |  WHERE a.nll < thr.thr)
         |SELECT d.source, count(*) AS n_kept,
         |  round(list_reduce(list_prepend(0.0, list(k.nll ORDER BY k.doc_id)),
         |    (a, b) -> a + b) / count(*), 4) AS avg_nll
         |FROM kept k JOIN documents d USING (doc_id)
         |GROUP BY 1 ORDER BY 1"""),

    // lr_quality: hashed features + all three GD iterations replayed;
    // 6dp-rounded gradients pin the weight chain across engines
    "lr_quality" -> lrOracleSql,

    // lr_calibration: the same generated replay with a decile-bucket
    // reliability tail
    "lr_calibration" -> lrCalibrationSql,

    // pca_project: every step of the training replayed — rounded
    // moments, each power iteration a (matvec, norm, divide) CTE
    // triple with ascending-index folds, deflation between components
    "pca_project" -> pcaOracleSql,

    // ann_matryoshka: prefix slice v[1:16] shortlists, full-vector
    // rescore — both cosine chains and both tie-breaks replayed
    "ann_matryoshka" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT id AS qid, v AS qv, v[1:16] AS qpv FROM e WHERE id < 5),
         |idx AS (SELECT id, v[1:16] AS pv FROM e),
         |short AS (
         |  SELECT q.qid, q.qv, i.id AS nbr,
         |    ${cos("q.qpv", "i.pv")} AS pcos,
         |    row_number() OVER (PARTITION BY q.qid ORDER BY
         |      ${cos("q.qpv", "i.pv")} DESC, i.id) AS r
         |  FROM idx i CROSS JOIN q WHERE i.id <> q.qid),
         |resc AS (
         |  SELECT s.qid, s.nbr, ${cos("s.qv", "c.v")} AS cos,
         |    row_number() OVER (PARTITION BY s.qid ORDER BY
         |      ${cos("s.qv", "c.v")} DESC, s.nbr) AS rank
         |  FROM short s JOIN e c ON c.id = s.nbr WHERE s.r <= 30)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos
         |FROM resc WHERE rank <= 3 ORDER BY qid, rank"""),

    // rp_project: the same hp_j_i sign family as ann_lsh, each output
    // coordinate folded i-ascending with a 0.0 init
    "rp_project" -> w(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |signs AS (
         |  SELECT j, list_transform(range(0, 64), i ->
         |    CASE WHEN (strpos('0123456789abcdef',
         |        substring(md5('hp_' || j || '_' || i), 1, 1)) - 1) % 2 = 1
         |      THEN 1.0 ELSE -1.0 END) AS s
         |  FROM (SELECT unnest(range(0, 16)) AS j)
         |), p AS (
         |  SELECT e.vec_id, s.j,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(0, 64), i -> e.v[i+1] * s.s[i+1])),
         |      (a, b) -> a + b) AS pv
         |  FROM e CROSS JOIN signs s)
         |SELECT vec_id, CAST(j AS INTEGER) AS j, round(pv, 4) AS pv
         |FROM p ORDER BY vec_id, j"""),

    "ann_lsh" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |signs AS (
         |  SELECT j, list_transform(range(0, 64), i ->
         |    CASE WHEN (strpos('0123456789abcdef',
         |        substring(md5('hp_' || j || '_' || i), 1, 1)) - 1) % 2 = 1
         |      THEN 1.0 ELSE -1.0 END) AS s
         |  FROM (SELECT unnest(range(0, 4)) AS j)
         |), sigs AS (
         |  SELECT e.id, e.v,
         |    CAST(sum(CASE WHEN list_dot_product(e.v, s.s) > 0
         |      THEN CAST(pow(2, s.j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e CROSS JOIN signs s GROUP BY e.id, e.v
         |), probes AS (
         |  SELECT id AS qid, v AS qv,
         |    CASE WHEN p = 0 THEN bucket
         |         ELSE xor(bucket, CAST(pow(2, p - 1) AS BIGINT)) END AS probe
         |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 5)) AS p)
         |  WHERE id < 5
         |), scored AS (
         |  SELECT p.qid, c.id AS nbr, ${cos("p.qv", "c.v")} AS cos
         |  FROM probes p JOIN sigs c ON p.probe = c.bucket AND c.id <> p.qid
         |), r AS (SELECT qid, nbr, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rank FROM scored)
         |SELECT qid, rank, nbr, round(cos, 4) AS cos FROM r WHERE rank <= 3 ORDER BY qid, rank"""),
    "cos_threshold" -> w(
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT a.id AS id_a, b.id AS id_b, round(${cos("a.v", "b.v")}, 4) AS cos
         |FROM e a JOIN e b ON a.id < b.id
         |WHERE ${cos("a.v", "b.v")} >= 0.45 ORDER BY 1, 2"""),
    "embedding_clusters" -> w(
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |pairs AS MATERIALIZED (
         |  SELECT a.id AS id_a, b.id AS id_b FROM e a JOIN e b ON a.id < b.id
         |  WHERE ${cos("a.v", "b.v")} >= 0.45),
         |nodes AS MATERIALIZED (
         |  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
         |edges AS MATERIALIZED (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT ed.u, re.r FROM edges ed JOIN reach re ON re.id = ed.v)
         |SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1 ORDER BY 1"""),
    // media_frames: frame counts depend only on the synthetic generator's
    // duration arithmetic (video = every 3rd asset, duration
    // 1000*(1+i%5) ms, sampled every 250 ms) — independently recomputed.
    "media_frames" -> w(
      """SELECT i AS media_id, CAST(1000 * (1 + i % 5) / 250 AS BIGINT) AS n_frames
        |FROM range(0, 60) t(i) WHERE i % 3 = 2 ORDER BY 1"""),
    // media_features: the stub codec IS SQL-expressible — the FNV-style
    // byte fold and LCG step run in HUGEINT with explicit mod-2^64
    // (two's-complement Long wraparound ≡ mod 2^64), and >>> 33 is an
    // unsigned integer division by 2^33. This closes the last rows-only
    // gate entry.
    "media_features" -> w(
      """WITH base AS (
        |  SELECT i,
        |    CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    list_transform(range(0, 64 + CAST(i % 64 AS BIGINT)), j ->
        |      CAST(CASE WHEN (i * 31 + j * 7) % 251 > 127
        |                THEN (i * 31 + j * 7) % 251 - 256
        |                ELSE (i * 31 + j * 7) % 251 END AS HUGEINT)) AS bytes
        |  FROM (SELECT unnest(range(0, 60)) AS i)
        |), folded AS (
        |  SELECT i, kind,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), bytes),
        |      (acc, b) -> (((acc * 31 + b) % 18446744073709551616)
        |                   + 18446744073709551616) % 18446744073709551616) AS h
        |  FROM base
        |), feat AS (
        |  SELECT kind,
        |    CAST(CAST((((h * 6364136223846793005 + 1442695040888963407)
        |      % 18446744073709551616) // 8589934592) % 1000 AS INTEGER) AS REAL)
        |      / CAST(1000 AS REAL) AS f0
        |  FROM folded
        |)
        |SELECT kind, count(*) AS n, round(sum(f0), 4) AS sum_f0,
        |  round(max(f0), 4) AS max_f0
        |FROM feat GROUP BY 1 ORDER BY 1"""),
    // media_decode: Spark decodes REAL PNG bytes; the oracle never sees
    // an image — it recomputes width/height/channel means straight from
    // the generator's pixel formula (PNG is lossless, so the decoded
    // pixels ARE the formula's values). Integer pixel sums, one double
    // division, round 4 — mirroring ImageCodec.decodeStats exactly.
    "media_decode" -> w(
      """WITH dims AS (
        |  SELECT i, 16 + (i % 5) * 8 AS w, 12 + (i % 3) * 10 AS h
        |  FROM (SELECT unnest(range(0, 24)) AS i)
        |), px AS (
        |  SELECT d.i, d.w, d.h, xs.x, ys.y
        |  FROM dims d,
        |    (SELECT unnest(range(0, 48)) AS x) xs,
        |    (SELECT unnest(range(0, 32)) AS y) ys
        |  WHERE xs.x < d.w AND ys.y < d.h
        |)
        |SELECT i AS media_id, any_value(w) AS width, any_value(h) AS height,
        |  round(CAST(sum((x * 7 + y * 13 + i * 31) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS r_mean,
        |  round(CAST(sum((x * 3 + y * 5 + i * 17) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS g_mean,
        |  round(CAST(sum((x * 11 + y * 2 + i * 23) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS b_mean
        |FROM px GROUP BY 1 ORDER BY 1"""),
    // media_audio: Spark decodes REAL WAV bytes; the oracle never sees
    // a WAV file — it recomputes sample-exact RMS/peak straight from
    // the generator's integer waveform (16-bit PCM is lossless).
    // Integer square sum, one double division + sqrt, round 4 —
    // mirroring AudioCodec.decodeStats exactly.
    "media_audio" -> w(
      """WITH meta AS (
        |  SELECT i, 8000 + (i % 3) * 4000 AS rate, 2000 + (i % 5) * 500 AS frames
        |  FROM (SELECT unnest(range(0, 18)) AS i)
        |), smp AS (
        |  SELECT m.i, m.rate, m.frames,
        |    ((js.j * (m.i + 3) * 2731) % 20001) - 10000 AS s
        |  FROM meta m, (SELECT unnest(range(0, 4000)) AS j) js
        |  WHERE js.j < m.frames
        |)
        |SELECT i AS media_id, any_value(rate) AS sample_rate,
        |  any_value(frames) AS frames,
        |  any_value(frames) * 1000 // any_value(rate) AS duration_ms,
        |  round(sqrt(CAST(sum(s * s) AS DOUBLE) / any_value(frames)), 4) AS rms,
        |  max(abs(s)) AS peak
        |FROM smp GROUP BY 1 ORDER BY 1"""),

    // media_video: Spark walks REAL MP4/AVI header bytes; the oracle
    // recomputes every parsed field from the generator's closed-form
    // formula (mp4 timescale 1000 → ticks are ms; avi 40000 µs/frame →
    // 40 ms per frame).
    "media_video" -> w(
      """SELECT i AS media_id,
        |  CASE WHEN i % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |  CASE WHEN i % 2 = 0 THEN 2000 + i * 500
        |       ELSE (100 + i * 25) * 40 END AS duration_ms,
        |  1 + i % 3 AS tracks,
        |  320 + (i % 4) * 160 AS width,
        |  240 + (i % 3) * 120 AS height
        |FROM (SELECT unnest(range(0, 20)) AS i) ORDER BY 1"""),

    // media_video_frames: Spark decodes REAL uncompressed-AVI DIB
    // frames; the oracle never sees a container — it recomputes every
    // per-frame channel mean straight from the generator's pixel
    // formula (BI_RGB frames are lossless, so the decoded bytes ARE the
    // formula's values). Integer pixel sums, one double division,
    // round 4 — mirroring VideoContainer.decodeAviFrames exactly.
    "media_video_frames" -> w(
      """WITH dims AS (
        |  SELECT i, 16 + (i % 3) * 8 AS w, 8 + (i % 2) * 4 AS h,
        |    2 + i % 3 AS nf
        |  FROM (SELECT unnest(range(0, 12)) AS i)
        |), px AS (
        |  SELECT d.i, d.w, d.h, fs.f, xs.x, ys.y
        |  FROM dims d,
        |    (SELECT unnest(range(0, 4)) AS f) fs,
        |    (SELECT unnest(range(0, 32)) AS x) xs,
        |    (SELECT unnest(range(0, 12)) AS y) ys
        |  WHERE fs.f < d.nf AND xs.x < d.w AND ys.y < d.h
        |)
        |SELECT i AS media_id, f AS frame_idx,
        |  any_value(w) AS width, any_value(h) AS height,
        |  round(CAST(sum((x * 7 + y * 13 + f * 11 + i * 31) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS r_mean,
        |  round(CAST(sum((x * 3 + y * 5 + f * 7 + i * 17) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS g_mean,
        |  round(CAST(sum((x * 11 + y * 2 + f * 3 + i * 23) % 256) AS DOUBLE)
        |    / (any_value(w) * any_value(h)), 4) AS b_mean
        |FROM px GROUP BY 1, 2 ORDER BY 1, 2"""),
    // media_mjpeg_frames: frame COUNTS and EXTENTS are container facts
    // the generator fixes per id — the oracle replays them without
    // touching a JPEG byte; the means themselves are lossy (no SQL
    // replay) and spec-pinned for determinism + closeness instead.
    "media_mjpeg_frames" -> w(
      """SELECT i AS media_id, CAST(2 + i % 3 AS BIGINT) AS n_frames,
        |  CAST(32 + (i % 3) * 16 AS BIGINT) AS width,
        |  CAST(16 + (i % 2) * 16 AS BIGINT) AS height
        |FROM (SELECT unnest(range(0, 12)) AS i) ORDER BY 1"""),
    // media_h264_frames: the oracle replays the SPEC's integer dequant
    // arithmetic (8.5.10 luma DC, 8.5.11 chroma DC, the (x+32)>>6 IDCT
    // constant) on the generator's (qp, L, Lc) choices — zero decoder
    // code in the loop. Frames are 48x32 = 6 MBs; the PCM seed MB holds
    // the base value, the other five sit at base + delta, so the frame
    // mean is an exact integer ratio.
    // identical expected pixels for the MP4 carriage — the container
    // is lossless transport of the same NALs
    "media_mp4_h264" -> w(
      """WITH m AS (SELECT unnest(range(0, 12)) AS i),
        |fr AS (SELECT i, unnest(range(0, 2 + i % 3)) AS f FROM m),
        |p AS (
        |  SELECT i, f, 20 + (i % 8) AS qp,
        |    2 + ((i + f) % 5) AS L,
        |    CASE WHEN f % 2 = 1 THEN 2 + (i % 3) ELSE 0 END AS Lc,
        |    40 + ((i * 29 + f * 13) % 160) AS ypcm,
        |    50 + ((i * 7 + f * 11) % 140) AS cbpcm,
        |    60 + ((i * 13 + f * 5) % 120) AS crpcm
        |  FROM fr),
        |q AS (
        |  SELECT *, qp // 6 AS q6,
        |    CASE qp % 6 WHEN 0 THEN 10 WHEN 1 THEN 11 WHEN 2 THEN 13
        |      WHEN 3 THEN 14 WHEN 4 THEN 16 ELSE 18 END AS v
        |  FROM p),
        |dd AS (
        |  SELECT *,
        |    ((((L * 16 * v + (1 << (5 - q6))) >> (6 - q6)) + 32) >> 6) AS d,
        |    CASE WHEN Lc = 0 THEN 0
        |      ELSE ((((Lc * 16 * v) << q6) >> 5) + 32) >> 6 END AS e
        |  FROM q)
        |SELECT i AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(48 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
        |  round(CAST(256 * ypcm + 1280 * (ypcm + d) AS DOUBLE) / 1536, 4) AS y_mean,
        |  round(CAST(64 * cbpcm + 320 * (cbpcm + e) AS DOUBLE) / 384, 4) AS cb_mean,
        |  round(CAST(64 * crpcm + 320 * (crpcm + e) AS DOUBLE) / 384, 4) AS cr_mean
        |FROM dd ORDER BY 1, 2"""),
    // media_h264_plane: the decoded frame IS the seeded linear plane
    // (exact continuation for slopes <= 4), so the oracle is the
    // plane's mean — no codec arithmetic at all
    "media_h264_plane" -> w(
      """WITH m AS (SELECT unnest(range(0, 12)) AS i)
        |SELECT i AS media_id, CAST(0 AS BIGINT) AS frame_idx,
        |  CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
        |  round(20 + (i % 40) + 15.5 * ((1 + i % 3) + (1 + (i + 1) % 2)), 4) AS y_mean,
        |  round(30 + (i % 30) + 7.5 * ((1 + i % 2) + 1), 4) AS cb_mean,
        |  round(40 + (i % 20) + 7.5 * ((1 + i % 2) + 1), 4) AS cr_mean
        |FROM m ORDER BY 1, 2"""),
    // media_h264_i4x4: the oracle walks the 16 blocks in raster order
    // with a RECURSIVE CTE carrying the reconstructed block values —
    // H chains left, V chains up, DC averages ((a+b+1)>>1 = //2), and
    // the per-block delta replays the spec's plain 4x4 dequant at scan
    // position 0 ((c·normAdjust << qp/6) + 32) >> 6. No decoder code.
    "media_h264_i4x4" -> w(
      """WITH RECURSIVE m AS (SELECT unnest(range(0, 12)) AS i),
        |fr AS (SELECT i, unnest(range(0, 1 + i % 2)) AS f FROM m),
        |p AS (SELECT i, f, 20 + (i % 8) AS qp,
        |    30 + ((i * 23 + f * 17) % 120) AS ypcm,
        |    50 + (i % 100) AS cbpcm, 60 + (i % 90) AS crpcm FROM fr),
        |q AS (SELECT *, qp // 6 AS q6,
        |    CASE qp % 6 WHEN 0 THEN 10 WHEN 1 THEN 11 WHEN 2 THEN 13
        |      WHEN 3 THEN 14 WHEN 4 THEN 16 ELSE 18 END AS v FROM p),
        |step AS (
        |  SELECT i, f, 0 AS n, CAST([] AS BIGINT[]) AS vs FROM q
        |  UNION ALL
        |  SELECT s.i, s.f, s.n + 1,
        |    list_append(s.vs,
        |      CASE
        |        WHEN s.n // 4 = 0 THEN (CASE WHEN s.n % 4 = 0 THEN q.ypcm ELSE s.vs[s.n] END)
        |        WHEN s.n % 4 = 0 THEN s.vs[s.n - 3]
        |        ELSE (s.vs[s.n] + s.vs[s.n - 3] + 1) // 2
        |      END
        |      + ((((1 + (q.i + (s.n % 4) + 2 * (s.n // 4)) % 3) * q.v) << q.q6) + 32) // 64)
        |  FROM step s JOIN q ON q.i = s.i AND q.f = s.f
        |  WHERE s.n < 16
        |)
        |SELECT q.i AS media_id, CAST(q.f AS BIGINT) AS frame_idx,
        |  CAST(32 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  round(CAST(256 * q.ypcm + 16 * list_aggregate(s.vs, 'sum') AS DOUBLE) / 512, 4) AS y_mean,
        |  round(CAST(q.cbpcm AS DOUBLE), 4) AS cb_mean,
        |  round(CAST(q.crpcm AS DOUBLE), 4) AS cr_mean
        |FROM step s JOIN q ON q.i = s.i AND q.f = s.f
        |WHERE s.n = 16 ORDER BY 1, 2"""),
    // MP4 carriage of the SAME I_4x4 streams: lossless transport, so
    // the oracle is identical (looked up post-hoc below)
    "media_h264_frames" -> w(
      """WITH m AS (SELECT unnest(range(0, 12)) AS i),
        |fr AS (SELECT i, unnest(range(0, 2 + i % 3)) AS f FROM m),
        |p AS (
        |  SELECT i, f, 20 + (i % 8) AS qp,
        |    2 + ((i + f) % 5) AS L,
        |    CASE WHEN f % 2 = 1 THEN 2 + (i % 3) ELSE 0 END AS Lc,
        |    40 + ((i * 29 + f * 13) % 160) AS ypcm,
        |    50 + ((i * 7 + f * 11) % 140) AS cbpcm,
        |    60 + ((i * 13 + f * 5) % 120) AS crpcm
        |  FROM fr),
        |q AS (
        |  SELECT *, qp // 6 AS q6,
        |    CASE qp % 6 WHEN 0 THEN 10 WHEN 1 THEN 11 WHEN 2 THEN 13
        |      WHEN 3 THEN 14 WHEN 4 THEN 16 ELSE 18 END AS v
        |  FROM p),
        |dd AS (
        |  SELECT *,
        |    ((((L * 16 * v + (1 << (5 - q6))) >> (6 - q6)) + 32) >> 6) AS d,
        |    CASE WHEN Lc = 0 THEN 0
        |      ELSE ((((Lc * 16 * v) << q6) >> 5) + 32) >> 6 END AS e
        |  FROM q)
        |SELECT i AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(48 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
        |  round(CAST(256 * ypcm + 1280 * (ypcm + d) AS DOUBLE) / 1536, 4) AS y_mean,
        |  round(CAST(64 * cbpcm + 320 * (cbpcm + e) AS DOUBLE) / 384, 4) AS cb_mean,
        |  round(CAST(64 * crpcm + 320 * (crpcm + e) AS DOUBLE) / 384, 4) AS cr_mean
        |FROM dd ORDER BY 1, 2"""),
    // image_phash: the oracle never decodes a PNG — it recomputes the
    // integer milli-luma of every pixel from the generator formula,
    // sums the 8×8 block grid, applies the identical cross-multiplied
    // comparison, and Horner-packs the 64 bits (HUGEINT → signed
    // BIGINT wraparound, the winnow trick).
    "image_phash" -> (phashBitsCte + w(
      """, ph AS (
        |  SELECT i, list_reduce(
        |    list_prepend(CAST(0 AS HUGEINT),
        |      list(CAST(bit AS HUGEINT) ORDER BY j DESC)),
        |    (a, b) -> a * 2 + b) AS hu
        |  FROM bits GROUP BY 1)
        |SELECT i AS media_id,
        |  CASE WHEN hu >= 9223372036854775808
        |       THEN CAST(hu - 18446744073709551616 AS BIGINT)
        |       ELSE CAST(hu AS BIGINT) END AS phash
        |FROM ph ORDER BY media_id""")),
    // image_phash_pairs: brute-force Hamming over the formula bits —
    // equal to the engine's pigeonhole join by construction (hd ≤ 3
    // implies a shared 16-bit chunk), so the exact answer gates the
    // bucketed path, minhash_lsh-style.
    "image_phash_pairs" -> (phashBitsCte + w(
      """SELECT a.i AS id_a, b.i AS id_b,
        |  count(*) FILTER (WHERE a.bit != b.bit) AS hd
        |FROM bits a JOIN bits b ON a.j = b.j AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) FILTER (WHERE a.bit != b.bit) <= 3
        |ORDER BY 1, 2"""))
  )

  /** ann_recall oracle: every approximate chain is already replicated
    * bit-exactly by its own oracle SQL, so the recall oracle NESTS those
    * verbatim as subqueries (standard SQL allows WITH inside a derived
    * table) and counts (qid, nbr) overlaps with the brute chain — the
    * recall measurement inherits each method's bit-exactness instead of
    * restating ~300 lines of k-means SQL. Two mechanical rewrites on
    * the nested text, anchor-checked so a future edit to the source
    * chains fails loudly here instead of silently skewing the metric:
    * the final top-k cap widens 3→30 (ranking is (cos DESC, nbr) both
    * sides, so top-3 is the prefix), and the pq32 variant grows the
    * four subspace seed sets 8→32 codes.
    */
  private val annRecallSql: String = {
    val cap = "WHERE rank <= 3 ORDER BY qid, rank"
    def widen(name: String): String = {
      val sql = oracleCore(name)
      require(sql.trim.endsWith(cap), s"$name oracle no longer ends with '$cap'")
      s"(SELECT qid, nbr, rank FROM (${sql.replace(cap, "WHERE rank <= 30 ORDER BY qid, rank")}))"
    }
    val pq32 = {
      val sql = oracleCore("ann_pq")
      require(sql.sliding("LIMIT 8".length).count(_ == "LIMIT 8") == 4,
        "ann_pq oracle seed CTEs changed — pq32 rewrite would mis-seed")
      sql.replace("LIMIT 8", "LIMIT 32")
    }
    def widePq32 = s"(SELECT qid, nbr, rank FROM (${pq32.replace(cap, "WHERE rank <= 30 ORDER BY qid, rank")}))"
    w(s"""WITH brute AS (SELECT qid, nbr FROM (${oracleCore("ann_brute")})),
         |sel AS (
         |  SELECT 'ivf' AS method, qid, nbr, rank FROM ${widen("ann_ivf")} UNION ALL
         |  SELECT 'ivf_pq', qid, nbr, rank FROM ${widen("ann_ivf_pq")} UNION ALL
         |  SELECT 'lsh', qid, nbr, rank FROM ${widen("ann_lsh")} UNION ALL
         |  SELECT 'pq', qid, nbr, rank FROM ${widen("ann_pq")} UNION ALL
         |  SELECT 'pq32', qid, nbr, rank FROM $widePq32 UNION ALL
         |  SELECT 'int8', qid, nbr, rank FROM ${widen("ann_int8")} UNION ALL
         |  SELECT 'binary', qid, nbr, rank FROM ${widen("ann_binary")} UNION ALL
         |  SELECT 'matryoshka', qid, nbr, rank FROM ${widen("ann_matryoshka")})
         |SELECT m.method, CAST(ks.k AS BIGINT) AS k,
         |  CAST(count(b.qid) AS BIGINT) AS hits,
         |  CAST(15 AS BIGINT) AS total,
         |  round(count(b.qid) / 15.0, 4) AS recall
         |FROM (VALUES ('ivf'), ('ivf_pq'), ('lsh'), ('pq'), ('pq32'), ('int8'), ('binary'), ('matryoshka')) m(method)
         |CROSS JOIN (VALUES (3), (30)) ks(k)
         |LEFT JOIN sel s ON s.method = m.method AND s.rank <= ks.k
         |LEFT JOIN brute b ON b.qid = s.qid AND b.nbr = s.nbr
         |GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  /** hybrid_rrf oracle: the bm25 and brute-cosine chains restated with
    * FULL-precision scores (the per-method gate SQL rounds its output,
    * which would corrupt rank derivation), ranked, fused by
    * 1/(60+rank) with a src-ordered fold — the same arithmetic
    * [[graft.llmops.VectorOps.rrfFuse]] runs.
    */
  private val hybridRrfSql: String = w(
    s"""WITH docs AS (SELECT doc_id, CAST(len($toksSql) AS DOUBLE) AS dl,
       |    $toksSql AS toks FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM docs),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf FROM (
       |    SELECT doc_id, dl, unnest(toks) AS term FROM docs)
       |  WHERE term IN ('spark', 'vector', 'query') GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |per AS (SELECT tf.doc_id, tf.term,
       |    ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
       |      * (tf.tf * (1.2 + 1.0))
       |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS sc
       |  FROM tf JOIN dfreq f USING (term) CROSS JOIN stats s),
       |bsc AS (SELECT doc_id, list_reduce(
       |    list_prepend(0.0, list(sc ORDER BY term)), (a, b) -> a + b) AS score
       |  FROM per GROUP BY 1),
       |bm AS (SELECT doc_id AS id, rank FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |    FROM bsc) WHERE rank <= 20),
       |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT * FROM e WHERE id = 0),
       |scored AS (SELECT c.id AS nbr, ${cos("q.v", "c.v")} AS cos
       |  FROM q JOIN e c ON c.id <> q.id),
       |ann AS (SELECT nbr AS id, rank FROM (
       |    SELECT nbr, row_number() OVER (ORDER BY cos DESC, nbr) AS rank FROM scored)
       |  WHERE rank <= 20),
       |u AS (SELECT id, CAST(rank AS BIGINT) AS rank, 0 AS src FROM bm
       |  UNION ALL SELECT id, CAST(rank AS BIGINT), 1 FROM ann),
       |fus AS (SELECT id, list_reduce(
       |    list_prepend(0.0, list(1.0 / (60 + rank) ORDER BY src)), (a, b) -> a + b) AS score
       |  FROM u GROUP BY 1),
       |top AS (SELECT * FROM fus ORDER BY score DESC, id LIMIT 10)
       |SELECT id, round(score, 4) AS score FROM top ORDER BY id""")

  /** retrieval_metrics oracle: same nesting trick as [[annRecallSql]]
    * (each method chain reused verbatim, cap widened 3→10), binary
    * relevance from the brute top-3, MRR = mean reciprocal first-hit
    * rank, NDCG@10 with the ln discount (base-invariant in the
    * DCG/IDCG ratio, so both engines run plain `ln`).
    */
  private val retrievalMetricsSql: String = {
    val cap = "WHERE rank <= 3 ORDER BY qid, rank"
    def widen10(name: String): String = {
      val sql = oracleCore(name)
      require(sql.trim.endsWith(cap), s"$name oracle no longer ends with '$cap'")
      s"(SELECT qid, nbr, rank FROM (${sql.replace(cap, "WHERE rank <= 10 ORDER BY qid, rank")}))"
    }
    w(s"""WITH brute AS (SELECT qid, nbr FROM (${oracleCore("ann_brute")})),
         |sel AS (
         |  SELECT 'binary' AS method, qid, nbr, rank FROM ${widen10("ann_binary")} UNION ALL
         |  SELECT 'int8', qid, nbr, rank FROM ${widen10("ann_int8")} UNION ALL
         |  SELECT 'lsh', qid, nbr, rank FROM ${widen10("ann_lsh")}),
         |j AS (SELECT s.method, s.qid, s.rank,
         |    CASE WHEN b.nbr IS NULL THEN 0.0 ELSE 1.0 END AS rel
         |  FROM sel s LEFT JOIN brute b ON b.qid = s.qid AND b.nbr = s.nbr),
         |per AS (SELECT method, qid, sum(rel / ln(rank + 1.0)) AS dcg,
         |    max(CASE WHEN rel = 1.0 THEN 1.0 / rank ELSE 0.0 END) AS rr
         |  FROM j GROUP BY 1, 2)
         |SELECT method, round(avg(rr), 4) AS mrr,
         |  round(avg(dcg / (1.0 / ln(2.0) + 1.0 / ln(3.0) + 1.0 / ln(4.0))), 4) AS ndcg
         |FROM per GROUP BY 1 ORDER BY 1""")
  }

  val oracle: Map[String, String] = {
    val base = oracleCore + ("ann_recall" -> annRecallSql,
      "hybrid_rrf" -> hybridRrfSql,
      "retrieval_metrics" -> retrievalMetricsSql)
    // MP4 carriage is lossless transport of the same I_4x4 NALs
    base + ("media_mp4_i4x4" -> base("media_h264_i4x4"))
  }
}
