package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * and document fingerprinting.
  *
  * All are pure Column expressions (whole-stage codegen, no UDFs), so
  * they run inside the scan projection at 100 TB with zero extra
  * shuffles.
  */
object TextOps {

  /** Whitespace normalization + lowercase — the canonical text form. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * punctuation marks each count as one token (a cheap stand-in for a
    * real byte-pair-encoding vocabulary).
    */
  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Exact occurrence count of any of `words` among the tokens. */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  // Tiny per-language stopword lists for the language-ID heuristic.
  val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  val FrStop = Seq("le", "les", "et", "est", "pas", "avec", "dans", "une")
  val EsStop = Seq("el", "los", "y", "es", "no", "con", "por", "para")

  /** Count of CJK (Han) characters — the zh signal. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))

  /** Language-ID by stopword/charset scoring with a fixed priority
    * order (en > de > fr > es > zh) on ties. A real system would use
    * character n-gram models; the shape (per-row scoring expression,
    * argmax) is identical.
    */
  def langId(text: Column): Column = {
    val en = wordHits(text, EnStop)
    val de = wordHits(text, DeStop)
    val fr = wordHits(text, FrStop)
    val es = wordHits(text, EsStop)
    val zh = cjkCount(text)
    when(en >= de && en >= fr && en >= es && en >= zh, "en")
      .when(de >= fr && de >= es && de >= zh, "de")
      .when(fr >= es && fr >= zh, "fr")
      .when(es >= zh, "es")
      .otherwise("zh")
  }

  /** Heuristic quality score in [0,1]: rewards length and stopword
    * density, penalizes digit-heavy text.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = wordHits(text, EnStop).cast("double") / nTok
    val digitRatio =
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text).cast("double")
    lit(0.4) * least(nTok / 50.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(digitRatio * 10.0, lit(1.0)))
  }

  /** Flesch reading-ease score from three compiled regex counts:
    * words = whitespace tokens, sentences = terminator runs `[.!?]+`
    * (floored at 1), syllables ≈ vowel-group runs `[aeiouy]+` of the
    * lowercased text (the classic heuristic — vowel runs never span a
    * space, so the whole-text count equals the per-word sum). All three
    * are integer-exact; the only FP is the final linear formula, which
    * the oracle writes with the identical shape.
    */
  def fleschScore(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences =
      greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("double")
    val syllables = regexp_count(lower(text), lit("[aeiouy]+")).cast("double")
    lit(206.835) - lit(1.015) * (words / sentences) -
      lit(84.6) * (syllables / words)
  }

  /** Total word-trigram occurrences (with repetition) of a document. */
  def trigramTotal(text: Column): Column =
    greatest(tokenCount(text) - 2, lit(0)).cast("long")

  /** Distinct word-trigram count. Together with [[trigramTotal]] this
    * gives the duplicate-n-gram fraction `1 − distinct/total` — the
    * Gopher-style repetition quality rule (Rae et al. 2021 §A1.1:
    * documents dominated by repeated n-grams are boilerplate/spam and
    * get filtered).
    *
    * NOTE: Catalyst higher-order-function lambdas run interpreted
    * (no whole-stage codegen) — measured ~15× slower than the compiled
    * pass for corpus-wide scans. Kept as the Column form for ad-hoc
    * per-row use; pipelines should call [[trigramStats]].
    */
  def trigramDistinct(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= 3,
      size(array_distinct(transform(sequence(lit(1), greatest(n - 2, lit(1))), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))))
      .otherwise(lit(0)).cast("long")
  }

  /** Compiled one-pass trigram stats: for each row emits
    * `(group, tt, td)` where `tt` = total word-trigram occurrences and
    * `td` = distinct word-trigram count, byte-identical to
    * [[trigramTotal]]/[[trigramDistinct]] but as a single
    * `Dataset.map` pass (tokenize once, HashSet of trigram strings) —
    * the same compiled-scan discipline as
    * [[DedupOps.minHashDocSignatures]]. Scan-stage only, no shuffle:
    * this is the form a 100 TB per-byte quality pass runs — which is
    * exactly why it is NOT spread: inserting a repartition would put a
    * full text-bytes exchange in front of a shuffle-free pass (r19
    * paired A/B: the r18 spread measured 1.31× on repetition_stats).
    */
  def trigramStats(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df
      .select(col(groupCol).cast("string"), col(textCol))
      .as[(String, String)]
      .map { case (g, text) =>
        // Mirrors normalize()/tokens(): lowercase, collapse whitespace,
        // trim, split on single spaces (limit -1 like Spark's split).
        val t = text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ").trim
        val toks = t.split(" ", -1)
        val n = toks.length
        val tt = math.max(n - 2, 0).toLong
        val td =
          if (n < 3) 0L
          else {
            val set = new java.util.HashSet[String](n * 2)
            val sb = new java.lang.StringBuilder(64)
            var i = 0
            while (i + 2 < n) {
              sb.setLength(0)
              sb.append(toks(i)).append(' ').append(toks(i + 1))
                .append(' ').append(toks(i + 2))
              set.add(sb.toString)
              i += 1
            }
            set.size.toLong
          }
        (g, tt, td)
      }
      .toDF(groupCol, "tt", "td")
  }

  /** Consecutive non-overlapping `c`-word chunks of the normalized
    * text — the passage-level dedup unit (CCNet dedups paragraphs;
    * for unstructured corpora a fixed word window is the analogue).
    * One compiled flatMap pass per document (the [[trigramStats]]
    * discipline — HOF slice/transform lambdas would run interpreted).
    * Output: (id, chunk string); hashing happens downstream so shuffle
    * keys stay 8-byte.
    */
  def wordChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, c: Int = 8): org.apache.spark.sql.DataFrame = {
    require(c >= 1, "chunk size must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ").trim
        val toks = t.split(" ", -1)
        val m = toks.length / c
        (0 until m).iterator.map { i =>
          val sb = new java.lang.StringBuilder(c * 8)
          var j = i * c
          while (j < (i + 1) * c) {
            if (j > i * c) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          (id, sb.toString)
        }
      }
      .toDF("id", "chunk")
  }

  /** Passage-duplication stats per document: of a document's `c`-word
    * chunks, how many occur more than once in the ENTIRE corpus
    * (including within the document itself) — the CCNet-style shared-
    * passage fraction used to strip boilerplate before training.
    *
    * Scale shape: chunks hash to 8-byte keys (xxhash64, codegen'd); one
    * shuffle builds the chunk-frequency table, the frequency join is
    * co-partitioned on the same key (exchange reuse — no extra
    * shuffle), and the per-document rollup is the only other exchange.
    * Nothing is collected; documents with fewer than `c` tokens emit
    * zero chunks and report 0/0.
    *
    * Output: (id, n_chunks, dup_chunks, dup_frac).
    */
  def chunkDupStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, c: Int = 8): org.apache.spark.sql.DataFrame = {
    // checkpoint: the chunk index feeds BOTH the frequency table and
    // the join side — without it the compiled chunking pass re-scans
    // the corpus twice (the winnowSharedPairs lesson)
    val ch = wordChunks(docs, idCol, textCol, c)
      .select(col("id"), xxhash64(col("chunk")).as("ch"))
      .localCheckpoint()
    val freq = ch.groupBy("ch").agg(count(lit(1)).as("df"))
    val per = ch.join(freq, "ch")
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("df") > 1, 1)).as("dup_chunks"))
    docs.select(col(idCol).cast("long").as("id")).distinct()
      .join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("dup_chunks"), lit(0L)).as("dup_chunks"))
      .withColumn("dup_frac",
        when(col("n_chunks") > 0,
          col("dup_chunks").cast("double") / col("n_chunks"))
          .otherwise(lit(0.0)))
  }

  /** Corpus-wide top-k most frequent word bigrams (vocabulary
    * statistics / boilerplate discovery). One compiled flatMap pass
    * emits bigrams; counts aggregate with map-side partials; the top-k
    * plans as TakeOrderedAndProject (per-partition top-n, no global
    * sort). Ties break lexicographically so the cut is deterministic.
    */
  def topBigrams(docs: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .flatMap { text =>
        val t = text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ").trim
        val toks = t.split(" ", -1)
        (0 until toks.length - 1).iterator.map(i => toks(i) + " " + toks(i + 1))
      }
      .toDF("ngram")
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(k)
  }

  /** Top-k TF-IDF terms per corpus slice (keyword extraction /
    * domain-signature terms): tf = term occurrences within the slice,
    * df = documents containing the term corpus-wide,
    * tfidf = tf · ln(N/df).
    *
    * One exploded (doc, term) count feeds BOTH the tf and df rollups
    * (checkpointed — the tokenize+explode pass runs once); N arrives as
    * a broadcast 1-row aggregate, so the plan stays fully lazy and
    * nothing but the k·slices result leaves the executors.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      sliceCol: String, textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val dt = docs.select(col(idCol).as("id"), col(sliceCol).as("slice"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "slice", "term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tf = dt.groupBy("slice", "term").agg(sum("cnt").as("tf"))
    val df = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("slice"), col("term"),
        (col("tf").cast("double") *
          log(col("n").cast("double") / col("df"))).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("slice").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Content fingerprint: md5 of the normalized text (byte-identical
    * duplicates collapse).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Canonical token-set fingerprint: md5 over the sorted distinct
    * tokens — invariant to word order and repetition, so shuffled
    * near-duplicates collapse too.
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Winnowing document fingerprints (Schleimer/Wilkes/Aiken, SIGMOD
    * 2003 — the MOSS scheme): Rabin-Karp rolling hashes of the
    * normalized text's `k`-grams, then the MINIMUM hash of every window
    * of `w` consecutive k-gram hashes. Any shared substring of length
    * ≥ k + w − 1 between two documents is guaranteed to contribute at
    * least one common fingerprint, so the selected set is a position-
    * free content signature at ~1/w the k-gram density.
    *
    * Selection is by VALUE (ties pick the same value no matter which
    * position wins), so the distinct set is deterministic and exactly
    * replicable as a mod-2^64 Horner hash in plain SQL. The hash walks
    * Unicode code points; Long wraparound IS arithmetic mod 2^64.
    *
    * One compiled pass per document (O(len) rolling update, O(1)
    * amortized monotonic-deque window minimum), no shuffle — the scan
    * projection shape, like the MinHash signature pass.
    *
    * Output: (id, fps: array<long>), fps distinct ascending.
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, "winnow k and w must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val t = text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ").trim
        val cps = t.codePoints().toArray
        val m = cps.length - k + 1
        val out =
          if (m < 1) Seq.empty[Long]
          else {
            val hs = new Array[Long](m)
            var pow = 1L // 257^(k-1) mod 2^64
            var j = 1
            while (j < k) { pow *= 257L; j += 1 }
            var h = 0L
            var i = 0
            while (i < k) { h = h * 257L + cps(i); i += 1 }
            hs(0) = h
            i = 1
            while (i < m) {
              h = (h - cps(i - 1) * pow) * 257L + cps(i + k - 1)
              hs(i) = h
              i += 1
            }
            // window minima via monotonic deque: O(m) total
            val sel = new java.util.HashSet[Long]()
            val deque = new java.util.ArrayDeque[Int]()
            val win = math.min(w, m) // short doc: one window over all
            i = 0
            while (i < m) {
              while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i))
                deque.pollLast()
              deque.addLast(i)
              if (deque.peekFirst() <= i - win) deque.pollFirst()
              if (i >= win - 1) sel.add(hs(deque.peekFirst()))
              i += 1
            }
            val arr = new Array[Long](sel.size)
            val it = sel.iterator(); var n = 0
            while (it.hasNext) { arr(n) = it.next(); n += 1 }
            java.util.Arrays.sort(arr)
            arr.toSeq
          }
        (id, out)
      }
      .toDF("id", "fps")
  }

  /** Near-duplicate pairs by shared winnow fingerprints: documents
    * sharing at least `minShared` fingerprints, AFTER dropping
    * fingerprints whose document frequency exceeds `maxDf` (template
    * boilerplate carries no dedup signal and would emit df² rows per
    * hot fingerprint — the same cap discipline as
    * [[DedupOps.capShingles]]). Inverted-index shape: one shuffle on
    * the fingerprint, posting-list pair emission bounded by
    * Σ df·(df−1)/2, pair counts aggregated map-side. Output:
    * (id_a, id_b, shared) with id_a < id_b.
    */
  def winnowSharedPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4, minShared: Int = 15,
      maxDf: Int = DedupOps.DefaultMaxDf): org.apache.spark.sql.DataFrame =
    // Fingerprint ONCE: the df-cap consumes the exploded index twice
    // (df counts + the anti-join input), which would otherwise run the
    // compiled fingerprint pass over every document two times.
    sharedPairsFromIndex(
      winnowFingerprints(df, idCol, textCol, k, w).localCheckpoint(),
      minShared, maxDf)

  /** Pair derivation over an existing `(id, fps)` fingerprint index —
    * the [[winnowSharedPairs]] body split out so pipelines that persist
    * or checkpoint the index (daily dedup, cluster+survivor stages)
    * don't re-fingerprint per consumer.
    */
  def sharedPairsFromIndex(fps: org.apache.spark.sql.DataFrame,
      minShared: Int = 15,
      maxDf: Int = DedupOps.DefaultMaxDf): org.apache.spark.sql.DataFrame = {
    val spark = fps.sparkSession
    import spark.implicits._
    val ex = fps.select(col("id"), explode(col("fps")).as("shingle"))
    DedupOps.capShingles(ex, maxDf)
      .groupBy("shingle").agg(collect_list(col("id")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val a = ids.toArray
        java.util.Arrays.sort(a)
        for (i <- a.indices.iterator; j <- (i + 1) until a.length)
          yield (a(i), a(j))
      }
      .toDF("id_a", "id_b")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** PII patterns — deliberately in the regex subset Java and RE2
    * share (character classes + bounded quantifiers + ASCII \b; no
    * lookaround, no backrefs), so the DuckDB oracle can run the SAME
    * pattern strings. A production pass swaps richer patterns in; the
    * pipeline shape (scan-stage regexp projection, zero shuffles) is
    * what this pins.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{10,15}"

  /** HTML → text extraction, the first step of every crawl pipeline
    * (the regex approximation of trafilatura/jusText's DOM walk —
    * honest about what it is: tag/script/style removal + the six
    * core entities + whitespace collapse, not content-vs-boilerplate
    * scoring, which [[removeDuplicateChunks]] handles corpus-wide
    * instead). Patterns live in the Java∩RE2 subset (no backrefs, no
    * lookaround) like the PII family, so the oracle replays them
    * verbatim; replace order is part of the contract (`&amp;` LAST —
    * double-escaped entities resolve one level, like real parsers).
    * Pure scan projection: codegen'd regexp_replace chain, no shuffle.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => regexp_replace(c, k, v) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Occurrences of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(call_function("regexp_extract_all", text, lit(pattern), lit(0)))

  /** Redact emails → `<EMAIL>`, then IPv4 → `<IP>`, then international
    * phone numbers → `<PHONE>` — fixed order (emails first: their local
    * parts may embed digit runs, and replacement text must never create
    * new matches for later patterns). Pure Column expression: the whole
    * redaction runs inside the scan projection at 100 TB.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Leet-speak fold for blocklist matching: the obfuscation
    * substitutions a first-pass safety filter must see through
    * (0→o, 1→i, 3→e, 4→a, 5→s, 7→t, $→s, @→a) applied to lowercased
    * text — a char-for-char translate, so it stays a scan projection.
    */
  def leetFold(text: Column): Column =
    translate(lower(text), "013457$@", "oieastsa")

  /** Blocklisted-term hits in the leet-folded text: the standard
    * wordlist screen (NSFW / toxicity / spam lists) every curation
    * pipeline runs before the learned classifiers. Terms are folded
    * the same way as the text (so "b1g" and "big" are one term),
    * deduplicated and sorted into a single word-boundary alternation —
    * one compiled regex pass per row in the Java∩RE2 subset, no
    * shuffle, list size bounded by the wordlist (not the corpus).
    * Returns the matched-occurrence array; `size(...)` is the hit
    * count, emptiness the keep verdict.
    */
  def blocklistHits(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    val folded = terms.map(t =>
        t.toLowerCase(java.util.Locale.ROOT).map {
          case '0' => 'o'; case '1' => 'i'; case '3' => 'e'; case '4' => 'a'
          case '5' => 's'; case '7' => 't'; case '$' => 's'; case '@' => 'a'
          case c => c
        }).distinct.sorted
    require(folded.forall(_.matches("[a-z]+")),
      s"blocklist terms must fold to plain words, got: ${folded.mkString(",")}")
    val pat = "\\b(" + folded.mkString("|") + ")\\b"
    call_function("regexp_extract_all", leetFold(text), lit(pat), lit(1))
  }

  /** URL pattern in the same Java∩RE2 subset as the PII family:
    * scheme, host (with optional port), then path / query / fragment
    * runs bounded by whitespace-and-delimiter classes.
    */
  val UrlRe = "https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\\s?#]*)?(?:\\?[^\\s#]*)?(?:#[^\\s]*)?"

  /** All URLs occurring in the text, in order. */
  def extractUrls(text: Column): Column =
    call_function("regexp_extract_all", text, lit(UrlRe), lit(0))

  /** Lower-cased host of a URL. */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, "^https?://([A-Za-z0-9.-]+)", 1))

  /** Canonical form for URL-level dedup — the first dedup stage of a
    * web-crawl pipeline (far cheaper than any content pass: two
    * fetches of one URL are duplicates before you ever hash a byte):
    * query string and fragment drop, scheme+host lowercase, path kept
    * case-sensitive (RFC 3986: host is case-insensitive, path is not).
    */
  def canonicalizeUrl(url: Column): Column = concat(
    lower(regexp_extract(url, "^(https?://[A-Za-z0-9.-]+(?::[0-9]+)?)", 1)),
    regexp_extract(url, "^https?://[A-Za-z0-9.-]+(?::[0-9]+)?([^#?]*)", 1))

  /** BM25 keyword retrieval (Robertson–Spärck Jones, Lucene's
    * non-negative idf form): for query terms Q,
    * `score(d) = Σ_{t∈Q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    *             · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
    * The curation use: keyword-targeted corpus slicing (pull the top-k
    * documents about X for an eval set or a domain mixture) without an
    * embedding model in the loop.
    *
    * Scale shape: one tokenize scan → per-(doc, term) counts with the
    * query-term filter pushed BELOW the groupBy (only matching tokens
    * ever enter the aggregation, so the shuffle carries ≤ |Q| rows per
    * doc); df and (N, avgdl) are |Q|-row / 1-row aggregates that
    * broadcast back; nothing corpus-sized is ever collected or
    * re-shuffled. Per-doc summation folds in term order over a sorted
    * array — bitwise-deterministic across partitionings (and engines:
    * the DuckDB oracle folds the same order).
    *
    * Returns (doc_id, score) — the top-k by (score DESC, doc_id), via
    * orderBy+limit (TakeOrdered: per-partition local top-k, driver
    * merges k·p rows — no global-window single-partition shuffle).
    */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("double").as("dl"),
      tokens(col(textCol)).as("toks"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(query))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val per = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    // fold in term order (array_sort on (term, s) structs): FP addition
    // is non-associative, so an unordered SQL SUM could differ in the
    // last ulp between engines/partitionings and flip a near-tie rank
    val scored = per.groupBy("doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("score"))
  }

  /** Unigram-LM per-document negative log-likelihood — the
    * perplexity-style quality filter (CCNet/Gopher filter on LM
    * perplexity; the unigram form keeps the pipeline shape — train a
    * corpus LM, score every document, filter the tail — with exact
    * cross-engine arithmetic instead of an external KenLM binary):
    * `nll(d) = Σ_t cnt_t·(−ln(ctf_t / T)) / |d|` where ctf is the
    * corpus term frequency and T the corpus token total. Low = fluent
    * under the corpus distribution; high = rare-token-heavy outliers.
    *
    * Scale shape: one tokenize scan → per-(doc, term) counts; corpus
    * term frequencies are ONE more aggregation over those counts
    * (vocabulary-sized, broadcast back); the 1-row total rides a
    * broadcast crossJoin. The per-doc sum folds over term-sorted
    * entries — same cross-engine FP-determinism trick as [[bm25TopK]].
    * Returns (id, n_tok, nll).
    */
  def unigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // materialized (r18): tf feeds both the corpus model (ctf) and the
    // scoring join — one materialization of the (id, term, cnt) table
    // replaces a second tokenize pass over the corpus. (The checkpoint
    // truncates the query's visible plan, so PlanGateSpec asserts scan
    // pruning on [[unigramTf]] — the real pre-checkpoint frame.)
    val tf = unigramTf(df, idCol, textCol).localCheckpoint()
    val ctf = tf.groupBy("term").agg(sum("cnt").as("ctf"))
    val total = ctf.agg(sum("ctf").as("t"))
    val per = tf.join(broadcast(ctf), "term").crossJoin(broadcast(total))
      .withColumn("s", col("cnt") * -log(col("ctf") / col("t")))
    per.groupBy("id")
      .agg(
        sum(col("cnt")).cast("long").as("n_tok"),
        (aggregate(
          array_sort(collect_list(struct(col("term"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")) / sum(col("cnt"))).as("nll"))
  }

  /** The (id, term, cnt) table [[unigramNll]] trains and scores from,
    * UN-checkpointed — exposed so the pruning gate (PlanGateSpec) can
    * assert the 2-column scan on the frame that actually feeds the
    * checkpoint, which truncates the query's own visible plan.
    */
  private[graft] def unigramTf(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("cnt"))

  /** Interpolated bigram-LM per-document negative log-likelihood — the
    * next step from [[unigramNll]] toward the 5-gram KenLM filter CCNet
    * actually runs: P(w|p) = λ·c(p,w)/c(p,·) + (1−λ)·c(w)/T, scored
    * over every transition, `nll(d) = Σ −ln P / transitions`. The
    * interpolation backstops unseen-in-context words with the unigram
    * model, so every observed transition has positive probability
    * (both models train on the corpus being scored, the standard
    * self-perplexity filter setup).
    *
    * Scale shape decides the join strategy: the UNIGRAM model is
    * vocabulary-sized → broadcast (like unigramNll), but the BIGRAM
    * model grows toward vocab² and at 100 TB does NOT fit an executor —
    * it stays a distributed table, and scoring joins doc-transition
    * counts against it with a hash shuffle co-partitioned on the
    * bigram key (both sides just aggregated on that very key, so the
    * planner reuses the partitioning; no broadcast of an unbounded
    * model). λ defaults to 0.5, exactly representable in binary so
    * `1−λ` is ulp-identical across engines. Per-doc sums fold in
    * (p,w) order — the family's FP-determinism discipline. Returns
    * (id, n_bi, nll); documents with fewer than 2 tokens drop (no
    * transitions to score).
    */
  def bigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val dfS = graft.SparkTuning.spreadSmallScan(df)
    val toks = dfS.select(col(idCol).as("id"), tokens(col(textCol)).as("arr"))
      .filter(size(col("arr")) >= 2)
    val pairs = toks.select(col("id"), explode(zip_with(
      slice(col("arr"), lit(1), size(col("arr")) - 1),
      slice(col("arr"), lit(2), size(col("arr")) - 1),
      (p, w) => struct(p.as("p"), w.as("w")))).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.w").as("w"))
    // NOT materialized (r18 probe): dbf/bc have multiple consumers, but
    // their repeated references are identical exchanges that AQE's
    // runtime exchange reuse already dedupes — adding localCheckpoints
    // here measured 1.08×/1.16× (paired minima, sf0.1), pure
    // materialization cost.
    val dbf = pairs.groupBy("id", "p", "w")
      .agg(count(lit(1)).cast("double").as("cnt"))
    val bc = dbf.groupBy("p", "w").agg(sum("cnt").as("bcnt"))
    val pc = bc.groupBy("p").agg(sum("bcnt").as("pcnt"))
    // unigram model over ALL tokens (not just bigram participants):
    // last tokens count too, mirroring a separately-trained unigram LM
    val uni = dfS.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("double").as("ucnt"))
    val ut = uni.agg(sum("ucnt").as("ut"))
    val per = dbf
      .join(bc, Seq("p", "w"))
      .join(pc, Seq("p"))
      .join(broadcast(uni), Seq("w"))
      .crossJoin(broadcast(ut))
      .withColumn("s", col("cnt") * -log(
        lit(lambda) * (col("bcnt") / col("pcnt")) +
          lit(1 - lambda) * (col("ucnt") / col("ut"))))
    per.groupBy("id").agg(
      sum(col("cnt")).cast("long").as("n_bi"),
      (aggregate(
        array_sort(collect_list(struct(col("p"), col("w"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")) / sum(col("cnt"))).as("nll"))
  }

  /** Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the
    * smoothing KenLM defaults to) — the step up from [[bigramNll]]'s
    * λ-interpolation: absolute discounting of the bigram estimate,
    * with the freed mass backed off to the CONTINUATION probability
    * (in how many distinct contexts does w appear) rather than raw
    * unigram frequency:
    *
    *   P(w|p) = max(c(p,w) − D, 0)/c(p·)
    *          + D·N₁₊(p·)/c(p·) · N₁₊(·w)/|bigram types|
    *
    * Train = score corpus (as bigramNll), so every scored bigram has
    * c(p,w) ≥ 1 and the probability is always positive. Scale shape is
    * identical to bigramNll: the bigram/context model tables stay
    * JOINED on their own aggregation keys (vocabulary²-sized — never a
    * broadcast), only the continuation-type table (vocabulary-sized)
    * and the scalar type count broadcast. Per-document folds are
    * (p, w)-ordered for cross-engine FP determinism.
    * Returns (id, n_bi, nll).
    */
  def kneserNeyNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("arr"))
      .filter(size(col("arr")) >= 2)
    val pairs = toks.select(col("id"), explode(zip_with(
      slice(col("arr"), lit(1), size(col("arr")) - 1),
      slice(col("arr"), lit(2), size(col("arr")) - 1),
      (p, w) => struct(p.as("p"), w.as("w")))).as("b"))
      .select(col("id"), col("b.p").as("p"), col("b.w").as("w"))
    // NOT materialized (r18 probe): see [[bigramNll]] — AQE exchange
    // reuse already dedupes the repeated model references; checkpoints
    // here measured 1.16× (paired minima, sf0.1).
    val dbf = pairs.groupBy("id", "p", "w")
      .agg(count(lit(1)).cast("double").as("cnt"))
    val bc = dbf.groupBy("p", "w").agg(sum("cnt").as("bcnt"))
    // context totals AND N₁₊(p·) = distinct continuations of p
    val pc = bc.groupBy("p").agg(sum("bcnt").as("pcnt"),
      count(lit(1)).cast("double").as("ntypes"))
    // continuation counts N₁₊(·w) = distinct predecessors of w
    val cont = bc.groupBy("w").agg(count(lit(1)).cast("double").as("nprec"))
    val tt = bc.agg(count(lit(1)).cast("double").as("tb"))
    val per = dbf
      .join(bc, Seq("p", "w"))
      .join(pc, Seq("p"))
      .join(broadcast(cont), Seq("w"))
      .crossJoin(broadcast(tt))
      .withColumn("s", col("cnt") * -log(
        greatest(col("bcnt") - lit(discount), lit(0.0)) / col("pcnt") +
          lit(discount) * col("ntypes") / col("pcnt") * (col("nprec") / col("tb"))))
    per.groupBy("id").agg(
      sum(col("cnt")).cast("long").as("n_bi"),
      (aggregate(
        array_sort(collect_list(struct(col("p"), col("w"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")) / sum(col("cnt"))).as("nll"))
  }

  /** Duplicate-passage REMOVAL (the C4/CCNet cleanup step itself, not
    * just [[chunkDupStats]]'s measurement): the text splits into
    * non-overlapping k-token chunks (tail partial chunk included —
    * reconstruction must not lose text), every occurrence of a chunk
    * whose corpus document-frequency exceeds `maxDf` is dropped, and
    * the surviving chunks reassemble in order. Boilerplate (cookie
    * banners, navigation, licenses) disappears from every document
    * at once. Returns `(id, n_kept, clean_text)`; a fully-boilerplate
    * document comes back with n_kept = 0 and empty text, which a
    * pipeline then drops.
    *
    * Scale shape: chunk explode → one frequency aggregation keyed by
    * chunk text (map-side combined) → co-partitioned join back →
    * per-doc ordered reassembly (array_sort over the doc's own
    * chunks — bounded by document size, not corpus size).
    */
  /** Sliding-window duplicate-SPAN removal — the offset-invariant
    * substring-dedup modality (the approach popularized by Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 — public literature; realized here with fixed-L sliding
    * windows instead of a suffix array, the standard distributed
    * approximation). [[removeDuplicateChunks]] tiles the doc into
    * NON-overlapping chunks, so a duplicated passage straddling a
    * chunk boundary — or starting at a different offset in each copy —
    * escapes it; a sliding L-token window catches a duplicated run at
    * ANY alignment: every window occurring ≥ 2 times corpus-wide
    * (cross-doc or repeated within one doc) marks its L positions
    * covered, and covered tokens are dropped from the rebuilt text.
    *
    * Scale shape: windows are (len−L+1) rows per doc with an 8-byte
    * xxhash64 shuffle key — one frequency aggregation + one
    * co-partitioned join back, same plan family as the chunk pass;
    * interval merging happens per-doc in bounded Column HOFs (O(len ·
    * dup-starts) worst case, i.e. O(len²) for a fully-duplicated doc —
    * per-doc bounded, never cross-doc). Fully-duplicated docs return
    * empty text, not dropped rows.
    *
    * Returns (id, n_kept, clean_text).
    */
  def removeDuplicateSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, spanLen: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val spark = df.sparkSession
    import spark.implicits._
    // same normalization as tokens()/the oracle's toksSql, compiled
    val docs = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, text.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ").trim.split(" ").toSeq)
      }
      .toDF("id", "toks")
    // window keys via token-level Rabin-Karp over per-token Horner
    // hashes: O(len) per doc instead of O(len·spanLen) string builds —
    // a first version that concat_ws'd every window measured 5.9 s vs
    // 1.8 s for the chunk pass at sf0.1; equality semantics match the
    // oracle's window-string compare (mod-2^64 collisions aside, which
    // the hash-gate would surface)
    val win = docs.as[(Long, Seq[String])].flatMap { case (id, tk) =>
      val n = tk.length
      val m = n - spanLen + 1
      if (m < 1) Iterator.empty
      else {
        val th = new Array[Long](n)
        var i = 0
        while (i < n) {
          var h = 0L
          val s = tk(i)
          var j = 0
          while (j < s.length) { h = h * 257L + s.charAt(j); j += 1 }
          th(i) = h * 257L + 32L // trailing separator disambiguates ("ab","c") vs ("a","bc")
          i += 1
        }
        val B = 1099511628211L // odd ⇒ invertible mod 2^64, error never cancels
        var pow = 1L
        var j = 1
        while (j < spanLen) { pow *= B; j += 1 }
        var h = 0L
        i = 0
        while (i < spanLen) { h = h * B + th(i); i += 1 }
        val out = new Array[(Long, Int, Long)](m)
        out(0) = (id, 1, h)
        i = 1
        while (i < m) {
          h = (h - th(i - 1) * pow) * B + th(i + spanLen - 1)
          out(i) = (id, i + 1, h)
          i += 1
        }
        out.iterator
      }
    }.toDF("id", "start", "h")
    val freq = win.groupBy("h").agg(count(lit(1)).as("df"))
    val dupStarts = win.join(freq, "h").filter(col("df") >= 2)
      .groupBy("id").agg(collect_list(col("start")).as("starts"))
    // compiled rebuild: boolean cover array, single append pass
    docs.join(dupStarts, Seq("id"), "left")
      .select(col("id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .as[(Long, Seq[String], Seq[Int])]
      .map { case (id, tk, starts) =>
        val n = tk.length
        val covered = new Array[Boolean](n)
        starts.foreach { s0 =>
          var j = s0 - 1
          val end = math.min(n, s0 - 1 + spanLen)
          while (j < end) { covered(j) = true; j += 1 }
        }
        val sb = new java.lang.StringBuilder
        var kept = 0L
        var i = 0
        while (i < n) {
          if (!covered(i)) {
            if (kept > 0) sb.append(' ')
            sb.append(tk(i))
            kept += 1
          }
          i += 1
        }
        (id, kept, sb.toString)
      }
      .toDF("id", "n_kept", "clean_text")
  }

  def removeDuplicateChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, maxDf: Long = 1)
      : org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val nCh = ceil(size(toks).cast("double") / k).cast("int")
    val chunkArr = transform(sequence(lit(0), greatest(nCh - 1, lit(0))), i =>
      concat_ws(" ", slice(toks, i * k + 1, lit(k))))
    val ch = graft.SparkTuning.spreadSmallScan(df)
      .select(col(idCol).as("id"), posexplode(chunkArr).as(Seq("idx", "chunk")))
      .filter(col("chunk") =!= "") // n=0 guard: the empty placeholder chunk
    val freq = ch.groupBy("chunk").agg(count(lit(1)).as("df"))
    val kept = ch.join(freq, "chunk").filter(col("df") <= maxDf)
    val rebuilt = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("idx"), col("chunk")))),
        x => x.getField("chunk"))).as("clean_text"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Gopher quality rules (Rae et al. 2021 §A1.1, the canonical
    * pretraining filter set), the document-shape subset: token count
    * in [minTok, maxTok], mean word length in [3, 10], ≥ 80% of words
    * containing an alphabetic character, and ≥ 2 distinct-position
    * stopword hits. (The repetition rules live in [[trigramStats]].)
    * Emits the per-rule measurements plus the fused `keep` — pipelines
    * filter on `keep` but log the measurements, which is why they stay
    * columns instead of vanishing into one boolean. Pure Column
    * arithmetic: the whole rule set runs inside the scan projection.
    */
  def gopherFilter(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTok: Long = 50, maxTok: Long = 100000)
      : org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks).cast("double")
    val meanWlen = aggregate(transform(toks, t => length(t)),
      lit(0), (acc, x) => acc + x).cast("double") / n
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n
    val stopHits = wordHits(col(textCol), EnStop)
    df.select(col(idCol).as("id"),
      n.cast("long").as("n_tok"),
      meanWlen.as("mean_wlen"),
      alphaFrac.as("alpha_frac"),
      stopHits.cast("long").as("stop_hits"),
      (n.cast("long") >= minTok && n.cast("long") <= maxTok &&
        meanWlen >= 3.0 && meanWlen <= 10.0 &&
        alphaFrac > 0.8 && stopHits >= 2).as("keep"))
  }

  /** Per-slice KL divergence from the corpus unigram distribution —
    * the domain-shift diagnostic (how far each source's token
    * distribution sits from the mixture it feeds):
    * `KL(slice ‖ corpus) = Σ_t p_s(t)·ln(p_s(t)/p(t))`, summed over
    * the slice's own support (p_s(t) > 0 ⇒ p(t) > 0 since the corpus
    * contains the slice — no smoothing needed). High-KL slices are the
    * ones a mixture reweighting or a contamination check should look
    * at first.
    *
    * Scale shape: one tokenize scan → (slice, term) counts; corpus
    * term totals are one more aggregation over those (vocabulary-
    * sized, broadcast back); slice and corpus token totals are
    * slice-count-sized. The per-slice sum folds term-ordered — the
    * cross-engine FP determinism pattern. Returns (slice, n_tok, kl).
    */
  def sliceKlDivergence(df: org.apache.spark.sql.DataFrame, sliceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = df.select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("term"))
      .groupBy("slice", "term").agg(count(lit(1)).cast("double").as("cnt"))
    val sliceTot = tf.groupBy("slice").agg(sum("cnt").as("stot"))
    val corpTf = tf.groupBy("term").agg(sum("cnt").as("ctf"))
    val corpTot = corpTf.agg(sum("ctf").as("t"))
    val per = tf.join(broadcast(sliceTot), "slice")
      .join(broadcast(corpTf), "term")
      .crossJoin(broadcast(corpTot))
      .withColumn("s",
        (col("cnt") / col("stot")) *
          log((col("cnt") / col("stot")) / (col("ctf") / col("t"))))
    per.groupBy("slice")
      .agg(
        sum(col("cnt")).cast("long").as("n_tok"),
        aggregate(
          array_sort(collect_list(struct(col("term"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")).as("kl"))
  }

  /** Per-slice vocabulary statistics: token count, type (distinct
    * token) count, hapax legomena (types occurring once IN THE SLICE),
    * and type/token ratio — the corpus-health numbers (a slice whose
    * TTR collapses is boilerplate; one whose hapax rate explodes is
    * noise/OCR garbage). Pure two-level aggregation, integer-exact.
    */
  def vocabStats(df: org.apache.spark.sql.DataFrame, sliceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = df.select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("term"))
      .groupBy("slice", "term").agg(count(lit(1)).as("cnt"))
    tf.groupBy("slice").agg(
      sum("cnt").as("n_tok"),
      count(lit(1)).as("n_types"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"),
      round(count(lit(1)) / sum("cnt"), 4).as("ttr"))
  }

  /** Pretraining sequence packing, concat-then-split form: documents
    * are concatenated in `orderCol` order into one token stream that is
    * cut every `seqLen` tokens (the standard packing used to build
    * fixed-length pretraining batches — documents may straddle cuts).
    * For each document this yields its token interval in the stream and
    * the sequence ids it lands in:
    * `(id, n_tok, tok_start, seq_first, seq_last, straddles)`.
    *
    * Scale shape: the corpus-wide running token count is
    * [[graft.dsl.SeriesScan.ungroupedPrefixSum]] — the audited two-pass
    * parallel prefix (range-partition by id, collect one total per
    * PARTITION, stream seeded) — never a global window. Token counts
    * are integers, so the double accumulator is exact below 2⁵³ total
    * tokens (~9·10¹⁵ — comfortably above a 100 TB corpus) and the
    * DuckDB oracle's integer window sum reproduces it bit-for-bit.
    */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seqLen: Long,
      numParts: Int = 32): org.apache.spark.sql.DataFrame = {
    val toks = packTokenCounts(df, idCol, textCol)
    graft.dsl.SeriesScan.ungroupedPrefixSum(toks, "id", "tok_d", "cum", numParts)
      .withColumn("n_tok", col("tok_d").cast("long"))
      .withColumn("tok_start", col("cum").cast("long") - col("n_tok"))
      .withColumn("seq_first", floor(col("tok_start") / seqLen))
      .withColumn("seq_last",
        floor((col("tok_start") + greatest(col("n_tok"), lit(1L)) - 1) / seqLen))
      .withColumn("straddles", col("seq_first") =!= col("seq_last"))
      .select("id", "n_tok", "tok_start", "seq_first", "seq_last", "straddles")
  }

  /** The (id, tok_d) input [[packSequences]] feeds into the prefix
    * scan, whose localCheckpoint truncates the query's visible plan —
    * exposed so the pruning gate can assert the 2-column scan on the
    * real pre-checkpoint frame (see [[unigramTf]]).
    */
  private[graft] def packTokenCounts(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      tokenCount(col(textCol)).cast("double").as("tok_d"))

  /** Incremental near-dup probe: match a NEW ingest batch against an
    * EXISTING corpus fingerprint index without touching corpus text.
    * `corpusFps` is the persisted `(id, fps)` output of
    * [[winnowFingerprints]] — at production scale it lives as a parquet
    * index appended per batch, so daily dedup fingerprints only the new
    * documents. The batch side is small by nature, so its exploded
    * fingerprints BROADCAST; the corpus index is scanned once, never
    * shuffled (the same shape as the contamination probe). The df-cap
    * drops stopword-grade fingerprints, measured over the corpus index
    * (where the index build would apply it).
    *
    * Returns (new_id, corpus_id, shared).
    */
  def incrementalDedupPairs(newDocs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      corpusFps: org.apache.spark.sql.DataFrame, k: Int = 8, w: Int = 4,
      minShared: Int = 15,
      maxDf: Int = DedupOps.DefaultMaxDf): org.apache.spark.sql.DataFrame = {
    val corpEx = DedupOps.capShingles(
      corpusFps.select(col("id"), explode(col("fps")).as("shingle")), maxDf)
      .select(col("id").as("corpus_id"), col("shingle"))
    val newEx = winnowFingerprints(newDocs, idCol, textCol, k, w)
      .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
    corpEx.join(broadcast(newEx), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023, unigram form): score every document
    * by its length-normalized log-likelihood RATIO between a target
    * domain's unigram LM and the corpus LM —
    * w_d = (1/n_d)·Σ_t cnt_d(t)·[ln p_target(t) − ln p_corpus(t)] —
    * the select-data-that-looks-like-the-target knob (positive = more
    * target-like than average). The target model is add-one smoothed
    * over the corpus vocabulary (never −∞); the corpus model is raw
    * MLE (every doc term exists in the corpus by construction).
    *
    * Exact arithmetic: per-doc sums fold over term-sorted entries
    * ([[unigramNll]]'s cross-engine FP-determinism trick). Scale
    * shape: both LMs are vocabulary-sized aggregates of ONE (doc,
    * term) count table and broadcast back; the scalar totals ride
    * broadcast crossJoins — one tokenize scan, bounded shuffles.
    * `targetPred` marks the target slice (rows where it is true).
    * Returns (id, n_tok, w).
    */
  def dsirWeights(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, targetPred: Column): org.apache.spark.sql.DataFrame = {
    val tf = df.select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "is_t", "term").agg(count(lit(1)).cast("double").as("cnt"))
    val ctf = tf.groupBy("term").agg(sum("cnt").as("ctf"))
    val cstats = ctf.agg(sum("ctf").as("ct"),
      count(lit(1)).cast("double").as("vn"))
    val ttf = tf.filter(col("is_t")).groupBy("term").agg(sum("cnt").as("ttf"))
    val ttot = ttf.agg(sum("ttf").as("tt"))
    val per = tf.join(broadcast(ctf), "term")
      .join(broadcast(ttf), Seq("term"), "left")
      .crossJoin(broadcast(cstats)).crossJoin(broadcast(ttot))
      .withColumn("s", col("cnt") *
        (log((coalesce(col("ttf"), lit(0.0)) + 1.0) / (col("tt") + col("vn"))) -
          log(col("ctf") / col("ct"))))
    per.groupBy("id").agg(
      sum("cnt").cast("long").as("n_tok"),
      (aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")) / sum("cnt")).as("w"))
  }

  /** Multinomial Naive Bayes text classifier — the curation-classifier
    * shape (CCNet's LM filter, the GPT-3/fastText quality classifier):
    * train token-count class models on labeled documents, score every
    * candidate document, keep/route by the predicted class. Add-one
    * smoothing over the training vocabulary; out-of-vocabulary terms
    * carry no evidence (the standard multinomial-NB convention).
    *
    * Exact arithmetic end to end: log p(c|d) ∝ ln(N_c/N) +
    * Σ_t cnt_d(t)·ln((cnt_c(t)+1)/(tot_c+V)), with the per-document
    * evidence sum folded over TERM-SORTED entries — the same
    * cross-engine FP-determinism trick as [[unigramNll]] — and argmax
    * ties broken by label order.
    *
    * Scale shape: the class models are (class × vocabulary)-sized
    * aggregates (metadata next to a 100 TB corpus — they broadcast);
    * scoring explodes each document's distinct terms × C classes (C is
    * a small constant) and folds per (doc, class) — one scan, two
    * bounded shuffles, nothing global. Documents with zero in-vocab
    * terms fall back to the prior-only argmax via a broadcast 1-row
    * crossJoin (no collect, no global window).
    *
    * Returns (id, label_true, pred, logp).
    */
  def nbClassify(train: org.apache.spark.sql.DataFrame,
      score: org.apache.spark.sql.DataFrame, idCol: String,
      labelCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val ttf = train
      .select(col(labelCol).as("label"), explode(tokens(col(textCol))).as("term"))
      .groupBy("label", "term").agg(count(lit(1)).cast("double").as("ct"))
    val ctot = ttf.groupBy("label").agg(sum("ct").as("tot"))
    val vocab = ttf.select("term").distinct()
    val vocabN = vocab.agg(count(lit(1)).cast("double").as("vn"))
    val ndocs = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).cast("double").as("nd"))
    val ntot = ndocs.agg(sum("nd").as("nn"))
    val classes = ndocs.join(ctot, "label")
      .crossJoin(broadcast(ntot)).crossJoin(broadcast(vocabN))
      .select(col("label"), log(col("nd") / col("nn")).as("prior"),
        col("tot"), col("vn"))
    val stf = score
      .select(col(idCol).as("id"), col(labelCol).as("label_true"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "label_true", "term")
      .agg(count(lit(1)).cast("double").as("cd"))
      .join(vocab, Seq("term")) // OOV terms carry no evidence
    val per = stf
      .crossJoin(broadcast(classes.select("label", "tot", "vn")))
      .join(ttf, Seq("label", "term"), "left")
      .withColumn("s", col("cd") *
        log((coalesce(col("ct"), lit(0.0)) + 1.0) / (col("tot") + col("vn"))))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("logp").desc, col("label"))
    val best = per.groupBy("id", "label_true", "label")
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("ev"))
      .join(broadcast(classes.select("label", "prior")), "label")
      .withColumn("logp", col("prior") + col("ev"))
      .withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .select(col("id"), col("label").as("pred"), col("logp"))
    // prior-only fallback for zero-in-vocab documents (TakeOrdered 1 row)
    val priorOnly = classes.select("label", "prior")
      .orderBy(col("prior").desc, col("label")).limit(1)
      .select(col("label").as("pred0"), col("prior").as("logp0"))
    score.select(col(idCol).as("id"), col(labelCol).as("label_true"))
      .join(best, Seq("id"), "left")
      .crossJoin(broadcast(priorOnly))
      .select(col("id"), col("label_true"),
        coalesce(col("pred"), col("pred0")).as("pred"),
        coalesce(col("logp"), col("logp0")).as("logp"))
  }
}
