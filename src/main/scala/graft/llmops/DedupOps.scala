package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), exact n-gram Jaccard
  * via an inverted shingle index, and MinHash + LSH banding for
  * sub-quadratic near-duplicate detection.
  *
  * Scale shape (100 TB discipline):
  *  - exact dedup = one hash shuffle on the fingerprint;
  *  - shingle join = inverted index: pairs are generated per shingle
  *    (never an all-pairs cross join) — hot shingles can be capped with
  *    a document-frequency filter;
  *  - MinHash-LSH = fixed-size signature per doc (64 longs), band keys
  *    shuffle, candidate pairs verified exactly; candidate count is
  *    bounded by band collisions, not n².
  */
object DedupOps {

  /** Duplicate groups by an arbitrary fingerprint column: one row per
    * group with more than one member, carrying the canonical (minimum)
    * id and the member count.
    */
  def dupGroups(df: DataFrame, idCol: String, fpCol: String): DataFrame =
    df.groupBy(col(fpCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)

  /** Distinct word n-gram shingles per document: (id, shingle).
    *
    * Compiled flatMap rather than Catalyst `transform`+`slice`: the
    * higher-order-function expressions are interpreted and re-slice the
    * token array per shingle (O(tokens × n) with lambda overhead) —
    * ~8 s vs ~1 s for 5k documents. Normalization matches
    * [[TextOps.normalize]] exactly (lowercase, whitespace collapse).
    *
    * `spread` pre-spreads a below-core-parallelism scan (guide §2.5).
    * It must stay call-site-gated: the heavy many-consumer pipelines
    * (exactJaccardPairs, dedup_eval) win from it, but small filtered
    * inputs (the contamination corpus/eval split) lose — the exchange
    * costs more than the single-core pass (r19 paired A/B: spread
    * measured 1.11× on contamination).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      spread: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    (if (spread) graft.SparkTuning.spreadSmallScan(df) else df)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
        if (toks.length < n) Iterator.empty
        else toks.sliding(n).map(_.mkString(" ")).toArray.distinct.iterator.map((id, _))
      }
      .toDF("id", "shingle")
  }

  /** Default document-frequency cap: a shingle shared by more documents
    * than this is stopword-grade, carries no dedup signal, and would
    * emit df² rows in the inverted-index self-join — one viral phrase
    * must not produce a quadratic partition. Far above any df in a
    * natural corpus slice (the synthetic corpus maxes at 25 at sf0.1).
    */
  val DefaultMaxDf = 1000

  /** Drop shingles whose document frequency exceeds `maxDf`. The hot
    * set is tiny by construction (few shingles are stopword-grade), so
    * it broadcasts; the df count itself is one map-side-combinable
    * aggregate.
    */
  def capShingles(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else {
      val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("shingle")
      sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }

  /** Exact Jaccard over distinct shingles for every pair sharing at
    * least one shingle (inverted-index join), kept when >= threshold.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Shingles with document frequency > `maxDf` are excluded from the
    * shingle universe (both intersection and union): the self-join cost
    * is Σ df² over shingles, so one hot shingle shared by k documents
    * would emit k² rows into a single join partition. Near-dup signal
    * lives in the rare shingles; the high-df regime is MinHash-LSH's
    * job ([[minHashLshPairs]]). With the default cap this is a no-op on
    * natural corpora.
    */
  def exactJaccardPairs(sh0: DataFrame, threshold: Double,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    // the shuffle key: hash the shingle STRING to 64 bits first — the
    // inverted-index shuffle moves fixed 8-byte keys instead of ~25-byte
    // text, and the groupBy compares longs. Set cardinalities (sizes,
    // intersections) are unchanged barring 2^-64 collisions.
    // NOT materialized (r18 probe): a localCheckpoint of the hashed
    // table measured 1.24×/1.35× (ngram_jaccard/incremental_dedup,
    // paired minima) — the repeated consumers shuffle on the same keys
    // and AQE exchange reuse already dedupes them at runtime.
    val sh = capShingles(sh0.withColumn("shingle", xxhash64(col("shingle"))), maxDf)
    val spark = sh.sparkSession
    import spark.implicits._
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    // Posting-list pair emission instead of a self-join: one shuffle of
    // the shingle table (groupBy shingle) instead of two (join build +
    // stream), then a compiled flatMap over each bounded posting list
    // (≤ maxDf ids after the cap) emits the same Σ df·(df−1)/2 pairs.
    val inter = sh.groupBy("shingle").agg(collect_list(col("id")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val a = ids.toArray
        java.util.Arrays.sort(a)
        for (i <- a.indices.iterator; j <- (i + 1) until a.length)
          yield (a(i), a(j))
      }
      .toDF("id_a", "id_b")
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-permutation MinHash signature per document from the shingle
    * table: sig_i = min over shingles of xxhash64(shingle, i) — a
    * seeded hash family (only internal determinism matters; ANSI mode
    * forbids the classic wrap-around affine family). Output:
    * (id, sig_0..sig_63).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    // hash the shingle STRING once, then derive the family by mixing the
    // long — 64 string hashes per row cost ~2x the whole signature pass
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(col("_h"), lit(i))).as(s"sig_$i")
    }
    sh.withColumn("_h", xxhash64(col("shingle")))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (id, band, key) where key hashes `rowsPerBand`
    * consecutive signature values. Docs sharing any (band, key) are
    * candidates.
    */
  def lshBands(sig: DataFrame, numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandKeys = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("key"))
    }
    sig.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs from LSH band collisions (deduplicated).
    *
    * Posting-list emission (one shuffle on the band key) rather than a
    * self-join (two). Bucket sizes follow real near-dup cluster sizes;
    * a corpus with huge identical-document clusters should collapse
    * exact dups first ([[dupGroups]]) — true for the join formulation
    * too, which emitted the same k² pairs into one partition.
    */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val spark = bands.sparkSession
    import spark.implicits._
    // One hash shuffle on the bucket key, then streaming run-detection
    // over each sorted partition: almost every (band, key) bucket is a
    // singleton, so a groupBy+collect_list would allocate a list per
    // bucket (numDocs × numBands of them) just to discover there is
    // nothing to pair. Sorting within partitions and walking runs of
    // equal keys emits the same Σ|bucket|·(|bucket|−1)/2 pairs with
    // O(largest bucket) state and zero per-singleton allocation.
    bands.select(col("band"), col("key"), col("id"))
      .repartition(col("band"), col("key"))
      .sortWithinPartitions("band", "key", "id")
      .as[(Int, Long, Long)]
      .mapPartitions { (it: Iterator[(Int, Long, Long)]) =>
        // walk runs of equal (band, key); emit each run's pairs lazily
        // (O(run) state, pairs materialize one at a time)
        val in = it.buffered
        new Iterator[(Long, Long)] {
          private var pairs: Iterator[(Long, Long)] = Iterator.empty
          private def nextRun(): Unit = {
            while (!pairs.hasNext && in.hasNext) {
              val (b, k, _) = in.head
              val run = scala.collection.mutable.ArrayBuffer.empty[Long]
              while (in.hasNext && in.head._1 == b && in.head._2 == k)
                run += in.next()._3
              if (run.size > 1) {
                val a = run.toArray // id-sorted by the partition sort
                pairs = for {
                  x <- a.indices.iterator
                  y <- ((x + 1) until a.length).iterator
                } yield (a(x), a(y))
              }
            }
          }
          def hasNext: Boolean = { nextRun(); pairs.hasNext }
          def next(): (Long, Long) = { nextRun(); pairs.next() }
        }
      }
      .toDF("id_a", "id_b")
      .distinct()
  }

  /** One compiled pass per document: MinHash signature array + distinct
    * shingle count, with NO shingle explode and NO shuffle — the
    * signature is a streaming min over splitmix64 mixes of one base
    * hash per shingle. Output: (id, sigs: array<long>, n_sh,
    * sh_hashes: array<long>).
    *
    * `withShingleHashes = true` additionally emits each document's
    * distinct shingle set as 64-bit FNV-1a hashes (a SEPARATE family
    * from the signature's 32-bit murmur base, so signatures — and thus
    * LSH candidates — are byte-identical either way): downstream exact
    * verification can then intersect hash sets instead of re-shingling
    * the text. When false the column is an empty array (the work and
    * bytes are skipped — Catalyst cannot prune computation inside a
    * typed map).
    */
  def minHashDocSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int = 64,
      withShingleHashes: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
        val sigs = Array.fill(numHashes)(Long.MaxValue)
        val hashes =
          if (withShingleHashes) scala.collection.mutable.ArrayBuilder.make[Long]
          else null
        var nSh = 0
        if (toks.length >= n) {
          val seen = new java.util.HashSet[String]()
          toks.sliding(n).foreach { w =>
            val sh = w.mkString(" ")
            if (seen.add(sh)) {
              nSh += 1
              if (hashes != null) {
                // FNV-1a 64 over chars: collision-free in practice at
                // corpus scale (2^-64 per pair), unlike the 32-bit base
                var h = 0xcbf29ce484222325L
                var k = 0
                while (k < sh.length) { h ^= sh.charAt(k); h *= 0x100000001b3L; k += 1 }
                hashes += h
              }
              val base = scala.util.hashing.MurmurHash3.stringHash(sh).toLong
              var i = 0
              while (i < numHashes) {
                // splitmix64 of (base, i): cheap independent hash family
                var z = base + i * 0x9E3779B97F4A7C15L
                z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
                z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
                z ^= z >>> 31
                if (z < sigs(i)) sigs(i) = z
                i += 1
              }
            }
          }
        }
        // distinct strings can (astronomically rarely) collide in fnv64;
        // dedup so set semantics survive downstream intersection counts
        val shSeq: Seq[Long] =
          if (hashes == null) Seq.empty
          else hashes.result().distinct.toSeq
        (id, sigs.toSeq, nSh, shSeq)
      }
      .toDF("id", "sigs", "n_sh", "sh_hashes")
  }

  /** MinHash-LSH near-dup pipeline: ONE compiled shingling pass → band
    * keys → candidate pairs → exact Jaccard verification >= threshold.
    *
    * The corpus is shingled exactly once: the signature pass also emits
    * each document's distinct shingle-hash set (64-bit, separate family
    * — candidates are unchanged), and verification intersects those
    * hash sets for candidate documents instead of re-tokenizing their
    * text. The signature frame is cached because it now feeds both the
    * band keys and the verification arrays — one tokenize+hash pass
    * plus (spillable) storage, versus two full text passes before.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int = 64, rowsPerBand: Int = 4,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    // The cold cache is NOT compute-once under AQE's concurrent leaf-
    // stage submission: the r18 profile showed ~10 racing copies of the
    // signature pass. Probed and kept AS IS: the copies overlap on idle
    // cores (wasted CPU, no wall cost), while serializing them behind a
    // count() + spreading the pass measured 1.9× WORSE wall.
    val sig = minHashDocSignatures(df, idCol, textCol, n, numHashes,
      withShingleHashes = true).cache()
    val numBands = numHashes / rowsPerBand
    val bandKeys = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => element_at(col("sigs"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("key"))
    }
    val bands = sig.filter(col("n_sh") > 0)
      .select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = lshCandidates(bands)
    val candDocs = cands.select(col("id_a").as("cid"))
      .union(cands.select(col("id_b").as("cid"))).distinct()
    // Exact verification over the cached hash ARRAYS: join each pair to
    // its two documents' distinct shingle-hash sets and compute
    // |A∩B| / |A∪B| with array_intersect/array_except — two joins and
    // one tiny aggregate instead of the exploded inverted-index chain
    // (explode → df-cap anti-join → Σdf² self-join → three aggregations),
    // which at 32 partitions was pure stage overhead for KB of data.
    // Per-task memory is two documents' hash arrays, not a posting list.
    val candArrays = sig
      .join(broadcast(candDocs), col("id") === col("cid"), "left_semi")
      .select(col("id"), col("sh_hashes"))
    // Same df-cap semantics as capShingles, over the same population
    // (candidate docs): shingles shared by > maxDf of them are stopword-
    // grade and leave BOTH intersection and union. The hot set is tiny
    // by construction — one (possibly empty) collected array row.
    val hot = candArrays.select(explode(col("sh_hashes")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .agg(collect_list(col("sh")).as("hot"))
    val verified = cands
      .join(candArrays.as("za"), col("id_a") === col("za.id"))
      .join(candArrays.as("zb"), col("id_b") === col("zb.id"))
      .crossJoin(broadcast(hot))
      .withColumn("_a", array_except(col("za.sh_hashes"), col("hot")))
      .withColumn("_b", array_except(col("zb.sh_hashes"), col("hot")))
      .withColumn("_i", size(array_intersect(col("_a"), col("_b"))).cast("long"))
      .withColumn("_u", (size(col("_a")) + size(col("_b"))).cast("long") - col("_i"))
      // _u = 0 ⇔ every shingle of both docs was capped: the old
      // formulation dropped such pairs (no shC rows); keep that, and
      // keep the division well-defined
      .filter(col("_u") > 0)
      .withColumn("jaccard", col("_i").cast("double") / col("_u").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // Materialize the (small) pair result eagerly so the cached
    // signature frame can be released here — otherwise every pipeline
    // invocation would leak a cached per-doc shingle-hash frame for the
    // rest of the session.
    val out = verified.localCheckpoint()
    sig.unpersist()
    out
  }

  /** Connected components over a near-duplicate pair list via the
    * alternating large-star / small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC '14): each
    * round is a groupBy-min plus a join — plain shuffles, no driver-side
    * graph state — and the edge set contracts to per-component stars
    * around the minimum id in O(log² n) rounds regardless of component
    * diameter, so a chain of pairwise near-dups collapses as fast as a
    * clique. Lineage is truncated with an eager localCheckpoint per
    * round (iterative plans otherwise grow exponentially).
    *
    * Returns (id, cluster_id) for every node appearing in `pairs`,
    * cluster_id being the minimum id of the node's component (centers
    * map to themselves). Singletons never enter the pair list and are
    * trivially their own cluster.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    // canonical directed form: u > v, deduplicated
    var edges = pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint()
    var it = 0
    var converged = false
    // Convergence is detected by a carried (count, Σ xxhash64(u,v))
    // signature plus an exact `except` CONFIRMATION at the
    // signature-matched round. The signature screens every round with
    // one tiny aggregate (whose action also materializes the round's
    // lazy localCheckpoint — checkpoint write and signature share a
    // single job); the exact set-equality probe then runs ONCE per CC
    // call, only at the round where count+hash already matched, so
    // its 2-shuffle cost is a fixed tail, not a per-round tax. The
    // exact confirm is the DEFAULT (r13 ADVICE: xxhash64 is
    // non-cryptographic, and production consumers — StreamGraph's
    // per-micro-batch incremental CC on corpus-derived edges — would
    // silently ship a wrong component index on a signature collision);
    // GRAFT_CC_FAST=1 opts out for bench runs whose consumers are
    // independently hash-verified. The earlier count-only shortcut
    // never fired on path/star graphs (a size-k component keeps k−1
    // edges every round). Hash sum in decimal(38,0): Long sum would
    // overflow under ANSI mode.
    def signature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head
      (r.getLong(0), r.getDecimal(1))
    }
    // The input signature seeds round-0 comparison (an already-starred
    // input converges at round 1, as before) AND measures the edge
    // count that sizes the loop's shuffle width below — one tiny job
    // over the already-checkpointed input buys both.
    var (edgeCount, edgeSum) = signature(edges)
    // Pinned per-round shuffle width, derived from the MEASURED edge
    // count (scale-adaptive, not a local-mode constant): AQE's
    // bytes-targeted coalescing collapses these KB/MB-scale iterative
    // stages to 1–2 tasks, serializing each round's window sorts; at
    // ~16k edges/task the sort work per task is large enough to beat
    // task overhead (r18's 64 KB minPartitionSize probe over-split at
    // 30 tasks and lost — the sweet spot is in between, r19 paired
    // A/B). Large graphs hit the defaultParallelism cap and behave as
    // before; the width is re-derived as rounds contract the edge set.
    def loopWidth(n: Long): Int =
      math.max(1, math.min(edges.sparkSession.sparkContext.defaultParallelism,
        ((n + 16383) / 16384).toInt))
    // One large-star + small-star round as a LAZY plan — no action, no
    // checkpoint. `large` is referenced twice (smin's aggregate and the
    // join probe) but both references shuffle the identical sub-plan on
    // the same key, so ReuseExchange collapses them to one physical
    // exchange; likewise `sym`'s two uses of the round input.
    def starRound(e: DataFrame, width: Int): DataFrame = {
      // Both star passes compute "min over all rows of my node" — an
      // unbounded window min over partitionBy(node), ONE shuffle each,
      // instead of the groupBy-min + join-back pair (which cost an
      // extra exchange plus a per-round broadcast build). The window
      // sort is spillable, so a giant star center degrades to disk
      // exactly like the sort-merge join it replaces — same skew
      // envelope, half the stages. Each window's exchange is pinned to
      // the count-derived `width` via an explicit same-key repartition
      // (satisfies the window's required distribution — no extra
      // exchange) so the sorts actually parallelize; see [[loopWidth]].
      val wU = Window.partitionBy("u")
      // large-star: each node links its strictly LARGER neighbours to
      // the minimum of its closed neighbourhood
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(width, col("u"))
      val large = sym
        .withColumn("m", least(col("u"), min(col("v")).over(wU)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .repartition(width, col("u"))
      // small-star: each node links its smaller neighbours (and itself)
      // to the smallest of them. Each windowed row (u, v, m) emits its
      // (v→m) link plus the (u→m) self-link in ONE explode pass — a
      // filter-branch ∪ select-branch union would compute the window
      // child twice (ReuseExchange does not collapse across union
      // branches; measured 2.7× slower on the fused variant) — and the
      // duplicate self-links collapse in the same distinct the
      // neighbour links already need.
      large
        .withColumn("m", min(col("v")).over(wU))
        .select(explode(when(col("v") =!= col("m"),
            array(struct(col("v").as("u"), col("m").as("v")),
              struct(col("u").as("u"), col("m").as("v"))))
          .otherwise(array(struct(col("u").as("u"), col("m").as("v")))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
    }
    while (!converged && it < maxIter) {
      // ONE star round per checkpointed job. Fusing two rounds into a
      // single plan was tried and measured 2.7× SLOWER per pair of
      // rounds: the second round's symmetrization unions two references
      // to the first round's un-materialized output, and ReuseExchange
      // does not collapse exchanges across union branches — the whole
      // first round recomputed in both. The LAZY checkpoint per round
      // still makes each round's output single-computed; the signature
      // aggregate is the action that materializes it.
      val tck = System.nanoTime()
      val small = starRound(edges).localCheckpoint(eager = false)
      val (smallCount, smallSum) = signature(small)
      val t1 = System.nanoTime()
      converged = edgeSum != null && smallCount == edgeCount &&
        smallSum.compareTo(edgeSum) == 0 &&
        (sys.env.get("GRAFT_CC_FAST").contains("1") || small.except(edges).isEmpty)
      val t2 = System.nanoTime()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round $it: edges $edgeCount -> $smallCount, " +
          f"ckpt+sig ${(t1 - tck) / 1e9}%.2fs, conv ${(t2 - t1) / 1e9}%.2fs")
      edges = small
      edgeCount = smallCount
      edgeSum = smallSum
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")).distinct())
  }

  /** Eval-set contamination probe: corpus documents sharing at least
    * `minShared` distinct word n-gram shingles with a document of the
    * (small) eval set — the decontamination check an LLM training
    * pipeline runs against its benchmark suites before training.
    *
    * Scale shape: the eval side is benchmark-sized by nature, so its
    * shingle table BROADCASTS and the corpus side is one scan +
    * map-side hash join + one bounded aggregation — the 100 TB corpus
    * is never shuffled. Shingles are xxhash64'd before the join
    * (8-byte keys in the broadcast table and the probe).
    *
    * Returns (corp_id, eval_id, shared).
    */
  def contaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int, minShared: Int): DataFrame = {
    // spread=false: both inputs are small filtered frames; paying a
    // round-robin exchange before the flatMap measured a net loss here
    // (r19 A/B), unlike the heavy exactJaccard pipelines
    val cs = shingles(corpus, idCol, textCol, n, spread = false)
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
    val es = shingles(evalSet, idCol, textCol, n, spread = false)
      .select(col("id").as("eval_id"), xxhash64(col("shingle")).as("sh"))
    cs.join(broadcast(es), "sh")
      .groupBy("id", "eval_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("id").as("corp_id"), col("eval_id"), col("shared"))
  }

  /** Bloom-filter decontamination — the scale path of
    * [[contaminationPairs]]. When the protected eval/benchmark n-gram
    * set grows past what an exact broadcast can hold (billions of
    * shingles across benchmark suites), compress it into an m-bit
    * Bloom filter ([[graft.functions.BloomBytes]]): the corpus-side
    * plan stays one scan + executor-side membership probes against a
    * broadcast blob — the corpus text is never shuffled, and the
    * filter itself OR-merges map-side while being built.
    *
    * The md5-derived double-hash positions make every probe — false
    * positives included — deterministic and replayable in oracle SQL,
    * so the trade (exact pairs → per-doc hit counts at a chosen FP
    * rate) is itself hash-gateable.
    *
    * Returns (corp_id, hits): corpus docs whose count of
    * bloom-positive distinct shingles reaches `minHits`.
    */
  def bloomContamination(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int,
      mBits: Int, kHashes: Int, minHits: Int): DataFrame = {
    // filter-sized blob to the driver, re-emitted as a Literal so the
    // probe's memo hits by array identity (a broadcast COLUMN would
    // defensive-copy per row and force byte-compares — see
    // SkewOps.bloomFilteredJoin); payload is mBits/8 bytes, never
    // corpus-scale
    // spread=false: the protected set is tiny by definition (it is
    // about to be compressed into a driver-held blob) — a pre-spread
    // exchange on it is pure cost
    val bloomBytes = shingles(evalSet, idCol, textCol, n, spread = false)
      .agg(call_function("graft_bloom_bytes",
        col("shingle"), lit(mBits), lit(kHashes)).as("bloom"))
      .head.getAs[Array[Byte]](0)
    shingles(corpus, idCol, textCol, n, spread = false)
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), col("shingle")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
      .select(col("id").as("corp_id"), col("hits"))
  }

  /** Documents surviving near-duplicate collapse: everything except
    * non-canonical cluster members (each cluster keeps its minimum id).
    * One anti-join against the (small) doomed set — the pair list is
    * sparse relative to the corpus, so the corpus is never reshuffled.
    */
  def dedupSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val doomed = connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("_doomed_id"))
    df.join(doomed, df(idCol) === col("_doomed_id"), "left_anti")
  }

  /** The end-to-end near-dup dedup pipeline's shared state: every stage
    * derives from ONE materialized fingerprint index and ONE
    * materialized pair list — at production scale the index is the
    * persisted parquet the incremental probe appends to, and clusters /
    * survivors are two consumers of the same pairs, not two
    * re-fingerprintings of the corpus.
    */
  final case class DedupPipeline(index: DataFrame, pairs: DataFrame,
      clusters: DataFrame, survivors: DataFrame)

  /** Fingerprint once → pairs → clusters → survivors. `index` and
    * `pairs` are eagerly materialized (localCheckpoint) so the df-cap's
    * two consumers, the CC rounds, and the survivor anti-join all read
    * materialized data instead of re-running the fingerprint scan.
    */
  def winnowDedupPipeline(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 15,
      maxDf: Int = DefaultMaxDf): DedupPipeline = {
    val idx = TextOps.winnowFingerprints(df, idCol, textCol, k, w)
      .localCheckpoint()
    val pairs = TextOps.sharedPairsFromIndex(idx, minShared, maxDf)
      .localCheckpoint()
    val clusters = connectedComponents(pairs)
    val doomed = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("_doomed_id"))
    val survivors = df.join(doomed, df(idCol) === col("_doomed_id"), "left_anti")
    DedupPipeline(idx, pairs, clusters, survivors)
  }

  // -------------------------------------------------------------------
  // Exact substring (span) deduplication with KEEP-FIRST survivors.
  //
  // [[graft.llmops.TextOps.removeDuplicateSpans]] is the C4-style
  // cleanup: every occurrence of a duplicated window is cut, so
  // boilerplate vanishes from ALL documents at once. The pair below
  // implements the other published semantics — Lee et al., ACL 2022
  // ("Deduplicating Training Data Makes Language Models Better"),
  // where exactly ONE copy of each duplicated passage survives (their
  // ExactSubstr keeps one occurrence so the information itself is not
  // lost, only its repetition) — and additionally emits the span
  // inventory (which token ranges of which doc are removable) as an
  // auditable table rather than only the rewritten text. That work
  // builds a corpus-wide suffix array; the distributed equivalent is
  // the rolling window-hash form: a duplicated run of >= w tokens
  // contains a duplicated w-token window, and a maximal duplicated run
  // is a maximal chain of overlapping/adjacent duplicated windows —
  // which the interval merge reconstructs. Granularity is w tokens
  // (runs shorter than w are not seen; boundaries are w-quantized),
  // the price of ONE hash shuffle instead of a global suffix sort.

  /** Position of the encoded (doc, position) key-space split: occurrence
    * order is min over `doc_id * SpanPosCap + i`, so any document with
    * more than this many tokens would alias into the next doc_id. 1e12
    * positions ≫ any real document; guarded with a raise_error below.
    */
  val SpanPosCap = 1000000000000L

  /** Every w-token window of the normalized text as (doc_id, i, h):
    * 1-based start position and window hash. Documents shorter than w
    * tokens emit nothing. One scan-stage projection + explode — rows
    * out ≈ corpus token count, same cost class as [[shingles]].
    *
    * `hashFn` defaults to xxhash64 (8-byte shuffle keys); the DuckDB
    * gates pass md5 for cross-engine hash parity.
    */
  def substringWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int, hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(w >= 2, s"substring window must be >= 2 tokens, got $w")
    // tokenize + per-window hashing dominates this pass; spread a
    // below-core-parallelism input first (guide §2.5 — no-op on a
    // multi-file corpus)
    graft.SparkTuning.spreadSmallScan(df)
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("arr"))
      .filter(size(col("arr")) >= w)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("arr")) - w + 1),
          i => hashFn(concat_ws(" ", slice(col("arr"), i, lit(w)))))))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("h"))
  }

  /** Maximal duplicated-token spans to REMOVE under keep-first
    * semantics: a window hash occurring in >= 2 distinct documents is
    * duplicated; its globally first occurrence (minimum (doc_id, i))
    * survives and every other occurrence becomes a removable span
    * [i, i+w-1], then overlapping/adjacent spans merge per document.
    * Returns one row per maximal span: (doc_id, ms, me), token
    * positions inclusive.
    *
    * Scale shape: ONE shuffle on the window hash for the dup/keeper
    * aggregate — "occurs in >= 2 distinct documents" is decided by
    * min(doc) != max(doc), so all three aggregates are plain
    * map-side-combinable min/max (no distinct-aggregate Expand pass
    * doubling the exchange), one hash-join back, and a per-document
    * window for the merge — no pairwise joins anywhere, so cost is
    * linear in corpus tokens regardless of how viral a passage is.
    */
  def substringSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int, hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val win = substringWindows(df, idCol, textCol, w, hashFn)
    // encoded global occurrence order; a doc with >= SpanPosCap tokens
    // would alias into the next doc_id, and a doc_id above
    // Long.MaxValue/SpanPosCap (~9.22e6 — plausible at corpus scale)
    // would wrap the product negative and corrupt the keep-first min —
    // both fail loudly, not wrongly (the DuckDB oracle replica's
    // `doc_id * 1e12 + i` carries the same bound; its BIGINT overflow
    // also errors rather than wrapping)
    val docCap = Long.MaxValue / SpanPosCap
    val enc = when(col("i") >= SpanPosCap,
        raise_error(concat(lit("document "), col("doc_id"),
          lit(s" exceeds $SpanPosCap tokens"))))
      .when(col("doc_id") < 0 || col("doc_id") >= docCap,
        raise_error(concat(lit("doc_id "), col("doc_id"),
          lit(s" outside [0, $docCap) — span encoding would overflow"))))
      .otherwise(col("doc_id") * SpanPosCap + col("i"))
    val dup = win.groupBy("h")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"),
        min(enc).as("keep"))
      .filter(col("d0") =!= col("d1"))
      .select("h", "keep")
    val spans = win.join(dup, "h")
      .filter(col("doc_id") * SpanPosCap + col("i") =!= col("keep"))
      .select(col("doc_id"), col("i").as("s"), (col("i") + w - 1).as("e"))
    mergeSpans(spans)
  }

  /** Merge overlapping or adjacent [s, e] integer intervals per
    * doc_id → one row per maximal interval (doc_id, ms, me). Classic
    * sweep: an interval starts a new group iff its start clears the
    * running max end so far + 1. Per-document window — partitions by
    * the document key, never a global sort.
    */
  def mergeSpans(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("brk",
        when(col("s") > coalesce(prevMax, lit(-1)) + 1, 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("gid"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
      .select("doc_id", "ms", "me")
  }

  /** Rewrite affected documents with their duplicated spans removed:
    * (doc_id, trimmed, kept_tokens) for every document that had at
    * least one removable span AND at least one surviving token
    * (fully-duplicated documents vanish — delete them outright).
    * Untouched documents are not re-emitted; at scale the trim is an
    * anti-join patch applied to the affected slice only, never a
    * rewrite of the whole corpus.
    */
  def substringTrim(df: DataFrame, idCol: String, textCol: String,
      w: Int, hashFn: Column => Column = xxhash64(_)): DataFrame =
    trimToSpans(df, idCol, textCol,
      substringSpans(df, idCol, textCol, w, hashFn)
        .localCheckpoint()) // reused twice below; spans are the small side

  /** Apply a removable-span table (doc_id, ms, me — from
    * [[substringSpans]] or a streaming probe) to its documents:
    * affected docs come back trimmed, fully-covered docs vanish,
    * untouched docs are not re-emitted. `spans` is read twice —
    * callers persist/checkpoint it.
    */
  def trimToSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val toks = df
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("arr"))
      .join(spans.select("doc_id").distinct(), Seq("doc_id")) // affected docs only
      .select(col("doc_id"), posexplode(col("arr")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("p") >= col("ms") && col("p") <= col("me"),
      "left_anti")
    kept.groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")),
          " ").as("trimmed"),
        count(lit(1)).as("kept_tokens"))
  }

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo 1995): sort
    * the corpus on a blocking key (here: the first 8 characters of the
    * normalized text, encoded order-preservingly as Σ ascii·128^(8−i)
    * with space padding, doc id as tie-break), then compare each
    * record only against its `w` successors in that order, verifying
    * candidates with exact token-set Jaccard. The third blocking
    * modality beside MinHash-LSH (hash bands) and SimHash (bit
    * pigeonholes) — cheapest when duplicates share prefixes.
    *
    * Scale: the global sort order comes from the distributed
    * range-bucket rank (SegmentOps.globalRank — no single-task sort),
    * and the w-neighborhood join is a BINNED adjacency join on the
    * rank (bins of width w, each right row exploded to its own and the
    * previous bin — the RangeJoin pattern), so candidates ≈ n·w flow
    * through one hash join, never a rank-range cartesian.
    */
  def sortedNeighborPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int, threshold: Double): DataFrame = {
    val norm = graft.llmops.TextOps.normalize(col(textCol))
    val toks = graft.llmops.TextOps.tokens(col(textCol))
    // candidate verification set = distinct word-3-gram shingles (the
    // ngram_jaccard semantics — a token-set Jaccard would score shared
    // VOCABULARY, not near-duplication)
    val shingleSet = when(size(toks) >= 3,
      array_sort(array_distinct(expr(
        "transform(sequence(1, size(_toks) - 2), i -> concat_ws(' ', slice(_toks, i, 3)))"))))
      .otherwise(array())
    // materialized (r18): globalRank references its input three times
    // (min/max, bucket counts, ranked join) and the ranked output is
    // consumed twice (window sides a and b) — without the cuts the
    // tokenize+shingle projection above ran ~6× per query. Both frames
    // are doc-cardinality (id, shingle array, key); one materialization
    // each beats re-tokenizing the corpus at any scale.
    val keyed = graft.SparkTuning.spreadSmallScan(df)
      .withColumn("_toks", toks).select(col(idCol).as("doc_id"),
      shingleSet.as("sa"),
      (0 until 8).map { i =>
        // clamp at 127: a non-ASCII codepoint would overflow the
        // 128-ary key (such chars all collapse to the top slot —
        // order within them falls back to the id tie-break)
        (least(ascii(substring(rpad(norm, 8, " "), i + 1, 1)), lit(127))
          .cast("long") * lit(math.pow(128, 7 - i).toLong))
      }.reduce(_ + _).as("pk"))
      .localCheckpoint()
    val ranked = graft.operators.SegmentOps
      .globalRank(keyed, col("pk"), "doc_id", nBuckets = 256, as = "rn")
      .withColumn("bin", expr(s"(rn - 1) div $w"))
      .localCheckpoint()
    val a = ranked.select(col("doc_id").as("id_a"), col("sa").as("saa"),
      col("rn").as("ra"), col("bin"))
    val b = ranked.select(col("doc_id").as("id_b"), col("sa").as("sab"),
      col("rn").as("rb"),
      explode(array(col("bin"), col("bin") - 1)).as("bin"))
    val inter = size(array_intersect(col("saa"), col("sab")))
    a.join(b, "bin")
      .where(col("rb") > col("ra") && col("rb") <= col("ra") + w)
      // empty∩empty pairs (sub-3-token docs) have no defined Jaccard —
      // dropped before the division (ANSI would raise on 0/0)
      .where(size(col("saa")) + size(col("sab")) - inter > 0)
      .withColumn("j", inter.cast("double") /
        (size(col("saa")) + size(col("sab")) - inter))
      .where(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), col("j"))
  }

  /** Blocked fuzzy record linkage: equi-join two entity tables on a
    * prefix blocking key, verify candidates with Levenshtein edit
    * distance ≤ maxDist — the classic entity-resolution shape (block →
    * compare → match). The edit-distance semantics are identical
    * across engines (unit-cost insert/delete/substitute), so matches
    * are exactly replayable.
    *
    * Scale: candidates = Σ_block |A_b|·|B_b| — the caller's blocking
    * key length controls the quadratic term; the verify predicate runs
    * inside the join's post-filter, never on the driver.
    */
  /** Per-block pair budget for [[blockedPairs]] — the record-linkage
    * analogue of the winnow df cap and [[graft.streaming.StreamDedup
    * .DefaultPairBudget]]: a prefix block whose pair product exceeds
    * this is a stopword-grade block (every "the …" document), carrying
    * no discriminative signal while going quadratic. The r16 100×
    * probe caught exactly that — one block's cross product pinned a
    * single task in Levenshtein for 33 minutes. Purged blocks are
    * dropped LOUDLY; the degrade direction matches the df cap (a true
    * match inside a mega-block can be missed, never fabricated), and
    * it is the standard ER practice (block purging).
    */
  val DefaultMaxBlockPairs: Long = 16000000L

  /** Blocked candidate enumeration shared by the linkage verbs: equal
    * `blockLen`-prefix join with BLOCK PURGING. Block sizes are counted
    * per side first (two metadata-scale aggregates), blocks whose
    * cnt_a·cnt_b product exceeds `maxBlockPairs` are dropped with a
    * stderr line naming them, and the join runs only over surviving
    * blocks — bounding both total pair work and the largest single
    * task (a block is one hash-join bucket, i.e. one task's worth of
    * quadratic compare).
    */
  def blockedPairs(a: DataFrame, idA: String, nameA: String,
      b: DataFrame, idB: String, nameB: String,
      blockLen: Int,
      maxBlockPairs: Long = DefaultMaxBlockPairs): DataFrame = {
    val aa = a.select(col(idA).as("id_a"), col(nameA).as("name_a"),
      substring(col(nameA), 1, blockLen).as("_blk"))
    val bb = b.select(col(idB).as("id_b"), col(nameB).as("name_b"),
      substring(col(nameB), 1, blockLen).as("_blk"))
    // FAST PATH (the common case): the EXACT max per-block pair product
    // in one aggregation job over a side-tagged union — per-block counts
    // of both sides fall out of one groupBy(_blk) with conditional sums,
    // so no join of two count frames, no checkpoint, no count action,
    // no anti-join. A healthy corpus (every gate shape; r16 measured
    // jw_linkage paying 1.5–1.8× for the full accounting it never used)
    // pays one map-side-combined agg and proceeds to the plain join.
    // The bound is exact, so the purge decision — and therefore every
    // result — is identical to the accounting path's. NULL `_blk`
    // (null-name rows) is excluded: an equi-join never matches null
    // keys, so a null group contributes zero pairs — counting it here
    // would inflate maxPairs past the budget (while the purge path's
    // inner join of per-side counts drops null keys), sending a
    // healthy corpus down the purge path for blocks that do no work.
    val maxPairs = Option(aa.select(col("_blk"), lit(1L).as("_ta"), lit(0L).as("_tb"))
      .union(bb.select(col("_blk"), lit(0L).as("_ta"), lit(1L).as("_tb")))
      .filter(col("_blk").isNotNull)
      .groupBy("_blk").agg(sum("_ta").as("_ca"), sum("_tb").as("_cb"))
      .agg(max(col("_ca") * col("_cb"))).head.get(0))
      .fold(0L)(_.asInstanceOf[Long])
    if (maxPairs <= maxBlockPairs) return aa.join(bb, "_blk")
    // PURGE set, not keep set, drives the filter: surviving prefixes
    // are corpus-domain-scale (millions at 100×) while oversized ones
    // are bounded by maxBlockPairs/rows (each needs ≥√budget members) —
    // broadcast the small side, anti-join the big one. Checkpointed so
    // the count, the warning's top-3, and the join all see ONE
    // evaluation of the two aggregates.
    val purged = aa.groupBy("_blk").agg(count(lit(1)).as("_ca"))
      .join(bb.groupBy("_blk").agg(count(lit(1)).as("_cb")), "_blk")
      .select(col("_blk"), (col("_ca") * col("_cb")).as("_pairs"))
      .filter(col("_pairs") > maxBlockPairs)
      .localCheckpoint()
    val nPurged = purged.count()
    // unreachable: the fast path's non-null max is exact and agrees
    // with this path's null-dropping inner join, so reaching here
    // implies ≥1 non-null block over budget
    if (nPurged == 0) aa.join(bb, "_blk")
    else {
      // fetch only the 3 worst offenders for the warning — O(3), never
      // the full purge set
      val top = purged.orderBy(col("_pairs").desc).limit(3).collect()
      System.err.println(s"[graft] blockedPairs: purging $nPurged " +
        s"block(s) over $maxBlockPairs pairs (top: " +
        top.map(r => s"'${r.getString(0)}'=${r.getLong(1)}").mkString(", ") +
        ") — stopword-grade prefixes carry no linkage signal; " +
        "true matches inside them are skipped, never fabricated " +
        "(DedupOps.DefaultMaxBlockPairs)")
      aa.join(broadcast(purged.select("_blk")), Seq("_blk"), "left_anti")
        .join(bb, "_blk")
    }
  }

  def editDistanceLink(a: DataFrame, idA: String, nameA: String,
      b: DataFrame, idB: String, nameB: String,
      blockLen: Int, maxDist: Int,
      maxBlockPairs: Long = DefaultMaxBlockPairs): DataFrame =
    blockedPairs(a, idA, nameA, b, idB, nameB, blockLen, maxBlockPairs)
      // lossless pre-filter: lev(a,b) >= |len(a) - len(b)|, so pairs
      // further apart than maxDist in length never reach the DP …
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // … and the DP itself is BANDED (threshold form, O(n·maxDist)
      // instead of O(n²); returns -1 above the threshold)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("lev") >= 0 && col("lev") <= maxDist)
      .select(col("id_a"), col("id_b"), col("lev"))
}
