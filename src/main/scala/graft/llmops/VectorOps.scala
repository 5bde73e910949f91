package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the exact
  * baseline) and IVF (inverted-file) top-k, the 100 TB scale path —
  * vectors are bucketed by nearest centroid so a query only scans
  * `nprobe` buckets instead of the full corpus.
  *
  * Dot products are sequential double folds over `array<double>`
  * columns (codegen'd `aggregate`/`zip_with`, no UDFs), which the
  * DuckDB oracle mirrors exactly.
  */
object VectorOps {

  /** Sequential-fold dot product of two array<double> columns
    * (interpreted HOF form — kept as the reference semantics the native
    * expression must match bit-for-bit).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** HOF cosine: three sequential folds. Interpreted by Catalyst —
    * see [[cosine]] for the codegen'd path used everywhere.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine similarity via the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]], registered through
    * SparkSessionExtensions): one fused whole-stage-codegen loop instead
    * of three interpreted higher-order folds. Accumulator fold order
    * matches [[cosineHof]] exactly, so results are bit-identical — which
    * also makes the fallback safe: a session built WITHOUT
    * `spark.sql.extensions=graft.functions.GraftExtensions` (library
    * embedding, notebook) silently gets the HOF form instead of an
    * unresolved-function analysis error.
    */
  def cosine(a: Column, b: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession.exists(hasNative))
      call_function("graft_cosine", a, b)
    else cosineHof(a, b)

  // registration is decided when the session is built, so the catalog
  // probe is cached per session (weak keys: don't pin stopped sessions)
  private val nativeBySession =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean])
  private def hasNative(s: org.apache.spark.sql.SparkSession): Boolean =
    nativeBySession.computeIfAbsent(s, _.catalog.functionExists("graft_cosine"))

  /** Normalize an embeddings table to (id, v: array<double>). */
  def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

  /** Nearest codebook entry — max cosine, ties → smaller cid — for one
    * vector slice against a metadata-sized codebook, computed INSIDE a
    * compiled map pass. This replaces the assignment idiom the
    * IVF/PQ verbs first shipped with (explode the n·k candidate rows
    * through a broadcast join, then `row_number` over a per-id window):
    * the window was a full SORT SHUFFLE of rows that exist only to be
    * argmax'd away, and measured as the pqTrain/pqEncode hotspot
    * (PERF.md round 12). Arithmetic is the same fused left-to-right
    * dab/daa/dbb loop as [[graft.functions.CosineSimilarity]], and the
    * comparator is exactly the window's ordering — descending
    * `java.lang.Double.compare` (NaN greatest, -0.0 < 0.0), tie →
    * smaller cid — so every assignment, and every oracle hash
    * downstream, is bit-identical to the join+window form.
    */
  private def nearestCid(cent: Array[(Long, Array[Double])],
      v: Array[Double], from: Int, len: Int): Long = {
    var bestCid = 0L
    var bestCos = 0.0
    var first = true
    var c = 0
    while (c < cent.length) {
      val cid = cent(c)._1
      val cv = cent(c)._2
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < len) {
        val xi = v(from + i); val yi = cv(i)
        dab += xi * yi; daa += xi * xi; dbb += yi * yi
        i += 1
      }
      val cos = dab / (math.sqrt(daa) * math.sqrt(dbb))
      val cmp = if (first) 1 else java.lang.Double.compare(cos, bestCos)
      if (cmp > 0 || (cmp == 0 && cid < bestCid)) {
        bestCos = cos; bestCid = cid; first = false
      }
      c += 1
    }
    bestCid
  }

  /** Brute-force cosine top-k: every query row is scored against the
    * whole corpus (broadcast queries × corpus scan — one pass, no
    * shuffle of the corpus), then per-query top-k. Exact; the baseline
    * the approximate paths are judged against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(queries.as("q")))
      .filter(col("q.id") =!= col("c.id"))
      .select(col("q.id").as("qid"), col("c.id").as("nbr"),
        cosine(col("q.v"), col("c.v")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that sit closest to the decision boundary, which is
    * where contrastive gradients carry signal (Robinson et al. 2021).
    * `maxCos` optionally fences off the top of the band (near-identical
    * cross-label pairs are more often label noise than hard negatives).
    *
    * Same scale shape as [[bruteForceTopK]]: the query block broadcasts,
    * the corpus streams through one codegen'd cosine pass, and the
    * per-query top-k ranks on (cos desc, id) for a deterministic order.
    * Expects (id, v, label) on both inputs.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      maxCos: Double = Double.PositiveInfinity): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(queries.as("q")))
      .filter(col("q.id") =!= col("c.id") &&
        col("q.label") =!= col("c.label"))
      .select(col("q.id").as("qid"), col("c.id").as("nbr"),
        col("c.label").as("nbr_label"),
        cosine(col("q.v"), col("c.v")).as("cos"))
      .filter(col("cos") < maxCos)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Symmetric per-vector int8 scalar quantization: `scale =
    * max(|v_i|)/127`, `code_i = round(v_i / scale)` — every code fits a
    * TINYINT, so the stored index is 8× smaller than the double vectors
    * (the standard first memory cut before PQ's 128×, and unlike PQ it
    * needs no training pass). The zero-vector guard floors the max at
    * 1e-30 so an all-zero embedding quantizes to all-zero codes instead
    * of dividing by zero. Output: `(id, codes array<tinyint>, scale)`;
    * `scale` rides along for consumers that need dequantized magnitudes
    * (cosine does not — it is per-vector-scale-invariant, so [[int8TopK]]
    * scores the codes directly).
    */
  def int8Quantize(vecsDf: DataFrame): DataFrame = {
    val scale = greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30)) / lit(127.0)
    vecsDf.select(col("id"),
      transform(col("v"), x => round(x / scale).cast("tinyint")).as("codes"),
      scale.as("scale"))
  }

  /** (id, codes) → (id, v) with codes widened to doubles: int8 dot
    * products stay EXACT in double (|dot| ≤ dim·127² ≈ 10⁶ ≪ 2⁵³), so
    * scoring quantized vectors reuses the same fold the oracle mirrors.
    */
  def int8AsVecs(quantized: DataFrame): DataFrame =
    quantized.select(col("id"), col("codes").cast("array<double>").as("v"))

  /** Brute-force cosine top-k over int8-quantized vectors: quantize
    * corpus and queries, score the codes (cosine is invariant to each
    * vector's own scale, so no dequantization happens anywhere). The
    * approximation error vs [[bruteForceTopK]] comes only from the
    * rounding — measured by the `ann_recall` gate's `int8` rows.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bruteForceTopK(int8AsVecs(int8Quantize(corpus)), int8AsVecs(int8Quantize(queries)), k)

  /** Sign-bit binary signature, packed into ONE BIGINT (dim ≤ 64:
    * bit i set iff v_i > 0) — the 64× compression extreme below int8's
    * 8× and PQ's 128×-with-codebooks. The packed form matters: Hamming
    * distance between signatures is `bit_count(a ^ b)` — two codegen'd
    * integer ops per PAIR instead of a dim-length float loop, so the
    * candidate scan reads 8 bytes/vector and runs entirely inside
    * whole-stage codegen. Wider dims would chunk into an array of
    * words; the gate corpus is 64-dim so the single-word form keeps the
    * hot path HOF-free.
    */
  def signSignatures(vs: DataFrame, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 64, s"signSignatures packs one 64-bit word, got dim=$dim")
    vs.select(col("id"), col("v"), expr(
      s"aggregate(sequence(0, $dim - 1), 0L, " +
        "(acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))").as("sig"))
  }

  /** Binary-hash ANN: Hamming candidate generation over packed sign
    * signatures, exact cosine rescore of the per-query `shortlist`. The
    * serving shape: the signature index (8 bytes/vector) is the only
    * thing the full corpus scan touches; original vectors are fetched
    * by id-join for shortlist rows only (shortlist·|Q| rows, not the
    * corpus). Ties: shortlist by (hamming ASC, nbr), final by
    * (cos DESC, nbr) — both deterministic and integer-exact, so the
    * DuckDB oracle replays them bit-for-bit.
    */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, dim: Int): DataFrame =
    binaryProbe(signSignatures(corpus, dim).select(col("id"), col("sig")),
      corpus, queries, k, shortlist, dim)

  /** Probe a persisted signature index (`(id, sig)` — fresh from
    * [[signSignatures]] or read back from parquet, 8 bytes a vector):
    * Hamming shortlist over the index, exact-cosine rescore against the
    * separate vector store — the production split (signature index and
    * vector table are different artifacts; only shortlist rows ever
    * touch a vector).
    */
  def binaryProbe(index: DataFrame, vectors: DataFrame, queries: DataFrame,
      k: Int, shortlist: Int, dim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val qs = signSignatures(queries, dim)
      .select(col("id").as("qid"), col("sig").as("qsig"))
    val wHam = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("ham"), col("nbr"))
    val cand = index.crossJoin(broadcast(qs))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nbr"),
        expr("bit_count(sig ^ qsig)").as("ham"))
      .withColumn("hr", row_number().over(wHam)).filter(col("hr") <= shortlist)
      .select("qid", "nbr")
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    cand
      .join(vectors.select(col("id").as("nbr"), col("v").as("cv")), "nbr")
      .join(broadcast(queries.select(col("id").as("qid"), col("v").as("qv"))), "qid")
      .select(col("qid"), col("nbr"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * hybrid-retrieval combiner: each input ranking contributes
    * `1/(k0 + rank)` per id and the fused score is the sum, so an id
    * near the top of ANY ranking surfaces without score calibration
    * between heterogeneous retrievers (BM25 scores and cosines are
    * not comparable; ranks are). Inputs are `(id, rank)` frames —
    * e.g. [[graft.llmops.TextOps.bm25TopK]] output ranked, and an
    * `ann*TopK` ranking. The union is |inputs|·k rows — list-scale —
    * and the fold over per-id contributions is ordered by source
    * index, so the FP sum is deterministic across engines and
    * partitionings. Returns the top `k` ids by (score DESC, id).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("id"), col("rank").cast("long").as("rank"),
        lit(i).as("src"))
    }.reduce(_ unionByName _)
    val contrib = tagged.withColumn("c", lit(1.0) / (lit(k0) + col("rank")))
    contrib.groupBy("id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("src"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
  }

  /** IVF top-k: assign every vector to its max-cosine centroid (the
    * inverted file), then for each query scan only the `nprobe`
    * closest centroids' lists. Centroids are caller-supplied (here:
    * deterministic seed vectors; at scale: a k-means sample). The
    * assignment shuffle is one hash partition by centroid id — queries
    * touch nprobe/nlist of the corpus.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    ivfProbe(ivfAssign(corpus, centroids), centroids, queries, k, nprobe)

  /** Build the inverted file: every corpus vector assigned to its
    * max-cosine centroid (ties → smaller cid). At production scale this
    * is the persisted index — write it as parquet partitioned by `cid`
    * once, and every later query batch probes it via [[ivfProbe]]
    * without rescanning or re-bucketing the corpus (the same
    * build-once/probe-many shape as the winnow fingerprint index).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // k×dim codebook cells to the driver (allowlisted metadata-scale
    // collect, like the trainer's), then ONE compiled map pass assigns
    // every corpus row — no n·k candidate rows, no window sort shuffle
    // (see [[nearestCid]] for the bit-identity argument)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cent: Array[(Long, Array[Double])] = centroids
      .select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (c, v) => (c, v.toArray) }
    corpus.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val a = v.toArray
        (id, v, nearestCid(cent, a, 0, a.length))
      }.toDF("id", "v", "cid")
  }

  /** Mean-silhouette clustering quality on a bounded probe subset:
    * for each probe point, a = mean cosine distance (1 − cos) to the
    * other members of its own cluster, b = the smallest mean distance
    * to any other cluster, s = (b − a) / max(a, b) — the standard
    * internal validation of a clustering (Rousseeuw 1987), here
    * scoring the trained IVF/SemDeDup centroids.
    *
    * Scale: exact silhouette is O(n²); this is the standard sampled
    * estimator — probe × corpus pairs with the PROBE side broadcast
    * (m·n work, m caller-bounded), collapsed per (probe, cluster)
    * before the min/ratio. Probe points whose cluster has no other
    * member drop out (a undefined), matching the reference estimator.
    */
  def silhouette(assigned: DataFrame, probe: DataFrame): DataFrame = {
    val pairs = assigned.as("c")
      .crossJoin(broadcast(probe.as("p")))
      .filter(col("p.id") =!= col("c.id"))
      .select(col("p.id").as("pid"), col("p.cid").as("pcid"),
        col("c.cid").as("ccid"),
        (lit(1.0) - cosine(col("p.v"), col("c.v"))).as("d"))
    val byCluster = pairs.groupBy("pid", "pcid", "ccid")
      .agg((sum(col("d")) / count(lit(1))).as("md"))
    val a = byCluster.where(col("ccid") === col("pcid"))
      .select(col("pid"), col("md").as("a"))
    val b = byCluster.where(col("ccid") =!= col("pcid"))
      .groupBy("pid").agg(min(col("md")).as("b"))
    a.join(b, "pid")
      .select(col("pid"), col("a"), col("b"),
        // + 0.0 folds a signed −0.0 ratio (b ≈ a rounding negative)
        ((col("b") - col("a")) / greatest(col("a"), col("b")) + lit(0.0))
          .as("s"))
  }

  /** Probe an inverted-file index (`(id, v, cid)` — fresh from
    * [[ivfAssign]] or read back from its parquet form): each query
    * scans only its `nprobe` closest centroids' lists.
    */
  def ivfProbe(index: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val probes = queries.as("q")
      .crossJoin(broadcast(centroids.select(col("id").as("cid"), col("v").as("cv"))))
      .select(col("q.id").as("qid"), col("q.v").as("qv"), col("cid"),
        cosine(col("q.v"), col("cv")).as("cos"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    probes
      .join(index, "cid")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nbr"), cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
  }

  /** Lloyd's k-means over a (pre-filtered, deterministic) training
    * sample, producing the IVF centroid table — closes the "centroids
    * come from where?" gap in the 100 TB ANN story. Fully
    * oracle-replicable: seed = the k smallest-id sample vectors (cid =
    * rank in id order), assignment = max-cosine (ties → smaller cid),
    * update = elementwise mean, empty clusters keep their previous
    * centroid, and the iteration count is fixed.
    *
    * Scale shape: the per-iteration assignment is a broadcast
    * crossJoin over the sample (centroids are k×dim — metadata-sized),
    * and the update aggregates elementwise sums distributed
    * (posexplode → groupBy(cid, pos)) before collecting only the k×dim
    * aggregated cells to the driver — the standard Lloyd's-on-Spark
    * pattern; the sample is never collected.
    */
  def trainIvfCentroids(sample: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = sample.sparkSession
    import spark.implicits._
    val s = sample.select(col("id").cast("long"), col("v").cast("array<double>"))
    var cent: Array[(Long, Array[Double])] =
      s.orderBy("id").limit(k).as[(Long, Seq[Double])].collect()
        .zipWithIndex.map { case ((_, v), i) => (i.toLong, v.toArray) }
    for (_ <- 0 until iters) {
      // assignment as one compiled map pass with the k×dim codebook in
      // the task closure (bit-identical to the broadcast-join + window
      // argmax it replaces — see [[nearestCid]]); only the update's
      // k×dim aggregated cells ever shuffle
      val centNow = cent
      val assign = s.as[(Long, Seq[Double])]
        .map { case (_, v) =>
          val a = v.toArray
          (nearestCid(centNow, a, 0, a.length), v)
        }.toDF("cid", "v")
      val cells = assign
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .as[(Long, Int, Double, Long)].collect()
      val byCid = cells.groupBy(_._1)
      cent = cent.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) => (cid, rows.sortBy(_._2).map(r => r._3 / r._4))
          case None       => (cid, old) // empty cluster keeps its centroid
        }
      }
    }
    cent.toSeq.map { case (cid, v) => (cid, v.toSeq) }.toDF("id", "v")
  }

  /** Product-quantization codebooks: the vector is split into `m`
    * contiguous subspaces of `dim/m` coordinates and each subspace gets
    * its own k-centroid codebook, trained with the SAME deterministic
    * Lloyd's schedule as [[trainIvfCentroids]] (seed = k smallest-id
    * sample subvectors, max-cosine assignment with ties → smaller cid,
    * fixed iteration count) — which keeps the whole PQ family
    * oracle-replicable. Output: `(sub, cid, cv)`, m·k rows of dim/m
    * doubles — codebooks are metadata-sized (KBs) at any corpus scale.
    *
    * This is the 100 TB MEMORY path: vectors compress to m code bytes
    * (64 doubles → 4 bytes here, 128× smaller), so a trillion-vector
    * index fits where raw floats never could; scoring never touches
    * the original vectors ([[pqTopK]]).
    */
  def pqTrain(sample: DataFrame, m: Int, dim: Int, k: Int, iters: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val d = dim / m
    val spark = sample.sparkSession
    import spark.implicits._
    val s = sample.select(col("id").cast("long"), col("v").cast("array<double>"))
    // all m subspaces train in the SAME jobs: one fused assignment pass
    // over the raw vectors (each row emits its m per-subspace codes)
    // and one cell aggregation per iteration — the math per (sub, cid)
    // is identical to running trainIvfCentroids on each slice, which is
    // what the gate oracle replays
    // seeds: the k smallest-id sample vectors, sliced per subspace
    var cent: Array[(Int, Long, Array[Double])] =
      s.orderBy("id").limit(k).as[(Long, Seq[Double])].collect()
        .zipWithIndex.flatMap { case ((_, v), i) =>
          (0 until m).map(sub => (sub, i.toLong, v.slice(sub * d, sub * d + d).toArray))
        }
    for (_ <- 0 until iters) {
      // per-sub codebooks in the task closure; assignment never
      // materializes the n·m·k candidate rows or their window sort
      // (see [[nearestCid]])
      val bySub: Array[Array[(Long, Array[Double])]] =
        Array.tabulate(m)(sub => cent.collect { case (`sub`, cid, cv) => (cid, cv) })
      val assign = s.as[(Long, Seq[Double])]
        .flatMap { case (_, v) =>
          val a = v.toArray
          (0 until m).map { sub =>
            (sub, nearestCid(bySub(sub), a, sub * d, d),
              v.slice(sub * d, sub * d + d))
          }
        }.toDF("sub", "cid", "sv")
      val cells = assign
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cid", "pos").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .as[(Int, Long, Int, Double, Long)].collect()
      val byKey = cells.groupBy(c => (c._1, c._2))
      cent = cent.map { case (sub, cid, old) =>
        byKey.get((sub, cid)) match {
          case Some(rows) => (sub, cid, rows.sortBy(_._3).map(r => r._4 / r._5))
          case None       => (sub, cid, old) // empty cluster keeps its centroid
        }
      }
    }
    cent.toSeq.map { case (sub, cid, cv) => (sub, cid, cv.toSeq) }.toDF("sub", "cid", "cv")
  }

  /** PQ-encode a corpus: every vector becomes m `(sub, cid)` codes —
    * nearest (max-cosine, ties → smaller cid) codebook entry per
    * subspace. One corpus scan + a broadcast of the metadata-sized
    * codebooks; the per-(id,sub) top-1 window shuffles n·m·k rows of
    * (id, sub, cid, cos) — code-sized, not vector-sized.
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val d = dim / m
    // m·k codebook cells to the driver (allowlisted metadata-scale
    // collect), then one compiled flatMap emits each vector's m codes —
    // the n·m·k candidate rows and their (id, sub) window sort never
    // exist (see [[nearestCid]] for the bit-identity argument)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb: Array[Array[(Long, Array[Double])]] = {
      val rows = codebooks
        .select(col("sub").cast("int"), col("cid").cast("long"),
          col("cv").cast("array<double>"))
        .as[(Int, Long, Seq[Double])].collect()
      Array.tabulate(m)(sub =>
        rows.collect { case (`sub`, cid, cv) => (cid, cv.toArray) })
    }
    corpus.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        val a = v.toArray
        (0 until m).map(sub => (id, sub, nearestCid(cb(sub), a, sub * d, d)))
      }.toDF("id", "sub", "cid")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query builds a
    * lookup table of `dot(query_subvector, centroid)` (and the
    * centroid/query self-dots) — |Q|·m·k rows, metadata-sized — and the
    * corpus is scored WITHOUT touching any original vector: each of the
    * n·m code rows joins the broadcast LUT on (sub, cid) and the m
    * partial dots assemble into an approximate cosine.
    *
    * Determinism: the m partials pivot into FIXED columns (one value
    * each — `max` of a single-element group) and sum left-to-right, so
    * Spark and the SQL oracle run the identical IEEE addition order —
    * no shuffle-order-dependent double summation.
    */
  def pqTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, m: Int, dim: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val lut = adcLut(queries, codebooks, m, dim / m)
    // one hash agg packs each vector's m codes into a map, then a
    // compiled flatMap scores every (query, vector) pair from the
    // driver-built LUT — the n·m LUT-join rows, the 3m-column pivot
    // aggregate and the per-qid window sort of the first formulation
    // never exist. The bounded-heap TopKPerGroup replaces the
    // row_number window (spec-pinned equal, including ties).
    val scored = packedCodes(codes).as[(Long, Map[Int, Long])]
      .flatMap { case (id, cm) =>
        lut.qids.indices.iterator.filter(qi => lut.qids(qi) != id)
          .map(qi => (lut.qids(qi), id, lut.cos(qi, cm, m)))
      }.toDF("qid", "nbr", "cos")
    graft.plans.TopKPerGroup(scored, Seq("qid"), "cos", "nbr", k)
  }

  /** Driver-built ADC lookup table: for each (query, sub, cid) the
    * partial dot `pd`, plus the centroid and query self-dots —
    * |Q|·m·k cells (two allowlisted metadata-scale collects: the query
    * batch and the codebooks; a "query batch" is the small side by
    * construction, like every ANN API here). [[cos]] assembles the m
    * partials sub-ascending and divides by the two square roots —
    * the identical IEEE operation sequence as the fixed-association
    * `reduceLeft` column totals the join formulation used, so scores
    * are bit-equal.
    */
  private final case class AdcLut(qids: Array[Long], qIdx: Map[Long, Int],
      pd: Array[Array[Array[Double]]], pc: Array[Array[Double]],
      pq: Array[Array[Double]]) {
    def cos(qi: Int, cm: Map[Int, Long], m: Int): Double = {
      var spd = 0.0; var spc = 0.0; var spq = 0.0
      var sub = 0
      while (sub < m) {
        val cid = cm(sub).toInt
        spd += pd(qi)(sub)(cid); spc += pc(sub)(cid); spq += pq(qi)(sub)
        sub += 1
      }
      spd / (math.sqrt(spq) * math.sqrt(spc))
    }
  }

  private def adcLut(queries: DataFrame, codebooks: DataFrame,
      m: Int, d: Int): AdcLut = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (i, v) => (i, v.toArray) }
    val cb = codebooks
      .select(col("sub").cast("int"), col("cid").cast("long"),
        col("cv").cast("array<double>"))
      .as[(Int, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c, v.toArray) }
    val kMax = cb.map(_._2).max.toInt + 1
    // sequential left-to-right fold from 0.0 — the dot() column form
    def dotA(a: Array[Double], aFrom: Int, b: Array[Double], len: Int): Double = {
      var s = 0.0; var i = 0
      while (i < len) { s += a(aFrom + i) * b(i); i += 1 }
      s
    }
    val pd = Array.ofDim[Double](qs.length, m, kMax)
    val pc = Array.ofDim[Double](m, kMax)
    val pq = Array.ofDim[Double](qs.length, m)
    for (((sub, cid, cv), _) <- cb.zipWithIndex) {
      pc(sub)(cid.toInt) = dotA(cv, 0, cv, d)
      for (qi <- qs.indices) pd(qi)(sub)(cid.toInt) = dotA(qs(qi)._2, sub * d, cv, d)
    }
    for (qi <- qs.indices; sub <- 0 until m) {
      val q = qs(qi)._2
      var s = 0.0; var i = 0
      while (i < d) { val x = q(sub * d + i); s += x * x; i += 1 }
      pq(qi)(sub) = s
    }
    AdcLut(qs.map(_._1), qs.map(_._1).zipWithIndex.toMap, pd, pc, pq)
  }

  /** (id, sub, cid) exploded codes → (id, cm: map<sub, cid>) — one
    * hash aggregation; map entries are keyed, so collect_list's
    * shuffle order can't leak into anything.
    */
  private def packedCodes(codes: DataFrame): DataFrame =
    codes.groupBy(col("id").cast("long").as("id"))
      .agg(map_from_entries(collect_list(struct(
        col("sub").cast("int").as("sub"),
        col("cid").cast("long").as("cid")))).as("cm"))

  /** IVFADC — the composed production shape for trillion-vector
    * search: the coarse inverted file ([[ivfAssign]]) prunes the
    * corpus to `nprobe` centroid lists, then the survivors are scored
    * from their PQ codes alone ([[pqTopK]]'s ADC). After index build,
    * a query touches: the broadcast coarse centroids (k×dim), the
    * broadcast LUT (|Q|·m·k), the pruned lists' id+code rows — and
    * NEVER an original vector. That is the 100 TB story: the float
    * corpus can live in cold storage; the serving index is
    * codes + two metadata-sized broadcasts.
    *
    * `coarseIndex` is `(id, cid)` from [[ivfAssign]] (the `v` column
    * dropped — deliberately: scoring must not depend on it), `codes`
    * is [[pqEncode]] output.
    */
  def ivfPqTopK(coarseIndex: DataFrame, centroids: DataFrame,
      codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int, m: Int, dim: Int): DataFrame = {
    val d = dim / m
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("ccid"))
    val probes = queries.as("q")
      .crossJoin(broadcast(centroids.select(col("id").as("ccid"), col("v").as("cv"))))
      .select(col("q.id").as("qid"), col("ccid"),
        cosine(col("q.v"), col("cv")).as("cos"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("qid"), col("ccid"))
    val cands = probes
      .join(coarseIndex.withColumnRenamed("cid", "ccid"), "ccid")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
    // pruned candidates join their packed codes, then a compiled map
    // scores each (qid, id) from the driver-built LUT — same ADC
    // arithmetic and top-k mechanics as [[pqTopK]] (see [[AdcLut]]).
    val spark = codes.sparkSession
    import spark.implicits._
    val lut = adcLut(queries, codebooks, m, d)
    val scored = cands.join(packedCodes(codes), "id")
      .select(col("qid").cast("long"), col("id").cast("long"), col("cm"))
      .as[(Long, Long, Map[Int, Long])]
      .map { case (qid, id, cm) => (qid, id, lut.cos(lut.qIdx(qid), cm, m)) }
      .toDF("qid", "nbr", "cos")
    graft.plans.TopKPerGroup(scored, Seq("qid"), "cos", "nbr", k)
  }

  /** Deterministic random-hyperplane signs for LSH: sign(j, i) derived
    * from md5("hp_j_i") so the DuckDB oracle can replicate the exact
    * hyperplane family (same trick as SimHash's md5-derived bits).
    */
  def lshSigns(nBits: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBits, dim) { (j, i) =>
      val h = md.digest(s"hp_${j}_$i".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0
      if (((h(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
    }
  }

  /** Signed random projection (Achlioptas 2001's ±1 database-friendly
    * JL family — public literature): project `dim`-dim vectors onto
    * `outDim` md5-derived ±1 directions (the SAME `hp_j_i` family the
    * LSH buckets use, so the oracle replays the matrix exactly).
    * Training-free dimensionality reduction: relative angles survive
    * within the JL distortion bound, so the 4–8× shorter vectors feed
    * the ANN family (cluster, bucket, shortlist) at a fraction of the
    * memory/IO — the cheap step BEFORE k-means/PQ when raw dims are
    * wide.
    *
    * Scale shape: the matrix is outDim·dim doubles captured in the
    * task closure (KBs — no broadcast table, no join); the projection
    * is one COMPILED Dataset.map pass in the scan stage, no shuffle
    * anywhere. (A first cut as nested transform/aggregate HOFs was
    * 10× slower — higher-order functions are CodegenFallback, so the
    * 16×64 lambda tower ran interpreted per row; same lesson as the
    * trigram pass.) Each output coordinate folds i ascending from a
    * 0.0 init — the same FP order the HOF fold had, so the SQL oracle
    * is unchanged. Returns (id, v, p).
    */
  def randomProject(vs: DataFrame, dim: Int, outDim: Int): DataFrame = {
    val signs = lshSigns(outDim, dim)
    val spark = vs.sparkSession
    import spark.implicits._
    vs.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val p = new Array[Double](outDim)
        var j = 0
        while (j < outDim) {
          val row = signs(j)
          var s = 0.0
          var i = 0
          while (i < dim) { s += v(i) * row(i); i += 1 }
          p(j) = s; j += 1
        }
        (id, v, p.toSeq)
      }.toDF("id", "v", "p")
  }

  /** ANN via random-hyperplane LSH buckets + Hamming-1 multiprobe — the
    * second bucketed scale path next to IVF. Every vector hashes to a
    * `nBits` signature (sign of the dot with each hyperplane); a query
    * scans only its own bucket and the nBits buckets one bit-flip away
    * (~ (nBits+1)/2^nBits of the corpus). Signatures are one compiled
    * pass; the bucket join is a plain equi-join Catalyst can broadcast
    * or shuffle by stats.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val signs = lshSigns(nBits, dim)
    def bucketOf(v: Array[Double]): Int = {
      var b = 0; var j = 0
      while (j < nBits) {
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i) * signs(j)(i); i += 1 }
        if (s > 0) b |= 1 << j
        j += 1
      }
      b
    }
    def withBucket(df: DataFrame): DataFrame =
      df.select(col("id").cast("long"), col("v").cast("array<double>"))
        .as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, bucketOf(v.toArray)) }
        .toDF("id", "v", "bucket")
    val cb = withBucket(corpus)
    val qb = withBucket(queries)
      .withColumn("probe", explode(array(
        (col("bucket") +: (0 until nBits).map(j =>
          col("bucket").bitwiseXOR(lit(1 << j)))): _*)))
      .select(col("id").as("qid"), col("v").as("qv"), col("probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    qb.join(cb, col("probe") === col("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nbr"), cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All pairs with cosine >= threshold, as a distributed block-pair
    * self-join — nothing ever materializes on the driver.
    *
    * Every vector is assigned to one of `numBlocks` blocks by id and
    * replicated to each of the `numBlocks` block-pairs its block is part
    * of; each pair-group then runs a tight compiled double loop over its
    * two bounded sides (Catalyst's `aggregate`/`zip_with` are
    * interpreted — higher-order functions don't codegen — which costs
    * ~100× on an O(n²) inner loop, hence mapGroups). Per-task memory is
    * two blocks (~2·n/numBlocks rows): at 100 TB you raise `numBlocks`
    * with O(√n) and every task stays bounded; total shuffle volume is
    * n·numBlocks rows. The fold order matches [[dot]] exactly
    * (sequential, left-to-right, smaller id as the left operand), so
    * results are bit-identical to the expression form, and sub-threshold
    * pairs are never materialized as rows at all.
    *
    * SCALE CONTRACT: all-pairs-above-threshold is quadratic in the
    * PROBLEM STATEMENT — blocking bounds memory and parallelizes, it
    * cannot remove the n² comparisons (measured: 10× corpus → ~6×
    * wall-clock at small n, trending to 100×). Use this for bounded
    * slices (a partition, a cluster, a candidate set); at corpus scale
    * route through the prefiltered family ([[lshTopK]] buckets /
    * [[ivfTopK]]) whose probe cost scales flat, then verify the
    * surviving candidates here.
    *
    * The contract is ENFORCED at call time: the corpus row count
    * (exact leaf-stats metadata when the optimizer has it, else one
    * cheap count over the id column — never a full-width scan) must not
    * exceed `maxCorpusRows` (default: the session conf
    * `spark.graft.cosPairs.maxCorpusRows`, 1,000,000 rows ≈ 5·10¹¹
    * comparisons). Above the bound the call fails fast with a pointer
    * to the ANN family instead of silently launching a cluster-killing
    * n² job.
    */
  def cosineThresholdPairs(vs: DataFrame, threshold: Double, numBlocks: Int = 8,
      maxCorpusRows: Long = -1L): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    val bound =
      if (maxCorpusRows >= 0L) maxCorpusRows
      else spark.conf.get("spark.graft.cosPairs.maxCorpusRows", "1000000").toLong
    val corpusRows: Long = vs.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong)
      .getOrElse(vs.select(vs.columns.head).count())
    require(corpusRows <= bound,
      s"cosineThresholdPairs: corpus has $corpusRows rows, above the configured " +
      s"bound of $bound (spark.graft.cosPairs.maxCorpusRows or the maxCorpusRows " +
      "argument). All-pairs-above-threshold is quadratic in corpus size; at this " +
      "scale route through the prefiltered ANN family — VectorOps.lshTopK " +
      "(hyperplane buckets + multiprobe) or VectorOps.ivfTopK (inverted file) — " +
      "then verify the surviving candidate set here.")
    val b = numBlocks
    val ds = vs.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v.toArray) }
    val replicated = ds.flatMap { case (id, v) =>
      val g = ((id % b + b) % b).toInt
      (0 until b).iterator.map { o =>
        val i = math.min(g, o); val j = math.max(g, o)
        (i * b + j, g, id, v)
      }
    }
    replicated
      .groupByKey(_._1)
      .flatMapGroups { (key: Int, it: Iterator[(Int, Int, Long, Array[Double])]) =>
        val bi = key / b; val bj = key % b
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        it.foreach { case (_, g, id, v) =>
          if (g == bi) left += ((id, v)) else right += ((id, v))
        }
        val pairs =
          if (bi == bj) // intra-block: unordered index pairs within `left`
            for (x <- left.indices.iterator; y <- (x + 1) until left.size)
              yield (left(x), left(y))
          else
            for (a <- left.iterator; c <- right.iterator) yield (a, c)
        pairs.flatMap { case (p, q) =>
          // smaller id is always the left operand of the fold
          val ((ia, va), (ib, vb)) = if (p._1 < q._1) (p, q) else (q, p)
          var dotAb = 0.0; var dotAa = 0.0; var dotBb = 0.0
          var i = 0
          val n = va.length
          while (i < n) {
            dotAb += va(i) * vb(i); dotAa += va(i) * va(i); dotBb += vb(i) * vb(i)
            i += 1
          }
          val cos = dotAb / (math.sqrt(dotAa) * math.sqrt(dotBb))
          if (cos >= threshold) Some((ia, ib, cos)) else None
        }
      }
      .toDF("id_a", "id_b", "cos")
  }

  /** Within-cluster cosine pairs over an assigned index (`(id, v, cid)`
    * from [[ivfAssign]]) — the pair-search half of SemDeDup (Abbas et
    * al. 2023): the all-pairs comparison runs INSIDE each k-means
    * cluster only, so the corpus-quadratic blowup
    * [[cosineThresholdPairs]] has to fence against becomes
    * k × (n/k)² = n²/k — the clustering IS the scale story, and the
    * cluster count is the knob that keeps per-cluster work bounded as
    * the corpus grows.
    *
    * Scale shape: one hash shuffle of the index on `cid` feeds a
    * co-partitioned self-join; nothing global, nothing on the driver.
    * Returns (cid, id_a, id_b, cos) with id_a < id_b.
    */
  def semDedupPairs(index: DataFrame, threshold: Double): DataFrame = {
    val a = index.select(col("cid"), col("id").as("id_a"), col("v").as("va"))
    val b = index.select(col("cid"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cid"), col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Per-cluster embedding EXTREMES — the pruning companion to
    * [[semDedup]] (SemDeDup removes near-dups; SSL-prototype pruning
    * removes the too-prototypical, outlier screens remove the noise):
    * for each k-means cluster, rank members by cosine to their
    * centroid and surface the `m` farthest (`r_out` ≤ m — candidate
    * noise/contamination) and the `m` closest (`r_proto` ≤ m —
    * candidate redundant prototypes). Rank-based on purpose: no
    * FP-order-dependent mean/stddev aggregates, so the answer is
    * deterministic under any partitioning and SQL-replicable exactly.
    *
    * Scale shape: centroid join is a broadcast (k×dim metadata); the
    * two rankings are ONE window partitioning (by cid — never global);
    * output is 2m·k rows. Returns (cid, id, ccos, r_out, r_proto)
    * filtered to the extremes.
    */
  def clusterExtremes(index: DataFrame, centroids: DataFrame,
      m: Int): DataFrame = {
    val wOut = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy(col("ccos").asc, col("id"))
    val wProto = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy(col("ccos").desc, col("id"))
    index
      .join(broadcast(centroids.select(col("id").as("cid"), col("v").as("cv"))), "cid")
      .select(col("cid"), col("id"), cosine(col("v"), col("cv")).as("ccos"))
      .withColumn("r_out", row_number().over(wOut))
      .withColumn("r_proto", row_number().over(wProto))
      .filter(col("r_out") <= m || col("r_proto") <= m)
  }

  /** SemDeDup end to end: assign every vector to its max-cosine
    * centroid, find within-cluster pairs above `threshold`, connect
    * them into components (min-id representative — deterministic, where
    * the paper keeps the member closest to the centroid), and emit the
    * per-vector decision table. Returns (id, cid, rep, keep): `rep` is
    * the component representative (the vector itself when it has no
    * semantic duplicate) and `keep` marks the survivors.
    *
    * Scale shape: the index materializes once (at production scale:
    * the persisted parquet partitioned by cid); pairs are
    * cluster-bounded; CC runs O(log² n) rounds over the SPARSE pair
    * list; the final join touches the pair-participating ids only
    * (component table ≪ corpus).
    */
  def semDedup(vs: DataFrame, centroids: DataFrame,
      threshold: Double): DataFrame = {
    val index = ivfAssign(vs, centroids).localCheckpoint()
    val comp = DedupOps.connectedComponents(semDedupPairs(index, threshold))
    index.select("id", "cid")
      .join(comp.select(col("id"), col("cluster_id").as("rep0")), Seq("id"), "left")
      .select(col("id"), col("cid"),
        coalesce(col("rep0"), col("id")).as("rep"),
        (coalesce(col("rep0"), col("id")) === col("id")).as("keep"))
  }

  /** SemDeDup with a SCALE-SAFE derived k (the r16 SemScaleProbe
    * remedy made the default): the published algorithm's pair work is
    * k·(n/k)² = n²/k, so any FIXED k is quadratic in the corpus — the
    * paper's own shape holds cluster SIZE constant, not cluster count.
    * This overload derives k = max(kMin, ceil(n / targetClusterSize)),
    * trains centroids on the id-sampled corpus with the deterministic
    * Lloyd schedule, and runs [[semDedup]] — pair work is then bounded
    * by ~n·targetClusterSize (balanced clusters), i.e. linear in n at
    * fixed target. The r16 probe measured the difference at 100×:
    * 109 s at the derived shape vs 377 s at the pinned gate shape.
    * Costs one metadata count() to size k. Callers that need an
    * oracle-replicable pinned k (the `semantic_dedup` gate) keep the
    * explicit-centroids overload.
    */
  def semDedup(vs: DataFrame, threshold: Double,
      targetClusterSize: Int = 250, kMin: Int = 8,
      trainSampleMod: Int = 5, iters: Int = 2): DataFrame = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    val n = vs.count()
    val k = math.max(kMin,
      ((n + targetClusterSize - 1) / targetClusterSize).toInt)
    val cent = trainIvfCentroids(
      vs.filter(col("id") % trainSampleMod === 0), k, iters)
    semDedup(vs, cent, threshold)
  }

  /** Matryoshka prefix ANN (Kusupati et al. 2022's MRL serving trick —
    * public literature): embeddings trained with matryoshka losses
    * concentrate signal in their leading coordinates, so the first
    * `prefixDim` dims alone rank candidates well. The serving split
    * mirrors [[binaryProbe]]: the SCAN touches only the prefix index
    * (prefixDim/dim of the vector bytes — 4× smaller at 64→16, no
    * training, no codebooks), and full vectors are fetched by id-join
    * for the `shortlist` rows only, then exact-cosine rescored.
    * Deterministic ties (pcos/cos DESC, nbr) keep it oracle-exact.
    */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, prefixDim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val index = corpus.select(col("id"), slice(col("v"), 1, prefixDim).as("pv"))
    val qp = queries.select(col("id").as("qid"), col("v").as("qv"),
      slice(col("v"), 1, prefixDim).as("qpv"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("pcos").desc, col("nbr"))
    val short = index.crossJoin(broadcast(qp))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("id").as("nbr"),
        cosine(col("qpv"), col("pv")).as("pcos"))
      .withColumn("r", row_number().over(wS)).filter(col("r") <= shortlist)
    val wF = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    short.join(corpus.select(col("id").as("nbr"), col("v")), "nbr")
      .select(col("qid"), col("nbr"), cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(wF)).filter(col("rank") <= k)
  }

  /** Per-dimension z-standardization — the feature-scaling step before
    * distance-based ops when raw dimensions have wildly different
    * scales (whitening-lite; full whitening = this + [[pcaTrain]]'s
    * rotation). One aggregation computes the 6dp-rounded per-dimension
    * moments (dim cells, audited collect); the normalization itself is
    * a compiled scan-stage map pass with the moments in the task
    * closure — no shuffle, no broadcast table. Zero-variance
    * dimensions map to 0 (no information, no NaN). Returns (id, v, z).
    */
  def standardize(vs: DataFrame, dim: Int): DataFrame = {
    val m = new Array[Double](dim)
    val sd = new Array[Double](dim)
    // dim aggregated moment cells, never corpus rows
    vs.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(round(avg("x"), 6).as("m"),
        round(stddev_pop(col("x")), 6).as("s"))
      .collect()
      .foreach { r => m(r.getInt(0)) = r.getDouble(1); sd(r.getInt(0)) = r.getDouble(2) }
    val spark = vs.sparkSession
    import spark.implicits._
    // compiled map pass (HOFs are CodegenFallback — see randomProject)
    vs.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val z = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          z(i) = if (sd(i) == 0) 0.0 else (v(i) - m(i)) / sd(i)
          i += 1
        }
        (id, v, z.toSeq)
      }.toDF("id", "v", "z")
  }

  /** PCA top components by covariance aggregation + driver-side power
    * iteration (the classical method; see e.g. Golub & Van Loan,
    * "Matrix Computations") — the DATA-AWARE dimensionality reduction
    * next to [[randomProject]]'s oblivious one: components follow the
    * corpus's actual variance directions, so the same target dim
    * preserves more structure (at the cost of a training pass).
    *
    * Scale shape: the corpus is touched by exactly two aggregations —
    * per-coordinate means (dim cells) and the covariance's
    * (i, j)-cell sums (dim² cells, map-side partially aggregated; the
    * n·dim² product rows exist only inside the scan stage, never in a
    * shuffle). Only those aggregated dim²+dim cells reach the driver
    * (audited collects) — the eigen-iteration then runs on a dim×dim
    * matrix, which is driver-trivial at any corpus size. Both
    * aggregates ROUND to 6dp before iteration (the [[graft.operators
    * .AnomalyOps.cusum]] trick): the long deterministic eigen-chain
    * starts from inputs any engine reproduces exactly. Deterministic
    * throughout: e₀ start vector, fixed iteration count, ascending-
    * index folds, Hotelling deflation between components.
    *
    * Returns (mean, components, eigenvalues): components are unit
    * vectors, eigenvalues their variances.
    */
  def pcaTrain(vs: DataFrame, dim: Int, nComp: Int = 2, iters: Int = 8)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val n = vs.count().toDouble
    val pe = vs.select(posexplode(col("v")).as(Seq("i", "xi")))
    val mean = new Array[Double](dim)
    // dim aggregated cells — coordinate means, never corpus rows
    pe.groupBy("i").agg(round(avg("xi"), 6).as("m")).collect()
      .foreach(r => mean(r.getInt(0)) = r.getDouble(1))
    val mLit = typedLit(mean.toSeq)
    val cov = Array.ofDim[Double](dim, dim)
    // dim² aggregated cells — the covariance matrix, never corpus rows
    vs.select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .withColumn("p",
        (col("xi") - element_at(mLit, col("i") + 1)) *
          (col("xj") - element_at(mLit, col("j") + 1)))
      .groupBy("i", "j").agg(round(sum("p") / lit(n), 6).as("c"))
      .collect()
      .foreach(r => cov(r.getInt(0))(r.getInt(1)) = r.getDouble(2))

    def matVec(c: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }; s
      }
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * v(i); i += 1 }; math.sqrt(s)
    }
    var c = cov
    val comps = Array.ofDim[Double](nComp, dim)
    val eig = new Array[Double](nComp)
    for (k <- 0 until nComp) {
      var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val w = matVec(c, v)
        val nm = norm(w)
        v = w.map(_ / nm)
      }
      val w = matVec(c, v)
      var lam = 0.0
      var li = 0
      while (li < dim) { lam += v(li) * w(li); li += 1 }
      comps(k) = v; eig(k) = lam
      // Hotelling deflation: remove the found direction, iterate again
      c = Array.tabulate(dim, dim)((i, j) => c(i)(j) - lam * v(i) * v(j))
    }
    (mean, comps, eig)
  }

  /** Project vectors onto trained PCA components: scores[k] =
    * Σ_i (v_i − mean_i)·comp_k[i], folded i-ascending from a 0.0 init.
    * Mean and components ride in the task closure (KBs) — a compiled
    * scan-stage map pass (HOFs are CodegenFallback — see
    * [[randomProject]]), no shuffle, no broadcast table. Returns
    * (id, v, p).
    */
  def pcaProject(vs: DataFrame, mean: Array[Double],
      comps: Array[Array[Double]]): DataFrame = {
    val dim = mean.length
    val nComp = comps.length
    val spark = vs.sparkSession
    import spark.implicits._
    vs.select(col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val p = new Array[Double](nComp)
        var k = 0
        while (k < nComp) {
          val c = comps(k)
          var s = 0.0
          var i = 0
          while (i < dim) { s += (v(i) - mean(i)) * c(i); i += 1 }
          p(k) = s; k += 1
        }
        (id, v, p.toSeq)
      }.toDF("id", "v", "p")
  }
}
