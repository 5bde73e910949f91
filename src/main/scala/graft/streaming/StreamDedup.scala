package graft.streaming

import graft.llmops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup stage for a document ingest pipeline: the
  * Structured Streaming analogue of the batch `exact_dedup` +
  * `incremental_dedup` operators.
  *
  * Two filters compose on the stream:
  *  1. stream-internal duplicates — `dropDuplicatesWithinWatermark` on
  *     the content fingerprint, so re-sent or doubly-crawled documents
  *     inside the watermark horizon collapse to their first arrival
  *     (state is bounded by the watermark: at 100 TB/day the state
  *     store holds one fingerprint per unique doc per horizon, not the
  *     corpus);
  *  2. corpus duplicates — a stream-static LEFT ANTI join against the
  *     persisted fingerprint index (the `(fp)` parquet a batch job
  *     appends per day). The static side is re-read per micro-batch, so
  *     a nightly index append is picked up without restarting the
  *     stream; Catalyst broadcasts it when small and shuffles the
  *     micro-batch (bounded) against it when not.
  *
  * Output is the deduplicated stream of novel documents — feed it to
  * `foreachBatch` to append both the documents and their fingerprints
  * to the corpus.
  */
object StreamDedup {

  /** @param docs streaming frame carrying `tsCol` (event-time) + `textCol`
    * @param corpusFps static frame with an `fp` column (md5 of the
    *   normalized text, [[TextOps.fingerprint]])
    * @param watermark event-time horizon for the in-stream dedup state
    */
  def exactDedupStream(docs: DataFrame, corpusFps: DataFrame,
      textCol: String, tsCol: String, watermark: String): DataFrame = {
    require(docs.isStreaming, "exactDedupStream expects a streaming frame")
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
  }

  /** Per-micro-batch candidate-pair budget (VERDICT r14 #4) — the
    * guard for the replay-the-corpus failure mode PERF.md documents:
    * a bench seed that replicated indexed documents drove the probe
    * join to 294M pair rows (~100 s/batch), because the join emits
    * df_idx(s)·df_batch(s) rows per shingle s — a batch densely
    * overlapping the index goes quadratic even though both sides are
    * individually bounded. The budget predicts that sum from the df
    * table BEFORE joining (an O(batch-shingles) metadata aggregate);
    * past it, the probe keeps the cheapest shingles that fit and drops
    * the densest — precisely the least discriminative
    * (boilerplate/replay-grade) — with a loud stderr warning.
    *
    * Degrade semantics, documented: dropping a shingle can only LOWER
    * a pair's shared-count, so an engaged budget may let a true
    * near-dup through; it can never fabricate a pair. The default (64M
    * pair rows ≈ a few GB of shuffle) is far above any healthy
    * micro-batch probe and only engages on replay storms.
    */
  val DefaultPairBudget: Long = 64000000L

  /** Predicted probe-join size per shingle — (shingle, _cost) with
    * _cost = df_idx·df_batch, restricted to the batch's non-hot
    * shingles (hot shingles are dropped by the probe's df cap and cost
    * nothing). `idxDf` is (shingle, df) covering at least the batch's
    * shingles — a batch-scoped view is fine, since a shingle's corpus
    * df doesn't depend on which batch probes it. Exposed for the
    * budget spec and the profiler.
    */
  private[graft] def pairCost(newEx: DataFrame, idxDf: DataFrame,
      maxDf: Int): DataFrame =
    newEx.groupBy("shingle").agg(count(lit(1)).as("_db"))
      .join(idxDf.filter(col("df") <= maxDf)
        .select(col("shingle"), col("df").as("_di")), "shingle")
      .select(col("shingle"), (col("_db") * col("_di")).as("_cost"))

  /** Trim `newEx` to a shingle set whose predicted probe-join size fits
    * `pairBudget` (cheapest-product shingles first, so trimming starts
    * with the replay-grade ones). No-op — and no extra job beyond one
    * metadata-scale sum — when the batch is healthy.
    */
  private def budgetNewEx(newEx: DataFrame, idxDf: DataFrame, maxDf: Int,
      pairBudget: Long, path: String): DataFrame = {
    val cost = pairCost(newEx, idxDf, maxDf).localCheckpoint()
    val total = cost.agg(coalesce(sum("_cost"), lit(0L))).head.getLong(0)
    if (total <= pairBudget) newEx
    else {
      // single-task cumulative sum over O(batch-shingles) rows —
      // micro-batch-bounded, and only paid on the already-degraded path
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("_cost").asc, col("shingle").asc)
      val kept = cost.withColumn("_cum", sum(col("_cost")).over(w))
        .filter(col("_cum") <= pairBudget).select("shingle")
      System.err.println(s"[graft] $path: candidate-pair budget engaged — " +
        s"predicted $total pair rows > budget $pairBudget; dropping the " +
        "densest shingles (shared counts can only shrink; see " +
        "StreamDedup.DefaultPairBudget)")
      newEx.join(broadcast(kept), Seq("shingle"))
    }
  }

  /** NEAR-dup filter for one micro-batch — the `foreachBatch` stage
    * that completes the streaming dedup pipeline (exact collapse above,
    * near-dup here): batch documents sharing at least `minShared`
    * df-capped winnow fingerprints with the persisted corpus index are
    * dropped; survivors are what `foreachBatch` appends to the corpus
    * (documents + fingerprints) before the next batch probes it.
    *
    * Near-dedup needs a per-document aggregation over the candidate
    * join, which Structured Streaming cannot express as an unbounded
    * stateful stage without holding corpus-scale shingle state — so the
    * production shape is exactly this: micro-batch = bounded batch,
    * probe the (static, nightly-compacted) index with the batch side
    * broadcast, so the corpus index is never reshuffled. The df cap is
    * measured batch-scoped (one broadcast-filtered corpus-postings
    * scan, O(batch) output — a shingle's corpus df doesn't depend on
    * which batch probes it, so this equals the full-corpus cap on
    * every shingle that matters), and the candidate join is
    * [[DefaultPairBudget]]-bounded.
    */
  def nearDedupBatch(batch: DataFrame, corpusFps: DataFrame, idCol: String,
      textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget): DataFrame = {
    val newEx0 = TextOps.winnowFingerprints(batch, idCol, textCol)
      .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
      .localCheckpoint()
    val corpEx = corpusFps
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
    val idxDf = corpEx
      .join(broadcast(newEx0.select("shingle").distinct()), Seq("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val newEx = budgetNewEx(newEx0, idxDf, maxDf, pairBudget, "nearDedupBatch")
    val hot = idxDf.filter(col("df") > maxDf).select("shingle")
    val doomed = corpEx
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(broadcast(newEx), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
  }

  /** Near-dup streaming state with MAINTAINED document frequencies:
    * the fingerprint index `(id, fps)` plus a `(shingle, df)` count
    * table. [[nearDedupBatch]] recomputes the df-cap aggregate over
    * the WHOLE corpus index every micro-batch — an O(corpus) shuffle
    * per trigger, quadratic over a stream's lifetime. Maintaining df
    * incrementally turns the per-batch corpus-side work into a pure
    * scan (the probe join), with the cap's hot-shingle set read from
    * state and updated by an O(batch) delta.
    */
  final case class NearDupIndex(fps: DataFrame, df: DataFrame)

  /** Build the initial state from a seed corpus. */
  def nearDupIndex(docs: DataFrame, idCol: String, textCol: String): NearDupIndex = {
    val fps = TextOps.winnowFingerprints(docs, idCol, textCol)
    NearDupIndex(fps,
      fps.select(explode(col("fps")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df")))
  }

  /** One micro-batch through the maintained-df index: returns the
    * surviving batch rows and the UPDATED state. Semantics match
    * [[nearDedupBatch]] with the df cap measured over the corpus index
    * (the same corpus-side-only capping as
    * [[TextOps.incrementalDedupPairs]]); the spec pins equivalence.
    * Per-batch costs: corpus-index SCAN for the probe join (batch side
    * broadcasts), O(batch) fingerprint work, O(batch) df delta merged
    * into state — no corpus-wide aggregate anywhere. The returned
    * frames are localCheckpointed so a foreachBatch driver can fold
    * them without lineage growth; a production sink appends `fps` rows
    * and merges `df` deltas in its table format instead.
    */
  def nearDedupBatchIncremental(batch: DataFrame, idx: NearDupIndex,
      idCol: String, textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget): (DataFrame, NearDupIndex) = {
    val newFps = TextOps.winnowFingerprints(batch, idCol, textCol).localCheckpoint()
    val newEx0 = newFps.select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
    // pair budget reads the STATE df table — an O(batch-shingles) join,
    // no corpus work (see DefaultPairBudget)
    val newEx = budgetNewEx(newEx0, idx.df, maxDf, pairBudget,
      "nearDedupBatchIncremental")
    // the df cap's hot set comes from STATE, not a per-batch aggregate;
    // it is tiny by construction (shingles with df > maxDf), so it
    // broadcasts onto the corpus scan
    val hot = idx.df.filter(col("df") > maxDf).select("shingle")
    val doomed = idx.fps
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(broadcast(newEx), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    val kept = batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
      .localCheckpoint()
    val keptFps = newFps
      .join(kept.select(col(idCol).cast("long").as("id")), Seq("id"))
      .localCheckpoint()
    val dfDelta = keptFps.select(explode(col("fps")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("d"))
    val mergedDf = idx.df.join(dfDelta, Seq("shingle"), "full")
      .select(col("shingle"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d"), lit(0L))).as("df"))
      .localCheckpoint()
    (kept, NearDupIndex(idx.fps.unionByName(keptFps).localCheckpoint(), mergedDf))
  }

  /** Merge-on-read persistence for the maintained-df near-dup index
    * (VERDICT r14 #2 — the production sink
    * [[nearDedupBatchIncremental]]'s scaladoc promises): two parquet
    * directories,
    *
    *  - `fps/`  — append-only `(id, fps)` fingerprint rows;
    *  - `df/`   — an append-only `(shingle, d)` DELTA LOG whose
    *              merge-on-read view is `df(shingle) = Σ d`.
    *
    * Per batch the sink APPENDS O(batch) rows to each — no full-outer
    * df merge, no rewrite of the corpus-wide df table (the in-memory
    * [[NearDupIndex]] fold materializes the whole domain per trigger,
    * which PERF.md measured as a wash-to-loss at bench scale). The
    * probe never needs the full df view either: only the batch's own
    * shingles can form pairs, so [[nearDedupBatchMor]] reads the log
    * through a broadcast semi-filter on the batch shingle set — an
    * O(log) columnar scan with O(batch) output, and the per-batch
    * corpus-side cost drops to the probe scan alone, independent of
    * index size.
    *
    * [[compact]] is the cadence sweep (same contract as
    * [[graft.store.BucketStore.compactFragmented]]): it folds the df
    * log to one row per shingle and coalesces the fps appends, keeping
    * the log at O(domain + K·batch) for a sweep every K batches. Run
    * it off the hot path; single-writer per index directory, like any
    * foreachBatch sink.
    */
  final class NearDupMorIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String) {
    private val fpsDir = s"$dir/fps"
    private val dfDir = s"$dir/df"

    /** Initialize from a seed corpus (overwrites both directories). */
    def seed(docs: DataFrame, idCol: String, textCol: String): Unit = {
      TextOps.winnowFingerprints(docs, idCol, textCol)
        .write.mode("overwrite").parquet(fpsDir)
      fps.select(explode(col("fps")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).cast("long").as("d"))
        .write.mode("overwrite").parquet(dfDir)
    }

    /** The fingerprint index — one scan per probe, never reshuffled. */
    def fps: DataFrame = spark.read.parquet(fpsDir)

    /** Merge-on-read df view, scoped to `shingles` (broadcast
      * semi-filter pushed onto the log scan; O(batch) output). Pass
      * no filter for the full domain view (compaction, diagnostics).
      */
    def dfView(shingles: Option[DataFrame] = None): DataFrame = {
      val log = spark.read.parquet(dfDir)
      val scoped = shingles match {
        case Some(s) => log.join(broadcast(s.select("shingle").distinct()),
          Seq("shingle"), "left_semi")
        case None => log
      }
      scoped.groupBy("shingle").agg(sum("d").as("df"))
    }

    /** Append one batch's surviving fingerprints: O(batch) rows into
      * each directory, nothing rewritten.
      */
    def append(keptFps: DataFrame): Unit = {
      keptFps.write.mode("append").parquet(fpsDir)
      keptFps.select(explode(col("fps")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).cast("long").as("d"))
        .write.mode("append").parquet(dfDir)
    }

    /** Cadence sweep: fold the df delta log to one row per shingle and
      * compact the fps appends to `targetFiles`. Off the hot path —
      * every K batches, or nightly.
      */
    def compact(targetFiles: Int = 1): Unit = {
      val foldedDf = dfView().select(col("shingle"), col("df").as("d"))
        .coalesce(targetFiles).localCheckpoint()
      foldedDf.write.mode("overwrite").parquet(dfDir)
      val foldedFps = fps.coalesce(targetFiles).localCheckpoint()
      foldedFps.write.mode("overwrite").parquet(fpsDir)
    }
  }

  /** One micro-batch through the merge-on-read index — semantics match
    * [[nearDedupBatchIncremental]] (the spec pins equivalence, df view
    * included), with the state maintenance turned into appends:
    *
    *   per-batch cost = fps-index probe SCAN
    *                  + df-log scan (broadcast-filtered, O(batch) out)
    *                  + O(batch) appends.
    *
    * Nothing corpus-sized is aggregated, merged, or rewritten per
    * trigger — the property that makes the maintained-df design win
    * when the index is 100×+ the batch (StreamBench's dedup_near_mor
    * row measures exactly that shape against the per-batch-aggregate
    * path). Returns the surviving batch rows; appends survivors'
    * fingerprints to the index as a side effect.
    */
  def nearDedupBatchMor(batch: DataFrame, idx: NearDupMorIndex,
      idCol: String, textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget): DataFrame = {
    val newFps = TextOps.winnowFingerprints(batch, idCol, textCol).localCheckpoint()
    val newEx0 = newFps.select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
    // batch-scoped df: one filtered log scan, O(batch) rows out
    val idxDf = idx.dfView(Some(newEx0)).localCheckpoint()
    val newEx = budgetNewEx(newEx0, idxDf, maxDf, pairBudget, "nearDedupBatchMor")
    val hot = idxDf.filter(col("df") > maxDf).select("shingle")
    val doomed = idx.fps
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(broadcast(newEx), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    val kept = batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
      .localCheckpoint()
    idx.append(newFps.join(
      kept.select(col(idCol).cast("long").as("id")), Seq("id")))
    kept
  }

  /** Exact-substring SCREEN for one micro-batch — the ingest-time form
    * of [[graft.llmops.DedupOps.substringSpans]]: the persisted corpus
    * is the keeper by definition (it was there first), so every
    * incoming w-token window that collides with the corpus window
    * index marks a removable span, spans merge per doc, and the batch
    * comes back PATCHED — (doc_id, trimmed, kept_tokens) for touched
    * docs, fully-covered docs dropped, novel docs passed through with
    * their token count. `foreachBatch` appends the survivors' windows
    * to the index, so a passage ingested in micro-batch N is screened
    * from batch N+1 on — same index-grows-per-batch shape as
    * [[nearDedupBatch]]. The batch side is micro-batch-bounded; the
    * corpus index joins on 8-byte hash keys and is never reshuffled
    * more than the equi-join requires.
    */
  def substrScreenBatch(batch: DataFrame, corpusWindows: DataFrame,
      idCol: String, textCol: String, w: Int,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    import graft.llmops.DedupOps
    val win = DedupOps.substringWindows(batch, idCol, textCol, w, hashFn)
    val spans = win
      .join(corpusWindows.select(col("h")).distinct(), Seq("h"))
      .select(col("doc_id"), col("i").as("s"), (col("i") + w - 1).as("e"))
    val merged = DedupOps.mergeSpans(spans).localCheckpoint()
    val trimmed = DedupOps.trimToSpans(batch, idCol, textCol, merged)
    val untouched = batch
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.normalize(col(textCol)).as("trimmed"),
        size(TextOps.tokens(col(textCol))).cast("long").as("kept_tokens"))
      .join(merged.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    untouched.unionByName(trimmed)
  }
}
