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
    * probe the (static, nightly-compacted) index via the
    * [[graft.llmops.TextOps.incrementalDedupPairs]] broadcast probe,
    * where the batch side broadcasts and the corpus index is never
    * reshuffled.
    */
  def nearDedupBatch(batch: DataFrame, corpusFps: DataFrame, idCol: String,
      textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf): DataFrame = {
    val doomed = TextOps.incrementalDedupPairs(batch, idCol, textCol,
        corpusFps, minShared = minShared, maxDf = maxDf)
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
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf): (DataFrame, NearDupIndex) = {
    val newFps = TextOps.winnowFingerprints(batch, idCol, textCol).localCheckpoint()
    val newEx = newFps.select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
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
