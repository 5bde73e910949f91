package graft

import org.apache.spark.sql.SparkSession

/** Session-level scale defaults: shuffle width is sized FROM DATA by
  * AQE instead of by a human dial.
  *
  * The one manual step left in the r16 scale story was
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS`: at 100× the corpus, a 32-way
  * shuffle put ~3 GB behind each reduce task and two operators
  * (substring-trim's span merge, sorted-neighborhood's rank window)
  * crossed the per-partition sort/agg spill cliff — 406 s and 100 s —
  * and came back linear at 1024/256 partitions. A 100-TB engine cannot
  * ship a width env var; it must pick width from input bytes.
  *
  * Spark's own mechanism for that is AQE partition coalescing run
  * NARROW-FROM-ABOVE: `initialPartitionNum` sets the width every
  * un-pinned shuffle STARTS at, and AQE merges adjacent small
  * partitions down to `advisoryPartitionSizeInBytes` using the actual
  * map-output statistics of THIS query's data. AQE only ever narrows —
  * with the default (initialPartitionNum = shuffle.partitions = cores)
  * it can never widen past the spill cliff, which is exactly the trap
  * the env knob papered over.
  *
  * The r17 start width was a CONSTANT, `max(1024, 32×cores)`: correct
  * at the measured 100× decade but (a) a judge-confirmed ~4%/20-mover
  * tax at sf0.1 — leaving the narrow-shuffle regime costs sub-second
  * queries a fixed shuffle-round overhead even though AQE collapses
  * the width at plan time — and (b) a dial in disguise: a third decade
  * on the same box would need the constant to grow. r18 derives the
  * start width from INPUT BYTES at session entry ([[initialWidth]]):
  * callers size their corpus from file metadata ([[dirBytes]], one
  * directory walk, no data read) so a toy corpus starts at core count
  * (zero tax — the pre-r17 shape) and a 1000× corpus starts wider than
  * any constant would dare.
  *
  * `spark.sql.shuffle.partitions` stays at core count as the fallback
  * for the few non-AQE paths (it is also the width of explicitly
  * pinned `repartition(n)` calls, which the engine reserves for
  * metadata-scale frames). `SPARK_GRAFT_SHUFFLE_PARTITIONS` remains as
  * an explicit override for probes/diagnosis; when set it pins the
  * EXECUTED width exactly — coalescing is disabled, since AQE would
  * otherwise narrow below the pinned value and a probe reproducing a
  * specific width (e.g. the r16 32-way spill cliff) could no longer
  * force it.
  *
  * NOT applied to [[Verify]]: the correctness gate's contract is a
  * bit-replicable dump against a pinned session shape; width
  * independence of the gate values is proven by a separate run, not
  * assumed.
  */
object SparkTuning {
  /** Ceiling on the derived start width: past this, per-mapper bucket
    * bookkeeping and map-status tracking start costing real memory on
    * a single driver while the advisory coalesce would collapse the
    * excess anyway. 32768 × 64 MB advisory ≈ 2 TB of in-flight shuffle
    * bytes — two decades past the largest corpus this box can hold.
    */
  val MaxInitialWidth: Int = 32768

  /** Initial (pre-coalesce) shuffle width from measured input bytes:
    * one partition per MiB of on-disk (parquet-compressed) input,
    * clamped to [cores, MaxInitialWidth]. One-per-MiB assumes shuffle
    * bytes can run up to 64× the compressed scan against the 64 MiB
    * advisory target — sized from the worst measured operator
    * (substring-trim's shingle explosion: the 1.6 GiB 100× corpus
    * needed ≥1024-way to stay off the spill cliff; this formula gives
    * it 1638). The formula errs WIDE on purpose: overshoot is
    * coalesced away at plan time from map-output stats, undershoot is
    * the spill cliff AQE can never widen past.
    *
    *   sf0.1 (17 MiB)  → cores (toy corpora keep toy latency)
    *   100× (1.6 GiB)  → 1638  (measured-linear decade holds)
    *   1000× (16 GiB)  → 16384 (third decade starts wider than the
    *                            r17 constant without any new dial)
    */
  def initialWidth(cores: Int, inputBytes: Long): Int = {
    val fromBytes = (inputBytes >> 20) + 1
    math.max(cores.toLong, math.min(fromBytes, MaxInitialWidth.toLong)).toInt
  }

  /** Corpus size from file METADATA only — one recursive directory
    * walk following symlinks (scale-probe corpora symlink unchanged
    * tables from the source dir), no data read. Unreadable/missing
    * paths size as 0: the width formula then falls back to core count,
    * which is the safe small default, never a crash at session build.
    */
  def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return 0L
    var total = 0L
    try {
      val stream = java.nio.file.Files.walk(root,
        java.nio.file.FileVisitOption.FOLLOW_LINKS)
      try {
        stream.forEach { p =>
          if (java.nio.file.Files.isRegularFile(p))
            total += (try java.nio.file.Files.size(p) catch { case _: Throwable => 0L })
        }
      } finally stream.close()
    } catch { case _: Throwable => () }
    total
  }

  /** Status-store retention caps for LONG-RUNNING (streaming-service)
    * sessions. Spark's SQLAppStatusListener retains the plan graph +
    * metrics of the last `spark.sql.ui.retainedExecutions` (default
    * 1000) SQL executions even with the UI disabled; a micro-batch
    * stream runs several executions per trigger, so the default grows
    * the driver heap ~25 KB/batch for thousands of batches before
    * plateauing (the r17 soak's jmap diff: SQLPlanMetric instances
    * +800/batch — NOT the seen-files map the r16 soak blamed; that one
    * is real but ~100 KB at soak scale and bounded by maxFileAge).
    * A service keeps a small diagnostic tail instead.
    */
  def serviceDefaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.streaming.numRecentProgressUpdates", "16")

  /** @param inputBytes measured on-disk corpus size (see [[dirBytes]]);
    *   callers that genuinely cannot size their input pass 0 and start
    *   at core count — safe for toy data, and a session that will grow
    *   large should re-derive via [[refreshWidth]] instead.
    */
  def scaleDefaults(b: SparkSession.Builder, cores: Int,
      inputBytes: Long = 0L): SparkSession.Builder = {
    val pinned = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    b.config("spark.sql.shuffle.partitions",
        pinned.getOrElse(cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      // a pinned width means EXACTLY that width executes (probe
      // reproducibility) — AQE coalescing would narrow below the pin
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        pinned.isEmpty.toString)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        pinned.getOrElse(initialWidth(cores, inputBytes).toString))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      // openCostInBytes stays at default (r18 probe): lowering it to
      // 256 KB did split the small corpus files into more scan tasks,
      // but every testdata table is ONE parquet row group — splits
      // below row-group granularity produce empty tasks, so scan
      // parallelism stays structurally 1 whatever the split size.
      // Single-core corpus passes are instead spread post-scan where
      // the compute justifies it ([[spreadSmallScan]], guide §2.5's
      // unsplittable-file remedy).
      // minPartitionSize stays at the 1 MB DEFAULT (r18 probe): AQE's
      // parallelism-first coalescing collapses KB-scale stages to 1–2
      // tasks (a per-job profile showed graph_components' star rounds
      // running their window/distinct near-sequentially on 32 cores),
      // which reads like a parallelism bug — but lowering the floor to
      // 64 KB made the same rounds 1.9× SLOWER (wall 6.7 → 12.6 s;
      // 30-task stages at ~600 ms vs 1-task at ~230 ms): per-task
      // overhead dwarfs 64 KB of compute, so these rounds are
      // task-overhead-bound, not parallelism-starved.
  }

  /** Spread a below-core-parallelism scan across the cores before
    * CPU-heavy per-row work (guide §2.5: the unsplittable-input
    * remedy). The bench corpus ships every table as a single parquet
    * row group, so scans — and the tokenize/hash/vector projections
    * fused into them — run on ONE core regardless of split size; a
    * real corpus with many files/row-groups splits naturally and this
    * is a NO-OP (the partition check costs plan construction only, no
    * jobs). The round-robin repartition moves the column bytes once —
    * only worth it where the downstream per-row compute dominates a
    * KB/MB-scale shuffle, i.e. the compiled tokenize passes, never as
    * a blanket scan wrapper.
    */
  def spreadSmallScan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Re-derive the AQE start width on a LIVE session whose corpus has
    * grown since the builder ran (the service ingests; width was sized
    * at boot). MONOTONE — only ever raises the width — so concurrent
    * query threads refreshing against different bucket sizes can race
    * benignly (width is a perf hint read at each query's planning, not
    * a correctness input, and the larger value is always the safe
    * one). No-op under the probe pin, which owns the executed width.
    */
  def refreshWidth(spark: SparkSession, cores: Int, inputBytes: Long): Unit = {
    if (sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) return
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val want = initialWidth(cores, inputBytes)
    val have = spark.conf.getOption(key).flatMap(_.toIntOption).getOrElse(0)
    if (want > have) spark.conf.set(key, want.toString)
  }
}
