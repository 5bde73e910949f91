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
  * the env knob papered over. Starting high costs only per-mapper
  * bucket bookkeeping at small scale (the sort-based shuffle writer is
  * O(rows), not O(buckets)) and AQE collapses the empty width away at
  * plan time, so small-SF latency is preserved while 100× shuffles
  * keep the width their bytes demand.
  *
  * `spark.sql.shuffle.partitions` stays at core count as the fallback
  * for the few non-AQE paths (it is also the width of explicitly
  * pinned `repartition(n)` calls, which the engine reserves for
  * metadata-scale frames). `SPARK_GRAFT_SHUFFLE_PARTITIONS` remains as
  * an explicit override for probes/diagnosis, but the 100× linear
  * numbers no longer require it.
  *
  * NOT applied to [[Verify]]: the correctness gate's contract is a
  * bit-replicable dump against a pinned session shape; width
  * independence of the gate values is proven by a separate run, not
  * assumed.
  */
object SparkTuning {
  /** Initial (pre-coalesce) shuffle width: high enough that the 100×
    * probe's measured spill cases land on their linear numbers with no
    * override (substr_trim needed 1024 at 32 cores), scaled by cores so
    * a larger executor fleet starts proportionally wider.
    */
  def initialWidth(cores: Int): Int = math.max(1024, cores * 32)

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

  def scaleDefaults(b: SparkSession.Builder, cores: Int): SparkSession.Builder = {
    val pinned = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    b.config("spark.sql.shuffle.partitions",
        pinned.getOrElse(cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        pinned.getOrElse(initialWidth(cores).toString))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
  }
}
