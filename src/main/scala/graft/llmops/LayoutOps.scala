package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning — the file-clustering step a 100 TB table needs when queries
  * filter on MORE than the partition column (public technique: Morton
  * 1966 ordering; the same layout idea behind modern lakehouse OPTIMIZE
  * ZORDER).
  *
  * Why it matters at scale: parquet min/max row-group stats prune a
  * range scan only if the file layout CLUSTERS the filtered columns.
  * Sorting by (a, b) clusters a but scatters b; interleaving the bits
  * of rank-normalized a and b gives files that are rectangles in (a, b)
  * space, so BOTH predicates prune. Everything here is pure Column
  * arithmetic (whole-stage codegen) plus one range repartition — the
  * standard write-path shuffle.
  *
  * Normalization: each dimension is mapped to a 16-bit grid cell. The
  * default `zvalue16` expects callers to pass already-quantized 0..65535
  * ints (how to quantize — rank, min/max scale, hash — is the caller's
  * domain knowledge); `quantizeMinMax` provides the min/max-scale
  * helper. Two dimensions interleave into a 32-bit Morton code with the
  * classic mask-shift doubling (5 steps per dimension, branch-free).
  */
object LayoutOps {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30)
    * — the mask-shift doubling network, expressed as int64 Column
    * arithmetic so Spark and any SQL oracle agree bit-for-bit.
    */
  def spreadBits16(x: Column): Column = {
    val a = x.cast("long")
    val s1 = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit grid cells (x even bits, y odd). */
  def zvalue16(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Min/max-scale a numeric column onto the 16-bit grid. `lo`/`hi`
    * are the column's global bounds (from stats or a prior pass);
    * values are clamped, so stale bounds degrade locality, not
    * correctness.
    */
  def quantizeMinMax(c: Column, lo: Double, hi: Double): Column = {
    val unit = (c.cast("double") - lit(lo)) / lit(math.max(hi - lo, Double.MinPositiveValue))
    least(greatest(floor(unit * 65536.0), lit(0.0)), lit(65535.0)).cast("long")
  }

  /** Rewrite `df` in z-order on two quantized dimensions: range
    * partition by the z-value (contiguous curve segments per output
    * file), then sort within partitions. The result is what you
    * `.write.parquet(...)` — each file covers a small rectangle of
    * (x, y) space and row-group stats prune on either dimension.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column,
               numFiles: Int, as: String = "_zvalue"): DataFrame = {
    val withZ = df.withColumn(as, zvalue16(x, y))
    withZ.repartitionByRange(numFiles, col(as))
      .sortWithinPartitions(col(as))
  }

  /** Bucketed co-located layout: hash-cluster a table into N buckets
    * on its join key AT WRITE TIME (`bucketBy` + `sortBy`), so every
    * subsequent equi-join or aggregation on that key runs WITHOUT a
    * shuffle — Spark's scan reports `HashPartitioning(key, N)` and
    * the planner drops the Exchange (and, with sorted buckets, the
    * Sort) under SortMergeJoin.
    *
    * The 100 TB arithmetic: a fact-fact join (lineitem ⋈ orders here)
    * otherwise re-shuffles BOTH tables on every query — at 100 TB
    * that is the dominant cost of the whole plan, paid per run.
    * Bucketing moves that shuffle into the one-time write; N equal
    * buckets also pre-bound task memory (each task sees 1/N of the
    * key space). Both sides must agree on bucket count and key;
    * registration goes through the session catalog because bucket
    * metadata lives there, not in the parquet footers. Dropping the
    * runtime SORT too (not just the Exchange) additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — safe
    * here because the pre-partitioning guarantees single-file
    * buckets (multi-file buckets would interleave, which is why
    * SPARK-28583 made order reuse opt-in).
    *
    * BucketedJoinSpec pins the plan (zero Exchange above the scans);
    * gate `bucketed_join` pins that the layout round-trip loses no
    * rows against the plain-join oracle.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Pre-partition on the bucket key so each bucket lands in exactly
    // ONE file: Spark only reports the write-time sortBy order from a
    // single-file bucket (multi-file buckets would interleave), and
    // only a reported order lets the planner drop the runtime Sort
    // under SortMergeJoin. Same hash function as the bucket spec, so
    // this shuffle IS the bucketing shuffle, not an extra one.
    df.repartition(numBuckets, col(bucketCol))
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
