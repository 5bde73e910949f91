package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate an sf1-scale probe corpus (default 10× sf0.1) for the
  * dedup/ANN scaling measurement (VERDICT r5 item 7) — PROBE DATA ONLY:
  * correctness gates always run on the driver-generated testdata.
  *
  * Scaling must not distort the workload's shape:
  *  - documents: replica k applies a WORD CIPHER (`w` → `w~k`), which
  *    is similarity-ISOMORPHIC within the replica — every exact/near
  *    duplicate cluster the generator planted is reproduced, shingle
  *    for shingle, in each replica — while cross-replica shingle sets
  *    are disjoint. A 10× corpus therefore carries 10× the documents
  *    AND 10× the duplicate pairs, exactly like a larger crawl, instead
  *    of 10 copies of every document (which would explode candidate
  *    pairs quadratically and overstate scaling) or 10× independent
  *    shuffles (which would drop the dup rate 10× and understate it).
  *  - embeddings: replicas jitter each coordinate by ±1% (deterministic
  *    hash), preserving the cluster geometry IVF training keys on while
  *    keeping replicas distinct.
  *
  * Remaining tables are symlinked from the source dir unchanged.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .appName("graft-scale-probe").master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = broadcast(spark.range(factor).toDF("k"))

    // a previous run may have symlinked a table we now generate —
    // writing THROUGH the link would touch the read-only source dir
    def unlink(name: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, name)
      if (java.nio.file.Files.isSymbolicLink(p)) java.nio.file.Files.delete(p)
    }
    Seq("documents.parquet", "embeddings.parquet", "events.parquet",
      "lineitem.parquet", "orders.parquet").foreach(unlink)

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("k") * nDocs)
      .withColumn("text", when(col("k") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1~"), col("k")))))
      .withColumn("n_chars", length(col("text")))
      .drop("k")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val vecs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nVecs = vecs.agg(max("vec_id")).head().getLong(0) + 1
    vecs.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("k") * nVecs)
      .withColumn("embedding", when(col("k") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, i) =>
          (x + (pmod(hash(col("vec_id"), i), lit(1000)).cast("double") / 1000.0 - 0.5)
            * 0.02).cast("float"))))
      .drop("k")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events: replica k time-shifts by k × 35 days — within-replica
    // series structure (hourly densities, state runs, window contents)
    // is IDENTICAL, replicas never share a window, so full-range
    // window/aggregation queries see a genuine 10× month-count
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    val nEv = events.agg(max("event_id")).head().getLong(0) + 1
    val shiftNs = 35L * 86400L * 1000000000L
    events.crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("k") * nEv)
      .withColumn("ts", events.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // ns-as-long generation
          col("ts") + col("k") * shiftNs
        case _ => // timestamp generation: shift by whole days, ns-equivalent
          col("ts") + expr("make_interval(0, 0, 0, k * 35, 0, 0, 0)")
      })
      .drop("k")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // lineitem/orders: replica k offsets the ORDER KEYS (so joins match
    // only within a replica — per-key fan-out is preserved, total join
    // work scales linearly) while dates stay put: more orders per date
    // is exactly how TPC-H itself scales (date range fixed), so the
    // range_join/bloom_join/salted_join interval and key shapes carry.
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val nOrd = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    orders.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("k") * nOrd)
      .drop("k")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")
    lineitem.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("k") * nOrd)
      .drop("k")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // the untouched tables ride along so any query can run against outDir
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.list(java.nio.file.Paths.get(srcDir)).forEach { p =>
      val tgt = out.resolve(p.getFileName)
      if (!java.nio.file.Files.exists(tgt))
        java.nio.file.Files.createSymbolicLink(tgt, p)
    }
    println(s"scale probe data at $outDir (${factor}x $srcDir)")
    spark.stop()
  }
}
