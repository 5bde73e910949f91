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

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Normalize an embeddings table to (id, v: array<double>). */
  def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

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

  /** IVF top-k: assign every vector to its max-cosine centroid (the
    * inverted file), then for each query scan only the `nprobe`
    * closest centroids' lists. Centroids are caller-supplied (here:
    * deterministic seed vectors; at scale: a k-means sample). The
    * assignment shuffle is one hash partition by centroid id — queries
    * touch nprobe/nlist of the corpus.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cos").desc, col("cid"))
    val assign = corpus.as("c")
      .crossJoin(broadcast(centroids.select(col("id").as("cid"), col("v").as("cv"))))
      .select(col("c.id").as("id"), col("c.v").as("v"), col("cid"),
        cosine(col("c.v"), col("cv")).as("cos"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("id"), col("v"), col("cid"))
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
      .join(assign, "cid")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nbr"), cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
  }

  /** All pairs with cosine >= threshold.
    *
    * Hand-rolled broadcast nested loop: one side is broadcast as
    * primitive arrays and each partition scans its rows against it with
    * tight double loops — Catalyst's `aggregate`/`zip_with` are
    * interpreted (higher-order functions don't codegen), which costs
    * ~100× on an O(n²) inner loop. The fold order matches [[dot]]
    * exactly (sequential, left-to-right), so results are bit-identical
    * to the expression form. At 100 TB the outer side streams while the
    * broadcast side is one IVF bucket / block at a time — same shape.
    */
  def cosineThresholdPairs(vs: DataFrame, threshold: Double): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    val ds = vs.select(col("id").cast("long"), col("v")).as[(Long, Seq[Double])]
      .map { case (id, v) => (id, v.toArray) }
      .toDF("id", "v").as[(Long, Array[Double])]
    // Build side to the driver + broadcast — the exact pattern of Spark's
    // own BroadcastHashJoin build phase; sized like a broadcast dim table
    // (at 100 TB the build side is one IVF bucket / block at a time).
    // Filtering inside the loop means sub-threshold pairs are never
    // materialized as rows at all.
    val bc = spark.sparkContext.broadcast(ds.collect())
    ds.mapPartitions { it =>
      val side = bc.value
      it.flatMap { case (ia, va) =>
        val n = va.length
        side.iterator.filter(_._1 > ia).flatMap { case (ib, vb) =>
          var dotAb = 0.0; var dotAa = 0.0; var dotBb = 0.0
          var i = 0
          while (i < n) {
            dotAb += va(i) * vb(i); dotAa += va(i) * va(i); dotBb += vb(i) * vb(i)
            i += 1
          }
          val cos = dotAb / (math.sqrt(dotAa) * math.sqrt(dotBb))
          if (cos >= threshold) Some((ia, ib, cos)) else None
        }
      }
    }.toDF("id_a", "id_b", "cos")
  }
}
