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

  /** All pairs with cosine >= threshold. Demonstration-exact (nested
    * loop); the production path for thresholds this low is IVF/blocked
    * matrix multiply, since angular LSH only helps near cos ~ 1.
    */
  def cosineThresholdPairs(vs: DataFrame, threshold: Double): DataFrame =
    vs.as("a").join(vs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
}
