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
    */
  def cosineThresholdPairs(vs: DataFrame, threshold: Double, numBlocks: Int = 8): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
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
}
