package graft.tools

import graft.llmops.VectorOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for SemDeDup's k-scaling guidance (r16): the
  * `semantic_dedup` gate fixes k = 8 centroids for oracle
  * replicability, which makes within-cluster pair work n²/8 —
  * quadratic in corpus size at FIXED k (the 100× probe measured 61×
  * per decade). SemDeDup as published clusters to a roughly constant
  * CLUSTER SIZE (k ∝ n), which keeps n²/k linear. This probe runs the
  * same operator chain (sampled Lloyd training → assign → within-
  * cluster pairs → CC) at a k that preserves the gate's ~250-vector
  * cluster size, demonstrating the production configuration on the
  * same corpus. Args: [sfDir] [k] [cpus].
  */
object SemScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val k = if (args.length > 1) args(1).toInt else -1 // -1 = derived-k default
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = graft.SparkTuning.scaleDefaults(SparkSession.builder()
      .appName("graft-sem-scale").master(s"local[$cpus]"), cpus.toInt,
      graft.SparkTuning.dirBytes(sfDir))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = VectorOps.vecs(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()
    val n = e.count()
    val t0 = System.nanoTime()
    // k <= 0 (or omitted 2nd arg = -1): the DEFAULT derived-k path —
    // the scale-safe shape a caller gets without naming any parameter
    val out =
      if (k <= 0) VectorOps.semDedup(e, 0.4)
      else VectorOps.semDedup(e,
        VectorOps.trainIvfCentroids(e.filter(col("id") % 5 === 0), k, 2), 0.4)
    val kept = out.filter(col("keep")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val kShown = if (k <= 0) "\"auto\"" else k.toString
    println(f"""{"probe":"sem_scale","sf_dir":"$sfDir","n":$n,"k":$kShown,"kept":$kept,"secs":$secs%.2f}""")
    spark.stop()
  }
}
