package graft.tools

import graft.llmops.DedupOps
import org.apache.spark.sql.SparkSession

/** Dev tool: stage-by-stage timing of the MinHash-LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm file listing

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("doc signatures") {
      DedupOps.minHashDocSignatures(docs, "doc_id", "text", 3).count()
    }
    time("full pipeline") {
      DedupOps.minHashLshPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("full pipeline 2nd") {
      DedupOps.minHashLshPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    // stage-by-stage on a warm JVM
    import org.apache.spark.sql.functions._
    val sig = DedupOps.minHashDocSignatures(docs, "doc_id", "text", 3, 64,
      withShingleHashes = true).cache()
    time("sig+cache") { sig.count() }
    val bandKeys = (0 until 16).map { b =>
      val cols = (0 until 4).map(r => element_at(col("sigs"), b * 4 + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("key"))
    }
    val bands = sig.filter(col("n_sh") > 0)
      .select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = DedupOps.lshCandidates(bands).cache()
    time("bands+cands") { println(s"  cands=${cands.count()}") }
    val candDocs = cands.select(col("id_a").as("cid"))
      .union(cands.select(col("id_b").as("cid"))).distinct()
    val shC = DedupOps.capShingles(
      sig.join(broadcast(candDocs), col("id") === col("cid"), "left_semi")
        .select(col("id"), explode(col("sh_hashes")).as("shingle")),
      1000).cache()
    time("shC explode+cap") { println(s"  shC=${shC.count()}") }
    val sizes = shC.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = cands
      .join(shC.as("sa"), col("id_a") === col("sa.id"))
      .join(shC.as("sb"), col("id_b") === col("sb.id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("verify joins") {
      inter.join(sizes.as("za"), col("id_a") === col("za.id"))
        .join(sizes.as("zb"), col("id_b") === col("zb.id")).count()
    }
    spark.stop()
  }
}
