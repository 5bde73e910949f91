package graft.tools

import graft.llmops.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of ONE streaming near-dedup
  * micro-batch at a chosen scale — written for the r14 StreamBench
  * finding (dedup_near 15.9 s → 425 s at 10×, a 27× superlinear jump).
  * Replays nearDedupBatch's exact pieces on a batch = one quartile of
  * the corpus against an index = 1/5 of the corpus.
  */
object ProfileStreamDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val batch = docs.where(col("doc_id") % 4 === 0).localCheckpoint()
    val idx = TextOps.winnowFingerprints(
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text").localCheckpoint()
    println(s"corpus=$n batch=${batch.count()} index=${idx.count()}")

    time("winnow(batch)") {
      TextOps.winnowFingerprints(batch, "doc_id", "text").count()
    }
    val corpEx = idx.select(col("id"), explode(col("fps")).as("shingle"))
    time("corpus explode") { corpEx.count() }
    time("capShingles(corpus)") { DedupOps.capShingles(corpEx, 1000).count() }
    val newEx = TextOps.winnowFingerprints(batch, "doc_id", "text")
      .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
      .localCheckpoint()
    println(s"newEx rows=${newEx.count()}")
    time("join+group (pairs)") {
      DedupOps.capShingles(corpEx, 1000)
        .select(col("id").as("corpus_id"), col("shingle"))
        .join(broadcast(newEx), "shingle")
        .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 15).count()
    }
    time("full nearDedupBatch") {
      graft.streaming.StreamDedup.nearDedupBatch(batch, idx, "doc_id", "text").count()
    }
    time("full nearDedupBatch 2nd") {
      graft.streaming.StreamDedup.nearDedupBatch(batch, idx, "doc_id", "text").count()
    }
    // the streaming harness hands foreachBatch a ONE-partition frame
    // (maxFilesPerTrigger=1 over coalesce(1) files) — replicate that
    val batch1 = batch.coalesce(1).localCheckpoint()
    time("nearDedupBatch 1-part") {
      graft.streaming.StreamDedup.nearDedupBatch(batch1, idx, "doc_id", "text").count()
    }
    // StreamBench's shapes: CONTIGUOUS first-quartile batch against a
    // limit()-seeded index — the batch docs ARE index docs (replica
    // overlap), unlike the modulo slices above
    val batchC = docs.where(col("doc_id") < n / 4).localCheckpoint()
    val idxC = TextOps.winnowFingerprints(
      docs.limit((n / 5).toInt), "doc_id", "text").localCheckpoint()
    println(s"contiguous batch=${batchC.count()} index=${idxC.count()}")
    val pairsC = DedupOps.capShingles(
        idxC.select(col("id"), explode(col("fps")).as("shingle")), 1000)
      .select(col("id").as("corpus_id"), col("shingle"))
      .join(broadcast(TextOps.winnowFingerprints(batchC, "doc_id", "text")
        .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))), "shingle")
    time("contiguous join rows") { println("  pair-rows = " + pairsC.count()) }
    time("contiguous nearDedupBatch") {
      graft.streaming.StreamDedup.nearDedupBatch(batchC, idxC, "doc_id", "text").count()
    }
    spark.stop()
  }
}
