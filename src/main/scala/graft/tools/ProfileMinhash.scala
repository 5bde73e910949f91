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
    spark.stop()
  }
}
