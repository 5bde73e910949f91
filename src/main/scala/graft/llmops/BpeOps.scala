package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * public literature), the tokenizer-fitting step of an LLM data
  * pipeline.
  *
  * Scale shape: the corpus is touched ONCE (word-count aggregation —
  * one shuffle over tokens, partial-aggregated map-side). Every merge
  * iteration after that runs on the VOCABULARY (unique words + counts),
  * which is millions of rows for a 100 TB corpus — thousands of times
  * smaller than the corpus itself. Per iteration: one pair-count
  * aggregate over the vocab and a single-ROW argmax collect (the chosen
  * pair — O(1) driver traffic, allowlisted in PlanGate), then a
  * narrow map applying the merge. No iteration ever rescans raw text.
  *
  * Symbol representation: a word's current segmentation is a
  * space-joined symbol string (`hello` → `h e l l o`); merging pair
  * (l, r) is a literal string replace of ` l r ` with ` lr ` inside
  * the space-padded form — left-to-right non-overlapping, exactly the
  * greedy BPE merge order, and expressible identically in the DuckDB
  * oracle (the `bpe_merges` gate unrolls three steps in SQL).
  */
object BpeOps {

  /** One corpus pass: normalized whitespace word counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Initial segmentation: every character its own symbol. */
  private def charSymbols(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1 "))

  /** Adjacent symbol pairs of vocab rows (s = symbol string, c = word
    * count), weighted by count: (l, r, cnt).
    */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val arr = vocab.select(split(col("s"), " ").as("a"), col("c"))
    arr.select(posexplode(slice(col("a"), lit(1), size(col("a")) - 1)).as(Seq("i", "l")),
        col("a"), col("c"))
      .select(col("l"), element_at(col("a"), col("i") + 2).as("r"), col("c"))
      .groupBy("l", "r").agg(sum(col("c")).as("cnt"))
  }

  /** Apply one merge to a symbol string column. */
  private def applyMerge(s: Column, l: String, r: String): Column =
    trim(replace(concat(lit(" "), s, lit(" ")),
      lit(s" $l $r "), lit(s" ${l + r} ")))

  /** Iteration-0 pair statistics (char-level, weighted by word count) —
    * the first merge candidates a BPE trainer scores.
    */
  def initialPairCounts(docs: DataFrame, textCol: String): DataFrame =
    pairCounts(wordCounts(docs, textCol)
      .select(charSymbols(col("w")).as("s"), col("c")))

  /** Greedy BPE training: `numMerges` iterations over the vocabulary.
    * Returns the merge table (step, l, r, cnt) — cnt is the pair's
    * weighted frequency AT selection time. Ties break on (l, r)
    * lexicographically, so training is deterministic.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordCounts(docs, textCol)
      .select(charSymbols(col("w")).as("s"), col("c"))
      .localCheckpoint() // vocab-sized; cuts the growing replace-chain plan
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    while (step <= numMerges) {
      // single-row argmax — O(1) driver traffic per iteration (audited)
      val best = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty) {
        step = numMerges + 1 // vocabulary fully merged — nothing left
      } else {
        val row = best.head
        val (l, r, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((step, l, r, cnt))
        vocab = vocab.select(applyMerge(col("s"), l, r).as("s"), col("c"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq.toDF("step", "l", "r", "cnt")
  }

  /** Segment text with a trained merge list: per word, char-split then
    * every merge applied in rank order (a fold of literal replaces —
    * pure Column expressions, whole-stage codegen, no shuffle). Returns
    * the docs with a `bpe_tokens` array column.
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)], as: String = "bpe_tokens"): DataFrame = {
    val segmented = (w: Column) =>
      merges.foldLeft(charSymbols(w)) { case (s, (l, r)) => applyMerge(s, l, r) }
    docs.withColumn(as,
      flatten(transform(TextOps.tokens(col(textCol)),
        w => split(segmented(w), " "))))
  }
}
