package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece family — Kudo 2018,
  * public paper) trained by HARD EM: candidate substrings seed a
  * unigram model, each E-step Viterbi-segments the corpus under the
  * current log-probs, each M-step re-estimates log-probs from the
  * segmentation's token counts (add-one smoothed). Deterministic by
  * construction — fixed iteration count, integer counts, ln of exact
  * rationals, and a total Viterbi tie order — so the whole train +
  * segment chain replays in SQL (the DP unrolls per position, the
  * LR/k-means/LTTB precedent).
  *
  * vs [[BpeOps]]: BPE grows a vocab bottom-up by pair merges; the
  * unigram model starts from a superset of candidates and lets EM
  * concentrate mass — the other standard subword family, and the one
  * whose segmentation step is a per-word DP rather than greedy merges.
  *
  * Scale shape: the corpus collapses ONCE to the (word, count) table
  * (one map-side-combinable aggregate — the same reduction every
  * tokenizer trainer performs); candidates/counts are model-sized
  * aggregates; the vocab (bounded by `topMulti` + the alphabet) rides
  * to executors as a broadcast map inside one compiled map pass per
  * E-step; the only driver traffic is the V-cell count vector per
  * iteration (PlanGate-allowlisted, like the LR gradient).
  */
object UnigramLm {

  /** Maximum candidate token length (characters). */
  val MaxTok = 6

  final case class Segmented(w: String, n: Long, pieces: String, nPieces: Int)

  /** Distinct normalized words with corpus occurrence counts. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Train `iters` hard-EM iterations and return the final model as
    * (tok, lp) pairs, sorted by token. Vocab = every single character
    * seen + the `topMulti` multi-char substrings by (weighted count
    * desc, token asc).
    */
  def train(words: DataFrame, topMulti: Int, iters: Int): Seq[(String, Double)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val wn = words.select(col("w"), col("n").cast("long").as("n"))
      .as[(String, Long)].localCheckpoint()
    // candidate substrings, weighted by word corpus count
    val cands = wn.flatMap { case (w, n) =>
      for {
        l <- 1 to math.min(MaxTok, w.length)
        i <- 0 to w.length - l
      } yield (w.substring(i, i + l), n)
    }.toDF("tok", "c").groupBy("tok").agg(sum("c").as("c"))
      .localCheckpoint()
    val singles = cands.filter(length(col("tok")) === 1)
    val multis = cands.filter(length(col("tok")) > 1)
      .orderBy(col("c").desc, col("tok")).limit(topMulti)
    // model-sized collect (alphabet + topMulti rows) — allowlisted
    val vocab0: Array[(String, Long)] =
      singles.union(multis).as[(String, Long)].collect()
    val t0 = vocab0.map(_._2).sum.toDouble
    var lp: Map[String, Double] = vocab0.map { case (t, c) => t -> math.log(c / t0) }.toMap
    val vocabToks = vocab0.map(_._1).toVector.sorted
    var it = 0
    while (it < iters) {
      val model = lp
      // E: Viterbi-segment every distinct word, weight by its count;
      // M: V-cell token-count vector to the driver (allowlisted)
      val counts: Map[String, Long] = wn.flatMap { case (w, n) =>
        viterbi(w, model).map(tok => (tok, n))
      }.toDF("tok", "n").groupBy("tok").agg(sum("n").as("c"))
        .as[(String, Long)].collect().toMap
      val tt = counts.values.sum.toDouble
      val v = vocabToks.size
      lp = vocabToks.map(t =>
        t -> math.log((counts.getOrElse(t, 0L) + 1L) / (tt + v))).toMap
      it += 1
    }
    vocabToks.map(t => (t, lp(t)))
  }

  /** Segment every distinct word under a trained model: (w, n, pieces
    * comma-joined, n_pieces). The vocab map broadcasts in the task
    * closure; one compiled map pass.
    */
  def segmentWords(words: DataFrame, model: Seq[(String, Double)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lp = model.toMap
    words.select(col("w"), col("n").cast("long").as("n"))
      .as[(String, Long)]
      .map { case (w, n) =>
        val pieces = viterbi(w, lp)
        Segmented(w, n, pieces.mkString(","), pieces.length)
      }
      .toDF("w", "n", "pieces", "n_pieces")
  }

  /** Deterministic Viterbi: dp(i) = best (score, −j, path) over
    * predecessors j with w[j..i) in vocab — lexicographic on (score,
    * −j), i.e. equal scores break toward the SMALLER j (longer last
    * token), mirroring the oracle's struct max exactly. Single chars
    * are always in the vocab, so dp never strands.
    */
  private[llmops] def viterbi(w: String, lp: Map[String, Double]): List[String] = {
    val L = w.length
    val score = new Array[Double](L + 1)
    val path = new Array[List[String]](L + 1)
    path(0) = Nil
    var i = 1
    while (i <= L) {
      var bestS = Double.NegativeInfinity
      var bestJ = -1
      var j = math.max(0, i - MaxTok)
      while (j < i) {
        if (path(j) != null) lp.get(w.substring(j, i)) match {
          case Some(p) =>
            val s = score(j) + p
            // strictly-greater on score, then smaller j (= larger −j)
            if (bestJ < 0 || s > bestS || (s == bestS && j < bestJ)) {
              bestS = s; bestJ = j
            }
          case None =>
        }
        j += 1
      }
      if (bestJ >= 0) {
        score(i) = bestS
        path(i) = w.substring(bestJ, i) :: path(bestJ)
      }
      i += 1
    }
    path(L).reverse
  }
}
