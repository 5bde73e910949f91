package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (llmops/UnigramLm.scala): Viterbi optimality
  * + tie rule, EM mass concentration, and the segment/train contract.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-probability split; ties go to the longer last token") {
    val lp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -1.5)
    // "abc": ab+c = -2.5 beats a+b+c = -5.5
    assert(UnigramLm.viterbi("abc", lp) == List("ab", "c"))
    // tie: "ab" as one token (-4.0) vs "a"+"b" (-4.0) — equal scores,
    // smaller predecessor j wins = the LONGER last token
    val tied = Map("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    assert(UnigramLm.viterbi("ab", tied) == List("ab"))
    // unknown multi-char spans fall back to single chars (always in vocab)
    assert(UnigramLm.viterbi("ac", Map("a" -> -1.0, "c" -> -1.0)) == List("a", "c"))
  }

  test("EM concentrates mass on the recurring morpheme") {
    // 'walk' appears inside every word: after hard EM the model must
    // segment walkxx as walk + suffix chars, not char soup
    val docs = Seq((0L, "walk walked walks walk walked walks walk")).toDF("doc_id", "text")
    val words = UnigramLm.wordCounts(docs, "text").localCheckpoint()
    val model = UnigramLm.train(words, topMulti = 10, iters = 2)
    val seg = UnigramLm.segmentWords(words, model)
      .select("w", "pieces", "n_pieces").as[(String, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // every segmentation reassembles its word exactly
    seg.foreach { case (w, (p, np)) =>
      assert(p.split(",").mkString == w && p.split(",").length == np)
    }
    // mass concentrated: the dominant whole word is ONE token, and the
    // inflected forms are far from char soup (<= 2 pieces each)
    assert(seg("walk")._1 == "walk")
    assert(seg("walked")._2 <= 2 && seg("walks")._2 <= 2)
    // counts survive: n carries corpus occurrences
    val n = UnigramLm.segmentWords(words, model)
      .filter(col("w") === "walk").select("n").as[Long].head()
    assert(n == 3L)
    // retrain is bit-identical (fixed iterations, exact arithmetic)
    assert(UnigramLm.train(words, topMulti = 10, iters = 2) == model)
  }
}
