package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer/encoder (llmops/BpeOps.scala): hand-computed merges on a
  * toy corpus, tie-break determinism, encode/train agreement, and
  * lossless segmentation.
  */
class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces hand-computed merges on a toy corpus") {
    // corpus: "low low low lower lowest"
    // char pairs weighted: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1
    val docs = Seq("low low low lower lowest").toDF("text")
    val merges = BpeOps.train(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // step1: (l,o) 5 beats (o,w) 5 on pair order; step2: (lo,w) 5;
    // step3: (low,e) 2 (from lower+lowest)
    assert(merges == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))
  }

  test("encode applies merges in rank order and is lossless") {
    val docs = Seq("low lower lowest", "wow").toDF("text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"))
    val out = BpeOps.encode(docs, "text", merges)
      .select(col("bpe_tokens")).as[Seq[String]].collect().toSeq
    assert(out.head == Seq("low", "lowe", "r", "lowe", "s", "t"))
    assert(out(1) == Seq("w", "o", "w")) // (l,o) merge can't fire without l
    // segmentation is lossless: concatenating tokens restores the words
    assert(out.head.mkString == "lowlowerlowest")
  }

  test("ties break lexicographically — training is order-independent") {
    // all pairs count 1: (a,b) from 'ab', (c,d) from 'cd' — argmax = (a,b)
    val docs = Seq("ab cd", "cd ab").toDF("text")
    val m1 = BpeOps.train(docs.repartition(1), "text", 1).collect().head
    val m4 = BpeOps.train(docs.repartition(4), "text", 1).collect().head
    assert((m1.getString(1), m1.getString(2)) == ("a", "b"))
    assert(m1 == m4)
  }

  test("train stops early when the vocabulary is fully merged") {
    val docs = Seq("ab ab").toDF("text")
    val merges = BpeOps.train(docs, "text", 10).collect()
    assert(merges.length == 1) // only (a,b) exists; loop must terminate
  }
}
