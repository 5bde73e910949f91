package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized cross-checks for the round's algorithmic curation ops:
  * each distributed implementation is compared against an independent
  * single-threaded Scala reference on seeded random inputs — the same
  * discipline SketchPropertiesSpec applies to the sketch states. The
  * references fold in the same documented orders, so comparisons are
  * exact (1e-12 only where a reference can't mirror rounding).
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("funnel matches a sequential per-user reference on random event streams") {
    val types = Vector("a", "b", "c", "d")
    val steps = Seq("a", "b", "c")
    val ev = (1 to 600).map { i =>
      (s"u${rnd.nextInt(25)}", types(rnd.nextInt(types.size)), rnd.nextInt(10000).toLong)
    }
    // reference: per user, scan times in order, taking each step's
    // first occurrence strictly after the previous step's time
    val ref = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val byType = rows.groupBy(_._2)
      def minAfter(tp: String, after: Long): Option[Long] = {
        val ts = byType.getOrElse(tp, Nil).map(_._3).filter(_ > after)
        if (ts.isEmpty) None else Some(ts.min)
      }
      minAfter(steps(0), Long.MinValue).map { t1 =>
        val t2 = minAfter(steps(1), t1)
        val t3 = t2.flatMap(minAfter(steps(2), _))
        (u, t1, t2, t3)
      }
    }.toSet
    val got = graft.operators.FunnelOps
      .funnel(ev.toDF("u", "t", "ts"), "u", "t", "ts", steps)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == ref)
  }

  test("substring spans + trim match a sequential reference on random corpora") {
    // tiny vocab + short docs ⇒ dense natural window collisions: the
    // reference recomputes keep-first / merge / trim single-threaded
    val vocab = Vector("a", "b", "c", "d", "e")
    val w = 3
    val docs = (0L until 40L).map { i =>
      (i, (1 to 3 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val toks: Map[Long, Vector[String]] =
      docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
    val wins = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.size < w) Nil
      else (0 to tk.size - w).map(i => (id, i + 1, tk.slice(i, i + w).mkString(" ")))
    }
    val keepers = wins.groupBy(_._3)
      .filter { case (_, occ) => occ.map(_._1).distinct.size >= 2 }
      .map { case (h, occ) => h -> occ.map(o => (o._1, o._2)).min }
    def merge(sp: Seq[(Int, Int)]): Seq[(Int, Int)] =
      sp.sortBy(identity).foldLeft(List.empty[(Int, Int)]) {
        case ((ms, me) :: rest, (s, e)) if s <= me + 1 => (ms, math.max(me, e)) :: rest
        case (acc, (s, e)) => (s, e) :: acc
      }.reverse
    val refSpans = wins
      .filter { case (id, i, h) => keepers.get(h).exists(_ != ((id, i))) }
      .groupBy(_._1)
      .flatMap { case (id, sp) =>
        merge(sp.map(x => (x._2, x._2 + w - 1))).map { case (s, e) => (id, s, e) }
      }.toSet
    val covered: Map[Long, Set[Int]] = refSpans.groupBy(_._1)
      .view.mapValues(_.flatMap { case (_, s, e) => s to e }.toSet).toMap
    val refTrim = covered.flatMap { case (id, cov) =>
      val kept = (1 to toks(id).size).filterNot(cov).map(p => toks(id)(p - 1))
      if (kept.isEmpty) None else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSet

    val df = docs.toDF("doc_id", "text")
    val gotSpans = DedupOps.substringSpans(df, "doc_id", "text", w)
      .as[(Long, Int, Int)].collect().toSet
    assert(gotSpans == refSpans)
    val gotTrim = DedupOps.substringTrim(df, "doc_id", "text", w)
      .select("doc_id", "trimmed", "kept_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(gotTrim == refTrim)
  }

  test("bigramNll matches a local reference LM on random corpora") {
    val vocab = Vector("red", "blue", "green", "gold")
    val docs = (0L until 30L).map { i =>
      (i, (1 to 2 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ut = uni.values.sum
    val bi = toks.flatMap { case (_, ws) => ws.zip(ws.tail) }
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val pc = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ref = toks.collect { case (id, ws) if ws.size >= 2 =>
      // per-(p,w) scores folded in (p,w) order, like the engine
      val cnt = ws.zip(ws.tail).groupBy(identity).view.mapValues(_.size.toDouble)
      val n = cnt.values.sum
      val s = cnt.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, ((p, w), c)) =>
        acc + c * -math.log(0.5 * (bi((p, w)) / pc(p)) + 0.5 * (uni(w) / ut))
      }
      id -> s / n
    }.toMap
    val got = TextOps.bigramNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "nll").as[(Long, Double)].collect().toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - ref(id)) < 1e-12, s"doc $id") }
  }

  test("kneserNeyNll matches a local reference KN-LM on random corpora") {
    val vocab = Vector("red", "blue", "green", "gold")
    val docs = (0L until 30L).map { i =>
      (i, (1 to 2 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val bi = toks.flatMap { case (_, ws) => ws.zip(ws.tail) }
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val pc = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ntypes = bi.groupBy(_._1._1).view.mapValues(_.size.toDouble).toMap
    val nprec = bi.groupBy(_._1._2).view.mapValues(_.size.toDouble).toMap
    val tb = bi.size.toDouble
    val D = 0.75
    def pkn(p: String, w: String): Double =
      math.max(bi((p, w)) - D, 0.0) / pc(p) +
        D * ntypes(p) / pc(p) * (nprec(w) / tb)
    val ref = toks.collect { case (id, ws) if ws.size >= 2 =>
      val cnt = ws.zip(ws.tail).groupBy(identity).view.mapValues(_.size.toDouble)
      val n = cnt.values.sum
      val s = cnt.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, ((p, w), c)) =>
        acc + c * -math.log(pkn(p, w))
      }
      id -> s / n
    }.toMap
    val got = TextOps.kneserNeyNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "nll").as[(Long, Double)].collect().toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - ref(id)) < 1e-12, s"doc $id") }
    // KN distributions are proper: for every context p, Σ_w P(w|p) over
    // the OBSERVED continuations plus backoff mass stays ≤ 1 + ε.
    pc.keys.foreach { p =>
      val seen = bi.keys.filter(_._1 == p).map { case (_, w) => pkn(p, w) }.sum
      assert(seen <= 1.0 + 1e-9, s"context $p mass $seen")
    }
  }

  test("lrTrain matches a local full-batch GD reference with rounded gradients") {
    val dim = 8
    val docs = (0L until 40L).map { i =>
      val nTok = 3 + rnd.nextInt(6)
      (i, (1 to nTok).map(_ => s"w${rnd.nextInt(20)}").mkString(" "), (i % 2).toDouble)
    }
    val feat = ClassifierOps.hashFeatures(docs.toDF("doc_id", "text", "y"), "doc_id", "text", dim)
    val labels = docs.map { case (i, _, y) => (i, y) }.toDF("id", "y")
    val wGot = ClassifierOps.lrTrain(feat, labels, dim, 5, 0.2)
    // local reference over the SAME features (collected once)
    val rows = feat.select("id", "f", "x").as[(Long, Int, Double)].collect()
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1)).toMap
    val yOf = docs.map { case (i, _, y) => i -> y }.toMap
    val n = docs.size.toDouble
    var w = new Array[Double](dim + 1)
    for (_ <- 0 until 5) {
      val g = new Array[Double](dim + 1)
      // per-doc margin folded in f order, residual × features
      byDoc.toSeq.sortBy(_._1).foreach { case (id, fs) =>
        val z = fs.foldLeft(0.0) { case (acc, (f, x)) => acc + x * w(f) }
        val r = 1.0 / (1.0 + math.exp(-z)) - yOf(id)
        fs.foreach { case (f, x) => g(f) += r * x }
      }
      w = Array.tabulate(dim + 1)(f =>
        w(f) - 0.2 * BigDecimal(g(f) / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // gradient sums are distributed on the engine side, so compare to
    // the reference at rounding precision, not bit-exactly
    wGot.zip(w).zipWithIndex.foreach { case ((a, b), f) =>
      assert(math.abs(a - b) < 2e-6, s"weight $f: $a vs $b")
    }
  }
}
