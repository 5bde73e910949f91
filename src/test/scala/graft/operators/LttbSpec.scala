package graft.operators

import graft.SparkSpec

/** LTTB (operators/Lttb.scala): endpoints kept, bucket counts, the
  * documented tie/centroid determinism, passthrough for short series,
  * and a randomized cross-check against an independent reference.
  */
class LttbSpec extends SparkSpec {
  import spark.implicits._

  test("short series pass through; k points selected otherwise; endpoints kept") {
    val pts = (0L until 100L).map(i => ("s", i, i, math.sin(i / 7.0) * 10))
    val df = pts.toDF("sk", "x", "id", "y")
    val out = Lttb.lttb(df, Seq("sk"), "x", "id", "y", 12)
      .orderBy("x").as[(String, Long, Long, Double)].collect().toSeq
    assert(out.size == 12)
    assert(out.head._2 == 0L && out.last._2 == 99L)
    // short series: untouched
    val small = Lttb.lttb(df.limit(5), Seq("sk"), "x", "id", "y", 12).count()
    assert(small == 5)
  }

  test("selection matches an independent sequential reference on random series") {
    val rnd = new scala.util.Random(7)
    val data = for {
      s <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield (s, i.toLong * 10 + rnd.nextInt(3), i.toLong, rnd.nextDouble() * 100)
    val k = 15
    // reference: direct transcription of the thesis algorithm with the
    // documented ordering/ties (independent of Lttb.select's code path)
    val ref = data.groupBy(_._1).flatMap { case (s, rows) =>
      val pts = rows.map(r => (r._2, r._3, r._4)).sortBy(p => (p._1, p._2)).toVector
      val n = pts.size
      val nb = k - 2
      val bs = Array.fill(nb)(Vector.empty[(Long, Long, Double)])
      for (m <- 0 until n - 2) {
        val b = (m.toLong * nb / (n - 2)).toInt
        bs(b) = bs(b) :+ pts(m + 1)
      }
      var anchor = pts.head
      val sel = (0 until nb).map { i =>
        val (cx, cy) =
          if (i + 1 < nb) {
            val nxt = bs(i + 1)
            (nxt.map(_._1).sum.toDouble / nxt.size, nxt.map(_._3).sum / nxt.size)
          } else (pts.last._1.toDouble, pts.last._3)
        val best = bs(i).minBy { case (px, pid, py) =>
          val area = math.abs((anchor._1 - cx) * (py - anchor._3) -
            (anchor._1 - px) * (cy - anchor._3))
          (-area, px, pid)
        }
        anchor = best
        best
      }
      (pts.head +: sel :+ pts.last).map(p => (s, p._1, p._2, p._3))
    }.toSet
    val got = Lttb.lttb(data.toDF("sk", "x", "id", "y"), Seq("sk"), "x", "id", "y", k)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == ref)
  }
}
