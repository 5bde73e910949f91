package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, the
  * public thesis algorithm every dashboard stack uses): reduce each
  * series to k points for plotting while preserving visual shape —
  * first and last point kept, the middle split into k−2 equal-count
  * buckets, and each bucket contributes the point forming the largest
  * triangle with the PREVIOUSLY SELECTED point and the NEXT bucket's
  * centroid. The selection is inherently sequential per series (each
  * choice anchors the next), so this is a per-series walk, not a
  * window expression.
  *
  * Determinism contract (what the DuckDB oracle replays exactly):
  *  - points order by (ts, id) — a total order;
  *  - bucket of middle index m (0-based over the n−2 middle points) is
  *    (m·(k−2)) div (n−2) — integer arithmetic;
  *  - centroid x averages exact integer sums; centroid y folds doubles
  *    in (ts, id) order, left to right;
  *  - triangle area = |(ax−cx)·(py−ay) − (ax−px)·(cy−ay)| (the ×½ is
  *    monotone and dropped), compared with ties broken toward smaller
  *    x then smaller id;
  *  - series with n ≤ k pass through untouched.
  *
  * Scale shape: `repartition(series).sortWithinPartitions(series, ts,
  * id)` + one mapPartitions — the [[graft.dsl.SeriesScan]] discipline.
  * Each series materializes in its task (like the Holt-Winters fit):
  * LTTB's input is a plot query's range selection, which is bounded by
  * construction; the op never shuffles more than the scan itself.
  */
object Lttb {

  /** Downsample every (seriesCols) series to at most `k` points.
    * Returns the selected rows as (seriesCols…, tsCol, idCol, valCol),
    * ordered within each task by series and time.
    */
  def lttb(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      idCol: String, valCol: String, k: Int): DataFrame = {
    require(k >= 3, s"LTTB needs k >= 3 (first + last + one bucket), got $k")
    require(seriesCols.nonEmpty, "LTTB needs a series key")
    val inSchema = df.schema
    val keyIdx = seriesCols.map(inSchema.fieldIndex)
    val projected = df.select(
      (seriesCols.map(col) :+ col(tsCol).cast("long").as(tsCol)) ++
        Seq(col(idCol).cast("long").as(idCol),
          col(valCol).cast("double").as(valCol)): _*)
    val sorted = projected
      .repartition(seriesCols.map(col): _*)
      .sortWithinPartitions((seriesCols :+ tsCol :+ idCol).map(col): _*)
    val outSchema = StructType(
      seriesCols.map(c => inSchema(inSchema.fieldIndex(c))) ++ Seq(
        StructField(tsCol, LongType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField(valCol, DoubleType, nullable = false)))
    val nKeys = seriesCols.size
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    sorted.mapPartitions { it =>
      val base = it.buffered
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && base.hasNext) {
            val key = (0 until nKeys).map(base.head.get)
            val buf = Vector.newBuilder[(Long, Long, Double)]
            while (base.hasNext &&
                (0 until nKeys).map(base.head.get) == key) {
              val r = base.next()
              buf += ((r.getLong(nKeys), r.getLong(nKeys + 1),
                r.getDouble(nKeys + 2)))
            }
            // Seq[Any] — a bare Seq(long, long, double) would weakly
            // unify to Seq[Double] and silently widen the longs
            out = select(buf.result(), k).iterator
              .map(p => Row.fromSeq(key ++ Seq[Any](p._1, p._2, p._3)))
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Row = { advance(); out.next() }
      }
    }
  }

  /** The sequential core on one sorted series — shared with the spec's
    * reference checks. Points are (x, id, y).
    */
  private[operators] def select(pts: Vector[(Long, Long, Double)],
      k: Int): Vector[(Long, Long, Double)] = {
    val n = pts.length
    if (n <= k) return pts
    val nb = k - 2
    val buckets = Array.fill(nb)(Vector.newBuilder[(Long, Long, Double)])
    var m = 0
    while (m < n - 2) {
      buckets((m.toLong * nb / (n - 2)).toInt) += pts(m + 1)
      m += 1
    }
    val out = Vector.newBuilder[(Long, Long, Double)]
    out += pts.head
    var ax = pts.head._1.toDouble
    var ay = pts.head._3
    var i = 0
    while (i < nb) {
      // anchor target: next bucket's centroid, or the last point
      val (cx, cy) =
        if (i + 1 < nb) {
          val b = buckets(i + 1).result()
          var sx = 0L
          var sy = 0.0
          b.foreach { p => sx += p._1; sy += p._3 } // (ts,id)-ordered fold
          (sx.toDouble / b.length, sy / b.length)
        } else (pts.last._1.toDouble, pts.last._3)
      var best: (Long, Long, Double) = null
      var bestArea = -1.0
      buckets(i).result().foreach { case p @ (px, pid, py) =>
        val area = math.abs((ax - cx) * (py - ay) - (ax - px) * (cy - ay))
        // ties toward smaller x, then smaller id — the oracle's
        // lexicographic struct max on (area, -x, -id)
        val better = area > bestArea ||
          (area == bestArea && (px < best._1 || (px == best._1 && pid < best._2)))
        if (best == null || better) { best = p; bestArea = area }
      }
      out += best
      ax = best._1.toDouble
      ay = best._3
      i += 1
    }
    out += pts.last
    out.result()
  }
}
