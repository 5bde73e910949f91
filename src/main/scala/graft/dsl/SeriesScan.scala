package graft.dsl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Order-sensitive per-series scans (EMA family, Holt-Winters, …).
  *
  * These transforms are inherently sequential per series (each output
  * depends on all predecessors), which window algebra cannot express
  * without an O(n²) closed form that overflows on long series. The
  * scale-correct shape is: one shuffle to co-locate each series,
  * in-partition sort, then a single streaming pass with O(1) state per
  * series — `repartition(key).sortWithinPartitions(key, time)` +
  * `mapPartitions`. Memory is constant regardless of series length
  * (unlike `collect_list`-based alternatives), so this survives a 100×
  * scale-up; SURVEY.md §7 lists it among the few justified
  * `mapPartitions` uses.
  */
object SeriesScan {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Co-locate + order each series. An EMPTY key is a sequential scan of
    * the whole frame: correct, but a single task regardless of cluster
    * size — callers at scale should group by a real series key first.
    * The guard logs loudly instead of silently serializing 100 TB.
    */
  private def sortedBySeries(df: DataFrame, keyCols: Seq[String],
      orderCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val ord = (orderCol +: tieCols).map(col)
    if (keyCols.isEmpty) {
      log.warn("SeriesScan with an empty series key: the whole frame moves " +
        "through ONE task. Group by a series key for parallel scans.")
      df.repartition(1).sortWithinPartitions(ord: _*)
    } else df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ ord: _*)
  }

  /** Group a sorted partition's rows into consecutive runs of one
    * series, materializing each run as (key, Vector[(order, value)]).
    * Callers that need the WHOLE series in memory (Holt-Winters seed +
    * seasonal state, parameter fitting) use this; O(1)-state scans use
    * [[scanDouble]] instead. Null values surface as NaN so callers can
    * choose their own null policy.
    */
  private def seriesGroups(it: Iterator[Row], keyIdx: Seq[Int], ordIdx: Int,
      valIdx: Int): Iterator[(String, Vector[(Long, Double)])] =
    new Iterator[(String, Vector[(Long, Double)])] {
      val base = it.buffered
      def hasNext = base.hasNext
      def next(): (String, Vector[(Long, Double)]) = {
        val key = keyIdx.map(base.head.get).mkString("\u0000")
        val buf = Vector.newBuilder[(Long, Double)]
        while (base.hasNext && keyIdx.map(base.head.get).mkString("\u0000") == key) {
          val r = base.next()
          val v = r.get(valIdx) match {
            case null => Double.NaN
            case x: java.lang.Number => x.doubleValue()
          }
          buf += ((r.get(ordIdx) match { case n: java.lang.Number => n.longValue() }, v))
        }
        (key, buf.result())
      }
    }

  /** Distributed lag-1 over ONE unkeyed series — the fix for the
    * "ungrouped transform serializes through one task" caveat, for the
    * transform class that only needs a bounded lookback (derivative /
    * difference / elapsed), where the full sequential scan above is
    * unnecessary.
    *
    * Shape: range-partition by `orderCol` (contiguous, balanced,
    * sampling-based spans), checkpoint so both passes see the SAME
    * partitioning, then (1) collect each partition's LAST row — one
    * row per partition, O(partitions) driver traffic, never O(rows) —
    * and (2) stream each partition with its nearest non-empty
    * predecessor's last row as the boundary carry. Every partition
    * computes independently; a 1000-executor cluster runs 1000-way
    * parallel where the window form ran one task.
    *
    * Appends `_prev_<c>` (lag-1 value, null for the global first row)
    * for each requested column. Ties on `orderCol` are
    * partition-order-dependent, exactly like the window form.
    */
  def ungroupedLag(df: DataFrame, orderCol: String, lagCols: Seq[String],
      numParts: Int): DataFrame = {
    import org.apache.spark.TaskContext
    val inSchema = df.schema
    val lagIdx = lagCols.map(inSchema.fieldIndex)
    val outSchema = StructType(inSchema.fields ++ lagCols.map(c =>
      StructField(s"_prev_$c", inSchema(c).dataType, nullable = true)))
    val pidSchema = StructType(
      StructField("_pid", org.apache.spark.sql.types.IntegerType, nullable = false)
        +: lagCols.map(c => inSchema(inSchema.fieldIndex(c)).copy(nullable = true)))
    val parts = df.repartitionByRange(math.max(numParts, 1), col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint() // pin the sampled range bounds for both passes
    // each partition's last row, projected down to the lagged columns:
    // the carries map rides inside every task closure, so its size must
    // be O(partitions × lagCols), never O(partitions × row width)
    val lastRows = {
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(pidSchema)
      parts.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          var last: Row = null
          while (it.hasNext) last = it.next()
          Iterator.single(Row.fromSeq(TaskContext.getPartitionId() +: lagIdx.map(last.get)))
        }
      }.collect()
    }
    // carry for partition p = last row of the nearest non-empty
    // predecessor (range partitions can be empty)
    val byPid = lastRows.map(r => r.getInt(0) -> r).toMap
    val maxPid = (byPid.keys ++ Seq(0)).max
    val carries: Map[Int, Seq[Any]] = {
      var running: Row = null
      (0 to maxPid + 1).map { p =>
        val c = p -> (if (running == null) null else running.toSeq.drop(1))
        byPid.get(p).foreach(running = _)
        c
      }.filter(_._2 != null).toMap
    }
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    parts.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      // prev is always the lagCols projection of the previous row
      var prev: Seq[Any] = carries.get(pid).orNull
      it.map { row =>
        val extra = if (prev == null) lagIdx.map(_ => null) else prev
        val out = Row.fromSeq(row.toSeq ++ extra)
        prev = lagIdx.map(row.get)
        out
      }
    }
  }

  /** Distributed running sum over ONE unkeyed series — the classic
    * two-pass parallel prefix: range-partition by `orderCol`,
    * checkpoint, collect per-partition TOTALS (one double per
    * partition), then stream each partition seeded with the sum of all
    * its predecessors' totals. Appends `outCol`; null values pass
    * through (null output, state untouched). Only the addition
    * grouping at partition boundaries differs from the sequential
    * window form (≤ 1 ulp per boundary).
    */
  def ungroupedPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numParts: Int): DataFrame = {
    import org.apache.spark.TaskContext
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val parts = df.repartitionByRange(math.max(numParts, 1), col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint() // pin the sampled range bounds for both passes
    def valOf(row: Row): java.lang.Double = row.get(valIdx) match {
      case null => null
      case n: java.lang.Number => n.doubleValue()
    }
    val totals = {
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(StructType(Seq(
        StructField("_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("_sum", DoubleType, nullable = false))))
      parts.mapPartitions { it =>
        var s = 0.0; var any = false
        while (it.hasNext) { val v = valOf(it.next()); if (v != null) { s += v; any = true } }
        if (any) Iterator.single(Row(TaskContext.getPartitionId(), s)) else Iterator.empty
      }.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    val maxPid = (totals.keys ++ Seq(0)).max
    val offsets: Map[Int, Double] = {
      var running = 0.0
      (0 to maxPid + 1).map { p =>
        val o = p -> running
        totals.get(p).foreach(running += _)
        o
      }.toMap
    }
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    parts.mapPartitions { it =>
      var acc = offsets.getOrElse(TaskContext.getPartitionId(), 0.0)
      it.map { row =>
        val v = valOf(row)
        if (v == null) Row.fromSeq(row.toSeq :+ null)
        else { acc += v; Row.fromSeq(row.toSeq :+ java.lang.Double.valueOf(acc)) }
      }
    }
  }

  /** Distributed n-row moving average over ONE unkeyed series. A row
    * window of n needs only the previous n−1 ROWS at each partition
    * boundary, so the carry per partition is the concatenation of its
    * predecessors' tails truncated to n−1 values — O(partitions × n)
    * driver traffic, never O(rows).
    *
    * Emits only rows whose row-window is full (the first n−1 rows drop,
    * matching both the Flux `movingAverage` and v1 `moving_average`
    * contracts). `requireAllNonNull = true` additionally drops rows
    * whose window contains a null (v1's `count(v) === n` filter);
    * `false` averages the non-null subset (Flux's `count(1) === n`).
    * The average sums the window in row order, the same accumulation
    * order as the sequential window form.
    */
  def ungroupedMovingAvg(df: DataFrame, orderCol: String, valueCol: String,
      n: Int, outCol: String, requireAllNonNull: Boolean,
      numParts: Int): DataFrame = {
    import org.apache.spark.TaskContext
    require(n >= 1, s"moving average needs n >= 1, got $n")
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val parts = df.repartitionByRange(math.max(numParts, 1), col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint() // pin the sampled range bounds for both passes
    def valOf(row: Row): java.lang.Double = row.get(valIdx) match {
      case null => null
      case x: java.lang.Number => x.doubleValue()
    }
    // pass 1: each partition's last min(n−1, rows) values, in order
    val tails: Map[Int, Vector[java.lang.Double]] = {
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(StructType(Seq(
        StructField("_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("_tail", org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true), nullable = false))))
      parts.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayDeque[java.lang.Double]
        while (it.hasNext) {
          buf.append(valOf(it.next()))
          if (buf.size > n - 1) buf.removeHead()
        }
        Iterator.single(Row(TaskContext.getPartitionId(), buf.toSeq))
      }.collect().map(r => r.getInt(0) -> r.getSeq[java.lang.Double](1).toVector).toMap
    }
    val maxPid = (tails.keys ++ Seq(0)).max
    val carries: Map[Int, Vector[java.lang.Double]] = {
      // running = last n−1 values of everything before partition p;
      // a short predecessor contributes all its rows, so concat+truncate
      // is exact
      var running = Vector.empty[java.lang.Double]
      (0 to maxPid).map { p =>
        val c = p -> running
        running = (running ++ tails.getOrElse(p, Vector.empty)).takeRight(math.max(n - 1, 0))
        c
      }.toMap
    }
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    parts.mapPartitions { it =>
      val q = scala.collection.mutable.ArrayDeque[java.lang.Double](
        carries.getOrElse(TaskContext.getPartitionId(), Vector.empty): _*)
      it.flatMap { row =>
        q.append(valOf(row))
        if (q.size > n) q.removeHead()
        if (q.size < n) None
        else {
          var s = 0.0; var nn = 0
          q.foreach { x => if (x != null) { s += x; nn += 1 } }
          if (requireAllNonNull && nn < n) None
          else {
            val out: java.lang.Double = if (nn == 0) null else s / nn
            Some(Row.fromSeq(row.toSeq :+ out))
          }
        }
      }
    }
  }

  /** Distributed EMA over ONE unkeyed series (Flux semantics: SMA seed
    * over the first n values, α = 2/(n+1) after). EMA is a LINEAR
    * recurrence — e' = (1−α)·e + α·v — so a partition's effect on
    * incoming state is an affine map (a, b) and P partitions compose
    * on the driver in O(P): the same two-pass parallel-prefix shape as
    * [[ungroupedPrefixSum]]. The SMA warm-up is handled exactly: pass 1
    * also ships each partition's first ≤ n non-null values (and the
    * affine maps of its ≤ n+1 candidate suffixes), so the driver
    * replays the seed bit-for-bit and enters every partition with the
    * exact sequential state. The only divergence from the single-task
    * scan is the re-association of the affine fold across boundaries
    * (≲ a few ulps, like the prefix-sum's documented boundary
    * grouping).
    *
    * Emits `outCol` for every row: null for null inputs and warm-up
    * rows, the EMA otherwise — identical to the [[scanDouble]] EMA.
    */
  def ungroupedEma(df: DataFrame, orderCol: String, valueCol: String,
      n: Int, outCol: String, numParts: Int): DataFrame = {
    import org.apache.spark.TaskContext
    require(n >= 1, s"ema needs n >= 1, got $n")
    val alpha = 2.0 / (n + 1)
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val parts = df.repartitionByRange(math.max(numParts, 1), col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .localCheckpoint() // pin the sampled range bounds for both passes
    def valOf(row: Row): java.lang.Double = row.get(valIdx) match {
      case null => null
      case x: java.lang.Number => x.doubleValue()
    }
    // pass 1 per partition: non-null count, first min(n, count) values,
    // and affine maps (a_j, b_j) of the suffix starting at non-null
    // index j for every j ≤ min(n, count) — the driver does not know
    // where the global warm-up ends until it has all counts, so each
    // partition ships every candidate entry point (≤ n+1 of them)
    final case class PartStat(pid: Int, cnt: Long, first: Vector[Double],
        sa: Vector[Double], sb: Vector[Double])
    val stats: Seq[PartStat] = {
      val arrT = org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(StructType(Seq(
        StructField("_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("_cnt", org.apache.spark.sql.types.LongType, nullable = false),
        StructField("_first", arrT, nullable = false),
        StructField("_sa", arrT, nullable = false),
        StructField("_sb", arrT, nullable = false))))
      parts.mapPartitions { it =>
        var cnt = 0L
        val first = Vector.newBuilder[Double]
        var aTop = 1.0; var bTop = 0.0 // forward affine over values at index ≥ n
        while (it.hasNext) {
          val v = valOf(it.next())
          if (v != null) {
            if (cnt < n) first += v.doubleValue()
            else { aTop *= (1 - alpha); bTop = (1 - alpha) * bTop + alpha * v }
            cnt += 1
          }
        }
        val f = first.result()
        val top = math.min(n.toLong, cnt).toInt
        val sa = new Array[Double](top + 1); val sb = new Array[Double](top + 1)
        sa(top) = aTop; sb(top) = bTop
        var j = top - 1
        while (j >= 0) { // M_j = M_{j+1} ∘ step(v_j)
          sa(j) = sa(j + 1) * (1 - alpha)
          sb(j) = sa(j + 1) * alpha * f(j) + sb(j + 1)
          j -= 1
        }
        Iterator.single(Row(TaskContext.getPartitionId(), cnt, f, sa.toSeq, sb.toSeq))
      }.collect().map(r => PartStat(r.getInt(0), r.getLong(1),
        r.getSeq[Double](2).toVector, r.getSeq[Double](3).toVector,
        r.getSeq[Double](4).toVector)).sortBy(_.pid).toSeq
    }
    // driver walk: replay the sequential state machine across
    // partitions, using each partition's shipped prefix for the warm-up
    // region and its affine map for the rest — O(partitions × n)
    val entries: Map[Int, (Long, Double, Double)] = {
      var count = 0L; var sum = 0.0; var ema = 0.0
      stats.map { p =>
        val entry = p.pid -> ((count, sum, ema))
        if (count >= n) { // fully past warm-up: one affine application
          ema = p.sa(0) * ema + p.sb(0)
          count += p.cnt
        } else {
          var i = 0
          while (i < p.first.length && count < n) {
            val v = p.first(i)
            count += 1
            if (count < n) sum += v
            else ema = (sum + v) / n // the SMA seed, bit-exact
            i += 1
          }
          if (count >= n) { ema = p.sa(i) * ema + p.sb(i); count += p.cnt - i }
        }
        entry
      }.toMap
    }
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    parts.mapPartitions { it =>
      val (c0, s0, e0) = entries.getOrElse(TaskContext.getPartitionId(), (0L, 0.0, 0.0))
      var count = c0; var sum = s0; var ema = e0
      it.map { row =>
        val v = valOf(row)
        val out: java.lang.Double =
          if (v == null) null
          else {
            count += 1
            if (count < n) { sum += v; null }
            else if (count == n) { ema = (sum + v) / n; ema }
            else { ema = v * alpha + ema * (1 - alpha); ema }
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** Append `outCol` (double) computed by a stateful scan over each
    * group in time order. `step` receives (state, value) and returns
    * (nextState, output); a null output KEEPS the row with a null
    * `outCol` (e.g. EMA warm-up rows carry null) — callers that want
    * warm-up rows gone filter afterwards. ungroupedEma's documented
    * parity with the scanDouble EMA depends on this keep-with-null
    * behavior; do not change it to row-dropping.
    *
    * @param keyCols  series identity columns (scan state resets on change)
    * @param orderCol column to order by within a series
    * @param tieCols  extra ordering columns breaking orderCol ties —
    *                 without one, duplicate (key, orderCol) rows make
    *                 any order-dependent state machine's output
    *                 nondeterministic
    */
  def scanDouble[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      outCol: String,
      tieCols: Seq[String] = Nil
  )(init: => S)(step: (S, Double) => (S, java.lang.Double)): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val valIdx = inSchema.fieldIndex(valueCol)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)

    val sorted = sortedBySeries(df, keyCols, orderCol, tieCols)

    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: S = null.asInstanceOf[S]
      it.flatMap { row =>
        val k = keyIdx.map(row.get)
        if (curKey == null || k != curKey) { curKey = k; state = init }
        val v = row.get(valIdx) match {
          case null => null
          case n: java.lang.Number => n.doubleValue()
        }
        if (v == null) Some(Row.fromSeq(row.toSeq :+ null))
        else {
          val (ns, out) = step(state, v.asInstanceOf[Double])
          state = ns
          Some(Row.fromSeq(row.toSeq :+ out))
        }
      }
    }
  }

  /** Exponential moving average, Flux semantics: first n values average
    * into the seed (SMA), EMA emitted from row n on with α = 2/(n+1).
    */
  final case class EmaState(n: Int, count: Int, sum: Double, ema: Double)

  def ema(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String, n: Int, outCol: String): DataFrame =
    if (keyCols.isEmpty)
      // EMA is linear, so the unkeyed series distributes via affine-map
      // composition instead of serializing through one task — this also
      // distributes doubleEMA/tripleEMA, which chain this call
      ungroupedEma(df, orderCol, valueCol, n, outCol,
        df.sparkSession.sparkContext.defaultParallelism)
    else emaSingleSeries(df, keyCols, orderCol, valueCol, n, outCol)

  /** The per-series sequential EMA scan ([[scanDouble]]). Package-
    * visible so specs can assert distributed ≡ single-task on the
    * unkeyed path.
    */
  private[graft] def emaSingleSeries(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String, n: Int, outCol: String): DataFrame = {
    val alpha = 2.0 / (n + 1)
    scanDouble[EmaState](df, keyCols, orderCol, valueCol, outCol)(EmaState(n, 0, 0.0, 0.0)) {
      case (s, v) =>
        if (s.count + 1 < n) (s.copy(count = s.count + 1, sum = s.sum + v), null)
        else if (s.count + 1 == n) {
          val seed = (s.sum + v) / n
          (s.copy(count = s.count + 1, ema = seed), seed)
        } else {
          val e = v * alpha + s.ema * (1 - alpha)
          (s.copy(count = s.count + 1, ema = e), e)
        }
    }
  }

  /** Relative strength index (Wilder smoothing), Flux/InfluxQL n-period. */
  final case class RsiState(count: Int, prev: Double, avgGain: Double, avgLoss: Double)

  def rsi(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String, n: Int, outCol: String): DataFrame =
    scanDouble[RsiState](df, keyCols, orderCol, valueCol, outCol)(RsiState(-1, 0.0, 0.0, 0.0)) {
      case (s, v) =>
        if (s.count == -1) (RsiState(0, v, 0.0, 0.0), null)
        else {
          val gain = math.max(v - s.prev, 0.0)
          val loss = math.max(s.prev - v, 0.0)
          val c = s.count + 1
          if (c < n) (RsiState(c, v, s.avgGain + gain, s.avgLoss + loss), null)
          else if (c == n) {
            val ag = (s.avgGain + gain) / n; val al = (s.avgLoss + loss) / n
            (RsiState(c, v, ag, al), rsiVal(ag, al))
          } else {
            val ag = (s.avgGain * (n - 1) + gain) / n
            val al = (s.avgLoss * (n - 1) + loss) / n
            (RsiState(c, v, ag, al), rsiVal(ag, al))
          }
        }
    }

  private def rsiVal(ag: Double, al: Double): java.lang.Double =
    if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)

  /** Chande momentum oscillator over n periods (sliding sums of gains
    * and losses).
    */
  final case class CmoState(prev: java.lang.Double, deltas: scala.collection.mutable.Queue[Double])

  def chandeMomentum(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String, n: Int, outCol: String): DataFrame =
    scanDouble[CmoState](df, keyCols, orderCol, valueCol, outCol)(CmoState(null, scala.collection.mutable.Queue.empty)) {
      case (s, v) =>
        if (s.prev == null) (CmoState(v, s.deltas), null)
        else {
          s.deltas.enqueue(v - s.prev)
          if (s.deltas.size > n) s.deltas.dequeue()
          val out: java.lang.Double =
            if (s.deltas.size < n) null
            else {
              val up = s.deltas.iterator.filter(_ > 0).sum
              val dn = -s.deltas.iterator.filter(_ < 0).sum
              if (up + dn == 0.0) 0.0 else (up - dn) / (up + dn) * 100.0
            }
          (CmoState(v, s.deltas), out)
        }
    }

  /** Additive Holt-Winters (triple exponential smoothing) with fitted
    * one-step-ahead values per input row and `forecast` extrapolated
    * rows per series (the InfluxQL `holtWinters(N, seasonal)` shape;
    * the reference engine fits α/β/γ by optimization — we take them as
    * parameters, which keeps the scan deterministic).
    *
    * Requires a regular time grid (apply after `aggregateWindow`, like
    * InfluxQL requires GROUP BY time()). Initialization: level = mean
    * of season 1, trend = (mean of season 2 − mean of season 1)/m,
    * seasonals = season-1 deviations; fitted values emitted from row m.
    * Forecast timestamps continue at the series' mean step.
    *
    * `m = 0` is v1's NO-SEASONALITY form — Holt's linear-trend double
    * exponential: level = v₀, trend = v₁ − v₀, fitted from row 1,
    * forecast = level + trend·h (γ unused).
    *
    * Output: (keyCols..., orderCol, value, fitted, is_forecast).
    */
  def holtWinters(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      forecast: Int,
      m: Int,
      alpha: Double = 0.5,
      beta: Double = 0.1,
      gamma: Double = 0.1
  ): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(Seq(
      StructField("_hw_key", StringType, nullable = false),
      StructField(orderCol, org.apache.spark.sql.types.LongType, nullable = false),
      StructField("value", DoubleType, nullable = true),
      StructField("fitted", DoubleType, nullable = true),
      StructField("is_forecast", org.apache.spark.sql.types.BooleanType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val ordIdx = inSchema.fieldIndex(orderCol)
    val valIdx = inSchema.fieldIndex(valueCol)

    val sorted = sortedBySeries(df, keyCols, orderCol)

    sorted.mapPartitions { it =>
      seriesGroups(it, keyIdx, ordIdx, valIdx).flatMap { case (key, rows0) =>
        emitHw(key, rows0.filterNot(_._2.isNaN), m, alpha, beta, gamma, forecast)
      }
    }
  }

  /** Replay the Holt-Winters recurrence over one series, emitting
    * (key, t, value, fitted, is_forecast) rows — shared by the fixed-
    * parameter [[holtWinters]] and the fitted [[holtWintersFitSeries]].
    * Short series (< 2 rows for m = 0, < 2m otherwise) emit nothing.
    */
  private def emitHw(key: String, rows: Vector[(Long, Double)], m: Int,
      alpha: Double, beta: Double, gamma: Double, forecast: Int): Iterator[Row] = {
    if (m == 0) {
      if (rows.length < 2) Iterator.empty
      else {
        val vs = rows.map(_._2)
        var level = vs(0)
        var trend = vs(1) - vs(0)
        val out = Vector.newBuilder[Row]
        var i = 1
        while (i < rows.length) {
          val (t, v) = rows(i)
          out += Row(key, t, v, level + trend, false)
          val prevLevel = level
          level = alpha * v + (1 - alpha) * (level + trend)
          trend = beta * (level - prevLevel) + (1 - beta) * trend
          i += 1
        }
        val step = (rows.last._1 - rows.head._1) / (rows.length - 1).max(1)
        var h = 1
        while (h <= forecast) {
          out += Row(key, rows.last._1 + step * h, null, level + trend * h, true)
          h += 1
        }
        out.result().iterator
      }
    } else if (rows.length < 2 * m) Iterator.empty
    else {
      val vs = rows.map(_._2)
      val mean1 = vs.take(m).sum / m
      val mean2 = vs.slice(m, 2 * m).sum / m
      var level = mean1
      var trend = (mean2 - mean1) / m
      val season = Array.tabulate(m)(i => vs(i) - mean1)
      val out = Vector.newBuilder[Row]
      var i = m
      while (i < rows.length) {
        val (t, v) = rows(i)
        val si = i % m
        val fitted = level + trend + season(si)
        out += Row(key, t, v, fitted, false)
        val prevLevel = level
        level = alpha * (v - season(si)) + (1 - alpha) * (level + trend)
        trend = beta * (level - prevLevel) + (1 - beta) * trend
        season(si) = gamma * (v - level) + (1 - gamma) * season(si)
        i += 1
      }
      val step = (rows.last._1 - rows.head._1) / (rows.length - 1).max(1)
      var h = 1
      while (h <= forecast) {
        val t = rows.last._1 + step * h
        out += Row(key, t, null, level + trend * h + season((rows.length + h - 1) % m), true)
        h += 1
      }
      out.result().iterator
    }
  }

  /** One additive-HW pass over a series: returns (sse over the fitted
    * window, final level, final trend, final seasonals). Arithmetic is
    * term-for-term identical to [[holtWinters]] (and to the recursive-
    * CTE oracle), with SSE accumulated in scan order BEFORE the state
    * update so both engines fold bit-identically.
    */
  private def hwRun(vs: Vector[Double], m: Int, alpha: Double, beta: Double,
      gamma: Double): (Double, Double, Double, Array[Double]) = if (m == 0) {
    // Holt (no season): level = v₀, trend = v₁ − v₀, γ unused
    var level = vs(0)
    var trend = vs(1) - vs(0)
    var sse = 0.0
    var i = 1
    while (i < vs.length) {
      val v = vs(i)
      val fitted = level + trend
      sse += (v - fitted) * (v - fitted)
      val prevLevel = level
      level = alpha * v + (1 - alpha) * (level + trend)
      trend = beta * (level - prevLevel) + (1 - beta) * trend
      i += 1
    }
    (sse, level, trend, Array.empty[Double])
  } else {
    val mean1 = vs.take(m).sum / m
    val mean2 = vs.slice(m, 2 * m).sum / m
    var level = mean1
    var trend = (mean2 - mean1) / m
    val season = Array.tabulate(m)(i => vs(i) - mean1)
    var sse = 0.0
    var i = m
    while (i < vs.length) {
      val v = vs(i)
      val si = i % m
      val fitted = level + trend + season(si)
      sse += (v - fitted) * (v - fitted)
      val prevLevel = level
      level = alpha * (v - season(si)) + (1 - alpha) * (level + trend)
      trend = beta * (level - prevLevel) + (1 - beta) * trend
      season(si) = gamma * (v - level) + (1 - gamma) * season(si)
      i += 1
    }
    (sse, level, trend, season)
  }

  /** Candidate schedule for [[holtWintersFit]], in integer HUNDREDTHS so
    * Spark and the SQL oracle derive every α/β/γ double from the same
    * `i / 100.0` division (float subtraction like `best − 0.1` would
    * land off-lattice). Three fixed refinement stages: a coarse
    * {0.2, 0.5, 0.8}³ sweep, then ±0.10, then ±0.05 around the argmin —
    * 81 SSE evaluations total.
    */
  private[graft] val HwFitStage1 = Seq(20, 50, 80)
  private[graft] val HwFitOffsets = Seq(Seq(-10, 0, 10), Seq(-5, 0, 5))

  /** The fixed-schedule grid refinement on one series: integer-
    * hundredths (α, β, γ) minimizing [[hwRun]]'s SSE, strict-< walk in
    * ascending candidate order ≡ the oracle's ORDER BY (sse, ca, cb,
    * cg) — identical doubles on both sides make the comparison
    * identical too. For m = 0 (Holt, no season) γ is inert, so it pins
    * to the first lattice point and only (α, β) sweep — 27 evaluations
    * instead of 81.
    */
  private[graft] def hwFitParams(vs: Vector[Double], m: Int): ((Int, Int, Int), Double) = {
    def argmin(cands: Seq[(Int, Int, Int)]): ((Int, Int, Int), Double) = {
      var best: (Int, Int, Int) = null
      var bestSse = Double.PositiveInfinity
      cands.foreach { c =>
        val s = hwRun(vs, m, c._1 / 100.0, c._2 / 100.0, c._3 / 100.0)._1
        if (s < bestSse) { bestSse = s; best = c }
      }
      (best, bestSse)
    }
    if (m == 0) {
      val g0 = HwFitStage1.head
      val stage1 = for (a <- HwFitStage1; b <- HwFitStage1) yield (a, b, g0)
      HwFitOffsets.foldLeft(argmin(stage1)) { case ((b0, _), offs) =>
        argmin(for (da <- offs; db <- offs) yield (b0._1 + da, b0._2 + db, g0))
      }
    } else {
      val stage1 = for (a <- HwFitStage1; b <- HwFitStage1; g <- HwFitStage1) yield (a, b, g)
      HwFitOffsets.foldLeft(argmin(stage1)) { case ((b0, _), offs) =>
        argmin(for (da <- offs; db <- offs; dg <- offs)
          yield (b0._1 + da, b0._2 + db, b0._3 + dg))
      }
    }
  }

  /** [[holtWinters]]'s output shape with FITTED parameters — what the
    * v1 text surface serves: the pinned engine's HOLT_WINTERS[_WITH_FIT]
    * optimizes α/β/γ per series before fitting/forecasting. Fit by
    * [[hwFitParams]]'s deterministic schedule, then one replay pass.
    */
  def holtWintersFitSeries(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      forecast: Int,
      m: Int
  ): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(Seq(
      StructField("_hw_key", StringType, nullable = false),
      StructField(orderCol, org.apache.spark.sql.types.LongType, nullable = false),
      StructField("value", DoubleType, nullable = true),
      StructField("fitted", DoubleType, nullable = true),
      StructField("is_forecast", org.apache.spark.sql.types.BooleanType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val ordIdx = inSchema.fieldIndex(orderCol)
    val valIdx = inSchema.fieldIndex(valueCol)
    val sorted = sortedBySeries(df, keyCols, orderCol)
    sorted.mapPartitions { it =>
      seriesGroups(it, keyIdx, ordIdx, valIdx).flatMap { case (key, rows0) =>
        val rows = rows0.filterNot(_._2.isNaN)
        if (rows.length < math.max(2 * m, 2)) Iterator.empty
        else {
          val ((ca, cb, cg), _) = hwFitParams(rows.map(_._2), m)
          emitHw(key, rows, m, ca / 100.0, cb / 100.0, cg / 100.0, forecast)
        }
      }
    }
  }

  /** Additive Holt-Winters with FITTED α/β/γ — closes the last v1
    * semantic divergence (the reference's pinned engine optimizes the
    * smoothing parameters; [[holtWinters]] takes them as constants).
    *
    * The optimizer is a deterministic fixed-schedule grid refinement
    * (see [[HwFitStage1]]) minimizing one-step-ahead SSE over the
    * fitted window, ties broken by ascending (α, β, γ). v1 uses
    * Nelder-Mead; a simplex's vertices are data-dependent reals that a
    * SQL oracle cannot enumerate, while a fixed evaluation schedule is
    * replayable query-for-query in DuckDB — same derivative-free
    * family, same fitted-SSE objective, exactly replicable. 81
    * evaluations × O(series) each, all inside one task per series.
    *
    * Output: `forecast` rows per series —
    * (_hw_key, orderCol, fitted, alpha, beta, gamma, sse).
    */
  def holtWintersFit(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      forecast: Int,
      m: Int
  ): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(Seq(
      StructField("_hw_key", StringType, nullable = false),
      StructField(orderCol, org.apache.spark.sql.types.LongType, nullable = false),
      StructField("fitted", DoubleType, nullable = true),
      StructField("alpha", DoubleType, nullable = false),
      StructField("beta", DoubleType, nullable = false),
      StructField("gamma", DoubleType, nullable = false),
      StructField("sse", DoubleType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val ordIdx = inSchema.fieldIndex(orderCol)
    val valIdx = inSchema.fieldIndex(valueCol)

    val sorted = sortedBySeries(df, keyCols, orderCol)

    require(m >= 1, "holtWintersFit needs a seasonal length >= 1")
    sorted.mapPartitions { it =>
      seriesGroups(it, keyIdx, ordIdx, valIdx).flatMap { case (key, rows0) =>
        val rows = rows0.filterNot(_._2.isNaN)
        if (rows.length < 2 * m) Iterator.empty
        else {
          val vs = rows.map(_._2)
          val ((ca, cb, cg), sse) = hwFitParams(vs, m)
          val (_, level, trend, season) =
            hwRun(vs, m, ca / 100.0, cb / 100.0, cg / 100.0)
          val step = (rows.last._1 - rows.head._1) / (rows.length - 1).max(1)
          (1 to forecast).iterator.map { h =>
            Row(key, rows.last._1 + step * h,
              level + trend * h + season((rows.length + h - 1) % m),
              ca / 100.0, cb / 100.0, cg / 100.0, sse)
          }
        }
      }
    }
  }

  /** Kaufman's adaptive moving average (n-period efficiency ratio). */
  final case class KamaState(window: scala.collection.mutable.Queue[Double], kama: java.lang.Double)

  def kama(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String, n: Int, outCol: String): DataFrame = {
    val fastest = 2.0 / (2 + 1); val slowest = 2.0 / (30 + 1)
    scanDouble[KamaState](df, keyCols, orderCol, valueCol, outCol)(KamaState(scala.collection.mutable.Queue.empty, null)) {
      case (s, v) =>
        s.window.enqueue(v)
        if (s.window.size > n + 1) s.window.dequeue()
        if (s.window.size < n + 1) (s, null)
        else {
          val arr = s.window.toArray
          val change = math.abs(arr.last - arr.head)
          val vol = arr.sliding(2).map(p => math.abs(p(1) - p(0))).sum
          val er = if (vol == 0.0) 0.0 else change / vol
          val sc = math.pow(er * (fastest - slowest) + slowest, 2)
          val prev: Double = if (s.kama == null) arr(arr.length - 2) else s.kama
          val k = prev + sc * (v - prev)
          (KamaState(s.window, k), k)
        }
    }
  }
}
