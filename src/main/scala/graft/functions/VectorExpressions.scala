package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the codegen'd replacement for the
  * `aggregate(zip_with(...))` higher-order-function formulation, which
  * Catalyst interprets (HOF lambdas don't participate in whole-stage
  * codegen and cost ~100× in tight loops; see PERF.md round 1).
  *
  * One fused loop computes a·b, a·a and b·b; each accumulator is its
  * own left-to-right sequential sum, so results are bit-identical to
  * the three-fold expression form (and to DuckDB's list_dot_product
  * oracle arithmetic). Registered via [[GraftExtensions]]
  * (SparkSessionExtensions.injectFunction) and reached with
  * `call_function("graft_cosine", a, b)`.
  *
  * Arrays must be non-null-element `array<double>` (cast upstream) and
  * equal length; length mismatch raises rather than silently truncating.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes' AbstractDataType is private[sql]; validate the
  // resolved child types directly instead.
  override lazy val resolved: Boolean = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    childrenResolved && ok(left) && ok(right)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_cosine: array lengths differ (${n} vs ${y.numElements()})")
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dab += xi * yi; daa += xi * xi; dbb += yi * yi
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: array lengths differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  final double $yi = $b.getDouble($i);
         |  $dab += $xi * $yi; $daa += $xi * $xi; $dbb += $yi * $yi;
         |}
         |${ev.value} = $dab / (java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb));
       """.stripMargin
    })
}

/** Session extension registering the graft expression family.
  * Enable with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in count(DISTINCT id) → bitmap rewrite; no-op unless
    // spark.graft.rewrite.bitmapDistinct=true (see RewriteRules.scala)
    ext.injectOptimizerRule(session => BitmapDistinctRewrite(session))
    // custom per-group top-k physical operator (plans/TopKPerGroup.scala)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b) takes two arguments")
        // cast inputs so float[]/int[] embeddings resolve to array<double>
        val cast = args.map(a =>
          org.apache.spark.sql.catalyst.expressions.Cast(a, ArrayType(DoubleType)))
        CosineSimilarity(cast.head, cast(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "graft_kll_quantiles"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_kll_quantiles(value, quantiles, k) takes three arguments")
        // cast the value so int/float/decimal columns resolve to double;
        // the analyzer wraps the returned AggregateFunction itself.
        KllQuantiles(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head, DoubleType),
          args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_sketch"),
      new ExpressionInfo(classOf[KllSketchBytes].getName, "graft_kll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_kll_sketch(value, k) takes two arguments")
        KllSketchBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head, DoubleType),
          args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeQuantiles].getName, "graft_kll_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_kll_merge(sketch, quantiles) takes two arguments")
        KllMergeQuantiles(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_distinct"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "graft_bitmap_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_bitmap_distinct(key) takes one argument")
        BitmapDistinct(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.LongType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_bytes"),
      new ExpressionInfo(classOf[BitmapBytes].getName, "graft_bitmap_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_bitmap_bytes(key) takes one argument")
        BitmapBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.LongType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_merge_count"),
      new ExpressionInfo(classOf[BitmapMergeCount].getName, "graft_bitmap_merge_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_bitmap_merge_count(bitmap) takes one argument")
        BitmapMergeCount(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(classOf[BitmapAndCount].getName, "graft_bitmap_and_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_bitmap_and_count(a, b) takes two arguments")
        BitmapAndCount(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_count"),
      new ExpressionInfo(classOf[HllCount].getName, "graft_hll_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hll_count(key, p) takes two arguments")
        HllCount(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_bytes"),
      new ExpressionInfo(classOf[HllBytes].getName, "graft_hll_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hll_bytes(key, p) takes two arguments")
        HllBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_merge_count"),
      new ExpressionInfo(classOf[HllMergeCount].getName, "graft_hll_merge_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_hll_merge_count(sketch) takes one argument")
        HllMergeCount(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_count"),
      new ExpressionInfo(classOf[KmvCount].getName, "graft_kmv_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kmv_count(key, k) takes two arguments")
        KmvCount(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_bytes"),
      new ExpressionInfo(classOf[KmvBytes].getName, "graft_kmv_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kmv_bytes(key, k) takes two arguments")
        KmvBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_merge_count"),
      new ExpressionInfo(classOf[KmvMergeCount].getName, "graft_kmv_merge_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_kmv_merge_count(sketch) takes one argument")
        KmvMergeCount(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_merge_bytes"),
      new ExpressionInfo(classOf[HllMergeBytes].getName, "graft_hll_merge_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_hll_merge_bytes(sketch) takes one argument")
        HllMergeBytes(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_merge_bytes"),
      new ExpressionInfo(classOf[KmvMergeBytes].getName, "graft_kmv_merge_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_kmv_merge_bytes(sketch) takes one argument")
        KmvMergeBytes(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_jaccard"),
      new ExpressionInfo(classOf[KmvJaccard].getName, "graft_kmv_jaccard"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_kmv_jaccard(a, b) takes two arguments")
        KmvJaccard(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_bytes"),
      new ExpressionInfo(classOf[BloomBytes].getName, "graft_bloom_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bloom_bytes(key, mBits, kHashes) takes three arguments")
        BloomBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_bloom_contains(bloom, key) takes two arguments")
        BloomContains(args.head,
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_bytes"),
      new ExpressionInfo(classOf[CmsBytes].getName, "graft_cms_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_cms_bytes(item, d, w) takes three arguments")
        CmsBytes(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_merge_bytes"),
      new ExpressionInfo(classOf[CmsMergeBytes].getName, "graft_cms_merge_bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "graft_cms_merge_bytes(cms) takes one argument")
        CmsMergeBytes(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_cms_estimate(cms, item) takes two arguments")
        CmsEstimate(args.head,
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKSketch].getName, "graft_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_topk(item, k, capacity) takes three arguments")
        TopKSketch(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType),
          args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(a, b) takes two arguments")
        JaroWinklerSimilarity(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head, StringType),
          org.apache.spark.sql.catalyst.expressions.Cast(args(1), StringType))
      }))
  }
}
