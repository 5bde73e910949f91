package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (functions/CountMin.scala). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("never underestimates; exact when collision-free") {
    val st = new CmsState(4, 4096)
    val freqs = (1 to 50).map(i => s"item-$i" -> i).toMap
    freqs.foreach { case (k, n) => (1 to n).foreach(_ => st.add(k)) }
    freqs.foreach { case (k, n) =>
      assert(st.estimate(k) >= n, s"$k underestimated")
    }
    // 50 items in 4096-wide rows: expect mostly-exact answers
    val exact = freqs.count { case (k, n) => st.estimate(k) == n }
    assert(exact >= 45, s"only $exact of 50 exact")
  }

  test("add-merge equals a direct build (collision-exact)") {
    val a = new CmsState(4, 256)
    val b = new CmsState(4, 256)
    val direct = new CmsState(4, 256)
    (1 to 1000).foreach { i =>
      val k = s"k${i % 97}"
      (if (i % 2 == 0) a else b).add(k)
      direct.add(k)
    }
    a.merge(b)
    assert(a.counts.sameElements(direct.counts))
    intercept[IllegalArgumentException](a.merge(new CmsState(3, 256)))
  }

  test("aggregate is partition-invariant; merge_bytes rolls up shards") {
    val df = (1 to 5000).map(i => (i % 5, s"u${i % 211}")).toDF("g", "k")
    val grids = Seq(1, 4, 13).map { p =>
      df.repartition(p)
        .agg(call_function("graft_cms_bytes", col("k"), lit(4), lit(512)))
        .head.getAs[Array[Byte]](0)
    }
    assert(grids.forall(g => java.util.Arrays.equals(g, grids.head)))
    val merged = df
      .groupBy("g").agg(call_function("graft_cms_bytes", col("k"), lit(4), lit(512)).as("cms"))
      .agg(call_function("graft_cms_merge_bytes", col("cms")))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, grids.head))
  }

  test("estimate expression matches state API through a broadcast join") {
    val df = (1 to 2000).map(i => s"u${i % 89}").toDF("k")
    val grid = df.agg(call_function("graft_cms_bytes", col("k"), lit(4), lit(1024)))
      .head.getAs[Array[Byte]](0)
    val st = CmsWire.read(grid)
    val got = df.distinct()
      .crossJoin(Seq(Tuple1(grid)).toDF("cms"))
      .select(col("k"), call_function("graft_cms_estimate", col("cms"), col("k")).as("est"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (k, est) => assert(est == st.estimate(k)) }
  }

  test("dimension contracts raise") {
    intercept[IllegalArgumentException](new CmsState(0, 512))
    intercept[IllegalArgumentException](new CmsState(17, 512))
    intercept[IllegalArgumentException](new CmsState(4, 8))
  }
}
