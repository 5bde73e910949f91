package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Paged-bitmap exact distinct (functions/BitmapDistinct.scala). */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("matches count(DISTINCT) and is partitioning-invariant") {
    val ids = (1 to 20000).map(i => ((i * 2654435761L) % 7919).toLong)
    val expect = ids.distinct.size.toLong
    Seq(1, 4, 13).foreach { p =>
      val got = ids.toDF("id").repartition(p)
        .agg(call_function("graft_bitmap_distinct", col("id")))
        .head.getLong(0)
      assert(got == expect, s"partitions=$p")
    }
  }

  test("sparse far-apart pages stay cheap and exact") {
    // keys scattered over a 10^12 domain: pages allocate only where
    // keys exist (4 pages here), not across the domain
    val ids = Seq(0L, 1L, 65536L, 1000000000000L, 1000000000001L, 0L)
    val got = ids.toDF("id")
      .agg(call_function("graft_bitmap_distinct", col("id")))
      .head.getLong(0)
    assert(got == 5L)
    val st = new BitmapState
    ids.foreach(st.add)
    assert(st.pages.size == 3) // {0,1}, {65536}, {10^12 pair}
  }

  test("serde round-trips; merge ORs pages") {
    val a = new BitmapState; Seq(1L, 2L, 70000L).foreach(a.add)
    val b = new BitmapState; Seq(2L, 3L).foreach(b.add)
    val agg = BitmapDistinct(
      org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val back = agg.deserialize(agg.serialize(a))
    assert(back.cardinality == 3)
    back.merge(b)
    assert(back.cardinality == 4)
  }

  test("bitmap bytes round-trip and AND-count equals set intersection") {
    val a = (1 to 300).map(i => (i * 7 % 211).toLong)
    val b = (1 to 300).map(i => (i * 13 % 307).toLong)
    val expect = (a.toSet & b.toSet).size.toLong
    val abm = a.toDF("id").agg(call_function("graft_bitmap_bytes", col("id")))
      .head.getAs[Array[Byte]](0)
    val bbm = b.toDF("id").agg(call_function("graft_bitmap_bytes", col("id")))
      .head.getAs[Array[Byte]](0)
    val got = Seq((abm, bbm)).toDF("x", "y")
      .select(call_function("graft_bitmap_and_count", col("x"), col("y")))
      .head.getLong(0)
    assert(got == expect)
  }

  test("negative keys raise the domain contract error") {
    val e = intercept[Exception] {
      Seq(-1L).toDF("id")
        .agg(call_function("graft_bitmap_distinct", col("id")))
        .head
    }
    assert(e.getMessage.contains("graft_bitmap_distinct") ||
      e.getCause != null && e.getCause.getMessage.contains("graft_bitmap_distinct"))
  }
}
