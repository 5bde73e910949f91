package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (llmops/LayoutOps.scala): the Morton bit network on
  * known values, quantization clamping, and the property the layout
  * exists for — each written file covers a small rectangle of the
  * 2-D space, so min/max stats prune on either dimension.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue16 interleaves bits (known values)") {
    val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(LayoutOps.zvalue16(col("x"), col("y")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    // spread(3)=0b101=5; y=1 → odd bits 0b10=2 → 7
    // spread(65535) = 0x55555555 (even bits); odd: 0xAAAAAAAA
    assert(got == Seq(7L, 0L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("quantizeMinMax clamps to the 16-bit grid") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(LayoutOps.quantizeMinMax(col("v"), 0.0, 100.0).as("q"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 0L, 32768L, 65535L, 65535L))
  }

  test("zorderBy files cover small rectangles of the key space") {
    // 64×64 uniform grid, 16 output files → each file's bounding box
    // must be far smaller than the full extent on BOTH dimensions
    // (a plain sort by x would give full-height stripes: ymax-ymin=63).
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    LayoutOps.zorderBy(pts.toDF("x", "y"), col("x") * 1024, col("y") * 1024, 16)
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size == 16)
    val sides = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head
      math.max(r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // curve segments of 256 cells sit inside ≤32-wide rectangles even
    // when range-partition cuts straddle quad boundaries
    assert(sides.max <= 32, s"bounding-box sides: $sides")
    // and a single-dimension sort could not do this: prove the layout
    // clusters BOTH dims by checking total bbox area ≪ full area
    val areas = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head
      (r.getLong(1) - r.getLong(0) + 1) * (r.getLong(3) - r.getLong(2) + 1)
    }
    assert(areas.sum <= 64L * 64 * 4, s"areas: $areas") // ≤4× ideal tiling
  }
}
