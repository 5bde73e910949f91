package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r18 width formula: the AQE start width derives from measured
  * input bytes (one partition per MiB of compressed input against the
  * 64 MiB advisory, i.e. up to 64× scan→shuffle expansion), clamped to
  * [cores, MaxInitialWidth]. The three decades the formula must serve
  * are pinned as cases: toy corpora start at core count (the r17
  * constant's judge-confirmed ~4% toy tax is structurally impossible),
  * the measured 100× decade starts ≥ its empirically-required 1024,
  * and a 1000× corpus starts wider than the removed constant ever did.
  */
class SparkTuningSpec extends AnyFunSuite {

  test("initialWidth: toy corpus → core count (no toy tax)") {
    // sf0.1 is ~17 MiB: far below cores MiB → clamp to cores
    assert(SparkTuning.initialWidth(32, 17L << 20) == 32)
    assert(SparkTuning.initialWidth(4, 0L) == 4)
    assert(SparkTuning.initialWidth(32, 1L) == 32)
  }

  test("initialWidth: the measured 100× decade starts at least as wide as its spill floor") {
    // r16 evidence: the 1.6 GiB 100× corpus needed ≥1024-way for
    // substr_trim to stay off the sort-spill cliff
    val w = SparkTuning.initialWidth(32, 1638L << 20)
    assert(w >= 1024, s"100x corpus must start >= 1024-way, got $w")
    assert(w == 1639) // exact: one per MiB + 1
  }

  test("initialWidth: a 1000× corpus starts wider than the removed r17 constant") {
    val w = SparkTuning.initialWidth(32, 16L << 30)
    assert(w > 1024 && w > 32 * 32, s"third decade must outgrow the old constant, got $w")
    assert(w == 16385)
  }

  test("initialWidth clamps at MaxInitialWidth") {
    assert(SparkTuning.initialWidth(32, 1L << 50) == SparkTuning.MaxInitialWidth)
  }

  test("initialWidth is monotone in bytes and never below cores") {
    var prev = 0
    for (mb <- Seq(0L, 1L, 64L, 512L, 4096L, 65536L, 1L << 22)) {
      val w = SparkTuning.initialWidth(16, mb << 20)
      assert(w >= 16 && w >= prev, s"non-monotone at ${mb}MiB: $prev -> $w")
      prev = w
    }
  }

  test("dirBytes sizes regular files recursively and follows symlinks (scale-probe layout)") {
    val root = java.nio.file.Files.createTempDirectory("graft-tuning-spec")
    val sub = java.nio.file.Files.createDirectories(root.resolve("t.parquet"))
    java.nio.file.Files.write(sub.resolve("part-0"), new Array[Byte](1000))
    java.nio.file.Files.write(sub.resolve("part-1"), new Array[Byte](500))
    // a linked table (the ScaleProbe rides untouched tables via symlink)
    val other = java.nio.file.Files.createTempDirectory("graft-tuning-linked")
    java.nio.file.Files.write(other.resolve("part-0"), new Array[Byte](2000))
    java.nio.file.Files.createSymbolicLink(root.resolve("linked.parquet"), other)
    assert(SparkTuning.dirBytes(root.toString) == 3500L)
    // missing path sizes as 0 — width falls back to cores, never throws
    assert(SparkTuning.dirBytes(root.resolve("nope").toString) == 0L)
  }

  test("refreshWidth only ever raises the live session's start width (monotone)") {
    val spark = SparkTestSession.spark
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val before = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "64")
      // a smaller corpus measurement must NOT narrow a live session
      SparkTuning.refreshWidth(spark, 4, 1L << 20)
      assert(spark.conf.get(key) == "64")
      // growth raises it
      SparkTuning.refreshWidth(spark, 4, 999L << 20)
      assert(spark.conf.get(key) == "1000")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
