package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  def sc = spark.sparkContext
}
