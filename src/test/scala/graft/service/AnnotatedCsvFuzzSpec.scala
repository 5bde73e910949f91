package graft.service

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-trip fuzz of the annotated-CSV wire dialect: random frames —
  * hostile strings (commas, quotes, CR/LF, quotes-at-edges, empties),
  * nulls in every type, negative/extreme numerics, random column
  * names needing escaping — encoded by [[AnnotatedCsv.write]] and
  * decoded by [[AnnotatedCsv.parse]] must reproduce the frame
  * exactly. A wire format's escaping bugs live precisely in the
  * corners enumeration tests skip.
  */
class AnnotatedCsvFuzzSpec extends SparkSpec {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(31L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  private val nastyStrings = Seq(
    "plain", "has,comma", "has\"quote", "\"leading", "trailing\"",
    "emb\"\"edded", "line\nbreak", "cr\rreturn", "crlf\r\nboth",
    ",", "\"", "", " padded ", "trailing,comma,", "a,\"b\",c",
    "ünïcødé 🎛", "  ", "\"\"")

  private def randomValue(t: DataType): Any =
    if (next(Gen.chooseNum(0, 9)) == 0) null
    else t match {
      case StringType => pick(nastyStrings)
      case LongType => pick(Seq(0L, -1L, 42L, Long.MaxValue, Long.MinValue + 1,
        next(Gen.chooseNum(-100000L, 100000L))))
      case DoubleType => pick(Seq(0.0, -0.5, 3.25, -1e18, 1.5e-9,
        next(Gen.chooseNum(-1000, 1000)) / 8.0)) // dyadic → toString round-trips
      case BooleanType => next(Gen.chooseNum(0, 1)) == 1
      case TimestampType => java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(next(Gen.chooseNum(0L, 4102444800L)),
          next(Gen.chooseNum(0, 1)) * 500000000L))
      case other => sys.error(other.toString)
    }

  test("60 random frames round-trip write -> parse exactly") {
    (0 until 60).foreach { trial =>
      val types = Seq(StringType, LongType, DoubleType, BooleanType, TimestampType)
      val nCols = next(Gen.chooseNum(1, 6))
      val fields = (0 until nCols).map { i =>
        // column names need escaping too
        val name = if (next(Gen.chooseNum(0, 4)) == 0) s"c$i,odd\"name" else s"c$i"
        StructField(name, types(next(Gen.chooseNum(0, types.size - 1))))
      }
      val schema = StructType(fields)
      val nRows = next(Gen.chooseNum(0, 12))
      val rows = (0 until nRows).map { _ =>
        Row.fromSeq(fields.map(f => randomValue(f.dataType)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)

      val wire = AnnotatedCsv.format(df)
      val back = AnnotatedCsv.parse(wire, spark)

      assert(back.schema.fields.map(_.name).toSeq == fields.map(_.name),
        s"trial $trial: column names diverged")
      def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        d.collect().map(_.toSeq.map {
          case t: java.sql.Timestamp => t.toInstant
          case x => x
        }).toSeq.sortBy(_.mkString(""))
      assert(canon(back) == canon(df),
        s"trial $trial diverged; wire:\n${wire.take(1500)}")
    }
  }
}
