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

  test("quote-everything producers: non-string quoted empties take the column default") {
    // the Go dialect erases quotedness, so a QUOTE_ALL payload spells
    // every defaulted cell "" — numeric columns must still default
    val wire = "#datatype,string,long,double,string\r\n" +
      "#group,false,false,false,false\r\n" +
      "#default,_result,,\"9.5\",\"fallback\"\r\n" +
      ",result,table,\"v\",\"s\"\r\n" +
      "\"\",\"r\",\"0\",\"\",\"\"\r\n"
    val row = AnnotatedCsv.parse(wire, spark).head
    assert(row.getDouble(0) == 9.5, "numeric quoted empty must take the default")
    assert(row.getString(1) == "", // documented residual ambiguity: string "" wins
      "string quoted empty decodes as the empty string")
  }

  test("payloads without transport columns parse (the #datatype marker cell is dropped)") {
    val wire = "#datatype,long,string\r\nn,s\r\n1,x\r\n"
    val rows = AnnotatedCsv.parse(wire, spark).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L && rows.head.getString(1) == "x")
  }

  test("a lone quoted-empty line is a blank separator, not a header or phantom row") {
    val wire = "#datatype,string,long,long\r\n" +
      "\"\"\r\n" + // stray quoted-blank line between annotations and header
      ",result,table,n\r\n" +
      ",,0,7\r\n" +
      "\"\"\r\n" // and as a trailing terminator
    val rows = AnnotatedCsv.parse(wire, spark).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 7L)
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
