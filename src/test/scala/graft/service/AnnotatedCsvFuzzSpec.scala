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

  test("single-column string table: a quoted-empty row survives the round trip") {
    // the one-cell `""` record is data in a width-1 table (the r15
    // carve-out, now fixed) — and still a separator in wider tables
    val wire = "#datatype,string\r\ns\r\n\"\"\r\nx\r\n\r\n"
    val rows = AnnotatedCsv.parse(wire, spark).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("", "x"),
      "quoted-empty row must decode as the empty string in a 1-column table")
    // unquoted blank line stays a separator even at width 1
    val wire2 = "#datatype,string\r\ns\r\n\r\nx\r\n"
    assert(AnnotatedCsv.parse(wire2, spark).collect().map(_.getString(0)).toSeq == Seq("x"))
    // … and a quoted empty in a width-1 NON-string table without a
    // default is a stray separator — `""` cannot be a long, so keeping
    // it would fabricate a phantom null row
    val wire3 = "#datatype,long\r\nn\r\n\"\"\r\n7\r\n"
    assert(AnnotatedCsv.parse(wire3, spark).collect().map(_.getLong(0)).toSeq == Seq(7L))
    // but WITH a #default it is a defaulted data cell (cell()'s
    // QUOTE_ALL rule), so the row survives and takes the default
    val wire4 = "#datatype,long\r\n#default,5\r\nn\r\n\"\"\r\n7\r\n"
    assert(AnnotatedCsv.parse(wire4, spark).collect().map(_.getLong(0)).toSeq == Seq(5L, 7L))
  }

  test("multi-table payload: parseResults exposes the result-set map; parse unions same-schema") {
    import org.apache.spark.sql.DataFrame
    def frame(rows: Seq[(String, Long)]): DataFrame = {
      val schema = StructType(Seq(StructField("k", StringType), StructField("n", LongType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1), schema)
    }
    val a = frame(Seq(("x", 1L), ("y", 2L)))
    val b = frame(Seq(("z", 3L)))
    val two = AnnotatedCsv.format(a, resultName = "alpha") +
      AnnotatedCsv.format(b, resultName = "beta")
    val rs = AnnotatedCsv.parseResults(two, spark)
    assert(rs.map(_._1) == Seq("alpha", "beta"))
    assert(rs.head._2.collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y"))
    assert(rs(1)._2.collect().map(_.getLong(1)).toSeq == Seq(3L))
    // same schema across blocks → parse unions
    assert(AnnotatedCsv.parse(two, spark).count() == 3)
    // different schemas → loud ambiguity error naming the results
    val c = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1.5)), 1),
      StructType(Seq(StructField("v", DoubleType))))
    val mixed = two + AnnotatedCsv.format(c, resultName = "gamma")
    val e = intercept[IllegalArgumentException](AnnotatedCsv.parse(mixed, spark))
    assert(e.getMessage.contains("alpha") && e.getMessage.contains("gamma"))
  }

  test("20 random multi-table payloads round-trip through parseResults") {
    (0 until 20).foreach { trial =>
      val types = Seq(StringType, LongType, DoubleType, BooleanType, TimestampType)
      def randomFrame(): org.apache.spark.sql.DataFrame = {
        val nCols = next(Gen.chooseNum(1, 6))
        val fields = (0 until nCols).map { i =>
          val name = if (next(Gen.chooseNum(0, 4)) == 0) s"c$i,odd\"name" else s"c$i"
          StructField(name, types(next(Gen.chooseNum(0, types.size - 1))))
        }
        val rows = (0 until next(Gen.chooseNum(0, 8))).map { _ =>
          Row.fromSeq(fields.map(f => randomValue(f.dataType)))
        }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), StructType(fields))
      }
      def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        d.collect().map(_.toSeq.map {
          case t: java.sql.Timestamp => t.toInstant
          case x => x
        }).toSeq.sortBy(_.mkString(""))
      val frames = (0 until next(Gen.chooseNum(2, 4))).map(i => (s"r$i", randomFrame()))
      val wire = frames.map { case (rn, df) =>
        AnnotatedCsv.format(df, resultName = rn)
      }.mkString
      val rs = AnnotatedCsv.parseResults(wire, spark)
      assert(rs.map(_._1) == frames.map(_._1), s"trial $trial: result names diverged")
      frames.zip(rs).foreach { case ((rn, df), (_, back)) =>
        assert(back.schema.fields.map(_.name).toSeq == df.schema.fields.map(_.name).toSeq,
          s"trial $trial/$rn: column names diverged")
        assert(canon(back) == canon(df),
          s"trial $trial/$rn diverged; wire:\n${wire.take(1500)}")
      }
    }
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
