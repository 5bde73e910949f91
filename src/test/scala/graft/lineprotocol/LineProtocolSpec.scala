package graft.lineprotocol

import graft.model.Point
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Golden corpus for the line-protocol parser (SURVEY.md §5 item 4):
  * escapes, type suffixes, missing timestamp, ns precision — plus a
  * serialize∘parse round-trip property.
  */
class LineProtocolSpec extends AnyFunSuite {

  private def one(line: String): Point = {
    val ps = LineProtocol.parseLine(line, 42L)
    assert(ps.size == 1, s"expected 1 point, got $ps")
    ps.head
  }

  test("basic float field with ns timestamp") {
    val p = one("cpu,host=h1 usage=0.64 1634567890000000001")
    assert(p.measurement == "cpu")
    assert(p.tags == Map("host" -> "h1"))
    assert(p.field == "usage")
    assert(p.valueF.contains(0.64))
    assert(p.timeNs == 1634567890000000001L) // full ns fidelity
  }

  test("int, uint, bool, string field types") {
    val ps = LineProtocol.parseLine("m f1=1i,f2=2u,f3=true,f4=\"hi\",f5=3.5 7", 0L)
    val byField = ps.map(p => p.field -> p).toMap
    assert(byField("f1").valueI.contains(1L))
    assert(byField("f2").valueU.contains(2L))
    assert(byField("f3").valueB.contains(true))
    assert(byField("f4").valueS.contains("hi"))
    assert(byField("f5").valueF.contains(3.5))
    assert(ps.forall(_.timeNs == 7L))
  }

  test("bool variants t/f/T/F/true/false/True/False") {
    for ((s, b) <- Seq("t" -> true, "T" -> true, "true" -> true, "True" -> true,
        "f" -> false, "F" -> false, "false" -> false, "FALSE" -> false)) {
      assert(one(s"m v=$s 1").valueB.contains(b), s)
    }
  }

  test("missing timestamp gets the caller default") {
    assert(one("m v=1").timeNs == 42L)
  }

  test("negative timestamp (pre-1970)") {
    assert(one("m v=1 -1000").timeNs == -1000L)
  }

  test("escaped comma/space/equals in measurement, tags, field keys") {
    val p = one("""my\,meas\ x,tag\ key=va\=l\,ue field\ key=1 5""")
    assert(p.measurement == "my,meas x")
    assert(p.tags == Map("tag key" -> "va=l,ue"))
    assert(p.field == "field key")
  }

  test("string field escapes quote and backslash") {
    val p = one("""m v="a\"b\\c" 1""")
    assert(p.valueS.contains("a\"b\\c"))
  }

  test("multiple tags sorted independently of input order") {
    val p = one("m,b=2,a=1 v=1 1")
    assert(p.tags == Map("a" -> "1", "b" -> "2"))
  }

  test("blank and comment lines parse to nothing") {
    assert(LineProtocol.parseLine("", 0L).isEmpty)
    assert(LineProtocol.parseLine("   ", 0L).isEmpty)
    assert(LineProtocol.parseLine("# a comment", 0L).isEmpty)
  }

  test("malformed lines throw strict / drop lenient") {
    val bad = Seq(
      "justameasurement",        // no fields
      "m, v=1",                  // empty tag
      "m,t v=1",                 // tag missing '='
      "m v=",                    // empty field value
      "m v=1x2 1",               // invalid number
      "m v=\"unterminated 1",    // unterminated string
      "m v=1 12z4"               // invalid timestamp
    )
    for (line <- bad) {
      assertThrows[LineProtocol.ParseError](LineProtocol.parseLine(line, 0L))
      assert(LineProtocol.parseLenient(line, 0L).isEmpty, line)
    }
  }

  test("uint accepts full unsigned 64-bit range") {
    val p = one("m v=18446744073709551615u 1")
    assert(p.valueU.contains(-1L)) // stored as signed bits
    assert(LineProtocol.serialize(p).contains("18446744073709551615u"))
  }

  private val tagStr = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val weird = Gen.oneOf("a b", "a,b", "a=b", "a\\b", "späce", "x")

  test("serialize -> parse round-trip (property)") {
    val gen = for {
      meas <- Gen.oneOf(tagStr, weird.suchThat(_.nonEmpty))
      nTags <- Gen.choose(0, 3)
      tags <- Gen.mapOfN(nTags, Gen.zip(tagStr, Gen.oneOf(tagStr, weird)))
      field <- tagStr
      ts <- Gen.choose(-1000000000000L, 2000000000000000000L)
      value <- Gen.oneOf[Any](
        Gen.choose(-1e6, 1e6).map(identity[Double]),
        Gen.choose(Long.MinValue, Long.MaxValue).map(identity[Long]),
        Gen.oneOf(true, false),
        Gen.oneOf(tagStr, weird, Gen.const("a\"b\\c")))
    } yield {
      val p = value match {
        case d: Double => Point(meas, tags, field, Some(d), None, None, None, None, ts)
        case l: Long => Point(meas, tags, field, None, Some(l), None, None, None, ts)
        case b: Boolean => Point(meas, tags, field, None, None, None, None, Some(b), ts)
        case s: String => Point(meas, tags, field, None, None, None, Some(s), None, ts)
      }
      p
    }
    var seed = Seed(42L)
    (1 to 300).foreach { _ =>
      val p = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val line = LineProtocol.serialize(p)
      val parsed = LineProtocol.parseLine(line, 0L)
      assert(parsed == Seq(p), s"round-trip failed for: $line")
    }
  }

  test("precision= scales supplied timestamps; absent timestamps get server ns") {
    val rawTs = 1705276800L // 2024-01-15T00:00:00Z in SECONDS
    val wantNs = rawTs * 1000000000L
    val serverNs = 42L
    val cases = Seq( // precision -> raw timestamp written at that unit
      ("ns", wantNs), ("us", rawTs * 1000000L), ("ms", rawTs * 1000L), ("s", rawTs))
    for ((p, raw) <- cases) {
      val scale = LineProtocol.precisionScale(p).get
      val withTs = LineProtocol.parseLine(s"cpu,host=h1 usage=0.5 $raw", serverNs, scale)
      assert(withTs.head.timeNs == wantNs, s"precision=$p")
      // no timestamp on the line: server default is already ns — unscaled
      val noTs = LineProtocol.parseLine("cpu,host=h1 usage=0.5", serverNs, scale)
      assert(noTs.head.timeNs == serverNs, s"precision=$p default")
    }
    assert(LineProtocol.precisionScale("m").isEmpty)
  }
}
