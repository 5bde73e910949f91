package graft.lineprotocol

import graft.model.Point
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative fuzz of the line-protocol INGEST boundary (VERDICT r15
  * #5): random Points — hostile tag/field keys needing every escape,
  * all five field types at their numeric edges, ns timestamps
  * including pre-epoch and the int64 rails — serialized by
  * [[LineProtocol.serialize]] must re-parse BIT-EXACTLY, single- and
  * multi-field; and malformed input must fail LOUDLY (ParseError on
  * the strict path, a dropped line on the lenient path), never parse
  * into a wrong Point.
  *
  * Generator honesty: the LP spec makes a backslash immediately before
  * a special character (or at token end) unrepresentable in
  * measurement/tag/key tokens — the dark corner [[LineProtocol
  * .serialize]]'s scaladoc documents, shared with the pinned engine —
  * so token generation excludes exactly that pattern and nothing else.
  * String FIELD values escape fully and fuzz backslashes and quotes
  * freely. Non-finite doubles and raw newlines are excluded (the wire
  * format is line-based and the pinned engine rejects NaN/Inf).
  */
class LpFuzzSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private var seed = Seed(1661L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  // token alphabet: escapables (, = space), unicode, quotes (legal raw
  // in tags/keys), interior backslashes (legal when not before a
  // special), digits, '#' (legal anywhere but line start)
  private val tokenChars: Seq[String] = Seq(
    "a", "B", "7", "_", "-", ".", "µ", "日", "🎛", "\"", "'", ",", " ", "=", "#", "\\x")

  /** Random non-empty token with the unrepresentable backslash shapes
    * (\ before , = space, or trailing) filtered out by construction:
    * backslash only ever appears as the pair "\x".
    */
  private def token(maxLen: Int = 8): String = {
    val s = (0 until next(Gen.chooseNum(1, maxLen))).map(_ => pick(tokenChars)).mkString
    val t = s
    if (t.forall(_ == ' ')) "pad" + t else t // all-spaces trims to empty
  }

  private def measToken(): String = {
    val t = token()
    // a leading '#' makes the whole line a comment; leading spaces trim
    if (t.startsWith("#") || t.startsWith(" ")) "m" + t else t
  }

  private val stringFieldChars: Seq[String] = Seq(
    "a", "Z", "0", " ", ",", "=", "\"", "\\", "\\\\", "\\\"", "µ", "🎛", "'", "#")

  private def randomValue(kind: Int): (Option[Double], Option[Long], Option[Long], Option[String], Option[Boolean]) =
    kind match {
      case 0 => // float: dyadics, integral spellings, extremes
        (Some(pick(Seq(0.0, -0.0, 1.0, -1.5, 3.25, 1e-300, -1.7976931348623157e308,
          4.9e-324, 123456789.0, next(Gen.chooseNum(-1000000, 1000000)) / 64.0))),
          None, None, None, None)
      case 1 => (None, Some(pick(Seq(0L, -1L, 42L, Long.MaxValue, Long.MinValue,
        next(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))))), None, None, None)
      case 2 => (None, None, Some(pick(Seq(0L, 1L, -1L /* = max uint64 */,
        Long.MaxValue, Long.MinValue /* = 2^63 unsigned */,
        next(Gen.chooseNum(0L, Long.MaxValue))))), None, None)
      case 3 =>
        val len = next(Gen.chooseNum(0, 12))
        (None, None, None,
          Some((0 until len).map(_ => pick(stringFieldChars)).mkString), None)
      case _ => (None, None, None, None, Some(next(Gen.chooseNum(0, 1)) == 1))
    }

  private def randomPoint(): Point = {
    val nTags = next(Gen.chooseNum(0, 4))
    // tag keys must be distinct or the map collapses a pair
    val tags = (0 until nTags).map(i => (s"${token(4)}_$i", token(6))).toMap
    val (f, iv, u, s0, b) = randomValue(next(Gen.chooseNum(0, 4)))
    val ts = pick(Seq(0L, -1L, 1L, -2208988800000000000L /* 1900, pre-epoch */,
      1705276800000000001L, Long.MaxValue, Long.MinValue + 1,
      next(Gen.chooseNum(-4102444800L, 4102444800L)) * 1000000000L))
    Point(measToken(), tags, token(6), f, iv, u, s0, b, ts)
  }

  test("1200 random points round-trip serialize -> parseLine bit-exactly") {
    (0 until 1200).foreach { trial =>
      val p = randomPoint()
      val wire = LineProtocol.serialize(p)
      val back = LineProtocol.parseLine(wire, sys.error("default time must not be consulted"))
      assert(back == Seq(p), s"trial $trial diverged\n  wire:  $wire\n  back:  $back\n  point: $p")
    }
  }

  test("300 random multi-field lines parse back to the field list in order") {
    (0 until 300).foreach { trial =>
      val base = randomPoint()
      val k = next(Gen.chooseNum(2, 5))
      val pts = (0 until k).map { i =>
        val (f, iv, u, s0, b) = randomValue(next(Gen.chooseNum(0, 4)))
        base.copy(field = s"${token(5)}_$i", valueF = f, valueI = iv,
          valueU = u, valueS = s0, valueB = b)
      }
      // splice k single-field serializations into one line
      // (meas,tags f0=v0,f1=v1,... ts) by cutting each around a probe
      // field whose assignment text is unique
      val probe = LineProtocol.serialize(base.copy(field = "__probe__",
        valueF = None, valueI = Some(7L), valueU = None, valueS = None, valueB = None))
      val Array(prefix, suffix) = probe.split(java.util.regex.Pattern.quote("__probe__=7i"), 2)
      val fieldPart = pts.map { p =>
        val one = LineProtocol.serialize(p)
        one.substring(prefix.length, one.length - suffix.length)
      }.mkString(",")
      val wire = prefix + fieldPart + suffix
      val back = LineProtocol.parseLine(wire, sys.error("no default"))
      assert(back == pts, s"trial $trial diverged\n  wire: $wire\n  back: $back\n  pts:  $pts")
    }
  }

  test("malformed input fails loudly on the strict path and drops on the lenient path") {
    val bad = Seq(
      "cpu", // no fields
      "cpu ", // no fields, trailing space
      ",host=h f=1", // empty measurement
      "cpu,host f=1", // tag missing '='
      "cpu,host= f=1", // empty tag value
      "cpu,=v f=1", // empty tag key
      "cpu f=tr", // invalid boolean
      "cpu f=\"abc", // unterminated string
      "cpu f=1 12x", // invalid timestamp
      "cpu f=1 1 2", // trailing junk after timestamp
      "cpu f=1.2.3", // invalid float
      "cpu f=", // empty field value
      "cpu f", // field missing '='
      "cpu f=92233720368547758080i", // int64 overflow
      "cpu f=-1u" // negative uint
    )
    bad.foreach { line =>
      intercept[LineProtocol.ParseError](LineProtocol.parseLine(line, 0L))
      assert(LineProtocol.parseLenient(line, 0L) == Nil, s"lenient must drop: $line")
    }
    // blank and comment lines are silence, not errors
    assert(LineProtocol.parseLine("", 0L) == Nil)
    assert(LineProtocol.parseLine("   ", 0L) == Nil)
    assert(LineProtocol.parseLine("# comment line", 0L) == Nil)
  }

  test("precision scaling multiplies supplied timestamps only") {
    val p = LineProtocol.parseLine("m f=1i 1705276800", 99L, tsScaleNs = 1000000000L).head
    assert(p.timeNs == 1705276800000000000L)
    val d = LineProtocol.parseLine("m f=1i", 99L, tsScaleNs = 1000000000L).head
    assert(d.timeNs == 99L, "server-assigned default is already ns — never scaled")
    // pre-epoch supplied timestamps scale through the sign
    val n = LineProtocol.parseLine("m f=1i -10", 99L, tsScaleNs = 1000L).head
    assert(n.timeNs == -10000L)
  }
}
