package graft.service

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The /api/v2/delete predicate grammar of the pinned engine: conjunctions
  * of `key="value"` equality clauses (reference README's delete examples;
  * the 2.x delete API supports only `=` and `AND`). `_measurement` and
  * `_field` address the canonical columns; any other key addresses a tag.
  */
object DeletePredicate {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  // one clause, anchored to the previous match (\G), consuming a trailing
  // AND or end-of-input — so a quoted value containing " AND " can't split
  private val Clause = java.util.regex.Pattern.compile(
    """\G\s*([A-Za-z0-9_]+)\s*=\s*"((?:[^"\\]|\\.)*)"\s*(?:(?i:AND)\s+|$)""")

  def parse(s: String): Column = {
    val m = Clause.matcher(s)
    var cols = List.empty[Column]
    var consumed = 0
    while (m.find()) {
      val v = m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
      cols ::= (m.group(1) match {
        case "_measurement" => col("measurement") <=> lit(v)
        case "_field" => col("field") <=> lit(v)
        // null-safe equality: a row without the tag must evaluate the
        // clause to false, not null — delete's keep-filter negates the
        // predicate, and !(null) would silently drop non-matching rows
        case tag => col("tags").getItem(tag) <=> lit(v)
      })
      consumed = m.end()
    }
    if (cols.isEmpty || consumed != s.length)
      throw ParseError(s"unsupported delete predicate: '${s.drop(consumed).trim.take(60)}'")
    cols.reverse.reduce(_ && _)
  }
}
