package graft

/** JSON string escaping shared by the driver-contract artifacts
  * (Bench's bench_result.json, Verify's _failures.json / oracle_sql
  * .json): backslash, quote, and ALL control chars (<0x20) — a tab or
  * CR in builder-authored SQL would otherwise make the driver's
  * json.load fail and silently zero the round's record. One definition
  * so an escaping fix can never land in one artifact and not the other.
  */
object JsonEscape {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
