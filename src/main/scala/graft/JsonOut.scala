package graft

/** The single JSON string escaper for every harness artifact — Verify's
  * `oracle_sql.json`, Bench's stdout line and `BENCH_FULL.json`, the
  * test reporter's `UNIT_RESULTS.json`. Escapes backslash, quote, and
  * ALL control chars (<0x20): a tab or CR in builder-authored SQL would
  * otherwise make the driver's `json.load` fail and silently zero a
  * round's correctness. One copy, so an escaping fix can never reach
  * one artifact and miss a sibling.
  */
object JsonOut {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
