package graft.core

/** Minimal JSON string escaping shared by every artifact writer
  * (Verify's oracle_sql.json / verify_errors.json, Bench's
  * BENCH_LOCAL.json `failed` map). One implementation so the escapers
  * cannot drift: backslash, quote, and ALL control chars (<0x20) — a
  * tab or CR in builder-authored SQL or an exception message would
  * otherwise make the driver's json.load fail and silently void the
  * round's artifact. */
object Json {
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
