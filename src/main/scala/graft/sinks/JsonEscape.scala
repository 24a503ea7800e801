package graft.sinks

/** The one JSON string escaper for hand-built sink output (quote,
  * backslash, and all control chars < 0x20) — shared so the sinks can never
  * drift on what valid JSON they emit. */
object JsonEscape {
  def apply(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
