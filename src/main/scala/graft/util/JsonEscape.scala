package graft.util

/** JSON string escaping shared by the Verify contract dump and the HTTP
  * LLM request builder — backslash, quote, and all control chars.
  */
object JsonEscape {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
