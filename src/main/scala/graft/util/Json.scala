package graft.util

/** Minimal JSON string escaping shared by the report/dump writers: quotes,
  * backslashes, and ALL control characters — a newline inside a Spark
  * exception message must not break the one-line-JSON contract. */
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
