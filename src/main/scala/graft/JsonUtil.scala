package graft

/** Single JSON string-escape helper shared by Verify and Bench — one
  * place to get control-character escaping right (a tab or CR in
  * builder-authored SQL once broke the driver's json.load and silently
  * zeroed a round's correctness). */
object JsonUtil {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
