package graft.util

import scala.collection.mutable

/** Minimal JSON reader/writer (zero-dependency; offline sandbox).
  * Used for the W3C manifest + map-test oracles in the test harness
  * and for pipeline snapshot manifests. Not performance-critical.
  */
object MiniJson {
  sealed trait J
  final case class JStr(v: String) extends J
  final case class JNum(v: Double) extends J
  final case class JBool(v: Boolean) extends J
  case object JNull extends J
  final case class JArr(v: Vector[J]) extends J
  final case class JObj(v: Vector[(String, J)]) extends J {
    def apply(k: String): Option[J] = v.collectFirst { case (`k`, x) => x }
    def str(k: String): Option[String] = apply(k).collect { case JStr(s) => s }
  }

  def parse(s: String): J = {
    val p = new P(s)
    val r = p.value()
    p.ws()
    require(p.eof, "trailing JSON content")
    r
  }

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i")
      i += 1
    }
    def value(): J = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _   => num()
      }
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val b = Vector.newBuilder[(String, J)]
      if (s.charAt(i) == '}') { i += 1; return JObj(b.result()) }
      var done = false
      while (!done) {
        ws()
        val k = string()
        ws(); expect(':')
        val v = value()
        b += ((k, v))
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[J]
      if (s.charAt(i) == ']') { i += 1; return JArr(b.result()) }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
      }
      JArr(b.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new mutable.StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"'  => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/'  => sb.append('/'); i += 1
            case 'b'  => sb.append('\b'); i += 1
            case 'f'  => sb.append('\f'); i += 1
            case 'n'  => sb.append('\n'); i += 1
            case 'r'  => sb.append('\r'); i += 1
            case 't'  => sb.append('\t'); i += 1
            case 'u' =>
              val h = Integer.parseInt(s.substring(i + 1, i + 5), 16)
              sb.append(h.toChar); i += 5
            case e => throw new IllegalArgumentException(s"bad escape \\$e")
          }
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    private def num(): JNum = {
      val start = i
      while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
      JNum(s.substring(start, i).toDouble)
    }
  }

  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => "\"" + escape(k) + "\":\"" + escape(v) + "\"" }
      .mkString("{", ",", "}")
}
