package graft.util

import scala.collection.immutable.ListMap

/** Minimal, dependency-free JSON — parser + renderer for the control plane
  * (task configs, REST bodies, source offsets). Handles the full JSON
  * grammar; numbers surface as `Double` plus a `BigInt`-exact long path.
  * Deliberately tiny: the engine's data path never touches this (envelope
  * JSON is Spark's codegen'd `to_json`); this is config-plane only.
  */
object MiniJson {

  sealed trait JValue {
    def asString: Option[String] = this match {
      case JStr(s) => Some(s); case _ => None
    }
    def asLong: Option[Long] = this match {
      case JNum(raw) => try Some(java.lang.Long.parseLong(raw.trim)) catch {
        case _: NumberFormatException =>
          try Some(raw.trim.toDouble.toLong) catch { case _: Exception => None }
      }
      case _ => None
    }
    def asDouble: Option[Double] = this match {
      case JNum(raw) => try Some(raw.toDouble) catch { case _: Exception => None }
      case _ => None
    }
    def asBool: Option[Boolean] = this match {
      case JBool(b) => Some(b); case _ => None
    }
    def asObj: Option[ListMap[String, JValue]] = this match {
      case JObj(f) => Some(f); case _ => None
    }
    def asArr: Option[Vector[JValue]] = this match {
      case JArr(v) => Some(v); case _ => None
    }
    /** Field lookup (None for absent or non-object). */
    def \(field: String): Option[JValue] = this match {
      case JObj(f) => f.get(field); case _ => None
    }
    def strings(field: String): Seq[String] =
      (this \ field).flatMap(_.asArr).getOrElse(Vector.empty)
        .flatMap(_.asString)
  }
  final case class JObj(fields: ListMap[String, JValue]) extends JValue
  final case class JArr(values: Vector[JValue]) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JNum(raw: String) extends JValue
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  object JObj {
    def of(fields: (String, JValue)*): JObj = JObj(ListMap(fields: _*))
  }

  def str(s: String): JValue = if (s == null) JNull else JStr(s)
  def num(n: Long): JValue = JNum(n.toString)
  def num(n: Double): JValue = JNum(n.toString)
  def bool(b: Boolean): JValue = JBool(b)
  def arr(vs: Seq[JValue]): JValue = JArr(vs.toVector)
  def strArr(vs: Seq[String]): JValue = JArr(vs.map(JStr(_)).toVector)

  // ---------------------------------------------------------------- render
  def render(v: JValue): String = v match {
    case JObj(f) =>
      f.map { case (k, x) => s"${quote(k)}:${render(x)}" }
        .mkString("{", ",", "}")
    case JArr(vs)  => vs.map(render).mkString("[", ",", "]")
    case JStr(s)   => quote(s)
    case JNum(raw) => raw
    case JBool(b)  => b.toString
    case JNull     => "null"
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  // ----------------------------------------------------------------- parse
  final case class JsonError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at $pos")

  def parse(s: String): Either[String, JValue] =
    try {
      val p = new Parser(s)
      val v = p.value()
      p.skipWs()
      if (p.pos < s.length) Left(s"trailing content at ${p.pos}")
      else Right(v)
    } catch {
      case JsonError(m, pos) => Left(s"$m at $pos")
    }

  private final class Parser(s: String) {
    var pos = 0
    def skipWs(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String): Nothing = throw JsonError(msg, pos)
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): JValue = {
      skipWs()
      if (pos >= s.length) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => array()
        case '"' => JStr(string())
        case 't' => literal("true", JBool(true))
        case 'f' => literal("false", JBool(false))
        case 'n' => literal("null", JNull)
        case c if c == '-' || c.isDigit => number()
        case c => fail(s"unexpected '$c'")
      }
    }

    private def literal(lit: String, v: JValue): JValue = {
      if (!s.startsWith(lit, pos)) fail(s"bad literal")
      pos += lit.length
      v
    }

    private def obj(): JValue = {
      expect('{'); skipWs()
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(ListMap.empty) }
      val b = ListMap.newBuilder[String, JValue]
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }

    private def array(): JValue = {
      expect('['); skipWs()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      val b = Vector.newBuilder[JValue]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(b.result())
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          if (pos + 1 >= s.length) fail("bad escape")
          s.charAt(pos + 1) match {
            case '"'  => sb += '"'; pos += 2
            case '\\' => sb += '\\'; pos += 2
            case '/'  => sb += '/'; pos += 2
            case 'b'  => sb += '\b'; pos += 2
            case 'f'  => sb += '\f'; pos += 2
            case 'n'  => sb += '\n'; pos += 2
            case 'r'  => sb += '\r'; pos += 2
            case 't'  => sb += '\t'; pos += 2
            case 'u' =>
              if (pos + 6 > s.length) fail("bad unicode escape")
              val hex = s.substring(pos + 2, pos + 6)
              // validate before parseInt: a malformed escape must surface as
              // JsonError (the Either contract), not NumberFormatException —
              // CdcPartitionReader relies on Left to skip malformed lines
              if (!hex.forall(c => Character.digit(c, 16) >= 0))
                fail(s"bad unicode escape '\\u$hex'")
              sb += Integer.parseInt(hex, 16).toChar
              pos += 6
            case o => fail(s"bad escape '\\$o'")
          }
        } else { sb += c; pos += 1 }
      }
      expect('"')
      sb.toString
    }

    private def number(): JValue = {
      val start = pos
      if (pos < s.length && s.charAt(pos) == '-') pos += 1
      while (pos < s.length && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos))))
        pos += 1
      if (pos == start) fail("bad number")
      JNum(s.substring(start, pos))
    }
  }
}
