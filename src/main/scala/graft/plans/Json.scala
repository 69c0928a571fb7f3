package graft.plans

/** Minimal dependency-free JSON encode/parse for model persistence (the
  * environment is offline — no jackson/circe beyond Spark's internals, and
  * depending on Spark's shaded copies would be fragile). Supports exactly
  * the subset the persistence layer emits: objects, arrays, strings,
  * numbers (as Double or Long), booleans, null.
  */
object Json {

  def str(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")

  def num(n: Long): String = n.toString
  def num(n: Double): String = n.toString
  def bool(b: Boolean): String = b.toString

  /** Parse into Map[String, Any] / List[Any] / String / Long / Double /
    * Boolean / null. Throws IllegalArgumentException on malformed input.
    */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): Any = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => parseStr()
        case 't' => literal("true", java.lang.Boolean.TRUE)
        case 'f' => literal("false", java.lang.Boolean.FALSE)
        case 'n' => literal("null", null)
        case _   => parseNum()
      }
    }

    private def literal(lit: String, v: Any): Any = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length
      v
    }

    private def parseObj(): Map[String, Any] = {
      expect('{')
      val b = scala.collection.mutable.LinkedHashMap[String, Any]()
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.toMap }
      var done = false
      while (!done) {
        skipWs()
        val k = parseStr()
        expect(':')
        b(k) = value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.toMap
    }

    private def parseArr(): List[Any] = {
      expect('[')
      val b = scala.collection.mutable.ListBuffer[Any]()
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.toList }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.toList
    }

    private def parseStr(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos)
        pos += 1
        c match {
          case '"' => return b.toString
          case '\\' =>
            if (eof) fail("bad escape")
            val e = s.charAt(pos)
            pos += 1
            e match {
              case '"'  => b += '"'
              case '\\' => b += '\\'
              case '/'  => b += '/'
              case 'n'  => b += '\n'
              case 'r'  => b += '\r'
              case 't'  => b += '\t'
              case 'b'  => b += '\b'
              case 'f'  => b += '\f'
              case 'u' =>
                if (pos + 4 > s.length) fail("bad \\u escape")
                b += Integer.parseInt(s.substring(pos, pos + 4), 16).toChar
                pos += 4
              case other => fail(s"bad escape \\$other")
            }
          case other => b += other
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseNum(): Any = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      if (pos == start) fail("expected value")
      val tok = s.substring(start, pos)
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
      else tok.toLong
    }
  }
}
