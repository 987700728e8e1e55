package graft.e2e

import scala.collection.mutable

/** Minimal TOML reader covering the subset the reference's e2e
  * fixtures use (`/root/reference/tests/_*_/test.toml`, parsed there
  * by go-toml in `cmd/e2e-test/e2etesting.go:32-156`): table headers
  * `[a.b]`, array-of-tables `[[a.b]]`, `key = value` with basic
  * strings, integers, floats (incl. `nan`), booleans, (multi-line)
  * arrays, and inline tables. Comments (`#` to end of line, outside
  * strings) are skipped.
  *
  * Not a general TOML implementation on purpose — no dotted keys,
  * dates, or multi-line strings; the fixtures don't use them and the
  * build allows no third-party parser dependency.
  */
object Toml {

  sealed trait Value
  final case class TStr(v: String) extends Value
  final case class TInt(v: Long) extends Value
  final case class TFloat(v: Double) extends Value
  final case class TBool(v: Boolean) extends Value
  final case class TArr(v: Vector[Value]) extends Value
  final case class TTable(v: Map[String, Value]) extends Value

  /** Navigation helpers on a parsed table. */
  implicit final class ValueOps(private val v: Value) extends AnyVal {
    def table: Map[String, Value] = v match {
      case TTable(m) => m
      case other     => sys.error(s"expected table, got $other")
    }
    def arr: Vector[Value] = v match {
      case TArr(a) => a
      case other   => sys.error(s"expected array, got $other")
    }
    def str: String = v match {
      case TStr(s) => s
      case other   => sys.error(s"expected string, got $other")
    }
    def num: Double = v match {
      case TFloat(d) => d
      case TInt(i)   => i.toDouble
      case other     => sys.error(s"expected number, got $other")
    }
    def int: Long = v match {
      case TInt(i)   => i
      case TFloat(d) => d.toLong
      case other     => sys.error(s"expected integer, got $other")
    }
    def bool: Boolean = v match {
      case TBool(b) => b
      case other    => sys.error(s"expected boolean, got $other")
    }
    def get(key: String): Option[Value] = v.table.get(key)
    def apply(key: String): Value =
      v.table.getOrElse(key, sys.error(s"missing key $key"))
    def getStr(key: String, default: String = ""): String =
      get(key).map(_.str).getOrElse(default)
    def getInt(key: String, default: Long = 0L): Long =
      get(key).map(_.int).getOrElse(default)
    def getArr(key: String): Vector[Value] =
      get(key).map(_.arr).getOrElse(Vector.empty)
  }

  /** Parse a TOML document into its root table. */
  def parse(text: String): Value = new Parser(text).parseDocument()

  private final class Parser(text: String) {
    private var pos = 0

    private def eof: Boolean = pos >= text.length
    private def peek: Char = text.charAt(pos)

    /** Skip whitespace, newlines, and comments. */
    private def skipAll(): Unit = {
      while (!eof) {
        val c = peek
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else if (c == '#') { while (!eof && peek != '\n') pos += 1 }
        else return
      }
    }

    /** Skip spaces/tabs only (not newlines). */
    private def skipInline(): Unit =
      while (!eof && (peek == ' ' || peek == '\t')) pos += 1

    def parseDocument(): Value = {
      // root is mutable nested structure: tables as mutable maps,
      // arrays-of-tables as mutable buffers
      val root = mutable.LinkedHashMap.empty[String, Any]
      var current: mutable.LinkedHashMap[String, Any] = root

      def descend(path: Seq[String], arrayMode: Boolean): mutable.LinkedHashMap[String, Any] = {
        var node = root
        for ((seg, i) <- path.zipWithIndex) {
          val last = i == path.length - 1
          node.get(seg) match {
            case Some(m: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
              if (last && arrayMode) sys.error(s"[[${path.mkString(".")}]] conflicts with table")
              node = m
            case Some(b: mutable.ArrayBuffer[Any @unchecked]) =>
              if (last && arrayMode) {
                val fresh = mutable.LinkedHashMap.empty[String, Any]
                b += fresh
                node = fresh
              } else
                node = b.last.asInstanceOf[mutable.LinkedHashMap[String, Any]]
            case None =>
              if (last && arrayMode) {
                val buf = mutable.ArrayBuffer.empty[Any]
                val fresh = mutable.LinkedHashMap.empty[String, Any]
                buf += fresh
                node(seg) = buf
                node = fresh
              } else {
                val fresh = mutable.LinkedHashMap.empty[String, Any]
                node(seg) = fresh
                node = fresh
              }
            case Some(other) => sys.error(s"key ${path.mkString(".")} is a value: $other")
          }
        }
        node
      }

      skipAll()
      while (!eof) {
        if (peek == '[') {
          val arrayMode = pos + 1 < text.length && text.charAt(pos + 1) == '['
          pos += (if (arrayMode) 2 else 1)
          skipInline()
          val path = mutable.ArrayBuffer.empty[String]
          var done = false
          while (!done) {
            path += parseKey()
            skipInline()
            if (!eof && peek == '.') { pos += 1; skipInline() }
            else done = true
          }
          expect(']'); if (arrayMode) expect(']')
          current = descend(path.toSeq, arrayMode)
        } else {
          val key = parseKey()
          skipInline(); expect('='); skipInline()
          current(key) = parseValue()
        }
        skipAll()
      }
      freeze(root)
    }

    private def freeze(v: Any): Value = v match {
      case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
        TTable(m.map { case (k, x) => k -> freeze(x) }.toMap)
      case b: mutable.ArrayBuffer[Any @unchecked] => TArr(b.map(freeze).toVector)
      case value: Value                           => value
      case other                                  => sys.error(s"unexpected node $other")
    }

    private def expect(c: Char): Unit = {
      if (eof || peek != c) sys.error(s"expected '$c' at offset $pos")
      pos += 1
    }

    private def parseKey(): String = {
      skipInline()
      if (!eof && (peek == '"' || peek == '\'')) parseString()
      else {
        val start = pos
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) pos += 1
        if (pos == start) sys.error(s"empty key at offset $pos")
        text.substring(start, pos)
      }
    }

    private def parseString(): String = {
      val quote = peek
      pos += 1
      val sb = new StringBuilder
      while (!eof && peek != quote) {
        if (quote == '"' && peek == '\\' && pos + 1 < text.length) {
          pos += 1
          sb.append(peek match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\\' => '\\'
            case other => other
          })
          pos += 1
        } else { sb.append(peek); pos += 1 }
      }
      expect(quote)
      sb.toString
    }

    private def parseValue(): Value = {
      skipInline()
      if (eof) sys.error("unexpected end of input")
      peek match {
        case '"' | '\'' => TStr(parseString())
        case '[' =>
          pos += 1
          val items = mutable.ArrayBuffer.empty[Value]
          skipAll()
          while (!eof && peek != ']') {
            items += parseValue()
            skipAll()
            if (!eof && peek == ',') { pos += 1; skipAll() }
          }
          expect(']')
          TArr(items.toVector)
        case '{' =>
          pos += 1
          val m = mutable.LinkedHashMap.empty[String, Value]
          skipInline()
          while (!eof && peek != '}') {
            val k = parseKey()
            skipInline(); expect('='); skipInline()
            m(k) = parseValue()
            skipInline()
            if (!eof && peek == ',') { pos += 1; skipInline() }
          }
          expect('}')
          TTable(m.toMap)
        case _ =>
          val start = pos
          while (!eof && !",]}\n\r#".contains(peek) && peek != ' ' && peek != '\t') pos += 1
          val tok = text.substring(start, pos)
          tok match {
            case "true"           => TBool(true)
            case "false"          => TBool(false)
            case "nan" | "+nan" | "-nan" => TFloat(Double.NaN)
            case "inf" | "+inf"   => TFloat(Double.PositiveInfinity)
            case "-inf"           => TFloat(Double.NegativeInfinity)
            case t if t.matches("[+-]?[0-9_]+") => TInt(t.replace("_", "").toLong)
            case t =>
              try TFloat(t.replace("_", "").toDouble)
              catch { case _: NumberFormatException => sys.error(s"bad value '$t' at $start") }
          }
      }
    }
  }
}
