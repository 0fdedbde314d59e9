package graft.config

import scala.collection.mutable.ArrayBuffer

import graft.ConfigError

/** Minimal-subset YAML reader (reference: config_loader.py:18,206 —
  * `yaml.safe_load` over data/queries.yml and agol_metadata.yml).
  * Parses exactly the subset those files use:
  *
  *   - block mappings nested by space indentation
  *   - block sequences (`- item`) and flow sequences (`[a, "b"]`)
  *   - plain / double-quoted / single-quoted scalars, including
  *     multi-line double-quoted scalars with YAML line folding
  *     (newline → space, blank line → newline)
  *   - `#` comments (full-line and trailing) and blank lines
  *   - scalar typing: booleans, null/~, integers, floats → typed
  *     [[YValue]]s; everything else a string
  *
  * Deliberately NOT a full YAML engine: tabs in indentation,
  * anchors/aliases (`&`/`*`), tags (`!`), directives (`%`),
  * document markers (`---`/`...`), and flow mappings (`{…}`) raise
  * a typed [[graft.ConfigError]] naming the line — the same
  * fail-loud posture the Settings loader takes, and far safer than
  * silently mis-parsing a construct this subset does not model.
  */
object Yaml {

  sealed trait YValue {
    /** Render back to the scalar string a config consumer wants. */
    def asString: String = this match {
      case YStr(s)    => s
      case YBool(b)   => b.toString
      case YLong(v)   => v.toString
      case YDouble(v) => v.toString
      case YNull      => ""
      case other      => throw new ConfigError(
        s"expected scalar, found ${other.getClass.getSimpleName}")
    }
  }
  case object YNull extends YValue
  final case class YBool(v: Boolean) extends YValue
  final case class YLong(v: Long) extends YValue
  final case class YDouble(v: Double) extends YValue
  final case class YStr(v: String) extends YValue
  final case class YList(items: Vector[YValue]) extends YValue
  final case class YMap(entries: Vector[(String, YValue)]) extends YValue {
    def get(key: String): Option[YValue] = entries.collectFirst {
      case (k, v) if k == key => v
    }
    def keys: Vector[String] = entries.map(_._1)
  }

  def parseFile(path: String): YValue =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  // one logical (possibly quote-joined) line: indent, content, lineNo
  private final case class Line(indent: Int, text: String, no: Int)

  def parse(source: String): YValue = {
    val lines = logicalLines(source)
    if (lines.isEmpty) YNull
    else {
      val (v, next) = parseBlock(lines, 0, lines(0).indent)
      if (next < lines.length)
        fail(lines(next).no, s"unexpected de-indented content '${lines(next).text}'")
      v
    }
  }

  private def fail(lineNo: Int, msg: String): Nothing =
    throw new ConfigError(s"YAML parse error: $msg",
      Map("line" -> lineNo.toString, "stage" -> "config"))

  /** Split raw text into logical lines: strip comments/blanks,
    * validate indentation, join multi-line double-quoted scalars
    * (with YAML folding) onto their opening line.
    */
  private def logicalLines(source: String): Vector[Line] = {
    val raw = source.split("\n", -1)
    val out = ArrayBuffer.empty[Line]
    var i = 0
    while (i < raw.length) {
      val lineNo = i + 1
      val line = raw(i)
      val indent = line.takeWhile(_ == ' ').length
      val body0 = line.substring(indent)
      if (body0.startsWith("\t") || line.take(indent + 1).contains('\t'))
        fail(lineNo, "tab in indentation (YAML requires spaces)")
      if (body0.startsWith("%")) fail(lineNo, "YAML directives unsupported")
      if (body0.startsWith("---") || body0.startsWith("..."))
        fail(lineNo, "multi-document YAML unsupported")
      val body = stripComment(body0, lineNo)
      if (body.nonEmpty) {
        // join an unterminated double-quoted scalar across lines
        var text = body
        if (hasOpenDoubleQuote(text)) {
          val folded = new StringBuilder(text)
          var closed = false
          while (!closed) {
            i += 1
            if (i >= raw.length) fail(lineNo, "unterminated double-quoted scalar")
            val cont = raw(i).trim
            if (cont.isEmpty) folded.append("\n")
            else {
              if (folded.last != '\n') folded.append(' ')
              folded.append(cont)
            }
            if (!hasOpenDoubleQuote(folded.toString)) closed = true
          }
          text = folded.toString
        }
        out += Line(indent, text, lineNo)
      }
      i += 1
    }
    out.toVector
  }

  /** Comment starts at an unquoted `#` preceded by start-of-line or
    * whitespace (YAML's rule; `tags#x` inside a value is data).
    */
  private def stripComment(s: String, lineNo: Int): String = {
    var inS = false; var inD = false
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (inD) {
        if (c == '\\') k += 1
        else if (c == '"') inD = false
      } else if (inS) {
        if (c == '\'') inS = false
      } else c match {
        case '"'  => inD = true
        case '\'' => inS = true
        case '#' if k == 0 || s.charAt(k - 1) == ' ' || s.charAt(k - 1) == '\t' =>
          return s.substring(0, k).reverse.dropWhile(ch => ch == ' ' || ch == '\t').reverse
        case _ =>
      }
      k += 1
    }
    // an unterminated double quote is legal here (multi-line scalar);
    // an unterminated single quote is not a construct the subset uses
    if (inS) fail(lineNo, "unterminated single-quoted scalar")
    s.reverse.dropWhile(ch => ch == ' ' || ch == '\t').reverse
  }

  private def hasOpenDoubleQuote(s: String): Boolean = {
    var inD = false
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (inD) {
        if (c == '\\') k += 1 else if (c == '"') inD = false
      } else if (c == '"') inD = true
      k += 1
    }
    inD
  }

  /** Parse the block starting at `idx`, whose members sit at exactly
    * `indent`; returns (value, index of first line after the block).
    */
  private def parseBlock(lines: Vector[Line], idx: Int, indent: Int): (YValue, Int) = {
    val first = lines(idx)
    if (first.text.startsWith("- ") || first.text == "-") parseSeq(lines, idx, indent)
    else parseMap(lines, idx, indent)
  }

  private def parseSeq(lines: Vector[Line], start: Int, indent: Int): (YValue, Int) = {
    val items = ArrayBuffer.empty[YValue]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val l = lines(i)
      val rest = if (l.text == "-") "" else l.text.substring(2).trim
      if (rest.isEmpty) {
        // nested block under the dash
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
          items += v; i = next
        } else { items += YNull; i += 1 }
      } else if (rest.contains(": ") || rest.endsWith(":")) {
        // inline "- key: value" compact mapping: re-parse as a map
        // whose first entry sits 2 columns deeper
        val synthetic = Line(indent + 2, rest, l.no)
        val tail = lines.drop(i + 1)
        val block = synthetic +: tail.takeWhile(_.indent >= indent + 2)
        val (v, consumed) = parseMap(block.toVector, 0, indent + 2)
        items += v
        i = i + 1 + (consumed - 1)
      } else { items += scalar(rest, l.no); i += 1 }
    }
    (YList(items.toVector), i)
  }

  private def parseMap(lines: Vector[Line], start: Int, indent: Int): (YValue, Int) = {
    val entries = ArrayBuffer.empty[(String, YValue)]
    var i = start
    while (i < lines.length && lines(i).indent == indent) {
      val l = lines(i)
      if (l.indent != indent) fail(l.no, "inconsistent indentation")
      val colon = keyColon(l.text, l.no)
      val key = unquoteKey(l.text.substring(0, colon).trim, l.no)
      val after = l.text.substring(colon + 1).trim
      if (after.isEmpty) {
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
          entries += key -> v; i = next
        } else { entries += key -> YNull; i += 1 }
      } else {
        entries += key -> scalar(after, l.no)
        i += 1
      }
    }
    (YMap(entries.toVector), i)
  }

  /** Index of the key-terminating colon (outside quotes, followed by
    * space or end-of-line).
    */
  private def keyColon(s: String, lineNo: Int): Int = {
    var inS = false; var inD = false
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (inD) { if (c == '\\') k += 1 else if (c == '"') inD = false }
      else if (inS) { if (c == '\'') inS = false }
      else c match {
        case '"'  => inD = true
        case '\'' => inS = true
        case ':' if k + 1 == s.length || s.charAt(k + 1) == ' ' => return k
        case _ =>
      }
      k += 1
    }
    fail(lineNo, s"expected 'key: value', got '$s'")
  }

  private def unquoteKey(k: String, lineNo: Int): String =
    if (k.startsWith("\"") && k.endsWith("\"") && k.length >= 2)
      unescapeDouble(k.substring(1, k.length - 1), lineNo)
    else if (k.startsWith("'") && k.endsWith("'") && k.length >= 2)
      k.substring(1, k.length - 1).replace("''", "'")
    else k

  private def scalar(s: String, lineNo: Int): YValue = {
    if (s.startsWith("&") || s.startsWith("*"))
      fail(lineNo, "YAML anchors/aliases unsupported")
    if (s.startsWith("!")) fail(lineNo, "YAML tags unsupported")
    if (s.startsWith("{")) fail(lineNo, "flow mappings unsupported")
    if (s.startsWith("|") || s.startsWith(">"))
      fail(lineNo, "block scalars unsupported (use quoted scalars)")
    if (s.startsWith("[")) return flowList(s, lineNo)
    if (s.startsWith("\"")) {
      if (!s.endsWith("\"") || s.length < 2 || hasOpenDoubleQuote(s))
        fail(lineNo, "unterminated double-quoted scalar")
      return YStr(unescapeDouble(s.substring(1, s.length - 1), lineNo))
    }
    if (s.startsWith("'")) {
      if (!s.endsWith("'") || s.length < 2)
        fail(lineNo, "unterminated single-quoted scalar")
      return YStr(s.substring(1, s.length - 1).replace("''", "'"))
    }
    s match {
      case "null" | "Null" | "NULL" | "~" => YNull
      case "true" | "True" | "TRUE"       => YBool(true)
      case "false" | "False" | "FALSE"    => YBool(false)
      case _ =>
        if (s.matches("[-+]?\\d+"))
          try YLong(s.toLong) catch { case _: NumberFormatException => YStr(s) }
        else if (s.matches("[-+]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][-+]?\\d+)?") && s.exists(c => c == '.' || c == 'e' || c == 'E'))
          try YDouble(s.toDouble) catch { case _: NumberFormatException => YStr(s) }
        else YStr(s)
    }
  }

  private def flowList(s: String, lineNo: Int): YValue = {
    if (!s.endsWith("]")) fail(lineNo, "unterminated flow sequence")
    val inner = s.substring(1, s.length - 1).trim
    if (inner.isEmpty) return YList(Vector.empty)
    val items = ArrayBuffer.empty[String]
    var depth = 0; var inS = false; var inD = false
    val cur = new StringBuilder
    var k = 0
    while (k < inner.length) {
      val c = inner.charAt(k)
      if (inD) { cur.append(c); if (c == '\\') { k += 1; if (k < inner.length) cur.append(inner.charAt(k)) } else if (c == '"') inD = false }
      else if (inS) { cur.append(c); if (c == '\'') inS = false }
      else c match {
        case '"'  => inD = true; cur.append(c)
        case '\'' => inS = true; cur.append(c)
        case '['  => depth += 1; cur.append(c)
        case ']'  => depth -= 1; cur.append(c)
        case ',' if depth == 0 => items += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      k += 1
    }
    items += cur.toString
    YList(items.map(it => scalar(it.trim, lineNo)).toVector)
  }

  private def unescapeDouble(s: String, lineNo: Int): String = {
    val out = new StringBuilder
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (c == '\\' && k + 1 < s.length) {
        k += 1
        s.charAt(k) match {
          case 'n'  => out.append('\n')
          case 't'  => out.append('\t')
          case 'r'  => out.append('\r')
          case '"'  => out.append('"')
          case '\\' => out.append('\\')
          case '0'  => out.append('\u0000')
          case other => fail(lineNo, s"unsupported escape \\$other")
        }
      } else out.append(c)
      k += 1
    }
    out.toString
  }
}
