package graft.functions

/** POSIX ERE → Java regex translation (reference regex surface:
  * re_match/re_extract POSIX ERE via regcomp, runtime/template.h:98-101).
  * The dialects agree on the core (alternation, classes, counts,
  * anchors); the translatable differences are:
  *  - POSIX bracket classes [[:digit:]] → \p{...} / explicit classes
  *  - interval escapes are already ERE-compatible
  * Back-references and collating elements ([.x.], [=x=]) are not in ERE's
  * portable subset and are rejected.
  */
object PosixRegex {

  private val classMap = Map(
    "alpha" -> "\\p{Alpha}", "digit" -> "\\d", "alnum" -> "\\p{Alnum}",
    "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}", "space" -> "\\s",
    "blank" -> " \\t", "punct" -> "\\p{Punct}", "print" -> "\\p{Print}",
    "graph" -> "\\p{Graph}", "cntrl" -> "\\p{Cntrl}", "xdigit" -> "\\p{XDigit}")

  /** Translate a POSIX ERE into an equivalent Java regex. */
  def translate(ere: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = ere.length
    while (i < n) {
      if (ere.startsWith("[[:", i) || (ere.charAt(i) == '[' && i + 1 < n &&
          ere.startsWith("[:", i + 1))) {
        // bracket expression containing POSIX classes — rewrite contents
        val close = findBracketEnd(ere, i)
        val inner = ere.substring(i + 1, close)
        sb.append('[').append(rewriteInner(inner)).append(']')
        i = close + 1
      } else if (ere.charAt(i) == '[') {
        val close = findBracketEnd(ere, i)
        val inner = ere.substring(i + 1, close)
        require(!inner.contains("[.") && !inner.contains("[="),
          s"collating elements unsupported: $ere")
        sb.append('[').append(rewriteInner(inner)).append(']')
        i = close + 1
      } else {
        sb.append(ere.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  /** Translate a POSIX/GNU BRE (the reference's DEFAULT template regex
    * dialect — glibc regcomp without REG_EXTENDED, typeRegex
    * TPL_REGEX_BRE when the type segment is omitted,
    * runtime/template.c:1592-1604) into an equivalent Java regex.
    *
    * BRE inverts ERE's escaping for the structural metas: `\(..\)`
    * groups and `\{m,n\}` intervals are operators while bare `( ) { }`
    * are literals; `+ ? |` are literal unless backslashed (the GNU
    * extension glibc implements and the reference therefore accepts);
    * a leading `*` (start of pattern or right after `\(`/`\|`) is a
    * literal; `^`/`$` anchor only at the edges (or adjacent to
    * `\(`/`\)`/`\|`). Back-references `\1`-`\9` carry over unchanged
    * (Java shares the syntax). Bracket expressions are dialect-shared
    * and reuse the ERE path (POSIX class rewrite included). */
  def translateBre(bre: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = bre.length
    // true at positions where a '*' is a literal: pattern start and
    // right after \( or \| (glibc BRE; '^' keeps it — "^*" is literal)
    var atSubStart = true
    while (i < n) {
      val c = bre.charAt(i)
      if (c == '\\' && i + 1 < n) {
        bre.charAt(i + 1) match {
          case '(' => sb.append('('); atSubStart = true; i += 2
          case ')' => sb.append(')'); atSubStart = false; i += 2
          case '{' =>
            val end = bre.indexOf("\\}", i + 2)
            require(end > 0, s"unterminated \\{ in BRE: $bre")
            val body = bre.substring(i + 2, end)
            require(body.matches("\\d+(,\\d*)?"),
              s"bad interval \\{$body\\} in BRE: $bre")
            sb.append('{').append(body).append('}')
            atSubStart = false; i = end + 2
          case '}' => sb.append("\\}"); atSubStart = false; i += 2
          case '+' => sb.append('+'); atSubStart = false; i += 2 // GNU \+
          case '?' => sb.append('?'); atSubStart = false; i += 2 // GNU \?
          case '|' => sb.append('|'); atSubStart = true; i += 2  // GNU \|
          case '<' | '>' => sb.append("\\b"); i += 2             // GNU \< \>
          case d if d >= '1' && d <= '9' =>                      // backref
            sb.append('\\').append(d); atSubStart = false; i += 2
          case d => // \. \* \[ \\ \w \s ... — keep escaped, Java-compatible
            sb.append('\\').append(d); atSubStart = false; i += 2
        }
      } else c match {
        case '[' =>
          val close = findBracketEnd(bre, i)
          sb.append('[').append(rewriteInner(bre.substring(i + 1, close)))
            .append(']')
          atSubStart = false; i = close + 1
        case '(' | ')' | '{' | '}' | '+' | '?' | '|' => // BRE literals
          sb.append('\\').append(c); atSubStart = false; i += 1
        case '*' =>
          sb.append(if (atSubStart) "\\*" else "*")
          atSubStart = false; i += 1
        case '^' =>
          // anchor only at pattern/group start; literal elsewhere
          sb.append(if (i == 0 || atSubStart) "^" else "\\^"); i += 1
        case '$' =>
          val anchors = i == n - 1 ||
            (i + 2 < n && bre.charAt(i + 1) == '\\' &&
              (bre.charAt(i + 2) == ')' || bre.charAt(i + 2) == '|'))
          sb.append(if (anchors) "$" else "\\$")
          atSubStart = false; i += 1
        case ch =>
          sb.append(ch); atSubStart = false; i += 1
      }
    }
    sb.toString
  }

  private def rewriteInner(inner0: String): String = {
    var inner = inner0
    val out = new StringBuilder
    var i = 0
    while (i < inner.length) {
      if (inner.startsWith("[:", i)) {
        val end = inner.indexOf(":]", i)
        require(end > 0, s"unterminated [: :] in bracket: $inner0")
        val name = inner.substring(i + 2, end)
        out.append(classMap.getOrElse(name,
          throw new IllegalArgumentException(s"unknown POSIX class [:$name:]")))
        i = end + 2
      } else {
        out.append(inner.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  /** Find the index of the ']' that ends the bracket expression starting
    * at `start` (POSIX: a ']' first-in-class is a literal; [: :] spans). */
  private def findBracketEnd(s: String, start: Int): Int = {
    var i = start + 1
    if (i < s.length && s.charAt(i) == '^') i += 1
    if (i < s.length && s.charAt(i) == ']') i += 1 // literal ]
    while (i < s.length) {
      if (s.startsWith("[:", i)) i = s.indexOf(":]", i) + 2
      else if (s.charAt(i) == ']') return i
      else i += 1
    }
    throw new IllegalArgumentException(s"unterminated bracket in: $s")
  }
}
