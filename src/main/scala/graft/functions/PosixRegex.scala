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
