package graft.rainerscript

/** Minimal YAML-subset parser for the reference's config schemas
  * (runtime/yamlconf.c's event walk and the ratelimit policy files):
  * block mappings, block sequences, scalars (plain / single- / double-
  * quoted), literal block scalars (`|` / `|-`), full-line and trailing
  * `#` comments, and the `- key: value` inline-first-entry list form.
  * No anchors, aliases, flow collections, or multi-doc streams — the
  * reference schemas use none of them (yamlconf.c walks scalars and
  * block collections only), and the container has no YAML library.
  */
object YamlLite {

  sealed trait YNode
  case class YScalar(v: String) extends YNode
  case class YMap(entries: Seq[(String, YNode)]) extends YNode {
    def get(k: String): Option[YNode] = entries.find(_._1 == k).map(_._2)
    def scalar(k: String): Option[String] =
      get(k).collect { case YScalar(s) => s }
  }
  case class YList(items: Seq[YNode]) extends YNode

  def parse(src: String): YNode = new Parser(src).parseTop()

  private final class Parser(src: String) {
    private val raw = src.split("\n", -1)
    private var i = 0
    // one virtual line allows the `- key: value` inline form to re-enter
    // the map parser at the dash's content indent
    private var virtualLine: Option[(Int, String)] = None

    private def isNoise(l: String): Boolean = {
      val t = l.trim
      t.isEmpty || t.startsWith("#")
    }

    /** (indent, trimmed content) of the next significant line. */
    private def peek: Option[(Int, String)] = {
      virtualLine.orElse {
        var j = i
        while (j < raw.length && isNoise(raw(j))) j += 1
        if (j >= raw.length) None
        else Some((raw(j).takeWhile(_ == ' ').length, raw(j).trim))
      }
    }

    private def advance(): Unit =
      if (virtualLine.isDefined) virtualLine = None
      else {
        while (i < raw.length && isNoise(raw(i))) i += 1
        i += 1
      }

    def parseTop(): YNode = parseBlock(0)

    private def parseBlock(minIndent: Int): YNode = peek match {
      case Some((ind, t)) if ind >= minIndent =>
        if (t == "-" || t.startsWith("- ")) parseList(ind)
        else parseMap(ind)
      case _ => YMap(Nil)
    }

    private def splitKey(t: String): (String, String) = t.indexOf(':') match {
      case -1 => (t, "")
      case p => (t.take(p).trim, t.drop(p + 1).trim)
    }

    /** Strip a trailing ` #comment` from an unquoted scalar; quoted
      * scalars are unquoted with their content untouched. */
    private def scalarValue(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && (t.head == '"' || t.head == '\'')) {
        val q = t.head
        val end = t.lastIndexOf(q)
        if (end > 0) t.substring(1, end) else t
      } else {
        val cut = t.indexOf(" #")
        (if (cut >= 0) t.take(cut) else t).trim
      }
    }

    private def parseMap(indent: Int): YMap = {
      val entries = scala.collection.mutable.ListBuffer.empty[(String, YNode)]
      var done = false
      while (!done) {
        peek match {
          case Some((ind, t)) if ind == indent && !t.startsWith("- ") && t != "-" =>
            advance()
            val (k, rest) = splitKey(t)
            if (rest == "|" || rest == "|-")
              entries += k -> YScalar(blockScalar(indent, keepFinalNl = rest == "|"))
            else if (rest.isEmpty) entries += k -> parseBlock(indent + 1)
            else entries += k -> YScalar(scalarValue(rest))
          case _ => done = true
        }
      }
      YMap(entries.toList)
    }

    private def parseList(indent: Int): YList = {
      val items = scala.collection.mutable.ListBuffer.empty[YNode]
      var done = false
      while (!done) {
        peek match {
          case Some((ind, t)) if ind == indent && (t == "-" || t.startsWith("- ")) =>
            advance()
            val rest = t.stripPrefix("-").trim
            if (rest.isEmpty) items += parseBlock(indent + 1)
            else {
              val (_, after) = splitKey(rest)
              val looksLikeEntry = rest.contains(":") &&
                (after.isEmpty || !rest.startsWith("\"") && !rest.startsWith("'"))
              if (looksLikeEntry) {
                // `- key: value` — the item is a map whose first entry is
                // on the dash line; later keys align at dashIndent + 2
                virtualLine = Some((indent + 2, rest))
                items += parseMap(indent + 2)
              } else items += YScalar(scalarValue(rest))
            }
          case _ => done = true
        }
      }
      YList(items.toList)
    }

    /** Literal block scalar: raw following lines deeper than the key's
      * indent, dedented to the first content line, comments/blanks kept. */
    private def blockScalar(keyIndent: Int, keepFinalNl: Boolean): String = {
      // operate on raw lines directly (comments inside the block are text)
      while (i < raw.length && raw(i).trim.isEmpty) i += 1
      if (i >= raw.length) return ""
      val bodyIndent = raw(i).takeWhile(_ == ' ').length
      if (bodyIndent <= keyIndent) return ""
      val sb = new StringBuilder
      var cont = true
      while (cont && i < raw.length) {
        val l = raw(i)
        val ind = l.takeWhile(_ == ' ').length
        if (l.trim.isEmpty) { sb.append('\n'); i += 1 }
        else if (ind >= bodyIndent) {
          sb.append(l.drop(bodyIndent)).append('\n'); i += 1
        } else cont = false
      }
      val s = sb.toString.reverse.dropWhile(_ == '\n').reverse
      if (keepFinalNl) s + "\n" else s
    }
  }
}
