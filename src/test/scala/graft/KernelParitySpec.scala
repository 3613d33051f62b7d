package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.device
import graft.operators.TextAnalysis

/** Randomized parity: every native kernel must be value-identical to the
  * declarative HOF/regexp formulation it replaced, on inputs nastier
  * than the oracle tables (unicode, empty strings, runs of whitespace,
  * partial matches). Seeded generators — failures reproduce.
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  private val wsChars = Array(' ', ' ', ' ', '\t', '\n', '\u000B', '\f', '\r')
  private val wordChars = "abcXYZ089äßé中_-%=\"|.".toCharArray

  private def randText(): String = {
    val sb = new StringBuilder
    val segs = rnd.nextInt(12)
    (0 until segs).foreach { _ =>
      if (rnd.nextBoolean()) sb.append(wsChars(rnd.nextInt(wsChars.length)))
      else (0 to rnd.nextInt(6)).foreach(_ =>
        sb.append(wordChars(rnd.nextInt(wordChars.length))))
    }
    sb.toString
  }

  test("TokensExpr == filter(split(lower, \\s+), nonempty) on random text") {
    val texts = (0 until 300).map(_ => randText()) ++
      Seq("", " ", "\t\n", "a", " a ", "a  b\tc\nd")
    val df = texts.toDF("t")
    val got = df.select(TextAnalysis.tokens(col("t")).as("x"))
      .as[Seq[String]].collect().toSeq
    val want = df.select(
        filter(split(lower(col("t")), "\\s+"), x => x =!= "").as("x"))
      .as[Seq[String]].collect().toSeq
    assert(got == want)
  }

  test("BpeCount/BpeEncode == naive all-entry longest-match reference") {
    // independent reference path: split words, then at each position
    // scan EVERY vocab entry with startsWith (no trie), codepoint
    // fallback — any trie-walk bug diverges
    val vocab = Seq("a", "ab", "abc", "bc", "c0", "xy", "xyz", "z8",
      "89", "ä", "äß", "ß=", "中.", "%=", "_-", "--")
    def refEncode(text: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      text.toLowerCase.split("[\\s]+").filter(_.nonEmpty).foreach { w =>
        var i = 0
        while (i < w.length) {
          val m = vocab.filter(v => w.startsWith(v, i)).map(_.length)
            .sorted.lastOption.getOrElse(0)
          if (m > 0) { out += w.substring(i, i + m); i += m }
          else {
            val step = Character.charCount(w.codePointAt(i))
            out += w.substring(i, i + step); i += step
          }
        }
      }
      out.toSeq
    }
    val texts = (0 until 300).map(_ => randText()) ++ Seq(
      "", " ", "abcabc", "ABCABC", "xyz89 xy z8", "äß ä ß=",
      "a" + new String(Character.toChars(0x1D11E)) + "b")
    val df = texts.toDF("t")
    val got = df.select(
        TextAnalysis.bpeEncode(col("t"), vocab).as("e"),
        TextAnalysis.bpeCount(col("t"), vocab).as("n"))
      .as[(Seq[String], Int)].collect().toSeq
    texts.zip(got).foreach { case (t, (e, n)) =>
      val want = refEncode(t)
      assert(e == want, s"encode mismatch on '$t'")
      assert(n == want.size, s"count mismatch on '$t'")
    }
  }

  test("JaccardTextsExpr == array_intersect over ShinglesExpr pairs") {
    val texts = (0 until 200).map(_ => randText()) ++ Seq(
      "", "a b c", "a b c d e f", "x y z x y z x y z")
    val pairs = (0 until 150).map(_ =>
      (texts(rnd.nextInt(texts.size)), texts(rnd.nextInt(texts.size)))) ++
      Seq(("a b c d", "a b c d"), ("a b c d", "b c d e"), ("", "a b c"))
    val df = pairs.toDF("ta", "tb")
    def sh(c: org.apache.spark.sql.Column) = graft.operators.Dedup.shingles(c, 3)
    val got = df.select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.JaccardTextsExpr(
          org.apache.spark.sql.GraftBridge.expression(col("ta")),
          org.apache.spark.sql.GraftBridge.expression(col("tb")), 3)).as("j"))
      .as[Double].collect().toSeq
    val want = df.select((size(array_intersect(sh(col("ta")), sh(col("tb"))))
        .cast("double") /
        greatest(lit(1), size(sh(col("ta"))) + size(sh(col("tb"))) -
          size(array_intersect(sh(col("ta")), sh(col("tb"))))).cast("double"))
        .as("j"))
      .as[Double].collect().toSeq
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("NgramJoinExpr == zip-shift construction on random token arrays") {
    val arrays = (0 until 200).map { _ =>
      (0 until rnd.nextInt(8)).map(_ =>
        (0 to rnd.nextInt(4)).map(_ =>
          wordChars(rnd.nextInt(wordChars.length))).mkString)
    }
    val df = arrays.toDF("toks")
    for (n <- Seq(2, 3)) {
      def shifted(k: Int) =
        slice(col("toks"), lit(k + 1), greatest(size(col("toks")) - k, lit(0)))
      val zipShift = filter(
        (1 until n).foldLeft(col("toks")) { (acc, k) =>
          zip_with(acc, shifted(k), (a, b) => concat(a, lit(" "), b))
        }, _.isNotNull)
      val got = df.select(TextAnalysis.wordNgrams(col("toks"), n).as("x"))
        .as[Seq[String]].collect().toSeq
      val want = df.select(zipShift.as("x")).as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n")
    }
  }

  test("LangIdExpr == aggregate-HOF marker argmax on random token arrays") {
    val markerPool = TextAnalysis.langMarkers.flatMap(_._2) ++
      Seq("zzz", "qq", "", "THE", "la")
    val arrays = (0 until 300).map { _ =>
      (0 until rnd.nextInt(10)).map(_ =>
        markerPool(rnd.nextInt(markerPool.length)))
    }
    val df = arrays.toDF("toks")
    // the pre-kernel formulation, verbatim
    val n = TextAnalysis.langMarkers.size
    val mask = scala.collection.mutable.LinkedHashMap[String, Int]()
    TextAnalysis.langMarkers.zipWithIndex.foreach { case ((_, ms), i) =>
      ms.foreach(mk => mask(mk) = mask.getOrElse(mk, 0) | (1 << i))
    }
    val keys = mask.keys.toSeq
    val hitMap = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k =>
        array((0 until n).map(i => lit((mask(k) >> i) & 1)): _*)): _*))
    val langArr = array(TextAnalysis.langMarkers.map(p => lit(p._1)): _*)
    val hof = aggregate(col("toks"), array_repeat(lit(0), n),
      (acc, t) => zip_with(acc,
        coalesce(try_element_at(hitMap, t), array_repeat(lit(0), n)),
        (a, b) => a + b),
      acc => when(array_max(acc) > 0,
        element_at(langArr, array_position(acc, array_max(acc)).cast("int")))
        .otherwise(lit("und")))
    val got = df.select(TextAnalysis.langIdFromTokens(col("toks")).as("x"))
      .as[String].collect().toSeq
    val want = df.select(hof.as("x")).as[String].collect().toSeq
    assert(got == want)
  }

  test("MinHashTextExpr == ShinglesExpr∘MinHashSignatureExpr on random text") {
    import graft.operators.Dedup
    val texts = (0 until 300).map(_ => randText()) ++ Seq(
      "", " ", "\t\n", "a", "a b", "a b c", "a b c d",
      "one two three one two three", // duplicate shingles — min-invariant
      "中文 字符 宽字 节中 文字", "Wide 中 mix ß chars é here",
      "  leading   and \t trailing  ws  ", "UPPER Case MIX lower")
    val df = texts.toDF("t")
    for ((n, k) <- Seq((3, 64), (2, 8), (1, 4))) {
      val fused = df.select(Dedup.minhashTextSignature(col("t"), n, k).as("x"))
        .as[Option[Seq[Long]]].collect().toSeq
      val composed = df.select(
          when(size(Dedup.shingles(col("t"), n)) > 0,
            Dedup.minhashSignature(Dedup.shingles(col("t"), n), k)).as("x"))
        .as[Option[Seq[Long]]].collect().toSeq
      assert(fused == composed, s"n=$n k=$k")
    }
  }

  test("NormalizeExpr == per-rule extract() coalesce chain on random lines") {
    import graft.operators.Normalize
    val rules = Seq(
      "error code=%code:number% at %host:word% fatal",
      "user %u:word% did %act:word% n=%n:number%")
    val good = (0 until 60).map { _ =>
      if (rnd.nextBoolean())
        s"error code=${rnd.nextInt(500)} at host${rnd.nextInt(40)} fatal"
      else s"user u${rnd.nextInt(40)} did act${rnd.nextInt(9)} n=${rnd.nextInt(999)}"
    }
    val bad = (0 until 40).map(_ => randText())
    val df = (good ++ bad).toDF("m")
    // reference formulation: first-matching-rule coalesce over extract()
    val legacy = coalesce(
      (rules.map(r => Normalize.extract(col("m"), r)) :+ lit("{}")): _*)
    val got = df.select(Normalize.normalize(col("m"), rules).as("x"))
      .as[String].collect().toSeq
    val want = df.select(legacy.as("x")).as[String].collect().toSeq
    assert(got == want)
  }

  test("RegexStructExpr == guard-rlike + per-group regexp_extract (cisco)") {
    val good = (0 until 50).map { _ =>
      val seq = if (rnd.nextBoolean()) s"${rnd.nextInt(9999)}: " else ""
      val mark = Seq("", "*", ".")(rnd.nextInt(3))
      s"${seq}${mark}Mar ${1 + rnd.nextInt(28)} 03:04:05: " +
        s"%SYS-${rnd.nextInt(8)}-CONFIG_I: configured by u${rnd.nextInt(99)}"
    }
    val bad = (0 until 50).map(_ => randText())
    val df = (good ++ bad).toDF("m")
    val re = ("^(?:(\\d+): )?[*.]?((?:[A-Z][a-z]{2} +\\d+|\\d{4} [A-Z][a-z]{2} +\\d+) " +
      "\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?: [A-Z]{1,4})?): " +
      "%([A-Z0-9_]+)-(\\d)-([A-Z0-9_]+): (.*)$")
    val legacy = when(col("m").rlike(re), struct(
      nullif(regexp_extract(col("m"), re, 1), lit("")).cast(LongType).as("seqno"),
      regexp_extract(col("m"), re, 2).as("ts"),
      regexp_extract(col("m"), re, 3).as("msg_facility"),
      regexp_extract(col("m"), re, 4).cast(IntegerType).as("severity"),
      regexp_extract(col("m"), re, 5).as("mnemonic"),
      regexp_extract(col("m"), re, 6).as("text")))
    val got = df.select(to_json(device.parseCiscoIos(col("m"))).as("x"))
      .as[String].collect().toSeq
    val want = df.select(to_json(legacy).as("x")).as[String].collect().toSeq
    assert(got == want)
  }

  test("FingerprintExpr == md5(trim(collapse(strip(lower)))) chain on random text") {
    val texts = (0 until 300).map(_ => randText()) ++ Seq(
      "", " ", "\t\n", "a", " A ", "A.B", "a .. \t b", "ä ö",
      "x  ,  y", "1a2b!3c", "中 文 .", "..!!..")
    val df = texts.toDF("t")
    val got = df.select(graft.operators.TextAnalysis.fingerprint(col("t")).as("x"))
      .as[String].collect().toSeq
    val want = df.select(md5(trim(regexp_replace(regexp_replace(
        lower(col("t")), "[^a-z0-9\\s]", ""), "\\s+", " "))).as("x"))
      .as[String].collect().toSeq
    assert(got == want)
  }

  test("SubwordCountExpr == size(regexp_extract_all(alpha|digit|symbol)) on random text") {
    val texts = (0 until 300).map(_ => randText()) ++ Seq(
      "", " ", "a", "1a2b!3c", "..!!..", "abc123", "ä中é", "a😀b",
      "x  ,  y\t9 9")
    val df = texts.toDF("t")
    val got = df.select(graft.operators.TextAnalysis.subwordCount(col("t")).as("x"))
      .as[Int].collect().toSeq
    val want = df.select(size(regexp_extract_all(col("t"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("x"))
      .as[Int].collect().toSeq
    assert(got == want)
  }

  test("MultiRemoveExpr == global regex alternation removal on random text") {
    def kernel(text: String, spans: Seq[String]): String = {
      val df = Seq(text).toDF("t")
      df.select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.MultiRemoveExpr(
          org.apache.spark.sql.GraftBridge.expression(col("t")), spans))
        .as("x")).as[String].collect().head
    }
    // hand cases: adjacency, seam NOT re-scanned, no-match identity
    assert(kernel("XXXX", Seq("XX")) == "")
    assert(kernel("XYXX", Seq("XX")) == "XY")
    // removing "ab" at 1 forms a new "ab" across the seam — single-pass
    // semantics leaves it (a global regex pass does too)
    assert(kernel("aabb", Seq("ab")) == "ab")
    assert(kernel("hello", Seq("zz")) == "hello")
    assert(kernel("hello", Nil) == "hello")
    // randomized parity vs java.util.regex literal alternation (small
    // alphabet with a metachar so matches are dense and escaping is hit)
    val W = 4
    (0 until 200).foreach { _ =>
      val alpha = "abc."
      def rs(n: Int) = (0 until n).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString
      val spans = (0 until 1 + rnd.nextInt(4)).map(_ => rs(W)).distinct
      val text = rs(rnd.nextInt(60))
      val pat = spans.map(java.util.regex.Pattern.quote).mkString("|")
      val want = java.util.regex.Pattern.compile(pat)
        .matcher(text).replaceAll("")
      val got = kernel(text, spans)
      assert(got == want, s"text=$text spans=$spans got=$got want=$want")
    }
  }

  test("CoarseCellExpr/CoarseSimsExpr == the nlist-cosine HOF formulation") {
    // the IVF-family quantizer kernel (VERDICT r14 #3) vs the
    // array(nlist × cosine(emb, lit-array)) + array_position(array_max)
    // Column tree it replaced — per-element doubles, argmax index, and
    // the zero-norm → null convention must all match bit-for-bit
    val dim = 16
    val nlist = 7
    val cents: Array[Array[Float]] = Array.tabulate(nlist, dim) { (c, d) =>
      var z = c * 2654435761L + d * 40503L + 5
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z.toFloat / Long.MaxValue
    }
    // a zero-norm centroid exercises the NaN-skip convention
    cents(3) = Array.fill(dim)(0f)
    val rows = (0 until 200).map { id =>
      val v =
        if (id == 57) Array.fill(dim)(0f) // zero-norm row → null cell
        else Array.tabulate(dim) { d =>
          var z = id * 7919L + d * 104729L + 3
          z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
          z.toFloat / Long.MaxValue
        }
      (id.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val hofSims = array(cents.map(ce =>
      graft.operators.Similarity.cosine(col("embedding"), array(ce.map(lit): _*))): _*)
    val want = df.select(col("vec_id"),
        (array_position(hofSims, array_max(hofSims)) - 1).cast("int").as("cl"),
        array_max(hofSims).as("ms"), hofSims.as("sims"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getSeq[Any](3)))
    val cc = org.apache.spark.sql.GraftBridge.column(
      graft.functions.CoarseCellExpr(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")), cents))
    val cs = org.apache.spark.sql.GraftBridge.column(
      graft.functions.CoarseSimsExpr(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")), cents))
    val got = df.select(col("vec_id"), cc.getField("cl").as("cl"),
        cc.getField("max_sim").as("ms"), cs.as("sims"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getSeq[Any](3)))
    assert(got.toSeq == want.toSeq)
  }
}
