package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HttpKernels

/** imhttp body framing kernel vs the reference's connection-worker loops
  * (contrib/imhttp/imhttp.c processDataUncompressed / processDisableLF /
  * processOctetCounting / processOctetMsgLen). */
class HttpBodySpec extends AnyFunSuite {

  private def split(body: String, mode: Int, maxLine: Int = 8096): Seq[String] =
    HttpKernels.bodySplit(body.getBytes("UTF-8"), mode, maxLine).toSeq
      .map(_.toString)

  test("LF mode splits on newline; trailing partial flushes (post-payload-multi-lf.sh)") {
    assert(split("a\nbb\nccc\n", 0) == Seq("a", "bb", "ccc"))
    assert(split("a\nbb\nccc", 0) == Seq("a", "bb", "ccc"))
    assert(split("", 0) == Seq.empty)
    // zero-sized messages are discarded (doSubmitMsg, imhttp.c:536-539)
    assert(split("\n\n", 0) == Seq.empty)
  }

  test("LF mode submits early at maxLine without consuming the char (:746-748)") {
    assert(split("abcdef\n", 0, maxLine = 3) == Seq("abc", "def"))
  }

  test("block mode chunks at maxLine (processDisableLF)") {
    assert(split("abcdefghij", 1, maxLine = 4) == Seq("abcd", "efgh", "ij"))
    assert(split("ab", 1, maxLine = 4) == Seq("ab"))
    assert(split("", 1, maxLine = 4) == Seq.empty)
  }

  test("octet mode: counted frames, per-frame stuffing fallback (processOctetMsgLen)") {
    assert(split("5 hello3 bye", 2) == Seq("hello", "bye"))
    // frame 2 starts with a non-digit -> LF stuffing for that frame
    assert(split("5 helloworld\n", 2) == Seq("hello", "world"))
    // zero count: the empty submit is discarded (iOctetsRemain < 1 path
    // + doSubmitMsg zero-size guard)
    assert(split("0 x\n", 2) == Seq("x"))
  }

  test("octet mode truncates an oversize count at maxLine and skips the rest (:623)") {
    assert(split("6 abcdef4 wxyz", 2, maxLine = 4) == Seq("abcd", "wxyz"))
    // body undershoots the count: partial flushes (one-shot body)
    assert(split("9 abc", 2) == Seq("abc"))
  }

  test("omfwd single-msg zlib: 60-byte gate, z marker, gain gate, round-trip") {
    def b(s: String) = s.getBytes("UTF-8")
    // <= CONF_MIN_SIZE_FOR_COMPRESS passes through untouched
    val short = b("x" * 60)
    assert(HttpKernels.omfwdZip(short, 9) eq short)
    // compressible long message: 'z' marker + shrink + exact round-trip
    val long = b("<13>h fwd: " + ("pad" * 200))
    val z = HttpKernels.omfwdZip(long, 9)
    assert(z(0) == 'z'.toByte && z.length < long.length)
    assert(java.util.Arrays.equals(HttpKernels.omfwdUnzip(z), long))
    // incompressible >60 bytes (full-entropy random): no gain -> raw
    // goes out (omfwd.c:1800 "only use compression if there is a gain")
    val rnd = new Array[Byte](100)
    new java.util.Random(7).nextBytes(rnd)
    assert(HttpKernels.omfwdZip(rnd, 9) eq rnd)
    // receive side: non-'z' passes through; corrupt 'z' stream -> null
    assert(HttpKernels.omfwdUnzip(long) eq long)
    assert(HttpKernels.omfwdUnzip(b("znot zlib at all")) == null)
  }

  test("omfwd stream zlib: sync-flush tx boundaries, trailing-data reject, sniff") {
    def b(s: String) = s.getBytes("UTF-8")
    val txs = Array(b("26 <13>h one msg in this tx"), b("10 <13>h two"), b("8 <13>end"))
    val z = HttpKernels.zipStream(txs, 9)
    // continuous stream inflates to the concatenation of all txs
    assert(java.util.Arrays.equals(HttpKernels.inflateStream(z), txs.flatten))
    // each SYNC_FLUSH writes the 00 00 FF FF empty-stored-block marker
    // (one per tx) so the receiver can decode at tx granularity
    def countFlushMarks(a: Array[Byte]): Int =
      (0 until a.length - 3).count(i => a(i) == 0 && a(i + 1) == 0 &&
        a(i + 2) == 0xff.toByte && a(i + 3) == 0xff.toByte)
    assert(countFlushMarks(z) >= txs.length)
    // trailing data after Z_STREAM_END -> reject (imptcp.c:1389,1427)
    assert(HttpKernels.inflateStream(z ++ b("junk")) == null)
    assert(HttpKernels.inflateStream(b("znot a stream")) == null)
    // AUTO sniff: zlib header passes the RFC1950 check, plaintext doesn't
    assert(HttpKernels.zlibCandidate(z))
    assert(!HttpKernels.zlibCandidate(txs(0)))
    assert(!HttpKernels.zlibCandidate(Array[Byte]()))
  }

  test("omfile zip: veryRobustZip members survive a torn tail, CRC checked") {
    import graft.functions.FileZipKernels
    def b(s: String) = s.getBytes("UTF-8")
    val parts = Array(b("line one\n"), b("line two\n"), b("line three\n"))
    // robust: one complete gzip member per flushed block
    val robust = FileZipKernels.omfileZip(parts, 6, veryRobust = true)
    val (rn, rdec) = FileZipKernels.walkMembers(robust)
    assert(rn == 3 && java.util.Arrays.equals(rdec, parts.flatten))
    // plain: one member, sync-flushed boundaries inside
    val plain = FileZipKernels.omfileZip(parts, 6, veryRobust = false)
    val (pn, pdec) = FileZipKernels.walkMembers(plain)
    assert(pn == 1 && java.util.Arrays.equals(pdec, parts.flatten))
    // torn tail: cut the file mid-last-member -> the strict walk rejects,
    // but cutting AT the member boundary (what a crash leaves after the
    // earlier members' completed writes) decodes every earlier member —
    // the veryRobustZip recovery contract (zlibw.c:161)
    val m01 = FileZipKernels.gzipMember(parts(0), 6).length +
      FileZipKernels.gzipMember(parts(1), 6).length
    assert(FileZipKernels.walkMembers(robust.take(robust.length - 4)) == null)
    val (tn, tdec) = FileZipKernels.walkMembers(robust.take(m01))
    assert(tn == 2 && java.util.Arrays.equals(tdec, parts(0) ++ parts(1)))
    // a flipped payload byte fails the CRC32 trailer check
    val corrupt = robust.clone()
    corrupt(12) = (corrupt(12) ^ 0x41).toByte
    assert(FileZipKernels.walkMembers(corrupt) == null)
    // interop: the JDK's multi-member reader agrees with the walk
    val jdk = HttpKernels.gunzip(robust)
    assert(java.util.Arrays.equals(jdk, parts.flatten))
  }

  test("omfile zstd driver: frames per flushed block, torn tail, corrupt reject") {
    import graft.functions.ZstdKernels
    def b(s: String) = s.getBytes("UTF-8")
    val parts = Array(b("alpha block\n"), b("beta block\n"), b("gamma block\n"))
    val robust = ZstdKernels.omfileZstd(parts, 3, veryRobust = true)
    val (rn, rdec) = ZstdKernels.walkFrames(robust)
    assert(rn == 3 && java.util.Arrays.equals(rdec, parts.flatten))
    val plain = ZstdKernels.omfileZstd(parts, 3, veryRobust = false)
    val (pn, pdec) = ZstdKernels.walkFrames(plain)
    assert(pn == 1 && java.util.Arrays.equals(pdec, parts.flatten))
    // torn tail at a frame boundary decodes the earlier frames
    val f01 = ZstdKernels.zstdFrame(parts(0), 3).length +
      ZstdKernels.zstdFrame(parts(1), 3).length
    val (tn, tdec) = ZstdKernels.walkFrames(robust.take(f01))
    assert(tn == 2 && java.util.Arrays.equals(tdec, parts(0) ++ parts(1)))
    // mid-frame truncation and garbage are rejected
    assert(ZstdKernels.walkFrames(robust.take(robust.length - 3)) == null)
    assert(ZstdKernels.walkFrames(b("not zstd data")) == null)
  }

  test("gzip round-trips; malformed stream rejects as null (processDataCompressed)") {
    val payload = "m1 alpha\nx42\n".getBytes("UTF-8")
    val back = HttpKernels.gunzip(HttpKernels.gzip(payload))
    assert(java.util.Arrays.equals(back, payload))
    assert(HttpKernels.gunzip("not gzip".getBytes("UTF-8")) == null)
    // gzip output is deterministic (GZIPOutputStream writes MTIME=0)
    assert(java.util.Arrays.equals(HttpKernels.gzip(payload),
      HttpKernels.gzip(payload)))
  }
}
