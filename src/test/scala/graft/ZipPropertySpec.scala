package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HttpKernels, FileZipKernels, ZstdKernels}

/** Property-based hardening of the compression kernels (omfwd single +
  * stream zlib, omfile gzip members, zstd frames) — pure driver-side
  * round-trip and invariant checks over arbitrary payloads, no Spark
  * session. The reference invariants: single-msg compression NEVER
  * loses bytes and only ships 'z' frames that gained; stream/file
  * decoders invert the writers exactly; member/frame walks agree with
  * the block structure the writer was given.
  */
class ZipPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150), p)
    assert(res.passed, res.status.toString)
  }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  // text-ish payloads compress; random ones often do not — both matter
  private val textGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.oneOf('a', 'b', ' ', 'x')
        .map(_.toByte)))

  private val payloadGen: Gen[Array[Byte]] = Gen.oneOf(bytesGen, textGen)

  private val partsGen: Gen[Array[Array[Byte]]] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.containerOfN[Array, Array[Byte]](n, payloadGen))

  test("omfwd single-msg: unzip(zip(m)) == m, short stays raw, gain honored") {
    // raw messages LEADING with 'z' are ambiguous on the wire by protocol
    // design (the receiver treats any leading 'z' as compressed — same in
    // the reference); syslog wires always lead with '<', so exclude them
    val msgGen = payloadGen.suchThat(m =>
      m.isEmpty || m(0) != 'z'.toByte)
    check(Prop.forAll(msgGen, Gen.oneOf(1, 6, 9)) { (m, level) =>
      val z = HttpKernels.omfwdZip(m, level)
      val back = HttpKernels.omfwdUnzip(z)
      val roundTrip = java.util.Arrays.equals(back, m)
      val shortRaw = m.length > 60 || (z eq m)
      // a 'z' frame must be a strict gain
      val gainOk = z.isEmpty || z(0) != 'z'.toByte || (z eq m) ||
        z.length < m.length
      roundTrip && shortRaw && gainOk
    })
  }

  test("omfwd stream: inflate inverts any tx split of any payload") {
    check(Prop.forAll(partsGen, Gen.oneOf(1, 6, 9)) { (txs, level) =>
      val z = HttpKernels.zipStream(txs, level)
      java.util.Arrays.equals(HttpKernels.inflateStream(z), txs.flatten)
    })
  }

  test("omfile gzip: member walk inverts both reliability modes") {
    check(Prop.forAll(partsGen, Gen.oneOf(1, 6, 9)) { (parts, level) =>
      val robust = FileZipKernels.omfileZip(parts, level, veryRobust = true)
      val plain = FileZipKernels.omfileZip(parts, level, veryRobust = false)
      val r = FileZipKernels.walkMembers(robust)
      val p = FileZipKernels.walkMembers(plain)
      r != null && p != null &&
        r._1 == parts.length && p._1 == 1 &&
        java.util.Arrays.equals(r._2, parts.flatten) &&
        java.util.Arrays.equals(p._2, parts.flatten)
    })
  }

  test("omfile zstd: frame walk inverts both reliability modes") {
    check(Prop.forAll(partsGen, Gen.oneOf(1, 3, 9)) { (parts, level) =>
      val robust = ZstdKernels.omfileZstd(parts, level, veryRobust = true)
      val plain = ZstdKernels.omfileZstd(parts, level, veryRobust = false)
      val r = ZstdKernels.walkFrames(robust)
      val p = ZstdKernels.walkFrames(plain)
      r != null && p != null &&
        r._1 == parts.length && p._1 == 1 &&
        java.util.Arrays.equals(r._2, parts.flatten) &&
        java.util.Arrays.equals(p._2, parts.flatten)
    })
  }

  test("torn robust tails: every member-boundary prefix stays decodable") {
    check(Prop.forAll(partsGen) { parts =>
      val members = parts.map(FileZipKernels.gzipMember(_, 6))
      val img = members.flatten
      (1 to parts.length).forall { k =>
        val cut = members.take(k).map(_.length).sum
        val w = FileZipKernels.walkMembers(img.take(cut))
        w != null && w._1 == k &&
          java.util.Arrays.equals(w._2, parts.take(k).toArray.flatten)
      }
    })
  }
}
