package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CloudSinks

/** Property-based hardening of the greedy batch packer shared by
  * omawslogshlc/omazuredce (CloudSinks.packIterator) — pure driver-side
  * checks of the flush rules against the reference's invariants
  * (omawslogshlc.c appendEvent/doAction, omazuredce.c
  * addMessageToBatchUnlocked), no Spark session needed.
  */
class PackerPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // sorted (key, ord, event) input — events are sep-free so payloads can
  // be split back losslessly for the reconstruction property
  private case class Cfg(maxEvents: Int, maxBytes: Long, perEventMax: Long,
                         sep: String, prefix: String, suffix: String)

  private val cfgGen: Gen[Cfg] = for {
    maxEvents <- Gen.chooseNum(1, 7)
    maxBytes <- Gen.chooseNum(8L, 64L)
    perEventMax <- Gen.chooseNum(1L, 32L)
    shape <- Gen.oneOf(("", "", ""), (",", "[", "]"))
  } yield Cfg(maxEvents, maxBytes, perEventMax, shape._1, shape._2, shape._3)

  private val rowsGen: Gen[List[(String, Long, String)]] = for {
    nKeys <- Gen.chooseNum(1, 3)
    keys = (0 until nKeys).map(i => s"k$i")
    rows <- Gen.listOfN(30, for {
      k <- Gen.oneOf(keys)
      len <- Gen.chooseNum(0, 40)
      body <- Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString)
    } yield (k, body))
  } yield rows.groupBy(_._1).toList.sortBy(_._1).flatMap {
    case (k, rs) => rs.zipWithIndex.map { case ((_, b), i) => (k, i.toLong, b) }
  }

  private def run(rows: List[(String, Long, String)], c: Cfg) =
    CloudSinks.packIterator(rows.iterator, c.maxEvents, c.maxBytes,
      c.perEventMax, c.sep, c.prefix, c.suffix, 0L).toList

  test("caps hold: n_events <= maxEvents; bytes <= cap when satisfiable") {
    check(Prop.forAll(rowsGen, cfgGen) { (rows, c) =>
      val out = run(rows, c)
      val countOk = out.forall(_.n_events <= c.maxEvents)
      // the byte cap is guaranteed whenever one max-size event fits in an
      // empty batch (the reference's own admission precondition)
      val capSatisfiable =
        c.prefix.length + c.suffix.length + c.perEventMax <= c.maxBytes
      val bytesOk = !capSatisfiable ||
        out.filter(_.n_events > 0).forall(_.payload_bytes <= c.maxBytes)
      countOk && bytesOk
    })
  }

  test("conservation: every event lands in exactly one batch or is dropped") {
    check(Prop.forAll(rowsGen, cfgGen) { (rows, c) =>
      val out = run(rows, c)
      out.map(_.n_events).sum + out.map(_.n_dropped).sum == rows.size
    })
  }

  test("reconstruction: batch payloads carry the kept events in order") {
    check(Prop.forAll(rowsGen, cfgGen) { (rows, c) =>
      rows.map(_._1).distinct.forall { k =>
        val out = run(rows, c).filter(_.key == k).sortBy(_.batch_idx)
        val kept = rows.filter(r => r._1 == k &&
          r._3.getBytes("UTF-8").length <= c.perEventMax).map(_._3)
        // walk the kept list batch by batch: each payload must be exactly
        // prefix + its slice joined by sep + suffix
        var idx = 0
        out.forall { p =>
          val slice = kept.slice(idx, idx + p.n_events.toInt)
          idx += p.n_events.toInt
          p.payload == c.prefix + slice.mkString(c.sep) + c.suffix
        } && idx == kept.size
      }
    })
  }

  test("batch numbering restarts per key and is consecutive") {
    check(Prop.forAll(rowsGen, cfgGen) { (rows, c) =>
      val out = run(rows, c)
      out.groupBy(_.key).values.forall { batches =>
        batches.sortBy(_.batch_idx).map(_.batch_idx) ==
          (0L until batches.size.toLong).toList
      }
    })
  }

  test("first/last ord bracket the batch's kept events") {
    check(Prop.forAll(rowsGen, cfgGen) { (rows, c) =>
      val out = run(rows, c).filter(_.n_events > 0)
      out.forall(p => p.first_ord <= p.last_ord)
    })
  }

  // ---- omfwd target-pool closed form (Sources.omfwdPoolTarget) ----

  /** Direct simulation of omfwd.c:1883-1901: per-worker counter, each
    * try consumes one increment, unconnected slots are skipped (up to
    * nTargets tries). Returns the chosen target index per message. */
  private def simulatePool(active: Seq[Boolean], nMsgs: Int): Seq[Int] = {
    var counter = 0L
    (0 until nMsgs).map { _ =>
      var chosen = -1
      var tries = 0
      while (chosen < 0 && tries < active.size) {
        val slot = (counter % active.size).toInt
        counter += 1
        if (active(slot)) chosen = slot
        tries += 1
      }
      assert(chosen >= 0, "pool with an active member always sends")
      chosen
    }
  }

  test("pool closed form: active members round-robin in pool order (omfwd.c:1889)") {
    val maskGen = Gen.nonEmptyListOf(Gen.oneOf(true, false)).map(_.take(8))
    check(Prop.forAll(maskGen, Gen.choose(1, 200)) { (mask, n) =>
      // shrinking ignores suchThat filters, so guard the empty pool
      // (the operator itself rejects it: SUSPENDED) in the body
      val activeIdx = mask.zipWithIndex.collect { case (true, i) => i }
      activeIdx.isEmpty || {
        val closedForm = (0 until n).map(i => activeIdx(i % activeIdx.size))
        simulatePool(mask, n) == closedForm
      }
    })
  }
}
