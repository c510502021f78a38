package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.CheckFreeze.{classify, Verdict}

/** The bench contention classifier is the r17/r18 drift-adjudication
  * protocol as code — these laws pin the narrative it replaces:
  * within-threshold queries are silent, an over-threshold query whose
  * SLOW runs coincide with a host-noise signature (steal / foreign CPU /
  * loadavg) is CONTENDED (re-run), one that ran slow on a clean host is
  * SUSPECT (investigate the plan), and missing telemetry never absolves. */
class CheckFreezeSpec extends AnyFunSuite {

  private val clean = (20000L, 0L, 2800L)        // 2% foreign, no steal, load 28
  private val steal = (20000L, 9000L, 2800L)     // hypervisor steal spike
  private val foreign = (400000L, 0L, 2800L)     // 40% of host burned elsewhere
  private val overload = (20000L, 0L, 9000L)     // load 90 on 32 cores
  private val ncpu = 32

  test("within threshold or under the absolute noise floor → no verdict") {
    // ratio 1.1x — silent regardless of host state
    assert(classify(Seq(1.1, 1.1, 1.1), 1.0, Seq.fill(3)(foreign), ncpu).isEmpty)
    // ratio 2.4x but only +0.12 s absolute — scheduler jitter, silent
    assert(classify(Seq(0.12, 0.12, 0.12), 0.05, Seq.fill(3)(clean), ncpu).isEmpty)
    // empty runs / unfrozen (0 s) rows never classify
    assert(classify(Nil, 1.0, Nil, ncpu).isEmpty)
    assert(classify(Seq(2.0), 0.0, Seq(clean), ncpu).isEmpty)
  }

  test("median is the lower median — one contended run out of three is absorbed") {
    // [1.0, 1.0, 9.9]: median 1.0 → within threshold, silent even though
    // one run blew up (exactly the single-contended-run case the
    // 3-run median was introduced for)
    assert(classify(Seq(1.0, 1.0, 9.9), 1.0,
      Seq(clean, clean, foreign), ncpu).isEmpty)
  }

  test("over threshold + noise signature on the slow runs → CONTENDED") {
    for (noisy <- Seq(steal, foreign, overload)) {
      val got = classify(Seq(2.0, 2.1, 2.2), 1.0,
        Seq(noisy, noisy, noisy), ncpu)
      assert(got.exists(_.label == "contended"), s"$noisy → $got")
    }
  }

  test("over threshold on a clean host → SUSPECT (plan deserves the isolated protocol)") {
    val got = classify(Seq(2.0, 2.1, 2.2), 1.0, Seq(clean, clean, clean), ncpu)
    assert(got.exists(_.label == "suspect"), s"$got")
    assert(got.get.detail.contains("2.1"), s"evidence carries the ratio: $got")
  }

  test("only the SLOW runs' host state decides — a noisy FAST run does not excuse a clean slow median") {
    // runs [0.9, 2.0, 2.1]: the 0.9 run saw foreign load, the two slow
    // runs saw a clean host → the slowness is NOT explained by the
    // noise → suspect
    val got = classify(Seq(0.9, 2.0, 2.1), 1.0,
      Seq(foreign, clean, clean), ncpu)
    assert(got.exists(_.label == "suspect"), s"$got")
    // and the converse: noise ON the slow runs → contended
    val got2 = classify(Seq(0.9, 2.0, 2.1), 1.0,
      Seq(clean, steal, clean), ncpu)
    assert(got2.exists(_.label == "contended"), s"$got2")
  }

  test("missing telemetry never absolves: over threshold with no env rows → SUSPECT, noted") {
    val got = classify(Seq(2.0, 2.1, 2.2), 1.0, Nil, ncpu)
    assert(got.exists(v => v.label == "suspect" &&
      v.detail.contains("no host telemetry")), s"$got")
    // unreadable (-1) counters on the slow runs are not a noise
    // signature, and the evidence must SAY the telemetry was
    // unreadable rather than render -1 as a measured-clean host
    val got2 = classify(Seq(2.0, 2.1, 2.2), 1.0,
      Seq.fill(3)((-1L, -1L, -1L)), ncpu)
    assert(got2.exists(v => v.label == "suspect" &&
      v.detail.contains("no host telemetry readable")), s"$got2")
    // partially readable: the unreadable counter prints as '?', the
    // readable ones as numbers, and a readable noise signal still wins
    val got3 = classify(Seq(2.0, 2.1, 2.2), 1.0,
      Seq.fill(3)((-1L, 9000L, -1L)), ncpu)
    assert(got3.exists(v => v.label == "contended" &&
      v.detail.contains("foreign ?") && v.detail.contains("steal 0.9%")),
      s"$got3")
  }

  test("loadavg threshold scales with the core count") {
    val load50 = (10000L, 0L, 5000L) // load 50
    assert(classify(Seq(2.0, 2.0, 2.0), 1.0, Seq.fill(3)(load50), 32)
      .exists(_.label == "contended"), "load 50 on 32 cores is noise")
    assert(classify(Seq(2.0, 2.0, 2.0), 1.0, Seq.fill(3)(load50), 64)
      .exists(_.label == "suspect"), "load 50 on 64 cores is a clean host")
  }

  test("verdict shape is stable for the round log") {
    assert(Verdict("contended", "x").label == "contended")
  }
}
