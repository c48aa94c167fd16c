package graft

import graft.tools.CrashHarness

/** Real crash injection at spec scale: SIGKILL a separate-JVM refresh
  * drain at seeded-random kill points, heal in THIS session (q174's
  * two-session shape), and gate the final stores on the one-shot batch
  * chain's oracle — the same runOnce the committed CRASH_HARNESS.json
  * main drives at 8 kill points. The constructed poisoned-state tests
  * (RefreshPipelineSpec, StoreRootSpec) prove the crash windows we
  * designed for; the killer probes for the ones we didn't. */
class CrashHarnessSpec extends SparkSpec {

  test("a SIGKILLed refresh drain heals to the one-shot oracle " +
      "(stores, ledger, token mass) at randomized kill points") {
    assume(new java.io.File(
        "target/scala-2.13/classes/graft/tools/CrashHarness.class")
      .exists(), "compiled classes dir not where the child JVM needs it")
    val reports = CrashHarness.killOffsets(2, windowMs = 8000L, seed = 7L)
      .zipWithIndex.map { case (off, i) =>
        CrashHarness.runOnce(spark, i, off,
          prior = 400L, triggers = 4, batchRows = 100L)
      }
    reports.foreach { r =>
      assert(r.equivalence, s"served ids diverged from oracle: $r")
      assert(r.mass, s"store token mass diverged from oracle: $r")
      assert(r.ledger, s"ledger fingerprints diverged from oracle: $r")
    }
    // whether a given kill lands mid-drain is timing-dependent on a
    // shared host — the heal gate above holds either way; the committed
    // harness main REQUIRES >= half interrupted at its wider window
    info(s"interrupted: ${reports.count(_.interrupted)}/${reports.size}")
  }

  test("MANAGED-path crash injection: a SIGKILLed runManaged drain " +
      "(StoreRoot roots, compaction on schedule) heals to the oracle") {
    assume(new java.io.File(
        "target/scala-2.13/classes/graft/tools/CrashHarness.class")
      .exists(), "compiled classes dir not where the child JVM needs it")
    val reports = CrashHarness.killOffsets(2, windowMs = 9000L, seed = 9L)
      .zipWithIndex.map { case (off, i) =>
        CrashHarness.runOnce(spark, i, off,
          prior = 400L, triggers = 4, batchRows = 100L,
          compactEvery = Some(2))
      }
    reports.foreach { r =>
      assert(r.started, s"child never reached drain-start: $r")
      assert(r.equivalence, s"served ids diverged from oracle: $r")
      assert(r.mass, s"store token mass diverged from oracle: $r")
      assert(r.ledger, s"ledger fingerprints diverged from oracle: $r")
    }
    // the committed managed main additionally requires >= 1 kill
    // landing INSIDE a compaction window at its wider window; at spec
    // scale the landing is timing-dependent, so it is reported only
    info(s"interrupted: ${reports.count(_.interrupted)}/${reports.size}" +
      s", windows: ${reports.map(_.window).mkString(",")}" +
      s", gens after heal: ${reports.map(_.genAfterHeal).mkString(",")}")
  }

  test("DOUBLE kill: SIGKILL the drain inside a fold, SIGKILL the " +
      "heal mid-flight, heal again - still the one-shot oracle") {
    assume(new java.io.File(
        "target/scala-2.13/classes/graft/tools/CrashHarness.class")
      .exists(), "compiled classes dir not where the child JVM needs it")
    val r = CrashHarness.runDouble(spark, 0,
      kill2AfterMs = 6000L, kill2OnFold = false,
      prior = 2000L, triggers = 8, batchRows = 400L, compactEvery = 2)
    assert(r.equivalence, s"served ids diverged from oracle: $r")
    assert(r.mass, s"store token mass diverged from oracle: $r")
    assert(r.ledger, s"ledger fingerprints diverged from oracle: $r")
    assert(r.genAfterHeal >= 0, s"no manifest after heal: $r")
    info(s"k1=${r.kill1Ms}ms w1=${r.window1} int1=${r.interrupted1} " +
      s"k2=${r.kill2Ms}ms w2=${r.window2} int2=${r.interrupted2} " +
      s"gen=${r.genAfterHeal}")
  }
}
