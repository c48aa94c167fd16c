package graft

import java.nio.file.Files
import graft.operators.Ledger

/** S2/D2 incremental-discovery ledger semantics. */
class LedgerSpec extends SparkSpec {
  import spark.implicits._

  test("discoverNew: anti-join vs processed set; markProcessed appends") {
    val dir = Files.createTempDirectory("ledger").toString + "/l1"
    val ledger = new Ledger(spark, dir)
    val candidates = Seq("2024-01-01", "2024-01-02", "2024-01-03").toDF("key")
    assert(ledger.discoverNew(candidates).count() == 3) // empty ledger
    ledger.markProcessed(Seq("2024-01-01", "2024-01-02").toDF("key"))
    val fresh = ledger.discoverNew(candidates).as[String].collect()
    assert(fresh.toSeq == Seq("2024-01-03"))
    // idempotent append
    ledger.markProcessed(Seq("2024-01-01").toDF("key"))
    assert(ledger.discoverNew(candidates).count() == 1)
  }

  test("completable: last empty folder stays eligible (late-file rule)") {
    val dir = Files.createTempDirectory("ledger").toString + "/l2"
    val ledger = new Ledger(spark, dir)
    val cands = Seq(
      ("2024-01-01", true), ("2024-01-02", false), // empty but not last -> complete
      ("2024-01-03", false))                       // empty AND last -> stays open
      .toDF("key", "has_files")
    val done = ledger.completable(cands).as[String].collect().toSet
    assert(done == Set("2024-01-01", "2024-01-02"))
  }
}
