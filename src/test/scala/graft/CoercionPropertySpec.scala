package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.core.Coercions
import graft.operators.Merge

/** Property-style invariants (SURVEY.md §5.2): cast totality (never throws,
  * output domain holds) over adversarial strings in ONE Spark job, and merge
  * idempotence over randomized tables. */
class CoercionPropertySpec extends SparkSpec {
  import spark.implicits._

  test("cast battery is total: arbitrary strings never throw, domains hold") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const(null: String),
      Gen.oneOf("t", "T", "TRUE", "false", "0", "00", "-0", "1e99",
        "NaN", "Infinity", "2024-13-45", "31/02/2024", "999999999999999999999",
        "  padded  ", "\t", "'); DROP TABLE x;--"))
    val samples = Gen.listOfN(300, gen).sample.get
    val df = samples.toDF("s")
    val out = df.select(
      Coercions.strFill($"s").as("sf"),
      Coercions.boolTruthy($"s").as("bt"),
      Coercions.boolWhitelist($"s").as("bw"),
      Coercions.intCoerce($"s").as("ic"),
      Coercions.floatCoerce($"s").as("fc"),
      Coercions.tsCoerce($"s").as("tc"),
      Coercions.dateDmy($"s").as("dd"),
      Coercions.emptyAsNull($"s").as("en")).collect()
    out.foreach { r =>
      assert(r.getAs[String]("sf") != null)              // never null
      assert(Set(0, 1).contains(r.getAs[Int]("bt")))
      assert(Set(0, 1).contains(r.getAs[Int]("bw")))
      val en = r.getAs[String]("en")
      assert(en == null || (en == en.trim && en.nonEmpty))
    }
  }

  test("scd1 merge idempotence on randomized tables") {
    val rng = new scala.util.Random(7)
    var seq = 0
    // unique ordering values per row => keep-latest fully deterministic
    def randTable(n: Int) = (1 to n).map { _ =>
      seq += 1
      (s"k${rng.nextInt(10)}", f"2024-01-${1 + rng.nextInt(28)}%02d $seq%05d",
        s"v${rng.nextInt(1000)}")
    }.toDF("id", "lastmodifieddate", "payload")
    for (_ <- 1 to 3) {
      val target = Merge.keepLatest(randTable(30), Seq("id"), "lastmodifieddate")
      val staging = randTable(30)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val once = Merge.scd1(target, staging, Seq("id"), "lastmodifieddate")
        .cache()
      val twice = Merge.scd1(once, staging, Seq("id"), "lastmodifieddate")
      assert(canon(once) == canon(twice))
      // exactly one row per key survives
      assert(once.select("id").distinct().count() == once.count())
    }
  }
}
