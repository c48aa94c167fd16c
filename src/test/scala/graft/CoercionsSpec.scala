package graft

import org.apache.spark.sql.functions._
import graft.core.Coercions

/** §1.2 cast battery edge cases (SURVEY.md; FIXTURES.md §A1 hazards). */
class CoercionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect()(0).get(0)

  test("strFill: NULL -> ''") {
    assert(one(Coercions.strFill(lit(null).cast("string"))) == "")
    assert(one(Coercions.strFill(lit("a"))) == "a")
  }

  test("boolTruthy: reference truthiness incl. the 'false'->1 hazard") {
    def bt(v: Any) = one(Coercions.boolTruthy(lit(v)))
    assert(bt(null) == 0)
    assert(bt("") == 0)
    assert(bt(0) == 0)
    assert(bt("0") == 0)       // pandas read_csv infers numeric 0 -> falsy
    assert(bt("false") == 1)   // truthiness hazard, SURVEY §7.4.1
    assert(bt("t") == 1)
    assert(bt(2) == 1)
  }

  test("boolWhitelist: only t/T/True/true/1, so 'TRUE' -> 0") {
    def bw(v: Any) = one(Coercions.boolWhitelist(lit(v)))
    assert(bw("t") == 1 && bw("T") == 1 && bw("True") == 1 &&
      bw("true") == 1 && bw("1") == 1)
    assert(bw("TRUE") == 0)    // matter whitelist hazard, SURVEY §7.4.1
    assert(bw("false") == 0 && bw(null) == 0 && bw("") == 0)
  }

  test("intCoerce: null/garbage -> 0, truncates toward zero") {
    def ic(v: Any) = one(Coercions.intCoerce(lit(v)))
    assert(ic(null) == 0L && ic("") == 0L && ic("garbage") == 0L)
    assert(ic("42") == 42L)
    assert(ic("3.9") == 3L)    // pandas astype(int) truncation
  }

  test("tsCoerce: errors='coerce' semantics") {
    assert(one(Coercions.tsCoerce(lit("not a time"))) == null)
    assert(one(Coercions.tsCoerce(lit("2024-01-02 03:04:05"))) != null)
    assert(one(Coercions.tsCoerce(lit(null).cast("string"))) == null)
  }

  test("dateDmy: dd/MM/yyyy, invalid calendar date -> NULL") {
    assert(one(Coercions.dateDmy(lit("15/03/2024"))).toString == "2024-03-15")
    assert(one(Coercions.dateDmy(lit("31/02/2024"))) == null) // FIXTURES A7
    assert(one(Coercions.dateDmy(lit("2024-03-15"))) == null)
  }

  test("emptyAsNull: blank and whitespace-only -> NULL, else trimmed") {
    assert(one(Coercions.emptyAsNull(lit(""))) == null)
    assert(one(Coercions.emptyAsNull(lit("   "))) == null)
    assert(one(Coercions.emptyAsNull(lit("  x "))) == "x")
  }

  test("utcToNyString: DST-aware conversion") {
    // January = EST (UTC-5), July = EDT (UTC-4)
    assert(one(Coercions.utcToNyString(lit("2024-01-15 12:00:00")
      .cast("timestamp"))) == "2024-01-15 07:00:00")
    assert(one(Coercions.utcToNyString(lit("2024-07-15 12:00:00")
      .cast("timestamp"))) == "2024-07-15 08:00:00")
  }
}
