package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Type-coercion battery reproducing the reference's pandas cleaning
  * semantics (see SURVEY.md §1.2; reference:
  * `Salesforce/Task/lambda_litify_task.py:97-111`,
  * `Salesforce/Matter/lambda_litify_matter.py:282-301`,
  * `Google Sheets/Employee/lambda_legal_employee_upsert.py:41-55`).
  *
  * All coercions are null-on-failure (never throw), independent of the
  * session's `spark.sql.ansi.enabled` setting — try_* forms keep the
  * battery total, matching `pd.to_datetime(errors='coerce')` / `fillna(...)`.
  */
object Coercions {

  /** NULL -> '' ; everything else -> string form.
    * Mirrors `fillna('').astype(str)` (lambda_litify_task.py:110-111). */
  def strFill(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Unparseable / NULL -> NULL timestamp.
    * Mirrors `pd.to_datetime(errors='coerce')` (lambda_litify_task.py:97-100). */
  def tsCoerce(c: Column): Column = try_to_timestamp(c.cast("string"))

  /** Truthiness boolean -> int 0/1.
    * Mirrors `fillna(0).astype(bool).astype(int)` (lambda_litify_task.py:102-104):
    * NULL / '' / numeric zero -> 0, anything else (including the string
    * "false"!) -> 1. The "false"->1 hazard is deliberate reference parity
    * (SURVEY.md §7.4.1). */
  def boolTruthy(c: Column): Column = {
    val s = c.cast("string")
    val asNum = s.try_cast("double")
    when(c.isNull || s === "", 0)
      .when(asNum.isNotNull && asNum === 0.0, 0)
      .otherwise(1)
  }

  /** Whitelist boolean -> int 0/1.
    * Mirrors `1 if x in ['t','T','True','true',1] else 0`
    * (lambda_litify_matter.py:286-288). Note "TRUE" -> 0, also deliberate. */
  def boolWhitelist(c: Column): Column =
    when(c.cast("string").isin("t", "T", "True", "true", "1"), 1).otherwise(0)

  /** NULL/unparseable -> 0. Mirrors `fillna(0).astype(int)`
    * (lambda_litify_matter.py:291-293). Divergence on garbage strings is
    * deliberate (SURVEY.md §7.4.5): pandas drops the whole file, we null->0. */
  def intCoerce(c: Column): Column =
    coalesce(c.cast("string").try_cast("double").cast("long"), lit(0L))

  /** NULL/unparseable -> 0.0. Mirrors `fillna(0).astype(float)`. */
  def floatCoerce(c: Column): Column =
    coalesce(c.cast("string").try_cast("double"), lit(0.0))

  /** dd/MM/yyyy string -> DATE, invalid -> NULL
    * (lambda_legal_employee_upsert.py:41-49). */
  def dateDmy(c: Column): Column =
    try_to_timestamp(c, lit("dd/MM/yyyy")).cast("date")

  /** '' (after trim) or NULL -> NULL, else trimmed
    * (lambda_legal_employee_upsert.py:51-55; Redshift BLANKSASNULL EMPTYASNULL). */
  def emptyAsNull(c: Column): Column = {
    // Python str.strip() removes ALL whitespace, not just spaces like SQL
    // trim — use a regex strip for parity.
    val t = regexp_replace(c.cast("string"), "^\\s+|\\s+$", "")
    when(c.isNull || t === "", lit(null).cast("string")).otherwise(t)
  }

  /** UTC instant -> New-York-local "yyyy-MM-dd HH:mm:ss" string, the storage
    * format the reference bakes in (lambda_connect_firehose_redshift.py:30-39). */
  def utcToNyString(c: Column): Column =
    date_format(from_utc_timestamp(c, "America/New_York"), "yyyy-MM-dd HH:mm:ss")
}
