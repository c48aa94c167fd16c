package graft.sinks

/** Warehouse-side merge statement generation — the SQL half of the
  * reference's load layer (S5/S6/S13), generated from the same
  * (target, staging, keys, ordering, columns) declaration the Spark-side
  * [[graft.operators.Merge]] uses.
  *
  * Two dialects:
  *  - `redshift*`: the exact statement sequence the reference's stored
  *    procedures issue — CREATE TEMP delta table, MERGE INTO, DROP, truncate
  *    staging (`Salesforce/Task/SP_litify_task.sql:6-76`,
  *    `Google Sheets/Employee/SP_legal_employee_upsert.sql:6-56`) and the
  *    S3 COPY bulk load (`Salesforce/Task/lambda_litify_task.py:36-52`).
  *  - `ansi*`: the same semantics as portable ANSI statements (no temp
  *    tables, no MERGE) runnable on any JDBC database — DELETE-stale +
  *    INSERT-unmatched. Used by [[JdbcSink]] and the embedded round-trip
  *    tests.
  *
  * All generators assume the staging table holds at most one row per key
  * (the Spark side stages through keep-latest first, like the reference's
  * per-batch pandas dedup).
  */
object MergeSql {

  private def onClause(target: String, keys: Seq[String]): String =
    keys.map(k => s"$target.$k = source.$k").mkString(" AND ")

  private def joinClause(keys: Seq[String], l: String, r: String): String =
    keys.map(k => s"$l.$k = $r.$k").mkString(" AND ")

  /** Delta selection: new keys or strictly-newer rows
    * (`SP_litify_task.sql:6-11`). */
  private def deltaSelect(target: String, staging: String, keys: Seq[String],
                          ordering: String): String =
    s"""SELECT s.* FROM $staging s
       |LEFT JOIN $target t ON ${joinClause(keys, "s", "t")}
       |WHERE t.${keys.head} IS NULL OR s.$ordering > t.$ordering""".stripMargin

  /** Redshift COPY bulk load of a JSONL stage
    * (`lambda_litify_task.py:36-52`). */
  def redshiftCopy(staging: String, s3Path: String, iamRole: String): String =
    s"""COPY $staging
       |FROM '$s3Path'
       |IAM_ROLE '$iamRole'
       |FORMAT AS JSON 'auto'
       |TIMEFORMAT 'auto'
       |BLANKSASNULL
       |EMPTYASNULL""".stripMargin

  /** SCD1 merge, reference procedure shape: temp delta table -> MERGE INTO
    * (matched: update all non-key columns; not matched: insert all) ->
    * drop temp -> truncate staging (`SP_litify_task.sql:6-76`). */
  def redshiftScd1(target: String, staging: String, keys: Seq[String],
                   ordering: String, columns: Seq[String]): Seq[String] = {
    val nonKey = columns.filterNot(keys.contains)
    val temp = "temp_source"
    Seq(
      s"CREATE TEMP TABLE $temp AS\n${deltaSelect(target, staging, keys, ordering)}",
      s"""MERGE INTO $target
         |USING $temp AS source
         |ON ${onClause(target, keys)}
         |WHEN MATCHED THEN UPDATE SET
         |${nonKey.map(c => s"    $c = source.$c").mkString(",\n")}
         |WHEN NOT MATCHED THEN INSERT (
         |    ${columns.mkString(", ")}
         |) VALUES (
         |    ${columns.map(c => s"source.$c").mkString(", ")}
         |)""".stripMargin,
      s"DROP TABLE $temp",
      s"DELETE FROM $staging")
  }

  /** Append-if-absent, reference procedure shape: INSERT the staging rows
    * whose key has no match, truncate staging
    * (`SP_boto3_connect_redshift.sql:5-29`). Portable ANSI as-is. */
  def appendIfAbsent(target: String, staging: String, keys: Seq[String],
                     columns: Seq[String]): Seq[String] = Seq(
    s"""INSERT INTO $target (${columns.mkString(", ")})
       |SELECT ${columns.map(c => s"s.$c").mkString(", ")}
       |FROM $staging s
       |LEFT JOIN $target f ON ${joinClause(keys, "s", "f")}
       |WHERE f.${keys.head} IS NULL""".stripMargin,
    s"DELETE FROM $staging")

  /** SCD1 merge as portable ANSI: delete target rows a strictly-newer
    * staged row replaces, insert staged rows that now have no match, then
    * truncate staging. Equivalent to [[redshiftScd1]] when staging holds
    * one row per key. */
  def ansiScd1(target: String, staging: String, keys: Seq[String],
               ordering: String, columns: Seq[String]): Seq[String] = Seq(
    s"""DELETE FROM $target WHERE EXISTS (
       |  SELECT 1 FROM $staging s
       |  WHERE ${joinClause(keys, "s", target)}
       |  AND s.$ordering > $target.$ordering)""".stripMargin,
    s"""INSERT INTO $target (${columns.mkString(", ")})
       |SELECT ${columns.map(c => s"s.$c").mkString(", ")}
       |FROM $staging s
       |LEFT JOIN $target t ON ${joinClause(keys, "s", "t")}
       |WHERE t.${keys.head} IS NULL""".stripMargin,
    s"DELETE FROM $staging")

  /** Conditional-column merge (M3): update matched rows only when `cond`
    * holds over (target, source), insert absent keys — the goals/employee
    * upsert shape (`SP_legal_employee_upsert.sql:6-56`,
    * `lambda_legal_goals_upsert.py:48-59`). `cond` references columns as
    * `$target.col` / `source.col`. */
  def redshiftConditional(target: String, staging: String, keys: Seq[String],
                          cond: String, columns: Seq[String]): Seq[String] = {
    val nonKey = columns.filterNot(keys.contains)
    Seq(
      s"""MERGE INTO $target
         |USING $staging AS source
         |ON ${onClause(target, keys)}
         |WHEN MATCHED AND ($cond) THEN UPDATE SET
         |${nonKey.map(c => s"    $c = source.$c").mkString(",\n")}
         |WHEN NOT MATCHED THEN INSERT (
         |    ${columns.mkString(", ")}
         |) VALUES (
         |    ${columns.map(c => s"source.$c").mkString(", ")}
         |)""".stripMargin,
      s"DELETE FROM $staging")
  }
}
