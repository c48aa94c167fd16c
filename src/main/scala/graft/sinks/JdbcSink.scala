package graft.sinks

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink (S5/S6/S13): stage a DataFrame into a staging table
  * with Spark's parallel JDBC writer, then run the generated merge
  * statements in ONE transaction on the driver.
  *
  * This is the Spark-native replacement for the reference's three load
  * paths, which all converge on "get rows into a staging table, then run a
  * stored procedure":
  *  - S3 JSONL + COPY + CALL (`Salesforce/Task/lambda_litify_task.py:36-52`)
  *    -> [[stage]] (parallel executor-side INSERT batches) + [[scd1]];
  *  - psycopg2 execute_values row batches
  *    (`…/lambda_boto3_connect_redshift.py:192-226`) -> [[appendRows]];
  *  - per-row INSERT + CALL (`…/lambda_legal_employee_upsert.py:57-147`)
  *    -> [[stage]] + [[conditional]].
  *
  * Scale notes: the DataFrame write is executor-parallel (one connection
  * per partition, `batchsize` rows per round trip — coalesce to a sane
  * partition count first; a 1000-executor write would DDoS the warehouse).
  * The merge statements are set-based SQL executed once on the warehouse —
  * never row-at-a-time from the driver.
  */
object JdbcSink {

  final case class Conn(url: String, props: Properties = new Properties) {
    def withConnection[A](f: java.sql.Connection => A): A = {
      val c = DriverManager.getConnection(url, props)
      try f(c) finally c.close()
    }
  }

  /** Execute statements sequentially in one transaction (commit at the end,
    * rollback on failure) — the reference procedures are transactional as a
    * whole, so a half-applied merge must not be observable. */
  def execute(conn: Conn, statements: Seq[String]): Unit =
    conn.withConnection { c =>
      c.setAutoCommit(false)
      try {
        val st = c.createStatement()
        try statements.foreach(st.execute) finally st.close()
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
    }

  /** Stage `df` into `stagingTable` (append; table pre-created so column
    * types stay warehouse-controlled, mirroring COPY into an existing
    * staging table). `repartition`, not `coalesce`: coalesce would cap the
    * WHOLE upstream computation at numPartitions tasks — one bounded
    * shuffle here keeps upstream parallelism intact and only the writer
    * narrow. */
  def stage(df: DataFrame, conn: Conn, stagingTable: String,
            numPartitions: Int = 8, batchSize: Int = 10000): Unit =
    df.repartition(numPartitions)
      .write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(conn.url, stagingTable, conn.props)

  /** S5/S13: stage + SCD1 merge + staging truncate. The batch is reduced to
    * one row per key BEFORE staging (MergeSql documents a <=1-row-per-key
    * staging invariant — ansiScd1's DELETE-then-INSERT would otherwise
    * insert every same-key duplicate into the target). */
  def scd1(df: DataFrame, conn: Conn, target: String, staging: String,
           keys: Seq[String], ordering: String): Unit = {
    stage(graft.operators.Merge.keepLatest(df, keys, ordering), conn, staging)
    execute(conn, MergeSql.ansiScd1(target, staging, keys, ordering,
      df.columns.toSeq))
  }

  /** S6: stage + insert-if-absent + staging truncate (immutable facts).
    * Same <=1-row-per-key reduction: the NOT-EXISTS insert only checks the
    * TARGET, so within-batch duplicates would all pass it. `ordering` is
    * REQUIRED (earliest wins — deterministic first-writer-wins, D1):
    * an arbitrary survivor would make replayed batches produce different
    * warehouse contents run to run. */
  def appendIfAbsent(df: DataFrame, conn: Conn, target: String,
                     staging: String, keys: Seq[String],
                     ordering: String): Unit = {
    stage(graft.operators.Merge.keepFirst(df, keys, ordering), conn, staging)
    execute(conn, MergeSql.appendIfAbsent(target, staging, keys,
      df.columns.toSeq))
  }

  /** S6 row-append with no merge (execute_values equivalent): plain
    * parallel batched INSERT into the target. */
  def appendRows(df: DataFrame, conn: Conn, table: String,
                 numPartitions: Int = 8, batchSize: Int = 10000): Unit =
    stage(df, conn, table, numPartitions, batchSize)

  /** S13/M3: stage + conditional-column merge. Redshift-dialect MERGE —
    * for warehouses without MERGE support, run the Spark-side
    * [[graft.operators.Merge.conditional]] and overwrite instead.
    * Reduced to one row per key before staging (MERGE raises on duplicate
    * source matches); `ordering` is REQUIRED — latest wins, so the
    * survivor is deterministic across replays. */
  def conditional(df: DataFrame, conn: Conn, target: String, staging: String,
                  keys: Seq[String], cond: String,
                  ordering: String): Unit = {
    stage(graft.operators.Merge.keepLatest(df, keys, ordering), conn, staging)
    execute(conn, MergeSql.redshiftConditional(target, staging, keys, cond,
      df.columns.toSeq))
  }
}
