package graft

import java.util.Properties
import org.apache.spark.sql.functions._
import graft.sinks.{JdbcSink, MergeSql}

/** Sink layer (S5/S6/S13): golden statement generation + an embedded Derby
  * round-trip of the full stage -> merge -> truncate cycle. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "lastmodifieddate", "payload")

  test("redshift SCD1 sequence matches the reference procedure shape") {
    val stmts = MergeSql.redshiftScd1("litify.task", "litify.task_staging",
      Seq("id"), "lastmodifieddate", cols)
    assert(stmts.size == 4)
    assert(stmts(0).startsWith("CREATE TEMP TABLE temp_source AS"))
    assert(stmts(0).contains(
      "WHERE t.id IS NULL OR s.lastmodifieddate > t.lastmodifieddate"))
    assert(stmts(1).contains("MERGE INTO litify.task"))
    assert(stmts(1).contains("ON litify.task.id = source.id"))
    assert(stmts(1).contains("lastmodifieddate = source.lastmodifieddate"))
    assert(!stmts(1).contains("id = source.id,")) // keys never in UPDATE SET
    assert(stmts(1).contains("VALUES (\n    source.id, source.lastmodifieddate, source.payload\n)"))
    assert(stmts(2) == "DROP TABLE temp_source")
    assert(stmts(3) == "DELETE FROM litify.task_staging")
  }

  test("append-if-absent + COPY + conditional shapes") {
    val app = MergeSql.appendIfAbsent("connect.f_calls",
      "connect.f_calls_staging", Seq("contact_id"), Seq("contact_id", "x"))
    assert(app(0).contains("LEFT JOIN connect.f_calls f ON s.contact_id = f.contact_id"))
    assert(app(0).contains("WHERE f.contact_id IS NULL"))
    assert(app(1) == "DELETE FROM connect.f_calls_staging")

    val copy = MergeSql.redshiftCopy("litify.task_staging",
      "s3://bucket/stage/task.jsonl", "arn:aws:iam::0:role/load")
    assert(copy.contains("FORMAT AS JSON 'auto'"))
    assert(copy.contains("BLANKSASNULL"))
    assert(copy.contains("EMPTYASNULL"))

    val cond = MergeSql.redshiftConditional("legal.goals",
      "legal.goals_staging", Seq("id"),
      "legal.goals.goal <> source.goal", Seq("id", "goal"))
    assert(cond(0).contains("WHEN MATCHED AND (legal.goals.goal <> source.goal)"))
  }

  test("embedded Derby round-trip: stage -> ansi SCD1 -> truncate") {
    val url = "jdbc:derby:memory:sinkspec;create=true"
    val conn = JdbcSink.Conn(url, new Properties)
    conn.withConnection { c =>
      val st = c.createStatement()
      // pre-created tables = warehouse-controlled types (like COPY targets)
      st.execute("CREATE TABLE tgt (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.execute("CREATE TABLE stg (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.execute("INSERT INTO tgt VALUES " +
        "('a', '2024-01-10', 'a-old'), ('b', '2024-01-10', 'b-old')")
      st.close()
    }
    val staging = Seq(
      ("a", "2024-01-20", "a-new"),   // newer -> replaces
      ("b", "2024-01-05", "b-stale"), // older -> ignored
      ("d", "2024-01-15", "d-new"))   // absent -> inserted
      .toDF("id", "lastmodifieddate", "payload")

    JdbcSink.scd1(staging, conn, "tgt", "stg", Seq("id"), "lastmodifieddate")

    val out = spark.read.jdbc(url, "tgt", new Properties)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out == Map(
      "a" -> ("2024-01-20", "a-new"),
      "b" -> ("2024-01-10", "b-old"),
      "d" -> ("2024-01-15", "d-new")))
    // staging truncated
    val stgRows = spark.read.jdbc(url, "stg", new Properties).count()
    assert(stgRows == 0)
  }

  test("Derby scd1: duplicate-key batch stages one row per key (keep-latest)") {
    // ansiScd1's DELETE-then-INSERT would insert BOTH copies of a same-key
    // duplicate; JdbcSink must reduce the batch to <=1 row/key first
    val url = "jdbc:derby:memory:dupkeys;create=true"
    val conn = JdbcSink.Conn(url, new Properties)
    conn.withConnection { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE tgt (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.execute("CREATE TABLE stg (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.close()
    }
    val staging = Seq(
      ("a", "2024-01-20", "a-v1"),
      ("a", "2024-01-25", "a-v2"),   // latest -> sole survivor
      ("a", "2024-01-22", "a-v3"))
      .toDF("id", "lastmodifieddate", "payload")
    JdbcSink.scd1(staging, conn, "tgt", "stg", Seq("id"), "lastmodifieddate")
    val rows = spark.read.jdbc(url, "tgt", new Properties)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(rows.toSeq == Seq(("a", "a-v2")))
  }

  test("stream -> JDBC warehouse: foreachBatch stages and merges into Derby") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val url = "jdbc:derby:memory:streamsink;create=true"
    val conn = JdbcSink.Conn(url, new Properties)
    conn.withConnection { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE tgt (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.execute("CREATE TABLE stg (id VARCHAR(16) NOT NULL, " +
        "lastmodifieddate VARCHAR(32), payload VARCHAR(64))")
      st.close()
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    mem.addData(("a", "2024-01-10", "a-v1"), ("b", "2024-01-10", "b-v1"))
    val dir = java.nio.file.Files.createTempDirectory("jdbcstream").toString
    def run(): Unit = {
      val q = mem.toDF().toDF("id", "lastmodifieddate", "payload")
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          JdbcSink.scd1(batch, conn, "tgt", "stg",
            Seq("id"), "lastmodifieddate")
        }.start()
      q.awaitTermination()
    }
    run()
    mem.addData(("a", "2024-01-20", "a-v2"), ("c", "2024-01-15", "c-v1"))
    run()
    val out = spark.read.jdbc(url, "tgt", new Properties)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "a-v2", "b" -> "b-v1", "c" -> "c-v1"))
  }

  test("embedded Derby round-trip: append-if-absent never updates") {
    val url = "jdbc:derby:memory:sinkspec2;create=true"
    val conn = JdbcSink.Conn(url, new Properties)
    conn.withConnection { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE f (contact_id VARCHAR(16) NOT NULL, " +
        "v VARCHAR(16))")
      st.execute("CREATE TABLE fs (contact_id VARCHAR(16) NOT NULL, " +
        "v VARCHAR(16))")
      st.execute("INSERT INTO f VALUES ('c1', 'orig')")
      st.close()
    }
    val staging = Seq(("c1", "CHANGED"), ("c2", "new"))
      .toDF("contact_id", "v")
    JdbcSink.appendIfAbsent(staging, conn, "f", "fs", Seq("contact_id"), "v")
    val out = spark.read.jdbc(url, "f", new Properties)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("c1" -> "orig", "c2" -> "new"))
  }
  test("writeSized/compact: many tiny files -> ceil(n/target) even files, " +
      "row and schema parity") {
    import graft.sinks.FileSink
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-")
    try {
      val in = s"$dir/in"; val out = s"$dir/out"
      // the pathological ingest layout: 64 partitions of ~8 rows each
      spark.range(0, 500).toDF("id")
        .withColumn("v", col("id") * 2)
        .repartition(64).write.parquet(in)
      assert(FileSink.countDataFiles(spark, in) >= 32L)
      val (before, after, rows) = FileSink.compact(spark, in, out, 100L)
      assert(rows == 500L)
      assert(before >= 32L)
      // ~ceil(500/100): round-robin imbalance may split a few stragglers,
      // but no file exceeds the target and the count stays near-minimal
      assert(after >= 5L && after <= 10L, s"after=$after")
      assert(after < before)
      val back = spark.read.parquet(out)
      assert(back.count() == 500L)
      assert(back.columns.sorted.toSeq == Seq("id", "v"))
      assert(back.agg(sum("id")).head.getLong(0) == (0L until 500L).sum)
      // tiny input never produces zero files / zero-target is rejected
      intercept[IllegalArgumentException] {
        FileSink.writeSized(spark.range(1).toDF("id"), s"$dir/z", 0L) }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
  test("FileSink retention: retire deletes only a covered pre-compaction " +
      "dir; grown sources and late accesses fail loudly") {
    import graft.sinks.FileSink
    val dir = java.nio.file.Files.createTempDirectory("graft-fsretire-")
    try {
      val in = s"$dir/in"; val out = s"$dir/out"; val out2 = s"$dir/out2"
      spark.range(0, 300).toDF("id").repartition(16).write.parquet(in)
      // no lineage marker yet -> refused
      intercept[IllegalArgumentException] {
        FileSink.retire(spark, in, out)
      }
      FileSink.compact(spark, in, out, 100L)
      // the source GREW past the fold (an append the compaction never
      // saw) -> refused until a fresh compaction covers it
      spark.range(300, 350).toDF("id").write.mode("append").parquet(in)
      val grown = intercept[IllegalArgumentException] {
        FileSink.retire(spark, in, out)
      }
      assert(grown.getMessage.contains("recompact"))
      FileSink.compact(spark, in, out2, 100L)
      FileSink.retire(spark, in, out2)
      // payload gone, tombstone marker survives; every FileSink access
      // against the retired path fails loudly naming the successor
      assert(new java.io.File(in).listFiles()
        .map(_.getName).toSeq == Seq("_graft_retired"))
      Seq(
        () => { FileSink.countDataFiles(spark, in); () },
        () => { FileSink.compact(spark, in, s"$dir/x", 100L); () },
        () => { FileSink.writeSized(spark.range(1).toDF("id"), in,
          10L); () }
      ).foreach { f =>
        val e = intercept[IllegalStateException](f())
        assert(e.getMessage.contains("retired")
          && e.getMessage.contains("out2"))
      }
      // the survivor holds the covered fold
      assert(spark.read.parquet(out2).count() == 350L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("overwritePartitions: rewriting one day leaves the others intact") {
    import graft.sinks.FileSink
    val dir = java.nio.file.Files.createTempDirectory("graft-dynpart-")
    try {
      val path = s"$dir/t"
      val day1 = Seq((1L, "2024-01-01"), (2L, "2024-01-01"),
        (3L, "2024-01-02")).toDF("id", "day")
      assert(FileSink.overwritePartitions(day1, path, "day") ==
        Seq("2024-01-01", "2024-01-02"))
      // re-run day 2 with corrected data: day 1 must survive untouched
      val day2fix = Seq((30L, "2024-01-02"), (31L, "2024-01-02"))
        .toDF("id", "day")
      assert(FileSink.overwritePartitions(day2fix, path, "day") ==
        Seq("2024-01-02"))
      // partition-value inference reads the day strings back as DATE
      val back = spark.read.parquet(path)
        .select(col("id"), col("day").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(back == Set((1L, "2024-01-01"), (2L, "2024-01-01"),
        (30L, "2024-01-02"), (31L, "2024-01-02")))
      // the session conf is restored (default static) after the write
      assert(spark.conf.getOption(
        "spark.sql.sources.partitionOverwriteMode").forall(_ != "dynamic"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
