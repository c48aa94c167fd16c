package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** SCD1 merge family semantics (SURVEY.md §2.4; fixture coverage per
  * FIXTURES.md §A1: new key, newer, older-ignored, same-batch duplicate). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (String, String, String)*): DataFrame =
    rows.toDF("id", "lastmodifieddate", "payload")

  private def asMap(df: DataFrame): Map[String, (String, String)] =
    df.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

  val target = tbl(
    ("a", "2024-01-10", "a-old"),
    ("b", "2024-01-10", "b-old"),
    ("c", "2024-01-10", "c-old"))

  test("scd1: new key inserted, newer updates, older ignored") {
    val staging = tbl(
      ("a", "2024-01-20", "a-new"),   // newer -> update
      ("b", "2024-01-05", "b-stale"), // older -> ignored
      ("d", "2024-01-15", "d-new"))   // absent -> insert
    val out = asMap(Merge.scd1(target, staging, Seq("id"), "lastmodifieddate"))
    assert(out == Map(
      "a" -> ("2024-01-20", "a-new"),
      "b" -> ("2024-01-10", "b-old"),
      "c" -> ("2024-01-10", "c-old"),
      "d" -> ("2024-01-15", "d-new")))
  }

  test("scd1: same-batch duplicate keys keep latest (D3)") {
    val staging = tbl(
      ("a", "2024-01-20", "a-v1"),
      ("a", "2024-01-25", "a-v2"),
      ("a", "2024-01-22", "a-v3"))
    val out = asMap(Merge.scd1(target, staging, Seq("id"), "lastmodifieddate"))
    assert(out("a") == ("2024-01-25", "a-v2"))
  }

  test("scd1: idempotent — merging the same staging twice is a no-op") {
    val staging = tbl(("a", "2024-01-20", "a-new"), ("d", "2024-01-15", "d"))
    val once = Merge.scd1(target, staging, Seq("id"), "lastmodifieddate")
    val twice = Merge.scd1(once, staging, Seq("id"), "lastmodifieddate")
    assert(asMap(once) == asMap(twice))
  }

  test("scd1: equal ordering value does NOT update (strict >)") {
    val staging = tbl(("a", "2024-01-10", "a-echo"))
    val out = asMap(Merge.scd1(target, staging, Seq("id"), "lastmodifieddate"))
    assert(out("a") == ("2024-01-10", "a-old"))
  }

  test("appendIfAbsent: existing keys never updated, new keys appended") {
    val staging = tbl(
      ("a", "2024-02-01", "a-SHOULD-NOT-APPEAR"),
      ("e", "2024-02-01", "e-new"),
      ("e", "2024-02-05", "e-dup"))
    val out = Merge.appendIfAbsent(target, staging, Seq("id"),
      "lastmodifieddate", Seq(col("payload")))
    assert(out.count() == 4)
    val m = asMap(out)
    assert(m("a") == ("2024-01-10", "a-old"))
    assert(m("e") == ("2024-02-01", "e-new")) // earliest wins, deterministic
  }

  test("scd1Partitioned: merges in place, untouched partitions not rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("pmerge").toString + "/t"
    def row(id: String, d: String, lm: String, p: String) = (id, d, lm, p)
    Seq(row("a", "2024-01-01", "2024-01-10", "a-old"),
        row("b", "2024-01-02", "2024-01-10", "b-old"))
      .toDF("id", "day", "lastmodifieddate", "payload")
      .write.partitionBy("day").parquet(dir)
    def files(day: String) =
      new java.io.File(s"$dir/day=$day").listFiles().map(_.getName).toSet
    val before = files("2024-01-02")

    val staging = Seq(
      row("a", "2024-01-01", "2024-01-20", "a-new"),  // update in-place
      row("c", "2024-01-01", "2024-01-15", "c-new"))  // insert same partition
      .toDF("id", "day", "lastmodifieddate", "payload")
    Merge.scd1Partitioned(dir, staging, Seq("id"), "lastmodifieddate", "day")

    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[String]("lastmodifieddate"), r.getAs[String]("payload"))).toMap
    assert(out == Map(
      "a" -> ("2024-01-20", "a-new"),
      "b" -> ("2024-01-10", "b-old"),
      "c" -> ("2024-01-15", "c-new")))
    assert(files("2024-01-02") == before) // untouched partition left alone
  }

  test("scd1Partitioned: NULL partition values merge, never clobber") {
    // isin(touched) never matches NULL — without null-safe pruning the
    // existing rows of the null partition are excluded from the merge and
    // dynamic overwrite rewrites __HIVE_DEFAULT_PARTITION__ staging-only
    val dir = java.nio.file.Files.createTempDirectory("pmergenull").toString + "/t"
    Seq(("a", null, "2024-01-10", "a-old"),
        ("n", null, "2024-01-10", "n-old"),     // must survive
        ("b", "2024-01-02", "2024-01-10", "b-old"))
      .toDF("id", "day", "lastmodifieddate", "payload")
      .write.partitionBy("day").parquet(dir)
    val staging = Seq(
      ("a", null, "2024-01-20", "a-new"),        // update in null partition
      ("c", null, "2024-01-15", "c-new"))        // insert in null partition
      .toDF("id", "day", "lastmodifieddate", "payload")
    Merge.scd1Partitioned(dir, staging, Seq("id"), "lastmodifieddate", "day")
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("payload")).toMap
    assert(out == Map("a" -> "a-new", "n" -> "n-old",
      "b" -> "b-old", "c" -> "c-new"))
  }

  test("scd1Bucketed: merges correctly; bucketed tables join exchange-free") {
    val name = "bmerge_target"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    Merge.scd1Bucketed(name, target, Seq("id"), "lastmodifieddate",
      nBuckets = 4)
    val staging = tbl(
      ("a", "2024-01-20", "a-new"),   // newer -> update
      ("d", "2024-01-15", "d-new"))   // absent -> insert
    Merge.scd1Bucketed(name, staging, Seq("id"), "lastmodifieddate",
      nBuckets = 4)
    val out = asMap(spark.table(name))
    assert(out == Map(
      "a" -> ("2024-01-20", "a-new"),
      "b" -> ("2024-01-10", "b-old"),
      "c" -> ("2024-01-10", "c-old"),
      "d" -> ("2024-01-15", "d-new")))
    // the point of the bucketing: a key-equi self-join of the bucketed
    // table plans with ZERO exchanges — at 100 TB neither side reshuffles.
    // (disable auto-broadcast: a big-big join is the scenario bucketing
    // exists for; the test table is tiny so the planner would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(name).as("x")
        .join(spark.table(name).select(col("id"),
          col("payload").as("p2")).as("y"), Seq("id"))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(s"DROP TABLE $name")
  }

  test("scd1Bucketed: recovers from both interrupted-swap crash states") {
    val name = "bmerge_crash"
    val tmp = name + "__merge_tmp"
    def cleanup(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
    }
    cleanup()
    // crash AFTER DROP, before RENAME: only tmp exists and holds the
    // committed merge -> next run must adopt it, not rebuild from staging
    Merge.scd1Bucketed(tmp, target, Seq("id"), "lastmodifieddate", 4)
    Merge.scd1Bucketed(name, tbl(("d", "2024-01-15", "d-new")),
      Seq("id"), "lastmodifieddate", 4)
    assert(asMap(spark.table(name)) == Map(
      "a" -> ("2024-01-10", "a-old"), "b" -> ("2024-01-10", "b-old"),
      "c" -> ("2024-01-10", "c-old"), "d" -> ("2024-01-15", "d-new")))
    // crash BEFORE DROP: both exist; tmp never committed -> discarded,
    // target intact, the new merge applies on the real target
    spark.table(name).limit(1)
      .write.bucketBy(4, "id").sortBy("id").mode("overwrite")
      .format("parquet").saveAsTable(tmp) // stale leftover tmp
    Merge.scd1Bucketed(name, tbl(("a", "2024-01-20", "a-new")),
      Seq("id"), "lastmodifieddate", 4)
    val out = asMap(spark.table(name))
    assert(out("a") == (("2024-01-20", "a-new")) && out.size == 4)
    assert(!spark.catalog.tableExists(tmp))
    cleanup()
  }

  test("conditional: update only when the tracked column changed (M3/J5)") {
    val goalsTarget = Seq(("e1", "2024-W1", 10), ("e2", "2024-W1", 20))
      .toDF("email", "week", "goal")
    val staging = Seq(
      ("e1", "2024-W1", 10),  // unchanged -> no-op
      ("e2", "2024-W1", 25),  // changed -> update
      ("e3", "2024-W1", 30))  // new -> insert
    .toDF("email", "week", "goal")
    val out = Merge.conditional(goalsTarget, staging, Seq("email", "week"),
      (st, _) => col("s.goal") =!= col("t.goal"))
    val m = out.collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(m == Map("e1" -> 10, "e2" -> 25, "e3" -> 30))
  }

  test("delta: pre-filter keeps only new-or-newer rows (J1)") {
    val staging = tbl(
      ("a", "2024-01-20", "newer"), ("b", "2024-01-01", "older"),
      ("z", "2024-01-01", "new"))
    val d = Merge.delta(target, staging, Seq("id"), "lastmodifieddate")
    assert(d.select("id").as[String].collect().toSet == Set("a", "z"))
  }

  test("keepLatest: tiebreak column decides equal orderings") {
    val df = Seq(("a", "2024-01-10", 1, "first"), ("a", "2024-01-10", 2, "second"))
      .toDF("id", "lastmodifieddate", "seq", "payload")
    val out = Merge.keepLatest(df, Seq("id"), "lastmodifieddate", Seq(col("seq")))
    assert(out.select("payload").as[String].collect().toSeq == Seq("second"))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe content, " +
      "normalization-insensitive") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, null.asInstanceOf[String]), (5L, "Same  Words"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha"),            // unchanged
      (3L, "gamma EDIT"),                  // changed
      (4L, null.asInstanceOf[String]),     // NULL on both sides: unchanged
      (5L, "same words"),                  // normalization-equal: unchanged
      (6L, "fresh"))                       // added; 2 is removed
      .toDF("doc_id", "text")
    val out = Merge.snapshotDiff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "unchanged", 5L -> "unchanged", 6L -> "added"))
  }
}
