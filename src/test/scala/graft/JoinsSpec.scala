package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** As-of join semantics: backward lookup, at-or-before inclusivity,
  * deterministic tiebreaks, no-match NULLs. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    ("u1", "2024-01-01 10:00:00", "e1"),
    ("u1", "2024-01-01 12:00:00", "e2"),
    ("u1", "2024-01-01 08:00:00", "e0"), // before any version
    ("u2", "2024-01-01 11:00:00", "e3"))
    .toDF("user_id", "ts", "event_id")
    .withColumn("ts", to_timestamp(col("ts")))

  private val versions = Seq(
    ("u1", "2024-01-01 09:00:00", "v1", 1),
    ("u1", "2024-01-01 10:00:00", "v2", 1),  // exactly at e1's ts
    ("u1", "2024-01-01 10:00:00", "v2b", 2), // tie: higher seq wins
    ("u1", "2024-01-01 11:30:00", "v3", 1),
    ("u3", "2024-01-01 00:00:00", "vx", 1))
    .toDF("user_id", "vts", "version", "seq")
    .withColumn("vts", to_timestamp(col("vts")))

  test("as-of: at-or-before, equal-ts inclusive, deterministic tie, NULLs") {
    val out = Joins.asOf(events, versions, Seq("user_id"), "ts", "vts",
      rightTiebreak = Some("seq"))
    val m = out.collect().map(r =>
      r.getAs[String]("event_id") -> r.getAs[String]("version")).toMap
    assert(m("e0") == null)   // no version yet
    assert(m("e1") == "v2b")  // equal timestamp visible; tiebreak by seq
    assert(m("e2") == "v3")   // latest at-or-before
    assert(m("e3") == null)   // u2 has no versions at all
    assert(out.columns.toSeq ==
      Seq("user_id", "ts", "event_id", "version", "seq"))
    assert(out.count() == 4)  // left rows preserved exactly
  }

  test("as-of: NULL-time right versions never match") {
    // a NULL vts would sort first and carry its payload into every left
    // row of the key; ASOF semantics (and DuckDB's ASOF, where sts <= ts
    // is never true for NULL) require it to be invisible
    val withNull = versions.unionByName(
      Seq(("u2", "x", "vnull", 9)).toDF("user_id", "vts", "version", "seq")
        .withColumn("vts", lit(null).cast("timestamp")))
    val out = Joins.asOf(events, withNull, Seq("user_id"), "ts", "vts",
      rightTiebreak = Some("seq"))
    val m = out.collect().map(r =>
      r.getAs[String]("event_id") -> r.getAs[String]("version")).toMap
    assert(m("e3") == null)  // u2's only version has NULL time -> no match
    assert(m("e0") == null && m("e1") == "v2b" && m("e2") == "v3")
  }

  test("saltedJoin: identical results to plain join; hot key spreads") {
    val big = spark.range(0, 1000).toDF("k")
      .withColumn("key", when(col("k") < 900, "hot").otherwise(col("k").cast("string")))
      .withColumn("payload", col("k") * 2)
    val small = Seq(("hot", "H"), ("5", "F"), ("901", "N"), ("unmatched", "U"))
      .toDF("key", "dim")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("key"), jt)
        .select("k", "key", "payload", "dim").collect().toSet
      val salted = Joins.saltedJoin(big, small, Seq("key"), salt = 8,
          joinType = jt)
        .select("k", "key", "payload", "dim").collect().toSet
      assert(salted == plain, s"join type $jt diverged")
    }
    // the hot key's rows must occupy multiple salt values (the whole point)
    import org.apache.spark.sql.functions.{hash => h}
    val spread = big.filter(col("key") === "hot")
      .select(pmod(h(big.columns.map(col): _*), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1)
  }

  test("rangeJoin: inclusive bounds, multi-match, malformed intervals, " +
      "parity with the naive cross join") {
    val points = Seq(1L, 2L, 4L, 6L, 10L, 25L).toDF("p")
    val intervals = Seq(("A", 2L, 4L), ("B", 4L, 6L), ("C", 20L, 30L),
      ("M", 9L, 7L)) // malformed: end < start, must match nothing
      .toDF("iv", "s", "e")
    val out = Joins.rangeJoin(points, intervals, "p", "s", "e",
        bucketWidth = 3)
      .select("p", "iv").as[(Long, String)].collect().toSet
    assert(out == Set((2L, "A"), (4L, "A"), (4L, "B"), (6L, "B"),
      (25L, "C")), s"got $out")

    // parity on a denser randomized-but-deterministic set, several bucket
    // widths (intervals spanning 0, 1, and many bucket boundaries)
    val ps = (0L until 200L).map(i => (i * 7919) % 500).toDF("p")
    val ivs = (0L until 40L).map { i =>
      val s = (i * 104729) % 450; (s"i$i", s, s + (i * 13) % 90)
    }.toDF("iv", "s", "e")
    val naive = ps.crossJoin(ivs)
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "iv").as[(Long, String)].collect().toSet
    for (w <- Seq(1L, 16L, 1000L)) {
      val got = Joins.rangeJoin(ps, ivs, "p", "s", "e", bucketWidth = w)
        .select("p", "iv").as[(Long, String)].collect().toSet
      assert(got == naive, s"bucketWidth $w diverged from the cross join")
    }
  }

  test("overlapJoin: inclusive overlap, emit-once across shared buckets, " +
      "parity with the naive cross join") {
    val l = Seq(("L1", 0L, 100L), ("L2", 50L, 60L), ("L3", 200L, 210L),
      ("LM", 30L, 20L)) // malformed
      .toDF("lk", "ls", "le")
    val r = Seq(("R1", 100L, 120L), ("R2", 55L, 58L), ("R3", 151L, 199L),
      ("R4", 210L, 300L))
      .toDF("rk", "rs", "re")
    // L1-R1 touch at exactly 100 (inclusive); L1 and R2/R1 share MANY
    // width-10 buckets with their partners -> emit-once matters
    val out = Joins.overlapJoin(l, r, "ls", "le", "rs", "re",
        bucketWidth = 10)
      .select("lk", "rk").as[(String, String)].collect().toList
    assert(out.distinct.size == out.size, s"duplicated pairs: $out")
    assert(out.toSet == Set(("L1", "R1"), ("L1", "R2"), ("L2", "R2"),
      ("L3", "R4")), s"got $out")
    // randomized-but-deterministic parity across bucket widths
    val ls = (0L until 60L).map { i =>
      val s = (i * 7919) % 400; (s"l$i", s, s + (i * 31) % 70)
    }.toDF("lk", "ls", "le")
    val rs = (0L until 60L).map { i =>
      val s = (i * 104729) % 400; (s"r$i", s, s + (i * 17) % 50)
    }.toDF("rk", "rs", "re")
    val naive = ls.crossJoin(rs)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lk", "rk").as[(String, String)].collect().toSet
    for (w <- Seq(1L, 13L, 1000L)) {
      val got = Joins.overlapJoin(ls, rs, "ls", "le", "rs", "re",
          bucketWidth = w)
        .select("lk", "rk").as[(String, String)].collect()
      assert(got.length == naive.size && got.toSet == naive,
        s"bucketWidth $w diverged")
    }
  }

  test("rangeJoin: an interval spanning too many buckets fails loudly") {
    val points = Seq(5L).toDF("p")
    val wide = Seq(("W", 0L, 10000L)).toDF("iv", "s", "e")
    val ex = intercept[Exception] {
      Joins.rangeJoin(points, wide, "p", "s", "e", bucketWidth = 10,
        maxBucketsPerInterval = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("buckets")), s"got $ex")
  }

  test("bloomSemiJoin == plain semi; bloomAntiJoin == plain anti (long keys)") {
    import scala.util.Random
    val rnd = new Random(7)
    val big = ((1 to 2000).map(_ => (Option(rnd.nextInt(500).toLong), rnd.nextInt(9))) ++
      Seq((None: Option[Long], 1))).toDF("k", "payload")
    val small = (0 until 200).map(i => Option(i * 3L)).toDF("sk")
      .unionByName(Seq(None: Option[Long]).toDF("sk"))
    val semi = Joins.bloomSemiJoin(big, small, "k", "sk")
    val anti = Joins.bloomAntiJoin(big, small, "k", "sk")
    val wantSemi = big.join(small, col("k") === col("sk"), "left_semi")
    val wantAnti = big.join(small, col("k") === col("sk"), "left_anti")
    assert(semi.columns.toSeq == big.columns.toSeq)
    assert(anti.columns.toSeq == big.columns.toSeq)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.get(0)), r.getInt(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    assert(bag(semi) == bag(wantSemi))
    assert(bag(anti) == bag(wantAnti))
    // partition-wise: semi + anti is exactly the input (null key in anti)
    assert(semi.count() + anti.count() == big.count())
    assert(anti.filter(col("k").isNull).count() == 1)
  }

  test("bloom joins: string keys, empty small side, tiny fpp still exact") {
    val big = Seq("a", "b", "c", "dd", "ee", null).toDF("k")
    val small = Seq("b", "dd", "zz").toDF("sk")
    val semi = Joins.bloomSemiJoin(big, small, "k", "sk", fpp = 0.5)
      .as[String].collect().sorted.toSeq
    assert(semi == Seq("b", "dd"))
    val anti = Joins.bloomAntiJoin(big, small, "k", "sk", fpp = 0.5)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(anti == Set(Some("a"), Some("c"), Some("ee"), None))
    // an empty reference: semi keeps nothing, anti keeps everything
    val none = small.filter(col("sk") === "nope")
    assert(Joins.bloomSemiJoin(big, none, "k", "sk").count() == 0)
    assert(Joins.bloomAntiJoin(big, none, "k", "sk").count() == big.count())
  }

  test("bloom probe runs codegen on the scan, before any exchange") {
    // AQE's wrapper hides the subtree from collect(); plan-shape pinning
    // wants the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = spark.range(0, 10000).toDF("k")
      val small = spark.range(0, 100).select((col("id") * 7).as("sk"))
      val out = Joins.bloomSemiJoin(big, small, "k", "sk")
      val plan = out.queryExecution.executedPlan
      // the probe filter must sit BELOW any exchange in the large branch:
      // its subtree is scan-side (filter pushed to the source, the whole
      // point of the prefilter)
      val probeFilter = plan.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("bloom_might_contain") &&
              !f.condition.toString.contains("__bloom_key") => f }
      assert(probeFilter.isDefined, plan.toString)
      assert(!probeFilter.get.child.toString.contains("Exchange"),
        plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
