package graft

import org.apache.spark.sql.functions._
import graft.operators.Relevance

/** Misra-Gries frequent-items aggregate: exactness within capacity, the
  * two sketch guarantees under eviction, and partition-layout
  * independence of both regimes. */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def trueCounts(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact regime: capacity >= distinct items -> exact counts, " +
      "deterministic order, any partitioning") {
    val docs = Seq((1L, "a a a b b c"), (2L, "b c c d"), (3L, "a d d d"))
      .toDF("doc_id", "text")
    // a:4 b:3 c:3 d:4 -> order by (cnt desc, item): a, d, b, c
    val want = Seq((1L, "a", 4L), (2L, "d", 4L), (3L, "b", 3L),
      (4L, "c", 3L))
    for (parts <- Seq(1, 7)) {
      val out = Relevance.heavyHitters(docs.repartition(parts), "text",
          capacity = 16, k = 10)
        .as[(Long, String, Long)].collect().toSeq
      assert(out == want, s"parts=$parts: $out")
    }
  }

  test("bounded regime: every true heavy hitter present, counts " +
      "undercount by at most n/(capacity+1), regardless of partitioning") {
    // deterministic zipf-ish stream: token i has frequency ~ 600/i
    val rng = new scala.util.Random(42)
    val tokens = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"t$i"))
    val shuffled = rng.shuffle(tokens)
    val truth = trueCounts(shuffled)
    val n = shuffled.size.toLong
    val capacity = 8
    val bound = n / (capacity + 1)
    val docs = shuffled.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    for (parts <- Seq(1, 5)) {
      val got = Relevance.heavyHitters(docs.repartition(parts), "text",
          capacity = capacity, k = capacity)
        .as[(Long, String, Long)].collect()
        .map { case (_, item, cnt) => item -> cnt }.toMap
      truth.filter(_._2 > bound).keys.foreach { hh =>
        assert(got.contains(hh),
          s"parts=$parts: heavy hitter $hh (${truth(hh)} > $bound) missing") }
      got.foreach { case (item, cnt) =>
        val t = truth(item)
        assert(cnt <= t, s"parts=$parts: $item overcounted $cnt > $t")
        assert(t - cnt <= bound,
          s"parts=$parts: $item undercounted by ${t - cnt} > $bound") }
    }
  }

  test("null and empty text contribute nothing") {
    val docs = Seq((1L, "x y"), (2L, null.asInstanceOf[String]), (3L, " "))
      .toDF("doc_id", "text")
    val out = Relevance.heavyHitters(docs, "text", capacity = 4, k = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "x", 1L), (2L, "y", 1L)))
  }
  test("bottom-k sample: window-rank parity across partition layouts, " +
      "duplicates, nulls, thin groups") {
    import graft.operators.Curate
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (s"g${rnd.nextInt(5)}", if (i % 37 == 0) null else s"v${rnd.nextInt(60)}"))
    // the window-form reference: rank by the identical portable hash
    def want(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] = {
      import org.apache.spark.sql.expressions.Window
      df.filter(col("v").isNotNull)
        .withColumn("__h", TextFunctions.portableHash64(
          concat(lit("graft"), lit(":"), col("v"))))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("__h"), col("v"))))
        .filter(col("__rn") <= 7).orderBy("g", "__rn")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    }
    for (parts <- Seq(1, 3, 32)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = Curate.groupSample(df, Seq("g"), "v", k = 7)
        .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
      assert(got.view.mapValues(_.toSeq).toMap == want(df), s"parts=$parts")
    }
    // a group smaller than k returns all its values
    val tiny = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "v")
    val t = Curate.groupSample(tiny, Seq("g"), "v", k = 10)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).sorted)).toMap
    assert(t == Map("a" -> Seq("x", "y"), "b" -> Seq("z")))
    // all-null group yields an empty sample, not a crash
    val nul = Seq(("n", null: String)).toDF("g", "v")
    assert(Curate.groupSample(nul, Seq("g"), "v", k = 3)
      .collect().map(_.getSeq[String](1)).head.isEmpty)
  }

  test("bottom-k sample: duplicate values keep multiple slots, " +
      "sample is growth-stable") {
    import graft.operators.Curate
    val df = Seq.fill(4)(("g", "dup")).toDF("g", "v")
    val s = Curate.groupSample(df, Seq("g"), "v", k = 3)
      .collect().head.getSeq[String](1)
    assert(s == Seq("dup", "dup", "dup")) // row sample, not distinct
    // growth stability: adding rows never evicts a smaller-hash keeper
    val base = (1 to 50).map(i => ("g", s"v$i")).toDF("g", "v")
    val grown = ((1 to 50) ++ (51 to 90)).map(i => ("g", s"v$i")).toDF("g", "v")
    val sBase = Curate.groupSample(base, Seq("g"), "v", k = 5)
      .collect().head.getSeq[String](1).toSet
    val sGrown = Curate.groupSample(grown, Seq("g"), "v", k = 5)
      .collect().head.getSeq[String](1).toSet
    // every grown-sample member absent from the base sample must be new
    assert(sGrown.diff(sBase).forall(v => v.stripPrefix("v").toInt > 50 ||
      !sBase.contains(v)))
    // and the grown sample's hash floor can only move down: its members
    // that existed in the base corpus must be base-sample members
    assert(sGrown.filter(_.stripPrefix("v").toInt <= 50).subsetOf(sBase))
  }
}
