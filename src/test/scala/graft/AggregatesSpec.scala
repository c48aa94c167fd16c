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
}
