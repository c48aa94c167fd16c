package graft

import org.apache.spark.sql.functions._
import graft.operators.Relevance

/** TF-IDF / BM25 semantics: known-answer scores, deterministic tie
  * handling, corpus-wide statistics unaffected by query pruning. */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "durian durian durian"),
    (4L, "x y"))
    .toDF("doc_id", "text")

  test("tfidfTopTerms: known scores, rank order, term tiebreak") {
    val out = Relevance.tfidfTopTerms(corpus, "text", "doc_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val n = 5.0 // N + 1 with 4 docs
    def idf(df: Long): Double = math.log(n / (df + 1)) + 1
    // doc 1: apple tf=2 df=2, banana tf=1 df=1
    assert(out((1L, 1)) == (("apple", 2L, 2 * idf(2))))
    assert(out((1L, 2)) == (("banana", 1L, idf(1))))
    // doc 4: x and y tie exactly (tf=1, df=1) -> term ascending
    assert(out((4L, 1))._1 == "x" && out((4L, 2))._1 == "y")
    // every doc has at most k entries and ranks are 1..k dense
    assert(out.keySet.count(_._1 == 3L) == 1) // doc 3 has one distinct term
  }

  test("bm25Rank: only matching docs, correct formula, id tiebreak, " +
      "exactSum parity") {
    // query hits docs 1 and 2 only; doc 2 is shorter so its apple tf=1
    // outweighs doc 1's tf=2 dampening? verify against the closed form.
    val out = Relevance.bm25Rank(corpus, "text", "doc_id",
        query = Seq("apple", "banana"), k = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.keySet == Set(1L, 2L)) // docs 3/4 match nothing
    val n = 4.0; val avgdl = (3 + 2 + 3 + 2) / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val s1 = idf(2) * tfn(2, 3) + idf(1) * tfn(1, 3)
    val s2 = idf(2) * tfn(1, 2)
    assert(math.abs(out(1L)._1 - s1) < 1e-12, s"doc1 ${out(1L)._1} vs $s1")
    assert(math.abs(out(2L)._1 - s2) < 1e-12)
    assert(out(1L)._2 == 2 && out(2L)._2 == 1) // n_matched
    assert(out(1L)._3 == (if (s1 > s2) 1 else 2))

    val exact = Relevance.bm25Rank(corpus, "text", "doc_id",
        query = Seq("apple", "banana"), k = 10, exactSum = true)
      .select(col("doc_id"), round(col("score"), 9).cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == exact.keySet)
    out.foreach { case (id, (s, _, _)) =>
      assert(math.abs(exact(id) - s) < 1e-9, s"exactSum diverged for $id") }
  }

  test("unigramLogProb: closed-form known answers, zero-token docs drop") {
    val tiny = Seq((1L, "a a b"), (2L, "b"), (3L, " \t "))
      .toDF("doc_id", "text")
    // corpus: a a b b -> total 4, count(a)=2, count(b)=2
    val out = Relevance.unigramLogProb(tiny, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L)) // whitespace-only doc has no tokens
    val lpHalf = math.log(0.5)
    assert(math.abs(out(1L)._2 - lpHalf) < 1e-12) // mean of 3x ln(1/2)
    assert(out(1L)._1 == 3 && out(2L)._1 == 1)
    assert(math.abs(out(2L)._2 - lpHalf) < 1e-12)
    // exactSum parity
    val ex = Relevance.unigramLogProb(tiny, "text", "doc_id",
        exactSum = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, (_, m)) =>
      assert(math.abs(ex(id) - m) < 1e-9) }
  }

  test("topNgrams: counts, rank order, ngram tiebreak, short docs skipped") {
    val tiny = Seq((1L, "x y z x y"), (2L, "x y q"), (3L, "solo"))
      .toDF("doc_id", "text")
    // 2-grams: doc1: "x y","y z","z x","x y"; doc2: "x y","y q"; doc3: none
    val out = Relevance.topNgrams(tiny, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("x y", 3L, 1), ("y q", 1L, 2), ("y z", 1L, 3)))
  }

  test("bm25Rank: identical docs score identically and tie by id") {
    val twins = Seq((10L, "apple pie"), (2L, "apple pie"), (7L, "apple pie"))
      .toDF("doc_id", "text")
    val ranks = Relevance.bm25Rank(twins, "text", "doc_id",
        query = Seq("apple"), k = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(ranks == Map(2L -> 1, 7L -> 2, 10L -> 3))
    assertThrows[IllegalArgumentException] {
      Relevance.bm25Rank(twins, "text", "doc_id", query = Seq.empty)
    }
  }
}
