package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Corpus-level term-relevance scoring: TF-IDF keyword extraction and BM25
  * ranking — the retrieval half of a training-data pipeline (quality-aware
  * sampling, topic balancing, query-targeted subcorpus pulls).
  *
  * Scale design (100 TB): the corpus is tokenized ONCE into (doc, term, tf)
  * with map-side combine, document frequencies are a second aggregation on
  * the term key, and corpus scalars (N, avgdl) ride along as broadcast
  * one-row frames — no driver-side collect of anything corpus-sized, no
  * cross join bigger than a literal. BM25 additionally prunes to the query
  * termset BEFORE any shuffle, so its cost scales with the posting lists of
  * the query terms, not the corpus vocabulary.
  *
  * Reference anchor: the reference engine has no retrieval surface; this
  * extends SURVEY §2.8's text battery the way `Dedup`/`Similarity` extend
  * its dedup surface (BASELINE.json north_star).
  */
object Relevance {

  /** (doc, term, tf) postings over whitespace tokens of the normalized
    * text — one explode + one combine-enabled aggregation. */
  private def postings(df: DataFrame, textCol: String, idCol: String) =
    df.select(col(idCol).as("__id"),
        explode(T.tokens(T.normalized(col(textCol)))).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document. idf = ln((N+1)/(df+1)) + 1 (the
    * smooth scikit-style form: never negative, defined for df = N). Ties
    * on score break by term ascending so the cut is deterministic.
    *
    * df (document frequency) is a window count over the term key, not a
    * groupBy+self-join: the postings subtree is evaluated ONCE, and the
    * shuffle-by-term the join would need anyway is the only extra
    * exchange. Posting-list skew (a stopword's postings land in one
    * partition) is identical in both shapes — it is the problem's own
    * skew, bounded by docs-per-term, and it spills rather than fails.
    * Output: (id, term, tf, score, rank), rank 1..k per doc. */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 5): DataFrame = {
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = postings(df, textCol, idCol)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") *
        (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1))
    scored.withColumn("rank", row_number().over(Window.partitionBy("__id")
        .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("term"), col("tf"),
        col("score"), col("rank"))
  }

  /** BM25 document ranking against a literal query termset (Robertson/
    * Sparck-Jones idf, k1/b standard defaults). Postings are pruned to the
    * query terms before the doc-frequency pass, but df and avgdl are still
    * CORPUS-wide statistics (df counted over all docs containing the term,
    * avgdl over all docs) — pruning changes cost, not semantics. Docs
    * matching no query term score 0 and are not returned.
    *
    * The global top-k is sort+limit (TakeOrdered: per-partition heaps, one
    * tiny exchange), NEVER an unpartitioned window over the matched set —
    * ranks are assigned after the cut, over k rows. Ties break by id.
    *
    * `exactSum = true` sums per-term contributions as DECIMAL(27,12):
    * exact, order-independent addition, so the score is bit-stable across
    * partition layouts and mirrorable by a SQL oracle (double summation is
    * order-sensitive in the last ulp). Default stays double for speed.
    * Output: (id, score, n_matched, rank), rank 1..k. */
  def bm25Rank(df: DataFrame, textCol: String, idCol: String,
               query: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               exactSum: Boolean = false): DataFrame = {
    require(query.nonEmpty, "bm25Rank needs at least one query term")
    val terms = query.distinct.map(_.toLowerCase)
    // doc length rides along with the postings (it is row-local, so the
    // (id, term) aggregation can carry it via first()) — no corpus-scale
    // doc-length join. The query-term filter sits UNDER the aggregation,
    // so the one posting shuffle moves only the query terms' posting
    // lists. The one-row corpus stats frame broadcasts N and avgdl.
    val stats = df.agg(count(lit(1)).as("__n"),
      avg(T.tokenCount(T.normalized(col(textCol))).cast("double"))
        .as("__avgdl"))
    val matched = df
      .select(col(idCol).as("__id"),
        T.tokenCount(T.normalized(col(textCol))).cast("double").as("__dl"),
        explode(T.tokens(T.normalized(col(textCol)))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("__dl")).as("__dl"))
    val contrib0 = log(lit(1.0) +
        (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
      (col("tf") * (lit(k1) + 1) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("__dl") / col("__avgdl"))))
    val contrib = if (exactSum) contrib0.cast("decimal(27,12)") else contrib0
    val scored = matched
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(stats))
      .groupBy(col("__id"))
      .agg(sum(contrib).as("score"), count(lit(1)).as("n_matched"))
    // ranks over the k-row cut are computed WITHOUT a window: an
    // empty-partition WindowExec logs the global-window WARN, and a
    // foldable partition key (lit(0)) constant-folds back to empty. The
    // TakeOrdered cut is collapsed into one sorted array (a global agg of
    // k rows — one tiny partial per partition) and posexploded, so rank is
    // the array position. Sort key: (-score, id) ascending == (score desc,
    // id asc); negation is exact for both double and decimal scores.
    scored.orderBy(col("score").desc, col("__id")).limit(k)
      .agg(sort_array(collect_list(struct(
        (-col("score")).as("__ns"), col("__id"), col("n_matched"))))
        .as("__r"))
      .select(posexplode(col("__r")))
      .select(col("col.__id").as(idCol), (-col("col.__ns")).as("score"),
        col("col.n_matched").as("n_matched"), (col("pos") + 1).as("rank"))
  }

  /** Mean unigram log-probability per document — the cheap corpus-LM
    * perplexity proxy quality filters use (a doc of common words scores
    * near the corpus mode; gibberish/boilerplate-with-rare-junk scores
    * low). score = (1/|toks|) * sum over tokens of ln(count(term)/total).
    * No smoothing needed: counts come from the same corpus, so every doc
    * token has count >= 1.
    *
    * Shape: token stream scanned once for the scoring pass (term counts
    * via a window over the term key, like [[tfidfTopTerms]]); the corpus
    * token total is a one-row broadcast. Emitting (sum, n) and dividing
    * outside the aggregate keeps the mean a pure function of the exact
    * decimal sum when `exactSum` is set. Docs with zero tokens emit no
    * row. Output: (id, n_tokens, mean_logprob). */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String,
                     exactSum: Boolean = false): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(T.tokens(T.normalized(col(textCol)))).as("term"))
    val total = toks.agg(count(lit(1)).as("__t"))
    val contrib0 = log(col("__c").cast("double") / col("__t"))
    val contrib = if (exactSum) contrib0.cast("decimal(27,12)") else contrib0
    toks.withColumn("__c", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(total))
      .groupBy(col("__id"))
      .agg(sum(contrib).as("__s"), count(lit(1)).as("n_tokens"))
      .select(col("__id").as(idCol), col("n_tokens"),
        (col("__s").cast("double") / col("n_tokens")).as("mean_logprob"))
  }

  /** Corpus-wide top-k word n-grams by occurrence count — the boilerplate
    * and contamination report (a crawl's most frequent 8-grams are its
    * shared templates). Count ties break by n-gram ascending. The global
    * top-k is sort+limit; the count aggregation has map-side combine.
    * Output: (ngram, n, rank). */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 2,
                k: Int = 20): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val t = col("__toks")
    val grams = df
      .select(T.tokens(T.normalized(col(textCol))).as("__toks")) // bind once
      .select(explode(when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => array_join(slice(t, i + 1, lit(n)), " ")))).as("ngram"))
    val counted = grams.groupBy(col("ngram")).agg(count(lit(1)).as("n"))
    // window-free rank over the post-limit k rows, same shape and
    // rationale as [[bm25Rank]]: sorted-array agg + posexplode
    counted.orderBy(col("n").desc, col("ngram")).limit(k)
      .agg(sort_array(collect_list(struct(
        (-col("n")).as("__nn"), col("ngram")))).as("__r"))
      .select(posexplode(col("__r")))
      .select(col("col.ngram").as("ngram"), (-col("col.__nn")).as("n"),
        (col("pos") + 1).as("rank"))
  }

  /** Single-pass heavy hitters over the token stream via the
    * [[graft.functions.FrequentItemsAgg]] Misra-Gries sketch: per
    * partition at most `capacity` counters, one O(capacity) partial per
    * partition crosses the shuffle — the shape for vocabularies too large
    * to groupBy exactly. EXACT whenever the distinct-token count stays
    * within `capacity`; otherwise every item with count > n/(capacity+1)
    * is present with an undercount of at most n/(capacity+1).
    * Output: (rank, item, cnt), rank 1..k by (cnt desc, item asc). */
  def heavyHitters(df: DataFrame, textCol: String, capacity: Int = 1024,
                   k: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftglue.GraftGlue
    val sketch = GraftGlue.column(graft.functions.FrequentItemsAgg(
      GraftGlue.expression(col("term")), capacity).toAggregateExpression())
    df.select(explode(T.tokens(T.normalized(col(textCol)))).as("term"))
      .agg(sketch.as("__hh"))
      .select(posexplode(slice(col("__hh"), 1, k)))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("item"), col("col.cnt").as("cnt"))
  }
}
