package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup}
import graft.functions.Stats

/** Round-6 operators: n-gram decontamination, semantic prune, linear
  * classifier scoring, blocklist gating, corpus report card, embedding
  * centroids. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- ngramDecontaminate --------------------------------------------------

  private val bench = Seq(
    (100L, "what is the capital of france"),
    (101L, "name the largest planet in the solar system"))
    .toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "quiz night asked what is the capital of france twice"), // quotes q100
    (2L, "the capital markets rallied in france yesterday"),      // shares < n-grams
    (3L, "a completely unrelated document about cooking pasta"),
    (4L, null.asInstanceOf[String]),
    (5L, "name the largest planet in the solar system"))          // verbatim q101
    .toDF("doc_id", "text")

  test("ngramDecontaminate: quoted benchmark flagged, partial overlap counted") {
    val out = Dedup.ngramDecontaminate(corpus, bench, "text", "doc_id",
        n = 5, minMatches = 2)
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 contains "what is the capital of france" = two 5-gram matches
    assert(out(1L) == ((2L, true)))
    assert(out(2L)._2 == false)
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((0L, false))) // NULL text is clean, still present
    // doc 5 is the benchmark verbatim: 8 tokens -> 4 distinct 5-grams
    assert(out(5L) == ((4L, true)))
  }

  test("ngramDecontaminate: distinct grams only (repetition does not inflate)") {
    val rep = Seq((1L, Array.fill(50)("what is the capital of france")
      .mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.ngramDecontaminate(rep, bench, "text", "doc_id",
        n = 6, minMatches = 1)
      .select("n_matched").as[Long].head()
    assert(out == 1L) // the one gram, not 50
  }

  test("ngramDecontaminate: Fast and Portable agree") {
    def run(m: Dedup.HashMode) =
      Dedup.ngramDecontaminate(corpus, bench, "text", "doc_id",
          n = 3, minMatches = 1, mode = m)
        .select("doc_id", "n_matched").as[(Long, Long)].collect().toSet
    assert(run(Dedup.Fast) == run(Dedup.Portable))
  }

  // ---- semanticPrune -------------------------------------------------------

  test("semanticPrune: transitive clusters keep exactly the min id") {
    // three near-identical vectors (A~B, B~C chains) + one distant
    def v(x: Double, y: Double) = Array.tabulate(8)(i =>
      if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0.0f)
    val df = Seq(
      (1L, v(1.0, 0.00)), (2L, v(1.0, 0.02)), (3L, v(1.0, 0.04)),
      (7L, v(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticPrune(df, "embedding", "vec_id",
        threshold = 0.999, nBits = 2, bands = 4, maxBucket = 16, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 7L))
  }

  test("semanticPrune: no pairs -> corpus unchanged") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticPrune(df, "embedding", "vec_id",
        threshold = 0.99, nBits = 2, bands = 4, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  // ---- classifierScore -----------------------------------------------------

  private val weights = Map("good" -> 0.5, "great" -> 0.25,
    "bad" -> -0.5, "awful" -> -0.25)

  test("classifierScore: exact dyadic logit, label, edge cases") {
    val df = Seq(
      (1L, "good good bad food"),        // (0.5+0.5-0.5)/4 = 0.125
      (2L, "awful awful awful awful"),   // -0.25
      (3L, "neutral words only here"),   // 0.0
      (4L, ""),                          // no tokens -> bias
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curate.classifierScore(df, "text", weights, bias = 0.0)
      .select("doc_id", "logit").as[(Long, Option[Double])]
      .collect().toMap
    val ntok = Curate.classifierScore(df, "text", weights)
      .select("doc_id", "n_tokens").as[(Long, Option[Long])].collect().toMap
    assert(ntok(1L).contains(4L) && ntok(4L).contains(0L) && ntok(5L).isEmpty)
    assert(out(1L).contains(0.125))
    assert(out(2L).contains(-0.25))
    assert(out(3L).contains(0.0))
    assert(out(4L).contains(0.0))   // bias
    assert(out(5L).isEmpty)          // NULL text -> NULL logit
    val labels = Curate.classifierScore(df, "text", weights)
      .select("doc_id", "label").as[(Long, Option[Boolean])].collect().toMap
    assert(labels(1L).contains(true) && labels(2L).contains(false))
    assert(labels(5L).isEmpty)
  }

  test("classifierScore: bias shifts every logit") {
    val df = Seq((1L, "good")).toDF("doc_id", "text")
    val l = Curate.classifierScore(df, "text", weights, bias = -0.75)
      .select("logit").as[Double].head()
    assert(l == -0.25) // -0.75 + 0.5/1
  }

  // ---- blocklistAudit ------------------------------------------------------

  test("blocklistAudit: integer-exact gate, case-insensitive, NULL keeps") {
    val df = Seq(
      (1L, "clean text with no issues at all here ok"),       // 0/9 blocked
      (2L, "BADWORD inside an otherwise long enough document"), // 1/7
      (3L, "badword badword badword"),                        // 3/3
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curate.blocklistAudit(df, "text", Seq("badword"),
        maxRatePpm = 200000L) // 20%
      .select("doc_id", "n_blocked", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(0L), true)))
    assert(out(2L) == ((Some(1L), true)))   // 1/7 ~ 14% <= 20%
    assert(out(3L) == ((Some(3L), false)))  // 100% > 20%
    assert(out(4L) == ((None, true)))       // NULL text: NULL count, keeps
    // zero tolerance drops any hit
    val strict = Curate.blocklistAudit(df, "text", Seq("badword"), 0L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!strict(2L) && strict(1L))
    // a MIXED-CASE blocklist entry must still match the lowercased tokens
    val mixed = Curate.blocklistAudit(df, "text", Seq("BadWord"), 0L)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!mixed(2L) && !mixed(3L) && mixed(1L))
  }

  // ---- corpusReport --------------------------------------------------------

  test("corpusReport: per-source docs/tokens/langs/quality/dup-rate") {
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog in a field", "a"),
      (2L, "THE  quick   brown fox and the lazy dog in a field", "a"), // dup of 1
      (3L, "el perro de la casa y el gato en los tejados", "a"),
      (4L, null.asInstanceOf[String], "b"),
      (5L, "one two three", "b"))
      .toDF("doc_id", "text", "source")
    val out = Curate.corpusReport(df, "text", "source")
      .select("source", "n_docs", "n_null", "n_tokens", "n_langs",
        "n_exact_dups")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val a = out("a")
    assert(a._2 == 3 && a._3 == 0 && a._4 == 11 + 11 + 11)
    assert(a._5 == 2)  // en + es
    assert(a._6 == 1)  // doc 2 is a normalized dup of doc 1
    val b = out("b")
    assert(b._2 == 2 && b._3 == 1 && b._4 == 3)
    assert(b._5 == 1)  // NULL text and marker-less doc 5 are both "und"
    assert(b._6 == 0)
  }

  // ---- embeddingCentroids --------------------------------------------------

  test("embeddingCentroids: exact mean/variance per (group, dim)") {
    val df = Seq(
      (0, Array(1.0f, 10.0f)), (0, Array(3.0f, 10.0f)),
      (1, Array(-2.0f, 4.0f)))
      .toDF("label", "embedding")
    val out = Stats.embeddingCentroids(df, "embedding", Seq("label"), dim = 2)
      .select("label", "dim", "n", "mean", "variance")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((0, 0L)) == ((2L, 2.0, 1.0)))   // mean(1,3)=2, var=1
    assert(out((0, 1L)) == ((2L, 10.0, 0.0)))
    assert(out((1, 0L)) == ((1L, -2.0, 0.0)))
    assert(out((1, 1L)) == ((1L, 4.0, 0.0)))
  }

  // ---- pagerank ------------------------------------------------------------

  test("pagerank: known graph, exact fixed-point values") {
    // star: 2->1, 3->1, plus 1->2. out(1)=1, out(2)=out(3)=1
    val edges = Seq((2L, 1L), (3L, 1L), (1L, 2L)).toDF("src", "dst")
    val r1 = graft.operators.Analytics.pagerank(edges, "src", "dst",
        iterations = 1)
      .select("id", "rank_units").as[(Long, Long)].collect().toMap
    // unit = 1e12, base = 0.15e12; after one round:
    // node1 inflow = r2/1 + r3/1 = 2e12 -> 0.15e12 + 2e12*85/100
    assert(r1(1L) == 150000000000L + 2000000000000L * 85L / 100L)
    assert(r1(2L) == 150000000000L + 1000000000000L * 85L / 100L)
    assert(r1(3L) == 150000000000L) // no inbound
    // determinism across partition layouts
    val a = graft.operators.Analytics.pagerank(edges.repartition(7),
      "src", "dst", iterations = 4).select("id", "rank_units")
      .as[(Long, Long)].collect().toSet
    val b = graft.operators.Analytics.pagerank(edges.coalesce(1),
      "src", "dst", iterations = 4).select("id", "rank_units")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("pagerank: authority ordering on a hub graph") {
    // many pages point at node 100; it should outrank everything
    val edges = (1L to 20L).map(i => (i, 100L)) ++ Seq((100L, 1L))
    val r = graft.operators.Analytics.pagerank(edges.toDF("src", "dst"),
        "src", "dst", iterations = 5)
      .select("id", "rank_units").as[(Long, Long)].collect().toMap
    assert(r(100L) > r(1L) && r(1L) > r(2L)) // 1 gets 100's mass back
  }

  // ---- pseudonymize --------------------------------------------------------

  test("pseudonymize: stable, joinable, NULL-safe, salt-sensitive") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, 10.0), (3L, 30.0)).toDF("id", "w")
    val pa = Curate.pseudonymize(a, Seq("id"), "s1")
    val pb = Curate.pseudonymize(b, Seq("id"), "s1")
    // joinability preserved: id 1 still matches
    assert(pa.join(pb, "id").count() == 1)
    // same value -> same token across frames
    val t1a = pa.filter(col("v") === "x").select("id").as[Long].head()
    val t1b = Curate.pseudonymize(b, Seq("id"), "s1")
      .filter(col("w") === 10.0).select("id").as[Long].head()
    assert(t1a == t1b)
    // a different salt unlinks
    val t1c = Curate.pseudonymize(a, Seq("id"), "s2")
      .filter(col("v") === "x").select("id").as[Long].head()
    assert(t1a != t1c)
    // NULL stays NULL
    val withNull = Seq((Some(1L), "x"), (None, "y")).toDF("id", "v")
    val pn = Curate.pseudonymize(withNull, Seq("id"), "s1")
    assert(pn.filter(col("id").isNull).count() == 1)
  }

  // ---- perplexityBuckets ---------------------------------------------------

  test("perplexityBuckets: terciles partition each stratum; repeated docs " +
      "score higher (head) than rare-word docs") {
    // doc i = i copies of the corpus-common token plus one unique token:
    // mean log-prob strictly increases with i, so terciles split 1-3 /
    // 4-6 / 7-9 exactly
    val docs = (1L to 9L).map(i =>
      (i, ("common " * i.toInt) + s"unique$i", "s"))
      .toDF("doc_id", "text", "source")
    val out = Curate.perplexityBuckets(docs, "text", "doc_id", "source")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out.size == 9)
    assert((1L to 3L).forall(out(_) == "tail"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 9L).forall(out(_) == "head"))
  }

  // ---- standardizeEmbeddings -----------------------------------------------

  test("standardizeEmbeddings: standardized dims have mean~0 and the " +
      "values match hand-computed (x-mean)/std") {
    val df = Seq(
      (1L, Array(1.0f, 10.0f)), (2L, Array(3.0f, 10.0f)),
      (3L, Array(5.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.Stats.standardizeEmbeddings(df, "embedding",
        dim = 2)
      .select(col("vec_id"), element_at(col("embedding_std"), 1).as("s0"),
        element_at(col("embedding_std"), 2).as("s1"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // dim0: mean 3, var 8/3; dim1: constant -> variance 0 -> eps floor
    val std0 = math.sqrt(8.0 / 3)
    assert(math.abs(out(1L)._1 - (1.0 - 3.0) / std0) < 1e-12)
    assert(math.abs(out(3L)._1 - (5.0 - 3.0) / std0) < 1e-12)
    assert(out(2L)._1 == 0.0)
    // constant dim standardizes to exactly 0 (x == mean), no div-by-zero
    assert(out.values.forall(_._2 == 0.0))
  }

  // ---- streaming parity ----------------------------------------------------

  test("row-local round-6 ops are streaming-safe: classifierScore, " +
      "blocklistAudit, pseudonymize run on a stream with batch-identical " +
      "output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 50L).map(i =>
      (i, if (i % 10 == 0) null else s"good text $i with bad word count"))
    def chain(df: org.apache.spark.sql.DataFrame) =
      Curate.pseudonymize(
        Curate.blocklistAudit(
          Curate.classifierScore(df, "text", weights)
            .withColumnRenamed("label", "cls_label")
            .withColumnRenamed("n_tokens", "cls_n"),
          "text", Seq("bad"), maxRatePpm = 100000L),
        Seq("doc_id"), "s")
        .select("doc_id", "cls_n", "logit", "n_blocked", "keep")
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = chain(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("r6_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("r6_stream").collect().map(_.toSeq).toSet
    val batch = chain(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  // ---- cross-op properties -------------------------------------------------

  test("ngramDecontaminate: every verbatim reference doc is flagged") {
    val ref = (1L to 30L).map(i =>
      (i, s"reference document number $i about topic ${i % 7} end"))
      .toDF("doc_id", "text")
    val corpusWithRefs = (100L to 129L).map(i =>
      (i, s"reference document number ${i - 99} about topic ${(i - 99) % 7} end"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramDecontaminate(corpusWithRefs, ref, "text",
        "doc_id", n = 5, minMatches = 1)
      .select("contaminated").as[Boolean].collect()
    assert(out.forall(identity) && out.length == 30)
  }

  test("semanticPrune: output is a subset; pruned mass equals cluster overflow") {
    def v(seed: Int) = Array.tabulate(8)(i =>
      (math.sin(seed * 31 + i) * 100).toFloat)
    // 10 distinct vectors + 15 exact duplicates of the first 5
    val rows = (0 until 10).map(i => (i.toLong, v(i))) ++
      (0 until 15).map(i => (100L + i, v(i % 5)))
    val df = rows.toDF("vec_id", "embedding")
    val kept = Dedup.semanticPrune(df, "embedding", "vec_id",
        threshold = 0.9999, nBits = 2, bands = 4, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.subsetOf(rows.map(_._1).toSet))
    // exact dups always pair with their rep: the 15 copies must be gone
    assert((100L until 115L).forall(id => !kept.contains(id)))
    assert((0L until 10L).forall(kept.contains)) // reps survive
  }

  test("embeddingCentroids: ragged vector fails loudly; NULL skipped") {
    val ok = Stats.embeddingCentroids(
      Seq((0, Array(1.0f, 2.0f)), (0, null.asInstanceOf[Array[Float]]))
        .toDF("label", "embedding"),
      "embedding", Seq("label"), dim = 2)
    assert(ok.count() == 2) // NULL row skipped, one row per dim
    val bad = Stats.embeddingCentroids(
      Seq((0, Array(1.0f, 2.0f)), (0, Array(1.0f)))
        .toDF("label", "embedding"),
      "embedding", Seq("label"), dim = 2)
    assertThrows[Exception](bad.collect())
  }

  test("embeddingCentroids: out-of-range values (either sign) and NULL " +
      "elements fail loudly, not silently") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def df(vec: Array[java.lang.Float]) = spark.createDataFrame(
      java.util.List.of(Row(0, vec.toSeq)),
      StructType(Seq(StructField("label", IntegerType),
        StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    // the negative extreme saturates the long cast to Long.MinValue —
    // gate must run on the DOUBLE or abs() waves it through
    val negBig = Stats.embeddingCentroids(
      df(Array(java.lang.Float.valueOf(-1.0e10f),
        java.lang.Float.valueOf(1.0f))),
      "embedding", Seq("label"), dim = 2)
    val eNeg = intercept[Exception](negBig.collect())
    assert(eNeg.toString.contains("exceeds") ||
      Option(eNeg.getCause).exists(_.toString.contains("exceeds")))
    val withNull = Stats.embeddingCentroids(
      df(Array(java.lang.Float.valueOf(1.0f), null)),
      "embedding", Seq("label"), dim = 2)
    val eNull = intercept[Exception](withNull.collect())
    assert(eNull.toString.contains("NULL element") ||
      Option(eNull.getCause).exists(_.toString.contains("NULL element")))
  }

  test("perplexityBuckets: NULL-strata docs form their own stratum") {
    val docs = ((1L to 9L).map(i =>
      (i, ("common " * i.toInt) + s"unique$i", Option("s"))) ++
      (11L to 19L).map(i =>
        (i, ("common " * (i - 10).toInt) + s"unique$i", None: Option[String])))
      .toDF("doc_id", "text", "source")
    val out = Curate.perplexityBuckets(docs, "text", "doc_id", "source")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out.size == 18) // nobody vanished
    assert((11L to 13L).forall(out(_) == "tail"))
    assert((17L to 19L).forall(out(_) == "head"))
  }

  test("filterQueries: terms match whole names or _-boundary prefixes only") {
    val all = SparkEntry.filterQueries(None)
    assert(all.size == SparkEntry.queries.size)
    val q10 = SparkEntry.filterQueries(Some("q10")).keySet
    assert(q10 == Set("q10_cast_battery")) // NOT q100/q101
    val two = SparkEntry.filterQueries(Some("q100, q99")).keySet
    assert(two == Set("q100_perplexity_buckets", "q99_pseudonymize"))
  }
}
