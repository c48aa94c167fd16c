package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

/** Corpus curation: deterministic sampling properties and the
  * dedup -> lang -> quality audit chain. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps of the lazy dog and the end", "src0"),
    (2L, "THE  quick   brown fox jumps of the lazy dog and the end", "src0"), // dup of 1
    (3L, "el perro de la casa y el gato que duerme en los tejados", "src0"),
    (4L, "der hund und die katze das ist von mit haus", "src0"),     // de -> lang drop
    (5L, "the !!!!!! ??????? ,,,,,,,, ;;;;;;;; ........", "src1"),  // en but junk
    (6L, null.asInstanceOf[String], "src1"))                        // null text
    .toDF("doc_id", "text", "source")

  test("curationAudit: first-match drop reasons, keepers NULL") {
    val audit = Curate.curationAudit(docs, "text", "doc_id",
        keepLangs = Seq("en", "es"), minQuality = 0.3)
      .select("doc_id", "drop_reason").as[(Long, String)].collect().toMap
    assert(audit(1L) == null)          // kept (en)
    assert(audit(2L) == "exact_dup")   // normalized dup of 1
    assert(audit(3L) == null)          // kept (es)
    assert(audit(4L) == "lang")
    assert(audit(5L) == "quality")
    assert(audit(6L) == "null_text")
    val kept = Curate.curate(docs, "text", "doc_id", Seq("en", "es"), 0.3)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("hashSample: deterministic, rate-monotone (nested subsets), stable") {
    val ids = spark.range(0, 2000).toDF("id")
    val s20 = Curate.hashSample(ids, "id", 0.2).as[Long].collect().toSet
    val s50 = Curate.hashSample(ids, "id", 0.5).as[Long].collect().toSet
    val s20again = Curate.hashSample(ids, "id", 0.2).as[Long].collect().toSet
    assert(s20 == s20again)                        // deterministic
    assert(s20.subsetOf(s50))                      // nested by construction
    assert(math.abs(s20.size - 400) < 80)          // ~rate, not exact
    assert(math.abs(s50.size - 1000) < 120)
    // growth stability: the same ids keep their fate in a larger corpus
    val grown = Curate.hashSample(spark.range(0, 4000).toDF("id"), "id", 0.2)
      .as[Long].collect().toSet
    assert(grown.filter(_ < 2000) == s20)
    // a different salt is an independent draw
    val other = Curate.hashSample(ids, "id", 0.2, salt = "other")
      .as[Long].collect().toSet
    assert(other != s20)
  }

  test("stratifiedSample: per-stratum rates, default applied, edge rates") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("src", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Curate.stratifiedSample(df, "src", "id",
      rates = Map("a" -> 1.0), defaultRate = 0.0)
    val kept = out.select("id").as[Long].collect()
    assert(kept.length == 500 && kept.forall(_ % 2 == 0)) // all a, no b
  }

  test("curateStream: stateless gates + watermarked content dedup") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again", ts(0)),
      (2L, "der hund und die katze das ist von mit haus", ts(1)),  // lang gate
      (3L, "the ?!?! ;;;; ,,,, ....", ts(2)))                      // quality gate
    mem.addData(
      (4L, "THE  quick  brown fox jumps over the lazy dog again", ts(5)), // dup of 1
      (5L, "a different sentence about the weather in the north", ts(6)))
    val out = Curate.curateStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts",
      keepLangs = Seq("en"), minQuality = 0.3)
    val q = out.writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("curated_stream")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L), ids.toString) // 2,3 gated; 4 deduped vs 1
  }

  test("gopherAudit: each rule fires on its crafted doc, first-match order") {
    val docs = Seq(
      (1L, "the cat sat on a mat and the dog lay in it"),        // kept
      (2L, "too short"),                                          // word_count
      (3L, "extraordinarily magnificent prodigious documentation " +
        "overwhelmingly sophisticated"),                          // word_length (mean > 10)
      (4L, "the quick brown fox runs past the lazy dog ### here"), // symbol_ratio
      (5L, "the 11 22 33 44 55 66 77 88 99 in"),                  // alpha_words
      (6L, "cat dog bird fish horse cow sheep goat"),             // stopword
      (7L, null.asInstanceOf[String]),                            // null_text
      (8L, "the quick brown fox runs… and then... stops… here"))  // symbol_ratio via ellipses
      .toDF("doc_id", "text")
    val out = Curate.gopherAudit(docs, "text", minWords = 5, maxWords = 50,
        minMeanLen = 2.0, maxMeanLen = 10.0, maxSymbolRatio = 0.1,
        minAlphaWordRatio = 0.8, minStopwords = 2)
      .select("doc_id", "gopher_reason")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains("word_count"))
    assert(out(3L).contains("word_length"))
    assert(out(4L).contains("symbol_ratio"))
    assert(out(5L).contains("alpha_words"))
    assert(out(6L).contains("stopword"))
    assert(out(7L).contains("null_text"))
    assert(out(8L).contains("symbol_ratio")) // counts '…' and '...' glyphs
  }

  test("dedupLines: first occurrence kept in order; blanks are lines; null safe") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "same\nsame\nsame"),
      (3L, "one line only"),
      (4L, "a\n\nb\n\na"),               // blank lines count (and dedup)
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curate.dedupLines(docs, "text")
      .select("doc_id", "text_deduped", "dup_line_fraction")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getDouble(2)))).toMap
    assert(out(1L) == ((Some("alpha\nbeta\ngamma"), 0.4)))
    assert(out(2L) == ((Some("same"), 1.0 - 1.0 / 3)))
    assert(out(3L) == ((Some("one line only"), 0.0)))
    assert(out(4L) == ((Some("a\n\nb"), 0.4)))
    assert(out(5L)._1.isEmpty && out(5L)._2 == 0.0)
  }

  test("scrubPii: typed redactions, rule order, clean text untouched") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org today"),
      (2L, "server 192.168.1.250 and phone +1 (555) 867-5309"),
      (3L, "key deadbeefdeadbeefdeadbeefdeadbeef1234 leaked"),
      (4L, "perfectly clean text with no pii at all"),
      (5L, "a@b.io or 10.0.0.1 or 555-123-4567 together"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curate.scrubPii(docs, "text")
      .select("doc_id", "text_scrubbed")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("reach me at <EMAIL> today"))
    assert(out(2L).contains("server <IP> and phone <PHONE>"))
    assert(out(3L).contains("key <KEY> leaked"))
    assert(out(4L).contains("perfectly clean text with no pii at all"))
    assert(out(5L).contains("<EMAIL> or <IP> or <PHONE> together"))
    assert(out(6L).isEmpty) // NULL stays NULL
  }

  test("repetitionStats: doubled docs repeat every n-gram; unique docs score 0") {
    val docs = Seq(
      (1L, "a b c d a b c d"),   // doubled: 2-grams 7 total, 4 distinct
      (2L, "all words unique here now"),
      (3L, "x"),                 // fewer tokens than n -> whole-doc shingle
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curate.repetitionStats(docs, "text", ns = Seq(2))
      .select("doc_id", "dup_2gram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - (1.0 - 4.0 / 7)) < 1e-12)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.0)
  }

  test("packSequences: contiguous layout, straddling docs, per-shard streams") {
    // shard A: docs of 3,4,5 tokens with budget 8 ->
    //   cum: 0,3,7 -> seq 0,0,0; offsets 0,3,7 (doc 3 straddles into seq 1)
    val df = Seq(
      (1L, "a b c", "A"), (2L, "d e f g", "A"), (3L, "h i j k l", "A"),
      (4L, "m n o p", "A"), (5L, null.asInstanceOf[String], "A"),
      (6L, "q r", "A"),
      (7L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    val out = Curate.packSequences(df, "text", "doc_id", budget = 8,
        shardCol = "source")
      .select("doc_id", "token_count", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 0L, 0L)))
    assert(out(2L) == ((4L, 0L, 3L)))
    assert(out(3L) == ((5L, 0L, 7L)))  // starts in seq 0 at offset 7
    assert(out(4L) == ((4L, 1L, 4L)))  // first doc STARTING in seq 1
    assert(out(5L) == ((0L, 2L, 0L)))  // null text = zero tokens, no shift
    assert(out(6L) == ((2L, 2L, 0L)))  // unaffected by the null doc
    assert(out(7L) == ((2L, 0L, 0L)))  // shard B has its own stream
  }

  test("canonicalizeUrls: every rule, one crafted URL each") {
    val cases = Seq(
      // fragment + default http port + host/scheme case
      (1L, "HTTP://WWW.Ex.COM:80/A/b#frag", "http://www.ex.com/A/b"),
      // https default port dropped, non-default kept
      (2L, "https://ex.com:443/p", "https://ex.com/p"),
      (3L, "https://ex.com:8443/p", "https://ex.com:8443/p"),
      // http with :443 is NOT a default -> kept
      (4L, "http://ex.com:443/p", "http://ex.com:443/p"),
      // tracking first / middle / last / only
      (5L, "http://e.com/p?utm_source=a&q=1", "http://e.com/p?q=1"),
      (6L, "http://e.com/p?q=1&gclid=g&r=2", "http://e.com/p?q=1&r=2"),
      (7L, "http://e.com/p?q=1&fbclid=f", "http://e.com/p?q=1"),
      (8L, "http://e.com/p?utm_x=1", "http://e.com/p"),
      // trailing slashes at end; slash before query survives
      (9L, "http://e.com/a/b///", "http://e.com/a/b"),
      (10L, "http://e.com/", "http://e.com"),
      (11L, "http://e.com/a/?q=1", "http://e.com/a/?q=1"),
      // path/query case preserved
      (12L, "http://E.com/CaseD?Q=V", "http://e.com/CaseD?Q=V"),
      // non-URL passes through, NULL host
      (13L, "not a url", "not a url"))
      .toDF("doc_id", "url", "want")
    val out = Curate.canonicalizeUrls(cases, "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("want"), r.getAs[String]("url_canonical"),
          r.getAs[String]("host")))).toMap
    out.foreach { case (id, (want, got, _)) =>
      assert(got == want, s"doc $id: got $got, want $want") }
    assert(out(1L)._3 == "www.ex.com" && out(13L)._3 == null)
  }

  test("domainQuota: lowest ids kept per host, partial WindowGroupLimit") {
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "big" else s"s${i % 3}"))
      .toDF("id", "host")
    val out = Curate.domainQuota(rows, "host", "id", quota = 5)
    val kept = out.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).sorted.toSeq }
    assert(kept("big") == (2L to 10L by 2))      // the 5 lowest even ids
    assert(kept.values.forall(_.size <= 5))
    // every host's kept set is exactly its 5 lowest ids
    val byHost = (1L to 100L).map(i =>
      (if (i % 2 == 0) "big" else s"s${i % 3}") -> i)
      .groupBy(_._1).map { case (h, xs) =>
        h -> xs.map(_._2).sorted.take(5).toSeq }
    assert(kept == byHost)
    // the rank filter must have become a pre-shuffle partial
    // WindowGroupLimit (the map-side prune the scaladoc promises)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("splitCorpus: disjoint, exhaustive, growth-stable, ~proportional") {
    val ids = spark.range(0, 5000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val lab = Curate.splitCorpus(ids, "id", splits)
      .as[(Long, String)].collect()
    assert(lab.length == 5000)                       // exhaustive, no dup
    assert(lab.map(_._1).distinct.length == 5000)
    val byLab = lab.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLab.keySet == Set("train", "val", "test"))
    assert(math.abs(byLab("train").size - 4000) < 200)
    assert(math.abs(byLab("val").size - 500) < 120)
    // growth stability: relabeling a subset agrees with the full labeling
    val sub = Curate.splitCorpus(ids.filter($"id" < 1000), "id", splits)
      .as[(Long, String)].collect().toMap
    assert(lab.filter(_._1 < 1000).forall { case (i, s) => sub(i) == s })
    // hashSample(rate) equals the train split of (rate, 1-rate): the
    // complementary-ranges discipline is shared, not merely analogous
    val s80 = Curate.hashSample(ids, "id", 0.8).as[Long].collect().toSet
    assert(byLab("train") == s80)
  }

  test("chunkSliding: coverage, overlap, last-chunk length, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),   // 10 toks: 3 chunks
      (2L, "a b c"),                                    // n <= size: 1 chunk
      (3L, ""), (4L, null.asInstanceOf[String]))        // no chunks
      .toDF("id", "text")
    val out = Curate.chunkSliding(docs, "text", "id", chunkSize = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(c => (c._1, c._2))
    assert(!out.exists(c => c._1 == 3L || c._1 == 4L))
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, "a b c", 3L)))
    val c1 = out.filter(_._1 == 1L).toSeq
    // starts 0,3,6 then 9 reaches the end: ceil((10-4)/3)+1 = 3 chunks
    assert(c1 == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L)))
    // disjoint mode reconstructs the token stream exactly
    val flat = Curate.chunkSliding(docs.filter($"id" === 1L), "text", "id",
        chunkSize = 3, stride = 3)
      .orderBy("chunk_id").as[(Long, Long, String, Long)].collect()
      .map(_._3).mkString(" ")
    assert(flat == (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("chunkSliding with tokensCol: an empty-string encoding ([\"\"], the " +
      "split(\"\",\"\") shape) emits NO chunks — matching length(enc) > 0") {
    val docs = Seq(
      (1L, Array("a", "b", "c")),          // real tokens: chunks
      (2L, Array("")),                     // empty-text BPE encoding: none
      (3L, Array.empty[String]))           // empty array: none
      .toDF("id", "toks")
    val out = Curate.chunkSliding(docs, "toks", "id", chunkSize = 2,
        stride = 2, tokensCol = Some("toks"), joinSep = "")
      .as[(Long, Long, String, Long)].collect().toSeq.sortBy(c => (c._1, c._2))
    assert(out.map(_._1).toSet == Set(1L))
    assert(out == Seq((1L, 0L, "ab", 2L), (1L, 1L, "c", 1L)))
  }
  test("zorderValue: textbook morton interleave, lane placement") {
    val df = Seq((3L, 1L), (0L, 0L), (3L, 3L), (2L, 2L)).toDF("x", "y")
    val out = df.select(Curate.zorderValue(
        Seq(col("x"), col("y")), bitsPer = 2).as("z"))
      .as[Long].collect().toSeq
    // morton(x,y) with x in even bit lanes, y in odd
    assert(out == Seq(7L, 0L, 15L, 12L))
  }

  test("zorderLayout: one range exchange; files cover small rectangles " +
      "on BOTH dims (vs a lexicographic sort's trailing-dim blowout)") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(8)
    val laid = Curate.zorderLayout(df, Seq("x", "y"), numPartitions = 16,
      bitsPer = 6)
    assert(laid.columns.toSeq == Seq("x", "y"))   // z column internal
    // exactly the one range exchange any global clustering pays
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    val spans = laid.withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.map(_._3).sum == 64L * 64L)
    // each dimension's average per-partition span is a small fraction of
    // the global 0..63 range; a sort by x alone leaves sy == 63 everywhere
    val avgSx = spans.map(_._1).sum.toDouble / spans.length
    val avgSy = spans.map(_._2).sum.toDouble / spans.length
    assert(avgSx <= 24.0, s"avg x span $avgSx")
    assert(avgSy <= 24.0, s"avg y span $avgSy")
    // rows within a partition are z-sorted -> rectangles, not stripes
    val lexi = df.repartitionByRange(16, col("x"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("y") - min("y")).as("sy"))
      .collect().map(_.getLong(1))
    assert(lexi.forall(_ == 63L))   // the contrast this layout removes
  }

  test("zorderLayout: constant and all-null lanes degrade gracefully") {
    val df = Seq((1L, Option(5L)), (2L, Option(5L)), (3L, None))
      .toDF("a", "b")
    val laid = Curate.zorderLayout(df, Seq("a", "b"), numPartitions = 2,
      bitsPer = 4)
    assert(laid.count() == 3)
    val nul = Seq((1L, None: Option[Long]), (2L, None)).toDF("a", "b")
    assert(Curate.zorderLayout(nul, Seq("b"), 1).count() == 2)
  }
  test("mixCorpus: saturation keeps everything, downsampling is nested " +
      "across budgets, unlisted strata drop, growth-stable") {
    val docs = (1L to 3000L).map(i =>
      (i, if (i <= 100) "rare" else if (i <= 1600) "web" else "junk"))
      .toDF("id", "src")
    val shares = Map("rare" -> 0.5, "web" -> 0.5)
    val out = Curate.mixCorpus(docs, "src", "id", shares, budget = 400L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // rare saturates: 400*0.5=200 allocation > 100 docs -> keep all 100
    assert(bySrc("rare") == 100)
    // web downsamples: rate 200/1500; deterministic hash -> tolerance band
    assert(math.abs(bySrc("web") - 200) < 60, bySrc.toString)
    assert(!bySrc.contains("junk"))
    // budget nesting: a smaller budget's pick is a subset of a larger's
    val small = Curate.mixCorpus(docs, "src", "id", shares, budget = 200L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(out.map(_._1).toSet))
    // growth stability with unchanged rates: adding docs to an UNLISTED
    // stratum never changes listed picks (counts of listed strata fixed)
    val grown = docs.unionByName(
      (9001L to 9500L).map(i => (i, "junk")).toDF("id", "src"))
    val regrown = Curate.mixCorpus(grown, "src", "id", shares, budget = 400L)
      .select("id").as[Long].collect().toSet
    assert(regrown == out.map(_._1).toSet)
  }
  test("trainPerceptron: converges on separable data, trajectory is " +
      "partition-invariant, margins survive huge weights") {
    import graft.operators.Curate
    // linearly separable: y = sign(x1 - x2)
    val data = ((1L to 40L).map(i => (1L, 100L + i, 10L)) ++
      (1L to 40L).map(i => (-1L, 10L, 100L + i))).toDF("y", "x1", "x2")
    val out = Curate.trainPerceptron(data, Seq("x1", "x2"), "y", epochs = 6)
      .orderBy("epoch").collect()
    // epoch 1 misclassifies everything (w=0 -> margin 0), then converges
    assert(out(0).getAs[Long]("n_updates") == 80L)
    assert(out.last.getAs[Long]("n_updates") == 0L, "did not converge")
    // converged weights separate: w_x1 > 0 > w_x2
    assert(out.last.getAs[Long]("w_x1") > 0 && out.last.getAs[Long]("w_x2") < 0)
    // partitioning cannot change the trajectory (integer sums commute)
    val re = Curate.trainPerceptron(data.repartition(13), Seq("x1", "x2"),
      "y", epochs = 6).orderBy("epoch").collect()
    assert(out.map(_.toSeq).toSeq == re.map(_.toSeq).toSeq)
    // decimal margins: 10^15-unit features with 10^3 rows must not wrap
    val big = ((1L to 500L).map(i => (1L, 1000000000000000L + i)) ++
      (1L to 500L).map(i => (-1L, -1000000000000000L - i))).toDF("y", "x1")
    val bo = Curate.trainPerceptron(big, Seq("x1"), "y", epochs = 3)
      .orderBy("epoch").collect()
    assert(bo.last.getAs[Long]("n_updates") == 0L)
  }

  test("fitPerceptron matches trainPerceptron's last row; applyPerceptron " +
      "separates, NULLs predict NULL, boundary goes to -1, no shuffle") {
    import graft.operators.Curate
    val data = ((1L to 40L).map(i => (1L, 100L + i, 10L)) ++
      (1L to 40L).map(i => (-1L, 10L, 100L + i))).toDF("y", "x1", "x2")
    val (b, w) = Curate.fitPerceptron(data, Seq("x1", "x2"), "y", epochs = 6)
    val last = Curate.trainPerceptron(data, Seq("x1", "x2"), "y", epochs = 6)
      .orderBy("epoch").collect().last
    assert(b == last.getAs[Long]("b") &&
      w == Seq(last.getAs[Long]("w_x1"), last.getAs[Long]("w_x2")))
    // converged weights classify the training set perfectly
    val scored = Curate.applyPerceptron(data, Seq("x1", "x2"), b, w)
    assert(scored.filter(col("prediction") =!= col("y")).count() == 0)
    // inference is row-local: no exchange anywhere in the plan
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"),
      scored.queryExecution.executedPlan.toString)
    // NULL feature -> NULL margin -> NULL prediction; margin 0 -> -1
    val edge = Seq((java.lang.Long.valueOf(5L), java.lang.Long.valueOf(5L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("x1", "x2")
    val e = Curate.applyPerceptron(edge, Seq("x1", "x2"), 0L, Seq(1L, -1L))
      .select("prediction").collect()
    assert(e(0).getLong(0) == -1L)  // margin exactly 0 -> -1 (training rule)
    assert(e(1).isNullAt(0))        // no silent class for NULL features
  }

  test("mixCorpus strata-count collect is |targetShares|-bounded on a " +
      "high-cardinality stratum column") {
    // 1000 distinct strata, 2 targets: the driver-side counts map must be
    // bounded by the TARGETS (pre-filtered before the groupBy/collect),
    // not by the column's cardinality — a URL-host stratum column at
    // corpus scale would otherwise be a driver-scale collect
    val wide = (1L to 2000L).map(i => (i, s"host$i"))
      .toDF("id", "src")
      .unionByName(Seq((9001L, "keepA"), (9002L, "keepA"), (9003L, "keepB"))
        .toDF("id", "src"))
    val counts = Curate.strataCounts(wide, "src", Seq("keepA", "keepB"))
    assert(counts.size <= 2, s"collect not bounded: ${counts.size} entries")
    assert(counts == Map("keepA" -> 2L, "keepB" -> 1L))
    // and the mix itself only ever emits target strata
    val mixed = Curate.mixCorpus(wide, "src", "id",
      Map("keepA" -> 0.5, "keepB" -> 0.5), budget = 10L)
    assert(mixed.select("src").distinct().as[String].collect().toSet
      .subsetOf(Set("keepA", "keepB")))
  }
  test("row-local curation ops are streaming-safe: hashSample and " +
      "splitCorpus run unchanged on a stream with batch-identical output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L until 500L: _*)
    val streamed = Curate.splitCorpus(
      Curate.hashSample(mem.toDF().toDF("id"), "id", 0.5), "id",
      Seq("train" -> 0.9, "val" -> 0.1))
    val q = streamed.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("curate_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Curate.splitCorpus(
      Curate.hashSample(spark.range(0, 500).toDF("id"), "id", 0.5), "id",
      Seq("train" -> 0.9, "val" -> 0.1))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }
  test("weightedSample: keep rate tracks weight, nested in scale, " +
      "null/zero weights never sample") {
    val docs = ((1L to 1000L).map(i => (i, Option(100.0))) ++
      (1001L to 2000L).map(i => (i, Option(1000.0))) ++
      Seq((3000L, None: Option[Double]), (3001L, Option(0.0)),
        (3002L, Option(-5.0))))
      .toDF("id", "w")
    val out = Curate.weightedSample(docs, "id", "w", scale = 0.0005)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(3000L) && !out.contains(3001L) &&
      !out.contains(3002L))
    val light = out.count(_ <= 1000)    // p = 0.05
    val heavy = out.count(i => i > 1000 && i <= 2000) // p = 0.5
    assert(math.abs(light - 50) < 35, s"light=$light")
    assert(math.abs(heavy - 500) < 80, s"heavy=$heavy")
    // scale nesting: smaller scale picks a subset
    val half = Curate.weightedSample(docs, "id", "w", scale = 0.00025)
      .select("id").as[Long].collect().toSet
    assert(half.subsetOf(out))
    // saturation: scale large enough -> every positive-weight row kept
    assert(Curate.weightedSample(docs, "id", "w", scale = 1.0).count()
      == 2000)
  }

  test("leakSafeSplit: near-dup clusters never straddle splits; unpaired " +
      "rows match splitCorpus exactly; empty pairs = splitCorpus") {
    import graft.operators.Dedup
    val docs = (0L until 100L).map(i => (i, s"doc$i")).toDF("id", "text")
    // two transitive chains + one pair; everything else unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L), (70L, 90L))
      .toDF("a", "b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curate.leakSafeSplit(docs, pairs, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 100)
    // every cluster lands in ONE split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(50L) == out(51L) && out(70L) == out(90L))
    // unpaired rows are hashed by their own id -> identical to splitCorpus
    val plain = Curate.splitCorpus(docs, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val paired = Set(1L, 2L, 3L, 50L, 51L, 70L, 90L)
    (0L until 100L).filterNot(paired).foreach(i =>
      assert(out(i) == plain(i), s"id $i moved without being paired"))
    // clustered rows adopt their REPRESENTATIVE's plain label
    assert(out(1L) == plain(1L) && out(50L) == plain(50L) &&
      out(70L) == plain(70L))
    // no pairs at all -> exactly splitCorpus
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val same = Curate.leakSafeSplit(docs, empty, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(same == plain)
  }

  test("trainingOrder: dense per-shard positions, hash-driven order, " +
      "deterministic under repartition, salt changes the permutation") {
    val docs = (0L until 200L).map(i => (i, s"doc$i")).toDF("id", "text")
    val out = Curate.trainingOrder(docs, "id", nShards = 4, salt = "e1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are dense 0..n-1 within every shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions not dense")
    }
    // bit-exact determinism under repartition + row order
    val re = Curate.trainingOrder(docs.repartition(7).orderBy(rand(5)),
        "id", nShards = 4, salt = "e1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == re.sortBy(_._1).toSeq)
    // a different salt yields a different permutation (fresh epoch)
    val e2 = Curate.trainingOrder(docs, "id", nShards = 4, salt = "e2")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq != e2.sortBy(_._1).toSeq)
    // id never decides order directly: within a shard, ascending pos is
    // NOT ascending id (the permutation actually permutes)
    val byShard = out.groupBy(_._2).values.find(_.length > 3).get
    assert(byShard.sortBy(_._3).map(_._1).toSeq !=
      byShard.map(_._1).sorted.toSeq)
  }
}
