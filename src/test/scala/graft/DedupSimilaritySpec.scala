package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Multimodal}

/** Extension-operator semantics: dedup families, ANN, multimodal plumbing. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  quick   Brown fox jumps over the lazy dog"), // exact dup (normalized)
    (3L, "the quick brown fox jumps over the lazy cat"),    // near dup
    (4L, "completely different words appear in this one here"),
    (5L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"))
    .toDF("doc_id", "text")

  test("exact dedup: whitespace/case-normalized duplicates collapse, min id kept") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L, 5L))
  }

  test("minhash pairs: near-dups found, disjoint docs not paired") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5, shingleN = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))          // identical token sets
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // 8/10 overlap
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // disjoint vocab
  }

  test("minhash hot-bucket rep verify: beyond-cap dense-class members " +
      "pair with their bucket rep; emitted pairs subset of uncapped") {
    // 8 near-identical docs (one token mutated each) + 2 unrelated:
    // with maxBucket = 2 the cap alone loses members 3..8 of every
    // bucket; hotBucketRep recovers them via the min-id rep
    val tmpl = (0 until 20).map(i => s"t$i")
    val dense = (0L until 8L).map(i =>
      (i, tmpl.updated((i % 20).toInt, s"mut$i").mkString(" ")))
    val other = Seq(
      (100L, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
      (101L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"))
    val corpus = (dense ++ other).toDF("doc_id", "text")
    def run(cap: Int, hot: Boolean) = Dedup.minhashPairs(corpus, "text",
        "doc_id", numHashes = 32, bands = 8, threshold = 0.7,
        shingleN = 1, maxBucket = cap, hotBucketRep = hot)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val uncapped = run(cap = 1024, hot = false)
    val capped = run(cap = 2, hot = false)
    val hotRep = run(cap = 2, hot = true)
    val densely = (s: Set[(Long, Long)]) =>
      s.flatMap(p => Seq(p._1, p._2)).filter(_ < 8L)
    // the cap loses dense members; the rep path recovers ALL of them
    assert(densely(capped).size < 8, s"cap did not bite: $capped")
    assert(densely(hotRep) == (0L until 8L).toSet,
      s"rep verify missed members: ${densely(hotRep)}")
    // precision: never invents a pair the uncapped join wouldn't emit
    assert(hotRep.subsetOf(uncapped), s"extra pairs: ${hotRep -- uncapped}")
    assert(capped.subsetOf(hotRep), "hot path lost a within-cap pair")
    // unrelated docs stay unpaired on every path
    assert(!hotRep.exists(p => p._1 >= 100L || p._2 >= 100L))
  }

  test("dense class beyond the cap stays ONE cluster with hotBucketRep: " +
      "minhash and embedding families feed connected components whole") {
    // the q177/SKEW_SCALE fragmentation shape at spec scale: 8
    // near-identical docs against maxBucket = 2. Without the rep star,
    // connected components sees bucket-sized ISLANDS (or nothing past
    // the cap) and every composite consumer keeps one survivor per
    // island; with it the class is one component under the min id.
    val tmpl = (0 until 20).map(i => s"t$i")
    val dense = (0L until 8L).map(i =>
      (i, tmpl.updated((i % 20).toInt, s"mut$i").mkString(" ")))
    val other = Seq(
      (100L, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
      (101L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"))
    val corpus = (dense ++ other).toDF("doc_id", "text")
    def clustersOf(hot: Boolean): Map[Long, Long] =
      Dedup.clusters(Dedup.minhashPairs(corpus, "text", "doc_id",
          numHashes = 32, bands = 8, threshold = 0.7, shingleN = 1,
          maxBucket = 2, hotBucketRep = hot))
        .select("id", "cluster").as[(Long, Long)].collect().toMap
    val whole = clustersOf(hot = true)
    assert((0L until 8L).forall(i => whole.get(i).contains(0L)),
      s"hotBucketRep did not keep the class whole: $whole")
    val frag = clustersOf(hot = false)
    val fragLabels = frag.filter(_._1 < 8L)
    assert(fragLabels.size < 8 || fragLabels.values.toSet.size > 1,
      s"cap did not fragment the class - fixture is too weak: $frag")

    // embedding family, same shape: 8 near-identical vectors (tiny
    // monotone perturbations - distinct, so the exact pre-pass does
    // not collapse them) + one unrelated
    val vdf = ((0L until 8L).map(i =>
        (i, Array(1f, 0.001f * (i + 1), 0f, 0f))) :+
        (100L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    def prune(hot: Boolean): Set[Long] =
      Dedup.semanticPrune(vdf, "embedding", "vec_id",
          threshold = 0.99, nBits = 4, bands = 8, maxBucket = 2,
          dim = 4, hotBucketRep = hot)
        .select("vec_id").as[Long].collect().toSet
    val vCl = Dedup.clusters(
        Dedup.embeddingNearDupPairs(vdf, "embedding", "vec_id",
          threshold = 0.99, nBits = 4, bands = 8, maxBucket = 2,
          dim = 4, hotBucketRep = true))
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert((0L until 8L).forall(i => vCl.get(i).contains(0L)),
      s"embedding hotBucketRep did not keep the class whole: $vCl")
    val keptHot = prune(hot = true)
    assert(keptHot == Set(0L, 100L),
      s"semanticPrune(hotBucketRep) must keep ONE class survivor: $keptHot")
    val keptCapped = prune(hot = false)
    assert(keptCapped.size > keptHot.size,
      s"cap did not fragment the embedding class: $keptCapped")
  }

  test("portableHash64: cross-engine known answer (DuckDB-verified)") {
    // SELECT CAST(concat('0x', substring(md5('abc'),1,15)) AS BIGINT)
    // = 648541476951500027 in DuckDB 1.0; '' = 955282973525019424
    import graft.functions.TextFunctions
    val out = Seq("abc", "").toDF("s")
      .select(TextFunctions.portableHash64(col("s"))).as[Long].collect()
    assert(out.toSeq == Seq(648541476951500027L, 955282973525019424L))
  }

  test("portable mode: same dedup semantics as fast mode on the known corpus") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5, shingleN = 1,
        mode = Dedup.Portable)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    val sh = Dedup.simhash(docs, "text", "doc_id", mode = Dedup.Portable)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))                    // normalized-identical
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60))) // 60-bit range
  }

  test("simhash: identical normalized docs -> distance 0; disjoint docs far") {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(5L)) > 10)
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("dedupParagraphs: first global occurrence survives, later docs lose " +
      "normalized-duplicate paragraphs, NULL text emits no row") {
    val corpus = Seq(
      (1L, "A\n\nB\n\nC"),
      (2L, "B\n\nD"),          // B first seen in doc 1
      (3L, "a \n\nE"),         // "a " normalizes to doc 1's "A"
      (4L, "b\n\nC"),          // everything already seen
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // NULL text -> no paragraphs
    assert(out(1L) == ((3L, 3L, "A\n\nB\n\nC"))) // doc 1 owns everything
    assert(out(2L) == ((2L, 1L, "D")))
    assert(out(3L) == ((2L, 1L, "E")))
    assert(out(4L) == ((2L, 0L, "")))            // fully boilerplate doc
  }

  test("simhash duplicate ids: one signature row per INPUT row; pairs emit " +
      "neither self nor duplicated pairs") {
    // the row-local form deliberately does not merge same-id rows (the old
    // aggregate form did); this pins the documented contract so a future
    // rewrite cannot silently flip it — and pins that simhashPairs stays
    // safe anyway: a<b kills self-pairs, dropDuplicates kills repeats
    val dup = docs.unionByName(Seq((1L, "the quick brown fox jumps over " +
      "the lazy dog")).toDF("doc_id", "text"))
    val sh = Dedup.simhash(dup, "text", "doc_id").collect()
    assert(sh.length == 6, "row-local simhash emits one row per input row")
    assert(sh.count(_.getLong(0) == 1L) == 2)
    val pairs = Dedup.simhashPairs(dup, "text", "doc_id", maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b }, "no self pairs")
    assert(pairs.distinct.length == pairs.length, "no duplicated pairs")
    assert(pairs.toSet.contains((1L, 2L)))
  }

  test("SimHashExpr simhash == aggregate reference form, both modes") {
    val edge = docs.unionByName(Seq(
      (6L, ""),                            // zero tokens -> no row
      (7L, " \t "),                        // whitespace-only -> no row
      (8L, "one"),                         // single token
      (9L, "dup dup dup tok"),             // repeated tokens vote repeatedly
      (10L, "unicode tøkens 中文 𝄞 here"))
      .toDF("doc_id", "text"))
      .unionByName(Seq((11L, Option.empty[String])).toDF("doc_id", "text"))
    for (mode <- Seq(Dedup.Fast, Dedup.Portable)) {
      val fast = Dedup.simhash(edge, "text", "doc_id", mode)
        .as[(Long, Long)].collect().toMap
      val ref = Dedup.simhashAgg(edge, "text", "doc_id", mode)
        .as[(Long, Long)].collect().toMap
      assert(fast == ref, s"mode=$mode")
      assert(!fast.contains(6L) && !fast.contains(7L) && !fast.contains(11L))
    }
  }

  test("ngram jaccard: exact value on known token sets") {
    val two = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val p = Dedup.ngramJaccardPairs(two, "text", "doc_id", n = 1,
      threshold = 0.1, maxDf = 10).collect()(0)
    assert(math.abs(p.getAs[Double]("jaccard") - 3.0 / 5.0) < 1e-12)
  }

  test("ngram jaccard: identical-doc cluster beyond maxDf still pairs") {
    // 100 identical docs push every shingle's df to 100 > maxDf=10; the
    // exact-dup pre-pass must still emit the 99 rep pairs at jaccard 1.0
    val dups = spark.range(0, 100).selectExpr("id AS doc_id",
      "'same words here' AS text")
    val pairs = Dedup.ngramJaccardPairs(dups, "text", "doc_id", n = 1,
      threshold = 0.5, maxDf = 10)
    assert(pairs.count() == 99)
    assert(pairs.agg(min(col("jaccard"))).collect()(0).getDouble(0) == 1.0)
  }

  test("brute-force top-k: exact neighbor order, self excluded") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),  // closest to 0
      (2L, Array(0f, 1f, 0f, 0f)),      // orthogonal to 0
      (3L, Array(0.5f, 0.5f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 1), (3L, 2)))
  }

  test("LSH top-k: identical vector found in same bucket; recall vs brute") {
    val vecs = (0L until 50L).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)
      (i, base)
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(vecs, probes, k = 3, idCol = "vec_id")
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(vecs, probes, k = 3, nBits = 6,
        multiprobe = 6, dim = 8)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("IVF top-k: full-probe recall == brute force; partial probes sane") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(vecs, probes, k = 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // nProbe == nLists scans everything -> exact
    val full = Similarity.ivfTopK(vecs, probes, k = 3, nLists = 4, nProbe = 4)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
    val partial = Similarity.ivfTopK(vecs, probes, k = 3, nLists = 8,
        nProbe = 4)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect partial).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("embedding near-dup: identical vectors pair at cos 1.0") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      threshold = 0.99, nBits = 4, dim = 4)
    val got = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("hamming masks: full ball, unique, popcount bounded") {
    val m = Similarity.hammingMasks(8, 2)
    assert(m.size == 1 + 8 + 28) // C(8,0)+C(8,1)+C(8,2)
    assert(m.distinct.size == m.size)
    assert(m.forall(x => java.lang.Long.bitCount(x) <= 2))
    assert(Similarity.hammingMasks(6, 6).size == 64) // whole space
  }

  test("minhash signatures are row-local and stable for dup docs") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id",
        numHashes = 16, shingleN = 1)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toVector).toMap
    assert(sigs(1L) == sigs(2L)) // identical token sets -> identical sigs
    assert(sigs(1L) != sigs(5L))
    assert(sigs.values.forall(_.size == 16))
  }

  test("pathological all-duplicates corpus: linear pairs, bounded time") {
    // 2000 identical docs: without the exact-dup pre-pass the band
    // self-join would produce ~2M rows; with it, exactly 1999 rep pairs.
    val dups = spark.range(0, 2000).selectExpr("id AS doc_id",
      "'the same text every single time' AS text")
    val pairs = Dedup.minhashPairs(dups, "text", "doc_id",
      numHashes = 32, bands = 8, threshold = 0.5, shingleN = 1)
    assert(pairs.count() == 1999)
    assert(pairs.filter(col("a") =!= 0L).count() == 0) // all anchored at rep
    val vdups = spark.range(0, 1000).selectExpr("id AS vec_id",
      "array(1.0F, 0.0F, 0.0F, 0.0F) AS embedding")
    val vpairs = Dedup.embeddingNearDupPairs(vdups, "embedding", "vec_id",
      threshold = 0.9, nBits = 4, maxBucket = 16, dim = 4)
    assert(vpairs.count() == 999)
    assert(vpairs.agg(min(col("cos"))).collect()(0).getDouble(0) == 1.0)
  }

  test("NULL content never pairs and never collapses") {
    val withNulls = docs.unionByName(Seq(
      (10L, null.asInstanceOf[String]), (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    // exact: all NULL-text rows survive (not duplicates of each other)
    assert(Dedup.exact(withNulls, "text", "doc_id").count() == 4 + 3)
    // pairs: no bogus est_jaccard=1.0 cluster among NULL rows
    val pairs = Dedup.minhashPairs(withNulls, "text", "doc_id",
        numHashes = 32, bands = 8, threshold = 0.5, shingleN = 1)
      .select("a", "b").as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 >= 10L || p._2 >= 10L))
    // embeddings: NULL vectors neither pair nor crash the dim guard
    val vecs = Seq((0L, Some(Array(1f, 0f, 0f, 0f))),
      (1L, Some(Array(1f, 0f, 0f, 0f))),
      (2L, Option.empty[Array[Float]]), (3L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val vp = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
        threshold = 0.9, nBits = 4, bands = 2, maxBucket = 16, dim = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(vp == Set((0L, 1L)))
  }

  test("simhashPairs rejects a pigeonhole-violating configuration") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 10, blocks = 4)
    }
  }

  test("bucket audit reports capped-out members") {
    val b = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 8L))
      .toDF("id", "bucket")
    val audit = Dedup.bucketAudit(b, Seq("bucket"), maxBucket = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit(7L) == (3L, 1L))
    assert(audit(8L) == (1L, 0L))
  }

  test("repeatedSpans: cross-doc repeated grams merge to maximal spans; " +
      "unique and short docs emit nothing") {
    val boiler = "one two three four five six seven eight"   // 8 tokens
    val d = Seq(
      (1L, s"alpha $boiler beta"),                  // span at tokens 1..8
      (2L, s"$boiler gamma delta"),                 // span at tokens 0..7
      (3L, "totally unique text with no repeats at all here ok"),
      (4L, "short doc")                             // < 8 tokens
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(d, "text", "doc_id", n = 8, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 1L, 9L), (2L, 0L, 8L)))
    // overlapping repeated windows merge into ONE maximal span
    val two = Seq((1L, s"$boiler nine"), (2L, s"$boiler nine"))
      .toDF("doc_id", "text")
    val m = Dedup.repeatedSpans(two, "text", "doc_id", n = 8, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 9 tokens, two overlapping 8-gram starts (0 and 1) -> one span [0,9)
    assert(m.toSet == Set((1L, 0L, 9L, 2L), (2L, 0L, 9L, 2L)))
  }

  test("cutRepeatedSpans removes exactly the span tokens and is idempotent") {
    val boiler = "one two three four five six seven eight"
    val d = Seq(
      (1L, s"alpha $boiler beta"),
      (2L, s"$boiler gamma delta"),
      (3L, "untouched document stays normalized only")
    ).toDF("doc_id", "text")
    val cut = Dedup.cutRepeatedSpans(d, "text", "doc_id", n = 8, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(cut(1L) == ("alpha beta", 2L, 8L))
    assert(cut(2L) == ("gamma delta", 2L, 8L))
    assert(cut(3L) == ("untouched document stays normalized only", 5L, 0L))
    // idempotent: cutting the cleaned corpus cuts nothing further
    val again = Dedup.cutRepeatedSpans(
        d.select(col("doc_id"), col("text")), "text", "doc_id", 8, 2)
      .select("doc_id", "text")
    val twice = Dedup.cutRepeatedSpans(again, "text", "doc_id", 8, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(twice.values.forall(_ == 0L), twice.toString)
  }

  test("multimodal: real PNG round trip — decoded stats match the fixture formula") {
    val withPayload = Multimodal.attachImagePayload(spark, docs, "doc_id")
    // payloads are genuine PNGs (magic bytes)
    val payload = withPayload.filter(col("doc_id") === 1L).collect()(0)
      .getAs[Array[Byte]]("payload")
    assert((payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N')
    val out = Multimodal.featurize(spark, withPayload, "doc_id")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("decode_ok"))
      val (w, h) = (Multimodal.ImageFixture.width(id), Multimodal.ImageFixture.height(id))
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val expSumR = (for (x <- 0 until w; y <- 0 until h)
        yield Multimodal.ImageFixture.r(id, 0, x, y).toLong).sum
      assert(r.getAs[Long]("sum_r") == expSumR)
    }
  }

  test("multimodal: undecodable payload fails soft with decode_ok=false") {
    val junk = Seq((1L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val r = Multimodal.featurize(spark, junk, "doc_id").collect()(0)
    assert(!r.getAs[Boolean]("decode_ok"))
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("sum_r")))
  }

  test("multimodal: frame container demux + per-frame real decode") {
    val withPayload = Multimodal.attachVideoPayload(spark, docs, "doc_id", nFrames = 3)
    val frames = Multimodal.frameSample(spark, withPayload, "doc_id")
    val f = frames.filter(col("doc_id") === 1L).orderBy("frame_idx").collect()
    assert(f.length == 3)
    // each frame is an independently decodable real PNG
    f.foreach { row =>
      val img = Multimodal.ImageCodec.decode(row.getAs[Array[Byte]]("frame"))
      assert(img.isDefined)
      assert(img.get.getWidth == Multimodal.ImageFixture.width(1L))
    }
    // fused frameStats agrees with the per-frame formula
    val st = Multimodal.frameStats(spark, withPayload, "doc_id")
      .filter(col("doc_id") === 1L).orderBy("frame_idx").collect()
    assert(st.length == 3)
    st.zipWithIndex.foreach { case (r, fi) =>
      val (w, h) = (Multimodal.ImageFixture.width(1L), Multimodal.ImageFixture.height(1L))
      val expSumG = (for (x <- 0 until w; y <- 0 until h)
        yield Multimodal.ImageFixture.g(1L, fi, x, y).toLong).sum
      assert(r.getAs[Long]("sum_g") == expSumG)
    }
  }

  test("multimodal: JPEG decode path works (lossy — dims exact, stats near)") {
    // the oracle tier uses PNG (lossless); this pins that the SAME decode
    // path handles JPEG payloads: real ImageIO JPEG encode -> decode
    val img = Multimodal.ImageFixture.image(5L)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val df = Seq((5L, baos.toByteArray)).toDF("doc_id", "payload")
    val r = Multimodal.featurize(spark, df, "doc_id").collect()(0)
    assert(r.getAs[Boolean]("decode_ok"))
    assert(r.getAs[Int]("width") == Multimodal.ImageFixture.width(5L))
    assert(r.getAs[Int]("height") == Multimodal.ImageFixture.height(5L))
    // lossy but bounded: mean channel value within 25% of the source's
    val n = Multimodal.ImageFixture.width(5L) * Multimodal.ImageFixture.height(5L)
    val exact = (for (x <- 0 until Multimodal.ImageFixture.width(5L);
                      y <- 0 until Multimodal.ImageFixture.height(5L))
      yield Multimodal.ImageFixture.r(5L, 0, x, y).toLong).sum
    assert(math.abs(r.getAs[Long]("sum_r") - exact).toDouble / (n * 255) < 0.25)
  }

  test("multimodal audio: real WAV round trip matches the fixture formula") {
    val withPayload = Multimodal.attachAudioPayload(spark, docs, "doc_id")
    // payloads are genuine RIFF/WAVE files
    val wav = withPayload.filter(col("doc_id") === 1L).collect()(0)
      .getAs[Array[Byte]]("payload")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val r = Multimodal.audioFeaturize(spark, withPayload, "doc_id")
      .filter(col("doc_id") === 2L).collect()(0)
    assert(r.getAs[Boolean]("decode_ok"))
    val exp = Multimodal.AudioFixture.samples(2L)
    assert(r.getAs[Int]("n_samples") == exp.length)
    assert(r.getAs[Long]("sum_s") == exp.map(_.toLong).sum)
    // junk fails soft
    val junk = Seq((9L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val j = Multimodal.audioFeaturize(spark, junk, "doc_id").collect()(0)
    assert(!j.getAs[Boolean]("decode_ok") && j.isNullAt(j.fieldIndex("sum_s")))
  }

  test("multimodal audio: decimation keeps every k-th real decoded sample") {
    val withPayload = Multimodal.attachAudioPayload(spark, docs, "doc_id")
    val res = Multimodal.audioResample(spark, withPayload, "doc_id", factor = 4)
    val r = Multimodal.audioFeaturize(spark, res, "doc_id")
      .filter(col("doc_id") === 3L).collect()(0)
    val exp = Multimodal.AudioCodec.decimate(Multimodal.AudioFixture.samples(3L), 4)
    assert(r.getAs[Int]("n_samples") == exp.length)
    assert(r.getAs[Int]("sample_rate") == Multimodal.AudioFixture.sampleRate / 4)
    assert(r.getAs[Long]("sumsq_s") == exp.map(v => v.toLong * v).sum)
  }

  test("multimodal: block-average resize is exact integer arithmetic") {
    val withPayload = Multimodal.attachImagePayload(spark, docs, "doc_id")
    val resized = Multimodal.resize(spark, withPayload, "doc_id", factor = 2)
    val r = Multimodal.featurize(spark, resized, "doc_id")
      .filter(col("doc_id") === 2L).collect()(0)
    val id = 2L
    val (w, h) = (Multimodal.ImageFixture.width(id), Multimodal.ImageFixture.height(id))
    assert(r.getAs[Int]("width") == w / 2 && r.getAs[Int]("height") == h / 2)
    val expSumB = (for (ox <- 0 until w / 2; oy <- 0 until h / 2) yield {
      val s = Multimodal.ImageFixture.b(id, 0, 2 * ox, 2 * oy) +
        Multimodal.ImageFixture.b(id, 0, 2 * ox + 1, 2 * oy) +
        Multimodal.ImageFixture.b(id, 0, 2 * ox, 2 * oy + 1) +
        Multimodal.ImageFixture.b(id, 0, 2 * ox + 1, 2 * oy + 1)
      (s / 4).toLong
    }).sum
    assert(r.getAs[Long]("sum_b") == expSumB)
  }

  test("kmeansLloyd: partition-invariant trajectory, tight clusters found, " +
      "empty clusters carried") {
    import graft.operators.Similarity
    // two point-masses far apart + k=3: seeds 0/1/2 are all IDENTICAL
    // (first blob), so ties send every member to cluster 0 and seeds 1/2
    // starve — the empty-cluster carry path runs every iteration
    val vecs = ((0L until 20L).map(i =>
        (i, Array.tabulate(4)(d => 10f + d))) ++
      (100L until 120L).map(i =>
        (i, Array.tabulate(4)(d => -10f - d))))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansLloyd(vecs, "embedding", "vec_id",
      k = 3, iterations = 4)
    val last = out.filter(col("iter") === 4).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_members")).toMap
    // the two masses land on clusters {0, and one of 1/2}; starved seeds
    // never appear in the output (no members), tie goes to the lowest id
    assert(last(0L) == 20L, last.toString)
    assert(last.values.sum == 40L && last.size == 2, last.toString)
    // exact determinism under repartition + row order
    val re = Similarity.kmeansLloyd(vecs.repartition(7).orderBy(rand(1)),
      "embedding", "vec_id", k = 3, iterations = 4)
    assert(out.orderBy("iter", "cluster").collect().map(_.toSeq).toSeq ==
      re.orderBy("iter", "cluster").collect().map(_.toSeq).toSeq)
    // converged: last two iterations identical memberships and centroids
    val it3 = out.filter(col("iter") === 3).orderBy("cluster")
      .collect().map(_.toSeq.drop(1)).toSeq
    val it4 = out.filter(col("iter") === 4).orderBy("cluster")
      .collect().map(_.toSeq.drop(1)).toSeq
    assert(it3 == it4, "did not converge on separated blobs")
  }

  test("IVF index: build once, serve many probe batches identically") {
    val vecs = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.ivfBuild(vecs, nLists = 8, vecCol = "embedding",
      idCol = "vec_id")
    def viaIndex(lo: Long, hi: Long) =
      Similarity.ivfQuery(idx, vecs.filter(col("vec_id").between(lo, hi)),
          k = 3, nProbe = 8)
        .select("probe_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    def oneShot(lo: Long, hi: Long) =
      Similarity.ivfTopK(vecs, vecs.filter(col("vec_id").between(lo, hi)),
          k = 3, nLists = 8, nProbe = 8)
        .select("probe_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    // two different probe batches served from ONE build match the
    // build-per-call results exactly
    assert(viaIndex(0, 3) == oneShot(0, 3))
    assert(viaIndex(10, 13) == oneShot(10, 13))
  }

  test("IVF index survives save/load: parquet layout partition-pruned by " +
      "list, loaded queries bit-match the in-memory index") {
    val vecs = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.ivfBuild(vecs, nLists = 8, vecCol = "embedding",
      idCol = "vec_id", persist = false)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-")
    try {
      Similarity.ivfSave(idx, dir.toString)
      // the serving layout: one directory per list -> probing nProbe
      // lists is a partition-pruned scan, not a corpus scan
      val listDirs = new java.io.File(s"$dir/assigned").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("__list="))
      assert(listDirs.length == 8, listDirs.map(_.getName).toSeq)
      val loaded = Similarity.ivfLoad(spark, dir.toString)
      assert(loaded.nLists == 8)
      def q(i: Similarity.IvfIndex) =
        Similarity.ivfQuery(i, vecs.filter(col("vec_id") < 6), k = 3,
            nProbe = 8)
          .select("probe_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      assert(q(loaded) == q(idx))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("nearIncremental: prior near-dups drop, fresh and null-text rows " +
      "stay, parity with contaminationFlags' near rule") {
    val prior = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "completely different content about distributed query engines"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog every day"),  // exact-as-near
      (11L, "the quick brown fox jumps over the lazy cat every day"),  // near
      (12L, "unrelated fresh document with novel words entirely"),
      (13L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Dedup.nearIncremental(batch, prior, "text", "id",
      numHashes = 32, bands = 8, threshold = 0.5, shingleN = 3)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept.contains(12L) && kept.contains(13L))
    assert(!kept.contains(10L))   // identical text must near-match
    assert(out.columns.toSeq == batch.columns.toSeq)
    // the same rule as contaminationFlags' near flag: rows it flags are
    // exactly the rows nearIncremental drops (same bands/threshold)
    val flagged = Dedup.contaminationFlags(batch, prior, "text", "id",
        numHashes = 32, bands = 8, threshold = 0.5, shingleN = 3)
      .filter(col("near_contaminated")).select("id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 12L, 13L) -- flagged)
    // precomputed-postings path (the refresh loop's per-trigger cache)
    // is the SAME frame, so decisions are identical
    val cached = Dedup.nearIncremental(batch, prior, "text", "id",
      numHashes = 32, bands = 8, threshold = 0.5, shingleN = 3,
      postings = Some(Dedup.nearPostings(prior, "text",
        numHashes = 32, bands = 8, shingleN = 3)))
    assert(cached.select("id").as[Long].collect().toSet == kept)
  }

  test("decontamination: exact and near reference matches flagged, corpus intact") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "THE quick  brown fox jumps over the lazy dog today"), // exact (normalized) copy of ref
      (3L, "the quick brown fox jumps over the lazy cat today"),  // near ref
      (4L, "completely unrelated content about something else entirely"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val reference = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val flags = Dedup.contaminationFlags(corpus, reference, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.6, shingleN = 1)
      .select("doc_id", "exact_contaminated", "near_contaminated")
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(flags(1L) == ((true, true)))
    assert(flags(2L) == ((true, true)))   // normalization catches case/space
    assert(flags(3L) == ((false, true)))  // near only
    assert(flags(4L) == ((false, false)))
    assert(flags(5L) == ((false, false))) // null text never matches
    assert(flags.size == 5)               // corpus rows all preserved
  }

  test("clusters: non-numeric (string) node ids propagate too") {
    val pairs = Seq(("docA", "docB"), ("docB", "docC"), ("x", "y"))
      .toDF("a", "b")
    val out = Dedup.clusters(pairs).as[(String, String)].collect().toMap
    assert(out("docA") == "docA" && out("docB") == "docA" &&
      out("docC") == "docA")
    assert(out("x") == "x" && out("y") == "x")
  }

  test("decontamination: pathological all-contaminated corpus (flag set ~ corpus)") {
    // every corpus row matches the reference -> the near/exact flag sets
    // approach corpus cardinality; must complete (no forced corpus-scale
    // broadcast) and flag everything
    val n = 2000
    val corpus = (0 until n).map(i =>
        (i.toLong, s"shared benchmark sentence number ${i % 50} repeated"))
      .toDF("doc_id", "text")
    val reference = (0 until 50).map(i =>
        (10000L + i, s"shared benchmark sentence number $i repeated"))
      .toDF("doc_id", "text")
    val flags = Dedup.contaminationFlags(corpus, reference, "text", "doc_id",
        numHashes = 32, bands = 8, threshold = 0.8, shingleN = 1)
    assert(flags.count() == n)
    assert(flags.filter(col("exact_contaminated") && col("near_contaminated"))
      .count() == n)
  }

  test("clusters: transitive chains and stars collapse to min-id components") {
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L))
      .toDF("a", "b").withColumn("est", lit(1.0))
    val out = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(out(_) == 1L))     // chain: transitive closure
    assert((10L to 13L).forall(out(_) == 10L))  // star
    assert(out(20L) == 20L && out(21L) == 20L)
    assert(out.size == 10)
  }
  test("exactIncremental: in-batch survivor rule + prior-version drop, " +
      "whitespace-normalized, null text never a cross-version dup") {
    val batch = Seq(
      (10L, "shared   doc"),            // dup of prior (normalization)
      (11L, "fresh one"),
      (12L, "batch dup"), (13L, "batch dup"),  // in-batch dup: keep 12
      (14L, null.asInstanceOf[String]),
      (15L, "also in prior"))
      .toDF("id", "text")
    val prior = Seq(
      (1L, "shared doc"), (2L, "also  in  prior"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Dedup.exactIncremental(batch, prior, "text", "id")
    assert(out.columns.toSeq == Seq("id", "text"))
    val kept = out.select("id").as[Long].collect().toSet
    // 10 drops (prior dup), 13 drops (in-batch dup), 15 drops (prior dup);
    // null text is kept even though prior has a null-text row
    assert(kept == Set(11L, 12L, 14L))
    // parity with the non-incremental composition: exact over the union,
    // restricted to batch survivors
    val unionDedup = Dedup.exact(
        prior.unionByName(batch), "text", "id")
      .select("id").as[Long].collect().toSet
    assert(kept == unionDedup.intersect(
      batch.select("id").as[Long].collect().toSet) ++ Set.empty)
  }

  test("ivfPq: assignment is the true coarse argmin, ADC parity with " +
      "driver recompute, deterministic under repartition") {
    import graft.operators.Similarity
    val vecs = pqCorpus // 40 vecs, dim 8
    val idx = Similarity.ivfPqBuild(vecs, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    val enc = idx.encoded.select("vec_id", "__list", "codes")
      .as[(Long, Int, Array[Int])].collect()
    assert(enc.length == 40)
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    // every row sits in its nearest coarse list (ties to lowest)
    enc.foreach { case (id, lst, _) =>
      val xu = units(raw(id))
      val dists = idx.coarse.map(c =>
        (0 until 8).map(d => { val df = xu(d) - c(d); df * df }).sum)
      assert(dists(lst) == dists.min && dists.indexOf(dists.min) == lst)
    }
    // full-coverage probe (nProbe = nLists): ADC matches a driver
    // recompute over residuals vs the residual codebook
    val out = Similarity.ivfPqQuery(idx, vecs.filter(col("vec_id") < 2),
        k = 4, nProbe = 3)
      .select("probe_id", "neighbor_id", "rank", "adc_dist")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 8)
    val codeMap = enc.map(e => e._1 -> (e._2, e._3)).toMap
    val exp = (0L until 2L).flatMap { p =>
      val pxu = units(raw(p))
      raw.keys.filter(_ != p).map { n =>
        val (nl, codes) = codeMap(n)
        // probe residual vs the NEIGHBOR's list centroid
        val pru = (0 until 8).map(d => pxu(d) - idx.coarse(nl)(d))
        val d = (0 until 2).map { s =>
          val cw = idx.cb.centroids(s)(codes(s))
          (0 until 4).map(i => {
            val df = pru(s * 4 + i) - cw(i); df * df }).sum
        }.sum
        (p, n, d)
      }.toSeq.sortBy(t => (t._3, t._2)).take(4)
        .zipWithIndex.map { case ((pp, n, d), r) => (pp, n, r + 1L, d) }
    }.toSet
    assert(out.toSet == exp)
    // bit-exact determinism of the whole build under repartition
    val idx2 = Similarity.ivfPqBuild(vecs.repartition(7).orderBy(rand(9)),
      nLists = 3, m = 2, kCodes = 4, iterations = 2)
    assert(idx.coarse.map(_.toSeq).toSeq == idx2.coarse.map(_.toSeq).toSeq)
    assert(idx.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      idx2.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("recallAtK: overlap counted per probe, zero-hit probes preserved, " +
      "ranks beyond k ignored; bruteForceTopKL2 ranks by integer L2") {
    import graft.operators.Similarity
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("probe_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 11L, 1L), (1L, 99L, 2L),   // one hit for probe 1
      (2L, 98L, 1L), (2L, 97L, 2L),   // zero hits for probe 2
      (2L, 20L, 3L))                  // rank 3 > k: must NOT count
      .toDF("probe_id", "neighbor_id", "rank")
    val r = Similarity.recallAtK(approx, exact, k = 2)
      .select("probe_id", "n_hits", "k")
      .as[(Long, Long, Long)].collect()
      .map { case (p, h, kk) => p -> (h, kk) }.toMap
    assert(r == Map(1L -> (1L, 2L), 2L -> (0L, 2L)))
    // integer-L2 ground truth: nearest by units distance, ties by id
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(3f, 0f))).toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopKL2(vecs,
        vecs.filter(col("vec_id") === 0), k = 2)
      .select("neighbor_id", "rank", "l2_dist")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    // dist(1) = dist(2) = 1e12 -> tie broken by lower id
    assert(bf.toSeq == Seq((1L, 1L, 1000000000000L), (2L, 2L, 1000000000000L)))
  }

  test("ivfPqQueryRefined: exact parity when the shortlist covers the " +
      "corpus; narrow shortlist is the exact re-rank of the ADC candidates") {
    import graft.operators.Similarity
    val vecs = pqCorpus // 40 vecs, dim 8
    val probes = vecs.filter(col("vec_id") < 2)
    val idx = Similarity.ivfPqBuild(vecs, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    // full probe + shortlist >= corpus: the refine stage sees every
    // candidate, so the result IS the exact integer-L2 top-k
    val full = Similarity.ivfPqQueryRefined(idx, vecs, probes, k = 4,
        nProbe = 3, refine = 10)
      .select("probe_id", "neighbor_id", "rank", "l2_dist")
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopKL2(vecs, probes, k = 4)
      .select("probe_id", "neighbor_id", "rank", "l2_dist")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full == exact)
    // refine=1: the output is the exact-L2 re-ranking of EXACTLY the
    // ADC top-4 shortlist (driver recompute of the contract)
    val shortlist = Similarity.ivfPqQuery(idx, probes, k = 4, nProbe = 3)
      .select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val narrow = Similarity.ivfPqQueryRefined(idx, vecs, probes, k = 4,
        nProbe = 3, refine = 1)
      .select("probe_id", "neighbor_id", "rank", "l2_dist")
      .as[(Long, Long, Long, Long)].collect()
    assert(narrow.length == 8)
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    narrow.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._2).toSet == shortlist(p))
      val pxu = units(raw(p))
      val expOrder = shortlist(p).toSeq.map { n =>
        val nxu = units(raw(n))
        val d = (0 until 8).map(i => {
          val df = pxu(i) - nxu(i); df * df }).sum
        (n, d)
      }.sortBy(t => (t._2, t._1))
      assert(rows.sortBy(_._3).map(r => (r._2, r._4)).toSeq == expOrder)
    }
  }

  test("scalarQuantize: codes span [0, levels-1], extremes hit the ends, " +
      "degenerate dims encode 0, zero-shuffle encode, deterministic") {
    import graft.operators.Similarity
    val vecs = (0L until 20L).map(i =>
      (i, Array(i.toFloat, -i.toFloat, 7f, i.toFloat / 100)))
      .toDF("vec_id", "embedding")
    val sq = Similarity.scalarQuantizeFit(vecs)
    assert(sq.mins.length == 4 && sq.spans(2) == 0L) // constant dim
    val enc = Similarity.scalarQuantizeEncode(vecs, sq)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = enc.select("vec_id", "codes")
      .as[(Long, Array[Long])].collect().toMap
    assert(got.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // min row encodes 0, max row encodes 255 on the varying dims
    assert(got(0L)(0) == 0L && got(19L)(0) == 255L)
    assert(got(19L)(1) == 0L && got(0L)(1) == 255L) // negated dim flips
    assert(got.values.forall(_(2) == 0L))           // degenerate dim
    // determinism under repartition
    val sq2 = Similarity.scalarQuantizeFit(
      vecs.repartition(7).orderBy(rand(11)))
    assert(sq.mins.toSeq == sq2.mins.toSeq &&
      sq.spans.toSeq == sq2.spans.toSeq)
  }

  test("ivfPqSave/Load: list-partitioned layout on disk, loaded index " +
      "serves identical results") {
    import graft.operators.Similarity
    val vecs = pqCorpus
    val idx = Similarity.ivfPqBuild(vecs, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_t")
    Similarity.ivfPqSave(idx, dir.toString)
    // the probe-pruning contract is physical: one directory per list
    val parts = new java.io.File(s"$dir/encoded").listFiles()
      .filter(_.getName.startsWith("__list=")).map(_.getName).sorted
    assert(parts.nonEmpty && parts.forall(_.matches("__list=\\d+")),
      parts.toSeq.toString)
    val loaded = Similarity.ivfPqLoad(spark, dir.toString)
    assert(loaded.nLists == 3 && loaded.cb.m == 2)
    def serve(i: Similarity.IvfPqIndex) =
      Similarity.ivfPqQuery(i, vecs.filter(col("vec_id") < 2), k = 4,
          nProbe = 2)
        .select("probe_id", "neighbor_id", "rank", "adc_dist")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(serve(idx) == serve(loaded))
  }

  test("ivfPqLoad codebook cache: a repeated load serves identically, " +
      "and an in-place re-save (retrain) at the same path is picked " +
      "up — the file fingerprint invalidates, never serves stale " +
      "codebooks") {
    import graft.operators.Similarity
    val vecs = pqCorpus
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_cc")
    val idx = Similarity.ivfPqBuild(vecs, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    Similarity.ivfPqSave(idx, dir.toString)
    def serve(i: Similarity.IvfPqIndex) =
      Similarity.ivfPqQuery(i, vecs.filter(col("vec_id") < 2), k = 4,
          nProbe = 2)
        .select("probe_id", "neighbor_id", "rank", "adc_dist")
        .as[(Long, Long, Long, Long)].collect().toSet
    val first = Similarity.ivfPqLoad(spark, dir.toString)
    val second = Similarity.ivfPqLoad(spark, dir.toString) // cache hit
    assert(serve(second) == serve(first))
    // retrain with a different geometry and overwrite the SAME path:
    // the next load must reflect the new codebooks, not the cached ones
    val retrained = Similarity.ivfPqBuild(vecs, nLists = 2, m = 2,
      kCodes = 3, iterations = 1)
    Similarity.ivfPqSave(retrained, dir.toString)
    val reloaded = Similarity.ivfPqLoad(spark, dir.toString)
    assert(reloaded.nLists == 2 && reloaded.cb.kCodes == 3,
      s"stale codebooks served: nLists=${reloaded.nLists} " +
        s"kCodes=${reloaded.cb.kCodes}")
    assert(reloaded.coarse.map(_.toSeq).toSeq ==
      retrained.coarse.map(_.toSeq).toSeq)
  }

  test("ivfPqAppend: frozen codebooks, old codes bit-stable, and exact " +
      "parity with a trainOn-split build over the combined corpus") {
    import graft.operators.Similarity
    val all = pqCorpus // 40 vecs, dim 8
    val prior = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    val idx = Similarity.ivfPqBuild(prior, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    val priorEnc = idx.encoded
      .select("vec_id", "__list", "codes")
      .as[(Long, Int, Array[Int])].collect()
      .map(e => (e._1, e._2, e._3.toSeq)).toSet
    val appended = Similarity.ivfPqAppend(idx, batch)
    // 1. codebooks are FROZEN: no Lloyd's ran — coarse and residual
    //    codebooks are the build's, element for element
    assert(appended.coarse.map(_.toSeq).toSeq ==
      idx.coarse.map(_.toSeq).toSeq)
    assert(appended.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    // 2. appending never touches shipped rows: the prior ids' encoded
    //    rows are bit-identical in the combined index
    val combEnc = appended.encoded
      .select("vec_id", "__list", "codes")
      .as[(Long, Int, Array[Int])].collect()
      .map(e => (e._1, e._2, e._3.toSeq)).toSet
    assert(combEnc.size == 40)
    assert(combEnc.filter(r => r._1 % 5 != 0) == priorEnc)
    // 3. parity: build-on-prior + append == one build over the combined
    //    corpus with trainOn = prior (the q158 oracle's exact split)
    val split = Similarity.ivfPqBuild(all, nLists = 3, m = 2, kCodes = 4,
      iterations = 2, trainOn = prior)
    val splitEnc = split.encoded
      .select("vec_id", "__list", "codes")
      .as[(Long, Int, Array[Int])].collect()
      .map(e => (e._1, e._2, e._3.toSeq)).toSet
    assert(combEnc == splitEnc)
    // 4. the probe path serves the combined index: appended ids can win
    val got = Similarity.ivfPqQuery(appended, all.filter(col("vec_id") < 2),
        k = 40, nProbe = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert((0L until 40L).forall(got.contains)) // k=nAll: every id ranked
  }

  test("ivfPqAppendSave: O(batch) on-disk append — parity with the " +
      "in-memory append, untouched __list partitions byte-identical") {
    import graft.operators.Similarity
    val all = pqCorpus
    val prior = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    val idx = Similarity.ivfPqBuild(prior, nLists = 3, m = 2, kCodes = 4,
      iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_app")
    try {
      Similarity.ivfPqSave(idx, dir.toString)
      Similarity.ivfPqAppendSave(spark, dir.toString, batch)
      // parity: the reloaded store equals the in-memory append
      def encSet(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id").cast("long"), col("__list").cast("int"),
          col("codes"))
        .as[(Long, Int, Array[Int])].collect()
        .map(e => (e._1, e._2, e._3.toSeq)).toSet
      val mem = Similarity.ivfPqAppend(idx, batch)
      val loaded = Similarity.ivfPqLoad(spark, dir.toString)
      assert(encSet(loaded.encoded) == encSet(mem.encoded))
      // a second, single-vector append touches exactly ONE list: every
      // other list partition's file set (names + sizes) is untouched
      def listing() = new java.io.File(s"$dir/encoded").listFiles()
        .filter(_.getName.startsWith("__list=")).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length)).toSet
        }.toMap
      val before = listing()
      val extra = Seq((100L, Array.tabulate(8)(d =>
        math.sin(100 * 3 + d).toFloat))).toDF("vec_id", "embedding")
      Similarity.ivfPqAppendSave(spark, dir.toString, extra)
      val after = listing()
      val touched = Similarity.ivfPqLoad(spark, dir.toString).encoded
        .filter(col("vec_id") === 100L)
        .select(col("__list").cast("int")).as[Int].collect()
      assert(touched.length == 1)
      val hot = s"__list=${touched.head}"
      before.keys.filterNot(_ == hot).foreach { p =>
        assert(after(p) == before(p), s"partition $p was rewritten")
      }
      assert(after(hot).size > before.getOrElse(hot, Set.empty).size)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }

  test("ivfPqAppendSave: the .append-pending sentinel makes a torn " +
      "append LOUD — load refuses while it exists, append refuses to " +
      "stack a second writer, success clears it") {
    import graft.operators.Similarity
    val all = pqCorpus
    val idx = Similarity.ivfPqBuild(all.filter(col("vec_id") % 5 =!= 0),
      nLists = 3, m = 2, kCodes = 4, iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_torn")
    try {
      Similarity.ivfPqSave(idx, dir.toString)
      // simulate a crash mid-append: the sentinel survives the writer
      val sentinel = new java.io.File(dir.toFile, ".append-pending")
      assert(sentinel.createNewFile())
      // every load path refuses with the remedy, never serves the
      // possibly-partial batch silently
      val e = intercept[IllegalStateException] {
        Similarity.ivfPqLoad(spark, dir.toString)
      }
      assert(e.getMessage.contains("torn append"))
      // a second writer refuses too (single-writer contract — its own
      // load hits the sentinel before it can stack an append)
      val batch = all.filter(col("vec_id") % 5 === 0)
      intercept[IllegalStateException] {
        Similarity.ivfPqAppendSave(spark, dir.toString, batch)
      }
      // operator verifies/rebuilds, removes the sentinel: store serves
      assert(sentinel.delete())
      Similarity.ivfPqAppendSave(spark, dir.toString, batch)
      assert(!sentinel.exists()) // success clears its own sentinel
      assert(Similarity.ivfPqLoad(spark, dir.toString).encoded.count() ==
        all.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }

  test("keepBestPerCluster: highest score survives (ties -> lowest id, " +
      "NULL loses), unpaired rows survive unchanged") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, java.lang.Long.valueOf(5L)),   // cluster {1,2,3}
      (2L, java.lang.Long.valueOf(9L)),   //  - 2 and 3 tie at 9 -> keep 2
      (3L, java.lang.Long.valueOf(9L)),
      (4L, null.asInstanceOf[java.lang.Long]), // unpaired, NULL score: kept
      (5L, null.asInstanceOf[java.lang.Long]), // cluster {5,6}: NULL loses
      (6L, java.lang.Long.valueOf(1L)))
      .toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val kept = Dedup.keepBestPerCluster(docs, pairs, "id", "quality")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L), kept.toString)
  }

  test("hardNegatives: only different-label neighbors, ranked by cosine, " +
      "NULL labels excluded on both sides") {
    import graft.operators.Similarity
    // 1D-ish geometry on 4 dims: label A clusters near +x, B near -x,
    // one B vector almost exactly on a probe's direction
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), "A"),
      (1L, Array(0.9f, 0.1f, 0f, 0f), "A"),
      (2L, Array(0.8f, 0.6f, 0f, 0f), "B"),   // closest different-label
      (3L, Array(-1f, 0f, 0f, 0f), "B"),
      (4L, Array(0.99f, 0.01f, 0f, 0f), null.asInstanceOf[String]), // excluded
      (5L, Array(0f, 1f, 0f, 0f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(rows, rows.filter(col("vec_id") === 0), k = 2)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // same-label 1 and null-label 4 are closer than 2 but must not appear
    assert(out.toSeq == Seq((0L, 2L, 1), (0L, 5L, 2)), out.toSeq.toString)
    // a NULL-label probe mines nothing
    assert(Similarity.hardNegatives(rows,
      rows.filter(col("vec_id") === 4), k = 2).count() == 0)
  }

  test("semanticDecontaminate: inclusive integer threshold, negative-dot " +
      "and NULL rows kept, broadcast anti-join plan with no exchange") {
    import graft.operators.Dedup
    val bench = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, null.asInstanceOf[Array[Float]])) // ignored
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2f, 0f, 0f, 0f)),    // cos 1.0 -> dropped
      (11L, Array(0f, 3f, 0f, 0f)),    // orthogonal -> kept
      (12L, Array(-1f, 0f, 0f, 0f)),   // cos -1 (dot < 0) -> kept
      (13L, Array(1f, 1f, 1f, 1f)),    // cos exactly 0.5 -> dropped (>=)
      (14L, null.asInstanceOf[Array[Float]])) // no evidence -> kept
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontaminate(corpus, bench,
      "embedding", "vec_id", thresholdPct = 50)
    assert(out.select("vec_id").as[Long].collect().toSet ==
      Set(11L, 12L, 14L))
    // zero corpus shuffle: broadcast nested-loop anti, no Exchange other
    // than the broadcast side
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  private def pqCorpus = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
    .toDF("vec_id", "embedding")

  private def units(v: Array[Float]): Array[Long] =
    v.map(x => (x.toDouble * 1000000L).toLong)

  test("pq: codes optimal per subspace, deterministic under repartition, " +
      "zero-shuffle encode") {
    import graft.operators.Similarity
    val vecs = pqCorpus
    val cb = Similarity.pqTrain(vecs, m = 2, kCodes = 4, iterations = 2)
    assert(cb.subDim == 4 && cb.centroids.length == 2 &&
      cb.centroids.forall(_.length == 4))
    val enc = Similarity.pqEncode(vecs, cb)
    // the encode pass is row-local: no Exchange anywhere in its plan
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      enc.queryExecution.executedPlan.toString)
    val got = enc.select("vec_id", "codes")
      .as[(Long, Array[Int])].collect().toMap
    assert(got.size == 40 &&
      got.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    // each emitted code is the true argmin (ties to lowest) over its subspace
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    got.foreach { case (id, cs) =>
      val xu = units(raw(id))
      cs.zipWithIndex.foreach { case (c, s) =>
        val dists = cb.centroids(s).map(cw =>
          (0 until 4).map(d => { val df = xu(s * 4 + d) - cw(d); df * df }).sum)
        assert(dists(c) == dists.min && dists.indexOf(dists.min) == c,
          s"vec $id subspace $s: code $c dists ${dists.toSeq}")
      }
    }
    // bit-exact determinism under repartition + row order
    val cb2 = Similarity.pqTrain(vecs.repartition(7).orderBy(rand(3)),
      m = 2, kCodes = 4, iterations = 2)
    assert(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pq: ADC top-k parity with driver recompute; dim guard raises") {
    import graft.operators.Similarity
    val vecs = pqCorpus
    val cb = Similarity.pqTrain(vecs, m = 2, kCodes = 4, iterations = 2)
    val codes = Similarity.pqEncode(vecs, cb)
    val probes = vecs.filter(col("vec_id") < 3)
    val out = Similarity.pqQuery(codes, probes, cb, k = 5)
      .select("probe_id", "neighbor_id", "rank", "adc_dist")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 15) // 3 probes x k=5
    // driver-side ADC recompute over the same codes and codebook
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    val codeMap = codes.select("vec_id", "codes")
      .as[(Long, Array[Int])].collect().toMap
    val exp = (0L until 3L).flatMap { p =>
      val pu = units(raw(p))
      raw.keys.filter(_ != p).map { n =>
        val d = (0 until 2).map { s =>
          val cw = cb.centroids(s)(codeMap(n)(s))
          (0 until 4).map(i => {
            val df = pu(s * 4 + i) - cw(i); df * df }).sum
        }.sum
        (p, n, d)
      }.toSeq.sortBy(t => (t._3, t._2)).take(5)
        .zipWithIndex.map { case ((pp, n, d), r) => (pp, n, r + 1L, d) }
    }.toSet
    assert(out.toSet == exp, s"got ${out.toSeq.sorted}")
    // wrong-dimension vector fails loudly, not silently
    val bad = Seq((99L, Array.tabulate(5)(_.toFloat))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.pqEncode(bad, cb).collect()
    }
    assert(ex.getMessage.contains("dimension") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimension"))
    // codes from an incompatible codebook fail loudly too (a wrong-m or
    // out-of-range code would otherwise NULL out of the ranking silently)
    val badCodes = Seq((7L, Array(0, 9))).toDF("vec_id", "codes")
    val ex2 = intercept[Exception] {
      Similarity.pqQuery(badCodes, probes, cb, k = 2).collect()
    }
    assert(ex2.getMessage.contains("incompatible") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("incompatible"))
  }

  test("unpackFrames: corrupt containers fail soft (garbage count/length, " +
      "truncated payload) — never throw, never over-allocate") {
    import Multimodal.ImageCodec
    val good = ImageCodec.packFrames(Seq(Array[Byte](1, 2, 3), Array[Byte](4)))
    assert(ImageCodec.unpackFrames(good).map(_.toSeq) ==
      Seq(Seq[Byte](1, 2, 3), Seq[Byte](4)))
    def withInt(payload: Array[Byte], at: Int, v: Int): Array[Byte] = {
      val b = payload.clone()
      b(at) = ((v >> 24) & 0xff).toByte; b(at + 1) = ((v >> 16) & 0xff).toByte
      b(at + 2) = ((v >> 8) & 0xff).toByte; b(at + 3) = (v & 0xff).toByte
      b
    }
    // negative frame count
    assert(ImageCodec.unpackFrames(withInt(good, 4, -1)).isEmpty)
    // huge frame count (would loop far past the payload)
    assert(ImageCodec.unpackFrames(withInt(good, 4, Int.MaxValue)).isEmpty)
    // negative first-frame length (NegativeArraySizeException before the fix)
    assert(ImageCodec.unpackFrames(withInt(good, 8, -5)).isEmpty)
    // length far beyond remaining bytes (would allocate 2 GB before the fix)
    assert(ImageCodec.unpackFrames(withInt(good, 8, Int.MaxValue - 2)).isEmpty)
    // truncated payload: container cut mid-frame
    assert(ImageCodec.unpackFrames(good.take(good.length - 2)).isEmpty)
    // and a corrupt payload inside a frameSample scan must not kill the job
    val mixed = Seq((1L, good), (2L, withInt(good, 8, -5))).toDF("doc_id", "payload")
    val rows = Multimodal.frameSample(spark, mixed, "doc_id").collect()
    assert(rows.forall(_.getAs[Long]("doc_id") == 1L) && rows.length == 2)
  }

  test("avi tier: MJPEG mux -> RIFF demux round trip; container dispatch " +
      "by magic; corrupt/truncated AVIs fail soft") {
    import Multimodal.ImageCodec
    // round trip: the exact frame bytes come back, in order
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5), Array[Byte](6))
    val avi = ImageCodec.packAvi(frames, 16, 14, fps = 25)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    // RIFF size field accounts for the whole file (external demuxers
    // trust it)
    val riffSz = (avi(4) & 0xFF) | ((avi(5) & 0xFF) << 8) |
      ((avi(6) & 0xFF) << 16) | ((avi(7) & 0xFF) << 24)
    assert(riffSz + 8 == avi.length, s"RIFF size $riffSz vs ${avi.length}")
    assert(ImageCodec.unpackAvi(avi).map(_.toSeq) == frames.map(_.toSeq))
    // dispatch: the same container surface reads GFRM and AVI
    assert(ImageCodec.unpackContainer(avi).map(_.toSeq) == frames.map(_.toSeq))
    val gfrm = ImageCodec.packFrames(frames)
    assert(ImageCodec.unpackContainer(gfrm).map(_.toSeq) == frames.map(_.toSeq))
    assert(ImageCodec.unpackContainer(Array[Byte](9, 9, 9, 9, 9)).isEmpty)
    // truncation mid-chunk (past idx1 = 8+48 bytes, into the last movi
    // chunk): frames parsed so far survive, no throw
    assert(ImageCodec.unpackAvi(avi.take(avi.length - 60)).length == 2)
    // a lying chunk size cannot read past the payload
    val lying = avi.clone()
    val moviAt = { // find first '00dc'
      var i = 12; while (!(lying(i) == '0' && lying(i + 1) == '0' &&
        lying(i + 2) == 'd' && lying(i + 3) == 'c')) i += 1; i }
    lying(moviAt + 4) = -1; lying(moviAt + 5) = -1
    lying(moviAt + 6) = -1; lying(moviAt + 7) = 0x7F
    assert(ImageCodec.unpackAvi(lying).isEmpty)
    // the real fixture: every frame is a decodable JDK JPEG at the
    // fixture geometry
    val vid = Multimodal.ImageFixture.avi(7L, 3)
    val decoded = ImageCodec.unpackAvi(vid).map(f => ImageCodec.decode(f).get)
    assert(decoded.length == 3)
    assert(decoded.forall(img => img.getWidth == 15 && img.getHeight == 8))
  }

  test("jpeg tier: real JDK encode->decode preserves dimensions and band " +
      "count; corrupt bytes fail soft through decodeMeta") {
    val jpg = Multimodal.ImageFixture.jpeg(7L)
    // real JPEG bytes: SOI marker, decodable, dims/bands invariant
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "no SOI")
    val img = Multimodal.ImageCodec.decode(jpg).get
    assert(img.getWidth == Multimodal.ImageFixture.width(7L) &&
      img.getHeight == Multimodal.ImageFixture.height(7L) &&
      img.getRaster.getNumBands == 3)
    // pixel values are NOT invariant (lossy) — decodeMeta must not expose
    // them, and a corrupt payload must flag, not throw
    val mixed = Seq((1L, jpg), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeMeta(spark, mixed, "doc_id")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Boolean]("decode_ok") &&
      rows(0).getAs[Int]("n_channels") == 3)
    assert(!rows(1).getAs[Boolean]("decode_ok") &&
      rows(1).isNullAt(rows(1).fieldIndex("width")))
  }

  test("semanticDecontaminate: corpus/benchmark dimension mismatch fails " +
      "LOUD (not silently keeping everything)") {
    val corpus = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val bench = Seq((Array(1.0f, 0.0f))).toDF("embedding")
    val ex = intercept[Exception] {
      Dedup.semanticDecontaminate(corpus, bench, "embedding", "vec_id", 90).collect()
    }
    def msg(t: Throwable): String =
      Option(t).map(e => e.getMessage + " " + msg(e.getCause)).getOrElse("")
    assert(msg(ex).contains("dimension mismatch"))
    // NULL corpus vectors still pass through (kept, no error)
    val withNull = Seq((1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticDecontaminate(withNull, bench, "embedding", "vec_id", 99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L)) // row 1 is an exact benchmark hit; NULL row kept
  }

  test("semanticDecontaminateAtScale: parity with the exact broadcast rule " +
      "on paraphrase-level contamination; NULLs kept; band equi join, " +
      "never a nested loop; wrong dim fails loud") {
    val ref = Seq(
      (0L, Array(1f, 0.02f, -0.01f, 0f)),
      (1L, Array(-0.5f, 0.5f, 0.5f, -0.5f)),
      (2L, null.asInstanceOf[Array[Float]])) // ignored
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(0.99f, 0.03f, 0f, 0.01f)),  // ~ref0 -> dropped
      (11L, Array(0f, 1f, 0f, 0f)),           // far -> kept
      (12L, Array(-1f, 1f, 1f, -1f)),         // parallel to ref1 -> dropped
      (13L, Array(0f, 0f, -1f, 0f)),          // far -> kept
      (14L, null.asInstanceOf[Array[Float]])) // no evidence -> kept
      .toDF("vec_id", "embedding")
    val scaled = Dedup.semanticDecontaminateAtScale(corpus, ref,
      "embedding", "vec_id", thresholdPct = 90, nBits = 2, bands = 8,
      dim = 4)
    val gotScaled = scaled.select("vec_id").as[Long].collect().toSet
    // parity with the exact-NLJ rule on the same fixture: paraphrase-level
    // hits (cos ~1) collide in every band, so the prefilter loses nothing
    val gotExact = Dedup.semanticDecontaminate(corpus, ref,
        "embedding", "vec_id", thresholdPct = 90)
      .select("vec_id").as[Long].collect().toSet
    assert(gotScaled == gotExact, s"scaled=$gotScaled exact=$gotExact")
    assert(gotScaled == Set(11L, 13L, 14L))
    // the scale contract: candidates meet through a band equi join — no
    // nested loop / cartesian regardless of reference size
    val plan = scaled.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // wrong-dimension vectors fail loud (signBucketChecked's guard), not
    // silently bucketing to 0
    def msg(t: Throwable): String =
      Option(t).map(e => e.getMessage + " " + msg(e.getCause)).getOrElse("")
    val bad = Seq((99L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Dedup.semanticDecontaminateAtScale(bad, ref, "embedding", "vec_id",
        50, nBits = 2, bands = 8, dim = 4).collect()
    }
    assert(msg(ex).contains("dimension"))
  }
}
