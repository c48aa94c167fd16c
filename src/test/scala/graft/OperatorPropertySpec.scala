package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.{Curate, Dedup, Joins}
import graft.functions.{TextFunctions => T}

/** Property-style invariants for the round-3 operators over generated
  * corpora, drawn from a FIXED seed so a failure reproduces exactly (one
  * Spark job per property, like CoercionPropertySpec). */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.rng.Seed

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "theta", "the", "a", "of", "und", "der")
  private val docGen = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  test("saltedJoin == plain join on randomized skewed data (inner & left)") {
    val keys = draw(Gen.listOfN(400,
      Gen.frequency(8 -> Gen.const("hot"), 2 -> Gen.choose(0, 30).map(_.toString))),
      seed = 1L)
    val big = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("key", "rowid")
    val small = Seq("hot", "3", "7", "nokey").map(k => (k, s"dim-$k"))
      .toDF("key", "dim")
    for (jt <- Seq("inner", "left"); salt <- Seq(1, 3, 16)) {
      val plain = big.join(small, Seq("key"), jt)
        .select("key", "rowid", "dim").collect().toSet
      val salted = Joins.saltedJoin(big, small, Seq("key"), salt, jt)
        .select("key", "rowid", "dim").collect().toSet
      assert(salted == plain, s"diverged at joinType=$jt salt=$salt")
    }
  }

  test("curationAudit: exact_dup tags are exactly Dedup.exact's drops") {
    val docs = draw(Gen.listOfN(120, docGen), seed = 2L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val audit = Curate.curationAudit(docs, "text", "doc_id",
      keepLangs = Seq("en"), minQuality = 0.1)
    val tagged = audit.filter(col("drop_reason") === "exact_dup")
      .select("doc_id").as[Long].collect().toSet
    val surviving = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(tagged == all -- surviving)
    // reasons partition the corpus: one row per doc, tag from the closed
    // reason set (or NULL for keepers) — count alone would pass trivially
    val rows = audit.select("doc_id", "drop_reason")
      .as[(Long, String)].collect()
    assert(rows.length == all.size && rows.map(_._1).toSet == all)
    val allowed = Set("null_text", "exact_dup", "lang", "quality", null)
    assert(rows.forall(r => allowed.contains(r._2)))
  }

  test("portableHash64 stays in [0, 2^60) over arbitrary strings") {
    val strs = draw(Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const(""),
      Gen.const("中文 tøkens"))), seed = 3L)
    val out = strs.toDF("s").select(T.portableHash64(col("s"))).as[Long].collect()
    assert(out.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("hashSample: nested across arbitrary rate pairs") {
    val ids = spark.range(0, 1500).toDF("id")
    for ((r1, r2) <- Seq((0.05, 0.3), (0.3, 0.31), (0.0, 1.0))) {
      val s1 = Curate.hashSample(ids, "id", r1).as[Long].collect().toSet
      val s2 = Curate.hashSample(ids, "id", r2).as[Long].collect().toSet
      assert(s1.subsetOf(s2), s"rate $r1 not nested in $r2")
    }
    assert(Curate.hashSample(ids, "id", 1.0).count() == 1500)
    assert(Curate.hashSample(ids, "id", 0.0).count() == 0)
  }

  test("CDC chunking: fast and portable modes agree on boundaries") {
    val docs = draw(Gen.listOfN(60, docGen), seed = 4L).zipWithIndex
      .map { case (t, i) => (i.toLong, t + " " + t + " " + t) }
      .toDF("doc_id", "text")
    val counts = docs.select(col("doc_id"),
        size(T.cdcChunks(col("text"))).as("nf"),
        size(T.cdcChunks(col("text"), portable = true)).as("np"))
      .as[(Long, Int, Int)].collect()
    counts.foreach { case (id, nf, np) =>
      assert(nf == np, s"doc $id: fast $nf chunks vs portable $np")
    }
  }

  test("codegen text exprs == HOF forms over randomized unicode documents") {
    // LangIdExpr / QualityRawExpr / SimHashExpr replaced interpreted HOF
    // chains this round; the fixed edge battery lives in CatalystExprSpec,
    // this pins parity over generated docs mixing markers of several
    // languages, unicode glyphs, digits, punctuation and odd whitespace
    val token = Gen.oneOf(
      "the", "a", "of", "in", "is", "el", "la", "de", "los", "der", "und",
      "das", "le", "les", "un", "的", "是", "我", "und", "zzz", "Wort",
      "náïve", "𝄞clef", "42", "x#y", "...", "", "tok")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val doc = for {
      n <- Gen.choose(0, 25)
      ts <- Gen.listOfN(n, token)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield (ts, ss).zipped.map(_ + _).mkString + ts.drop(math.max(n - 1, 0)).mkString
    val docs = draw(Gen.listOfN(300, doc), seed = 77L)
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "text")
    val rows = docs.select(
      T.langId(col("text")).as("lg"), T.langIdHof(col("text")).as("lh"),
      T.qualityScore(col("text")).as("qg"),
      T.qualityScoreHof(col("text")).as("qh")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"langId diverged: $r")
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0,
        s"quality diverged: $r")
    }
    for (mode <- Seq(Dedup.Fast, Dedup.Portable)) {
      val fast = Dedup.simhash(docs, "text", "id", mode)
        .as[(Long, Long)].collect().toMap
      val ref = Dedup.simhashAgg(docs, "text", "id", mode)
        .as[(Long, Long)].collect().toMap
      assert(fast == ref, s"simhash diverged in $mode")
    }
  }

  test("exactQuantiles: known answers, ties safe, nulls skipped") {
    import graft.functions.Stats
    val df = ((1 to 10).map(v => ("a", Some(v.toDouble))) ++
      Seq(("a", None)) ++                      // null skipped entirely
      Seq(("b", Some(5.0)), ("b", Some(5.0)), ("b", Some(9.0))))
      .toDF("g", "v")
    val out = Stats.exactQuantiles(df, Seq("g"), "v", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out("a") == ((5.0, 10.0)))  // rank ceil(.5*10)=5, ceil(.95*10)=10
    assert(out("b") == ((5.0, 9.0)))   // ties at the median rank
  }

  test("winsorize: clamps into the exact band, nulls and thin groups pass") {
    import graft.functions.Stats
    val df = ((1 to 100).map(v => ("a", Some(v.toDouble))) ++
      Seq(("a", None)) ++          // null value -> stays null
      Seq(("empty", None)))        // group with no non-null values
      .toDF("g", "v")
    val out = Stats.winsorize(df, Seq("g"), "v", 0.05, 0.95)
    val a = out.filter($"g" === "a")
      .select("v", "v_w", "lo_threshold", "hi_threshold")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getDouble(2), r.getDouble(3)))
    // thresholds: rank ceil(.05*100)=5 -> 5.0, ceil(.95*100)=95 -> 95.0
    assert(a.forall { case (_, _, lo, hi) => lo == 5.0 && hi == 95.0 })
    assert(a.collect { case (Some(v), Some(w), _, _) =>
      (v.asInstanceOf[Double], w.asInstanceOf[Double]) }.forall {
      case (v, w) => w == math.max(5.0, math.min(95.0, v)) })
    assert(a.collect { case (None, w, _, _) => w }.forall(_.isEmpty))
    // a group with no thresholds keeps its value (NULL here) unclamped
    val e = out.filter($"g" === "empty").select("v_w", "lo_threshold")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(e.sameElements(Array((None, None))))
    // clamped values are bit-identical to an input or a threshold: the
    // winsorized mean of group a is computable by hand
    val meanW = out.filter($"g" === "a" && $"v_w".isNotNull)
      .agg(avg($"v_w")).as[Double].head()
    // 1..4 clamp up to 5 (5 IS the threshold), 96..100 clamp down to 95
    val expect = ((5 to 95).map(_.toDouble).sum + 4 * 5.0 + 5 * 95.0) / 100
    assert(meanW == expect)
  }
  test("keySkewReport: exact counts, ppm floor arithmetic, stable ranks") {
    import graft.functions.Stats
    // 600 a, 300 b, 60 c, 30 d, 10 e -> exact ppm of 1000 rows
    val rows = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(60)("c") ++ Seq.fill(30)("d") ++ Seq.fill(10)("e")
    val df = scala.util.Random.shuffle(rows).map(Tuple1(_)).toDF("k")
      .repartition(13)
    val out = Stats.keySkewReport(df, Seq("k"), topN = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("a", 600L, 600000L, 1L), ("b", 300L, 300000L, 2L),
      ("c", 60L, 60000L, 3L), ("d", 30L, 30000L, 4L)))
    // ties rank deterministically by key
    val tied = (Seq.fill(5)("x") ++ Seq.fill(5)("w")).map(Tuple1(_)).toDF("k")
    val t = Stats.keySkewReport(tied, Seq("k"), topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(t == Seq(("w", 1L), ("x", 2L)))
  }
  test("tableChecksum: order/partition invariant, change-sensitive, " +
      "null accounting") {
    import graft.functions.Stats
    val rows = (1 to 500).map(i =>
      (i.toLong, if (i % 7 == 0) null else s"s$i"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      Stats.tableChecksum(df, Seq("id", "s")).collect().head
    val base = sum(rows.toDF("id", "s"))
    assert(base.getLong(0) == 500L)
    assert(base.getLong(2) == 0L)                 // nulls_id
    assert(base.getLong(3) == 500L / 7)           // nulls_s
    // invariant under row order and partitioning
    val shuffled = sum(scala.util.Random.shuffle(rows).toDF("id", "s")
      .repartition(17))
    assert(base.getString(1) == shuffled.getString(1))
    // any single-value change moves the checksum
    val changed = sum(rows.updated(3, (4L, "MUTATED")).toDF("id", "s"))
    assert(base.getString(1) != changed.getString(1))
    // null vs the sentinel-free empty string are distinct rows
    val a = sum(Seq((1L, null: String)).toDF("id", "s"))
    val b = sum(Seq((1L, "")).toDF("id", "s"))
    assert(a.getString(1) != b.getString(1))
    // Fast (xxhash64) mode: same invariance and sensitivity, cheaper hash
    def fast(df: org.apache.spark.sql.DataFrame) =
      Stats.tableChecksum(df, Seq("id", "s"), portable = false)
        .collect().head.getString(1)
    assert(fast(rows.toDF("id", "s")) ==
      fast(scala.util.Random.shuffle(rows).toDF("id", "s").repartition(11)))
    assert(fast(rows.toDF("id", "s")) !=
      fast(rows.updated(3, (4L, "MUTATED")).toDF("id", "s")))
  }

  test("Bpe: Spark encoder == reference encoder on randomized text, and " +
      "token counts are merge-monotone") {
    import graft.functions.{Bpe, BpeVocab}
    val charGen = Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('X', '7', '!', '.'))
    val textGen = Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString)
    val texts = (1 to 60).map(i => draw(textGen, seed = 100L + i))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        Bpe.applyMerges(col("text"), BpeVocab.merges).as("enc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = Bpe.encodeStr(t, BpeVocab.merges)
      assert(got(i.toLong) == ref, s"parity broke on: '$t'")
      // every merge can only shrink or preserve the token count, and the
      // count is bounded below by ceil(normalized length / max token len)
      assert(ref.length <= Bpe.normalizeStr(t).length)
    }
  }

  test("repeatedSpans invariants on randomized corpora: spans disjoint, " +
      "in-bounds, gram-consistent; cut + spans account for every token") {
    import graft.operators.Dedup
    val n = 4
    val docGen2 = for {
      len <- Gen.choose(0, 30)
      ws <- Gen.listOfN(len, wordGen)
    } yield ws.mkString(" ")
    val texts = (1 to 50).map(i => draw(docGen2, seed = 500L + i))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "text", "doc_id", n = n, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tokLen = texts.map(_.split("\\s+").filter(_.nonEmpty).length)
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, s, e, ng) =>
        assert(s >= 0 && e <= tokLen(id.toInt), s"span out of bounds: $id [$s,$e)")
        assert(e - s >= n, s"span shorter than a gram: [$s,$e)")
        // ng grams starting in [s, e-n] exactly fill the merged span chain
        assert(ng >= 1 && ng <= e - n - s + 1)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1, s"overlapping merged spans for doc $id")
        case _ => ()
      }
    }
    // conservation: kept + cut == token count, cut == covered span length
    val cut = Dedup.cutRepeatedSpans(df, "text", "doc_id", n = n, minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val covered = spans.groupBy(_._1).view
      .mapValues(_.map(s => s._3 - s._2).sum).toMap
    texts.indices.foreach { i =>
      val (kept, c) = cut(i.toLong)
      assert(kept + c == tokLen(i), s"doc $i: $kept + $c != ${tokLen(i)}")
      assert(c == covered.getOrElse(i.toLong, 0L))
    }
  }

  private def units(v: Array[Float]): Array[Long] =
    v.map(x => (x.toDouble * 1000000L).toLong)

  test("pq: on RANDOM vectors every emitted code is the argmin codeword " +
      "and ADC matches a BigInt driver recompute") {
    import graft.operators.Similarity
    val vecGen = Gen.listOfN(8, Gen.choose(-999, 999).map(_ / 500.0f))
    val vecs = draw(Gen.listOfN(30, vecGen), seed = 7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vecs, m = 2, kCodes = 4, iterations = 3)
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    val codes = Similarity.pqEncode(vecs, cb)
      .select("vec_id", "codes").as[(Long, Array[Int])].collect().toMap
    codes.foreach { case (id, cs) =>
      val xu = units(raw(id))
      cs.zipWithIndex.foreach { case (c, s) =>
        val d = cb.centroids(s).map(cw => (0 until 4).map(i => {
          val df = BigInt(xu(s * 4 + i) - cw(i)); df * df }).sum)
        assert(d(c) == d.min && d.indexOf(d.min) == c,
          s"vec $id sub $s code $c")
      }
    }
    val out = Similarity.pqQuery(codes.toSeq.toDF("vec_id", "codes")
        .select(col("vec_id"), col("codes")),
        vecs.filter(col("vec_id") < 2), cb, k = 3)
      .select("probe_id", "neighbor_id", "rank", "adc_dist")
      .as[(Long, Long, Long, Long)].collect().toSet
    val exp = (0L until 2L).flatMap { p =>
      val pu = units(raw(p))
      raw.keys.filter(_ != p).map { n =>
        val d = (0 until 2).map { s =>
          val cw = cb.centroids(s)(codes(n)(s))
          (0 until 4).map(i => {
            val df = BigInt(pu(s * 4 + i) - cw(i)); df * df }).sum
        }.sum
        (p, n, d)
      }.toSeq.sortBy(t => (t._3, t._2)).take(3)
        .zipWithIndex.map { case ((pp, n, d), r) =>
          (pp, n, r + 1L, d.toLong) }
    }.toSet
    assert(out == exp)
  }

  test("semanticDecontaminate on RANDOM vectors == a BigInt rational " +
      "cosine filter (inclusive threshold, zero vectors kept)") {
    import graft.operators.Dedup
    val vecGen = Gen.listOfN(6, Gen.choose(-999, 999).map(_ / 500.0f))
    val all = draw(Gen.listOfN(40, vecGen), seed = 8L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    // plant a zero vector on each side: dot = 0 -> never a hit
    val rows = all :+ (40L, Array.fill(6)(0f)) :+ (41L, Array.fill(6)(0f))
    val corpus = rows.filter(_._1 % 3 != 0).toDF("vec_id", "embedding")
    val bench = rows.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    for (t <- Seq(25, 50, 90, 100)) {
      val got = Dedup.semanticDecontaminate(corpus, bench,
          "embedding", "vec_id", thresholdPct = t)
        .select("vec_id").as[Long].collect().toSet
      val bu = rows.filter(_._1 % 3 == 0).map(r => units(r._2))
      val exp = rows.filter(_._1 % 3 != 0).filter { case (_, v) =>
        val au = units(v)
        val an = au.map(x => BigInt(x) * x).sum
        !bu.exists { b =>
          val dot = au.zip(b).map { case (x, y) => BigInt(x) * y }.sum
          val bn = b.map(x => BigInt(x) * x).sum
          dot > 0 && dot * dot * 10000 >= BigInt(t) * t * an * bn
        }
      }.map(_._1).toSet
      assert(got == exp, s"diverged at threshold $t")
    }
  }

  test("semanticDecontaminateAtScale on RANDOM vectors: drops are a " +
      "SUBSET of the exact rule's drops (the prefilter can only miss, " +
      "never fabricate a hit), and every drop re-verifies exactly") {
    import graft.operators.Dedup
    // dim must match the LSH plane dimension passed to the scaled variant
    val dim = 6
    val vecGen = Gen.listOfN(dim, Gen.choose(-999, 999).map(_ / 500.0f))
    val all = draw(Gen.listOfN(60, vecGen), seed = 21L).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    // plant exact duplicates across the split so certain hits exist
    val rows = all :+ (60L, all(0)._2) :+ (61L, all(3)._2)
    val corpus = rows.filter(_._1 % 3 != 0).toDF("vec_id", "embedding")
    val ref = rows.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    for (t <- Seq(50, 90)) {
      val keptExact = Dedup.semanticDecontaminate(corpus, ref,
          "embedding", "vec_id", thresholdPct = t)
        .select("vec_id").as[Long].collect().toSet
      val keptScaled = Dedup.semanticDecontaminateAtScale(corpus, ref,
          "embedding", "vec_id", thresholdPct = t,
          nBits = 2, bands = 8, dim = dim)
        .select("vec_id").as[Long].collect().toSet
      // exact drops ⊆ scaled keeps' complement: anything scaled dropped,
      // exact dropped too (identical verify behind the prefilter)
      assert(keptExact.subsetOf(keptScaled),
        s"scaled fabricated a hit at t=$t: " +
          (keptExact -- keptScaled).toSeq.sorted)
      // a planted exact duplicate (61 = copy of ref id 3, cos = 1)
      // collides in every band -> the scaled tier must drop it
      assert(!keptScaled.contains(61L),
        s"planted duplicate survived at t=$t")
      assert(!keptExact.contains(61L))
    }
  }

  test("packTokenIds: generated corpora, arbitrary budgets — stream " +
      "reassembly, full-sequence invariant, packSequences consistency") {
    val idsGen = for {
      n <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 120))
      ids <- Gen.listOfN(n, Gen.choose(0, 1279))
    } yield ids.toArray
    val shardGen = Gen.oneOf("s0", "s1", "s2")
    val rows = draw(Gen.listOfN(80, Gen.zip(shardGen, idsGen)), seed = 9L)
      .zipWithIndex.map { case ((sh, ids), i) => (sh, i.toLong, ids) }
    for (budget <- Seq(1, 7, 64, 100000)) {
      val df = rows.toDF("shard", "id", "ids")
      val packed = Curate.packTokenIds(df, "ids", "id", budget, "shard")
        .collect()
      val byShard = packed.groupBy(_.getString(0))
      val expect = rows.groupBy(_._1).map { case (sh, rs) =>
        sh -> rs.sortBy(_._2).flatMap(_._3).toSeq }
      byShard.foreach { case (sh, out) =>
        val sorted = out.sortBy(_.getLong(1))
        // dense seq ids; every sequence but the last exactly `budget`
        assert(sorted.map(_.getLong(1)).toSeq ==
          sorted.indices.map(_.toLong), s"$sh/$budget seq ids not dense")
        sorted.dropRight(1).foreach(r => assert(r.getInt(3) == budget,
          s"$sh/$budget seq ${r.getLong(1)} not full"))
        // token stream reassembles exactly (order and values)
        assert(sorted.flatMap(_.getSeq[Int](2)).toSeq == expect(sh),
          s"$sh/$budget stream diverged")
      }
      // shards with only empty ids arrays produce no sequences
      val emptyShards = rows.groupBy(_._1)
        .filter(_._2.forall(_._3.isEmpty)).keySet
      assert(byShard.keySet.intersect(emptyShards).isEmpty)
      // layout consistency with packSequences: a document's seq_id there
      // is the sequence its FIRST token lands in here
      val layout = Curate.packSequences(
          df.withColumn("__n", size(col("ids"))), "ids", "id",
          budget, "shard", tokenCountCol = Some("__n"))
        .filter(size(col("ids")) > 0)
        .select(col("shard"), col("id"), col("seq_id"), col("seq_offset"))
        .collect()
      layout.foreach { r =>
        val sh = r.getString(0); val id = r.getLong(1)
        val firstTok = rows.filter(_._1 == sh).sortBy(_._2)
          .takeWhile(_._2 < id).map(_._3.length).sum
        assert(r.getLong(2) == firstTok / budget,
          s"$sh/$budget doc $id seq_id mismatch")
        assert(r.getLong(3) == firstTok % budget)
      }
    }
  }
}
