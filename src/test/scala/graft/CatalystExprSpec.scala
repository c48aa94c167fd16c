package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Codegen'd hot-path expressions: bit-parity with the HOF reference
  * implementations across normal, zero-norm, mismatched and null inputs. */
class CatalystExprSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 2f, 3f, 4f), Array(4f, 3f, 2f, 1f)),
    (1L, Array(0f, 0f, 0f, 0f), Array(1f, 1f, 1f, 1f)),       // zero norm
    (2L, Array(0.1f, -0.2f, 0.3f, -0.4f), Array(-1f, 2f, -3f, 4f)),
    (3L, Array(1e-8f, 2e8f, -3.5f, 0.25f), Array(7f, -0.125f, 9f, 11f)))
    .toDF("id", "a", "b")

  test("cosineFast == cosine HOF bit-for-bit (incl. zero norm)") {
    val rows = vecs.select(
      V.cosine(col("a"), col("b")).as("hof"),
      V.cosineFast(col("a"), col("b")).as("gen")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"hof=${r.getDouble(0)} gen=${r.getDouble(1)}")
    }
  }

  test("cosineFast: NULL on length mismatch and null input, like zip_with") {
    val odd = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(odd.select(V.cosineFast(col("a"), col("b"))).collect()(0).isNullAt(0))
    val nul = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(nul.select(V.cosineFast(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("cosineFast survives interpreted fallback (eval parity)") {
    // force the interpreted path through a filter on the expression value
    val n = vecs.filter(V.cosineFast(col("a"), col("b")) > -2.0).count()
    assert(n == 4)
  }

  test("CDC chunks: edit locality — one edit changes O(1) chunks") {
    import graft.functions.{TextFunctions => T}
    val base = (1 to 120).map(i => s"word$i").mkString(" ")
    val edited = base.replace("word60", "EDITED")
    val shifted = "inserted_prefix " + base // fixed-width chunking's nemesis
    val df = Seq((1L, base), (2L, edited), (3L, shifted), (4L, base))
      .toDF("id", "text")
      .select(col("id"), T.cdcChunks(col("text")).as("ch"))
    val m = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(m(1L) == m(4L)) // deterministic
    def sharedFrac(a: Set[Long], b: Set[Long]) =
      (a intersect b).size.toDouble / math.min(a.size, b.size)
    assert(sharedFrac(m(1L), m(2L)) >= 0.6, s"edit not local: ${m(1L).size}")
    assert(sharedFrac(m(1L), m(3L)) >= 0.6, "prefix insertion not absorbed")
    assert(m(1L) != m(2L))
  }

  test("chunk overlap pairs: containment scores high") {
    import graft.operators.Dedup
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    val contained = (50 to 150).map(i => s"tok$i").mkString(" ")
    val other = (1 to 100).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, long), (2L, contained), (3L, other)).toDF("id", "text")
    val pairs = Dedup.chunkOverlapPairs(df, "text", "id", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("PortableMinHashExpr == built-in md5/conv composition bit-for-bit") {
    import graft.functions.{TextFunctions => T, PortableMinHashExpr, SeededMinArrayExpr}
    import org.apache.spark.sql.graftglue.GraftGlue
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  Weird   spacing\tand CASE  "),
      (3L, "short"),                 // fewer tokens than shingleN
      (4L, ""),                      // empty -> md5("") whole-doc shingle
      (5L, "unicode tøkens traîné 中文 here"))
      .toDF("id", "text")
    val mix = graft.operators.Dedup.mixConstants(8)
    val (as, bs) = mix.unzip
    val fast = GraftGlue.column(PortableMinHashExpr(
      GraftGlue.expression(split(T.normalized(col("text")), "\\s+")),
      3, as.toArray, bs.toArray))
    val ref = GraftGlue.column(SeededMinArrayExpr(
      GraftGlue.expression(transform(
        T.shingles(col("text"), 3), s => T.portableHash64(s))),
      as.toArray, bs.toArray))
    val rows = docs.select(fast.as("f"), ref.as("r"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (f, r) => assert(f == r) }
  }

  private val texts = Seq(
    (1L, "the quick brown fox and the lazy dog in a field of rye"),
    (2L, "el perro y la casa de los gatos que en madrid"),
    (3L, "der hund und die katze das ist von mit haus"),
    (4L, "le chat et la maison les chiens des rues un jour"),
    (5L, "的 是 在 了 和 有 我"),
    (6L, "no marker words whatsoever here!!"),          // all-zero -> und
    (7L, "the el"),                                     // tie en/es -> en
    (8L, "de la de la"),                                // tie es/fr -> es
    (9L, ""),                                           // empty
    (10L, " \t \n "),                                   // whitespace-only
    (11L, "  the\t\ta  of\nand   to in is  "),          // odd spacing
    (12L, "unicode tøkens traîné 中文 𝄞clef the"),       // 2/3/4-byte UTF-8
    (13L, "Punctuation, only... the; end."),
    (14L, "ThE A Of")                                   // case-sensitive: 0 hits
  ).toDF("id", "text")
    .unionByName(Seq((15L, Option.empty[String])).toDF("id", "text"))

  test("LangIdExpr langId == HOF langId on the full edge battery") {
    import graft.functions.{TextFunctions => T}
    val rows = texts.select(
      T.langIdHof(col("text")).as("hof"),
      T.langId(col("text")).as("gen"), col("id")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"id=${r.getLong(2)} hof=${r.getString(0)} gen=${r.getString(1)}")
    }
  }

  test("QualityRawExpr qualityScore == HOF qualityScore bit-for-bit") {
    import graft.functions.{TextFunctions => T}
    val rows = texts.select(
      T.qualityScoreHof(col("text")).as("hof"),
      T.qualityScore(col("text")).as("gen"), col("id")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"id=${r.getLong(2)} null mismatch")
      if (!r.isNullAt(0)) {
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"id=${r.getLong(2)} hof=${r.getDouble(0)} gen=${r.getDouble(1)}")
      }
    }
  }

  test("LangIdExpr/QualityRawExpr survive interpreted fallback") {
    import graft.functions.{TextFunctions => T}
    // filters force non-codegen eval of the expression value
    assert(texts.filter(T.langId(col("text")) === "en").count() == 4) // 1,7,11,12
    assert(texts.filter(T.qualityScore(col("text")) >= 0.0).count() == 14)
  }

  test("sometimes-NULL exprs declare nullable even over non-nullable children") {
    // CosineSimilarityExpr / SimHashExpr / SeededMinArrayExpr can return
    // NULL from non-null inputs (length mismatch / zero tokens / empty
    // array). If they inherit child nullability, Spark's non-nullable
    // codegen path never declares ev.isNull, the generated Java does not
    // compile (janino "not an rvalue") and every containing stage silently
    // falls back to interpreted eval — the round-2/3 bench-tail
    // NonFateSharingCache error. Guard the overrides AND the janino
    // compile with a log appender on the codegen error path.
    import org.apache.spark.sql.graftglue.GraftGlue
    import graft.functions.{CosineSimilarityExpr, L2UnitsDistExpr,
      SeededMinArrayExpr, SimHashExpr}
    val e = GraftGlue.expression(col("a"))
    assert(CosineSimilarityExpr(e, e).nullable)
    assert(SimHashExpr(e, portable = false).nullable)
    assert(SeededMinArrayExpr(e, Array(1L), Array(0L)).nullable)
    // same class: NULL on length mismatch from non-null children
    assert(L2UnitsDistExpr(e, e).nullable)

    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-codegen-guard", null, null, false, null) {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      override def append(ev: org.apache.logging.log4j.core.LogEvent): Unit =
        if (ev.getMessage.getFormattedMessage.contains("Failed to compile"))
          n.incrementAndGet()
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(appender, org.apache.logging.log4j.Level.ERROR, null)
    try {
      // non-nullable array columns (toDF of Array[Float]) + the expr in a
      // FILTER: exactly the shape that failed to compile before the fix
      val out = vecs.filter(V.cosineFast(col("a"), col("b")) > -2.0)
        .select(V.cosineFast(col("a"), col("b")).as("c")).collect()
      assert(out.length == 4)
      // the round-10 distance exprs through the same non-nullable-child
      // filter shape: a janino failure here would silently fall back to
      // interpreted eval and erase their entire point
      import graft.functions.L2UnitsDistExpr
      def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        GraftGlue.column(L2UnitsDistExpr(
          GraftGlue.expression(a), GraftGlue.expression(b)))
      val lu = Seq((Array(1L, 2L), Array(3L, 4L)), (Array(5L, 6L), Array(7L, 8L)))
        .toDF("x", "y")
      assert(lu.filter(l2(col("x"), col("y")) >= 0L).count() == 2)
      assert(appender.n.get() == 0,
        s"codegen compile failures detected: ${appender.n.get()}")
    } finally {
      root.removeAppender("graft-codegen-guard")
      appender.stop()
    }
  }

  test("L2UnitsDistExpr == aggregate/zip_with HOF form; NULL on " +
      "mismatch/null; interpreted fallback parity") {
    import org.apache.spark.sql.graftglue.GraftGlue
    import graft.functions.L2UnitsDistExpr
    def fast(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftGlue.column(L2UnitsDistExpr(
        GraftGlue.expression(a), GraftGlue.expression(b)))
    val rng = new scala.util.Random(11)
    val units = (0 until 20).map { i =>
      (i.toLong, Array.fill(16)(rng.nextLong() % 2000000L),
        Array.fill(16)(rng.nextLong() % 2000000L)) }
      .toDF("id", "a", "b")
    val rows = units.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v).as("hof"),
      fast(col("a"), col("b")).as("gen")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // mismatch + null -> NULL (like zip_with's null-pad poisoning the sum)
    val odd = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    assert(odd.select(fast(col("a"), col("b"))).collect()(0).isNullAt(0))
    val nul = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
    assert(nul.select(fast(col("a"), col("b"))).collect()(0).isNullAt(0))
    // interpreted fallback (filter forces eval)
    assert(units.filter(fast(col("a"), col("b")) >= 0L).count() == 20)
  }

  test("PqAdcDistExpr == per-subspace HOF ADC chain; fail-loud on " +
      "out-of-range codes") {
    import org.apache.spark.sql.graftglue.GraftGlue
    import graft.functions.PqAdcDistExpr
    val rng = new scala.util.Random(13)
    val m = 4; val kCodes = 8; val subDim = 4
    val cents = Array.fill(m, kCodes, subDim)(rng.nextLong() % 1000000L)
    val df = (0 until 12).map { i =>
      (i.toLong, Array.fill(m * subDim)(rng.nextLong() % 1000000L),
        Array.fill(m)(rng.nextInt(kCodes))) }
      .toDF("id", "vec", "codes")
    def fast(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      GraftGlue.column(PqAdcDistExpr(
        GraftGlue.expression(v), GraftGlue.expression(c), cents))
    val hof = (0 until m).map { s =>
      aggregate(zip_with(
        slice(col("vec"), s * subDim + 1, subDim),
        element_at(typedLit(cents(s).map(_.toSeq).toSeq),
          element_at(col("codes"), s + 1) + 1),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v)
    }.reduce(_ + _)
    df.select(hof.as("hof"), fast(col("vec"), col("codes")).as("gen"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // wrong-shape codes must throw, not NULL-and-drop
    val bad = Seq((Array.fill(m * subDim)(0L), Array(0, 1, 2, 99)))
      .toDF("vec", "codes")
    val e = intercept[Exception] {
      bad.select(fast(col("vec"), col("codes"))).collect() }
    assert(e.getMessage != null)
  }

  test("distance/decode exprs reject wrong element types at ANALYSIS " +
      "(array<bigint> codes would otherwise be read bytewise as garbage)") {
    import org.apache.spark.sql.graftglue.GraftGlue
    import graft.functions.{BpeByteDecodeExpr, L2UnitsDistExpr,
      PqAdcDistExpr}
    val cents = Array.fill(2, 2, 2)(1L)
    // codes as array<bigint> — the exact foreign-parquet drift ADVICE
    // flagged: must fail analysis, not compute garbage distances
    val longCodes = Seq((Array.fill(4)(0L), Array(0L, 1L)))
      .toDF("vec", "codes")
    intercept[org.apache.spark.sql.AnalysisException] {
      longCodes.select(GraftGlue.column(PqAdcDistExpr(
        GraftGlue.expression(col("vec")),
        GraftGlue.expression(col("codes")), cents))).collect()
    }
    // vec as array<int> into the long-units distance
    val intVecs = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      intVecs.select(GraftGlue.column(L2UnitsDistExpr(
        GraftGlue.expression(col("a")),
        GraftGlue.expression(col("b"))))).collect()
    }
    // token ids as array<bigint> into decode
    val longIds = Seq(Tuple1(Array(104L, 105L))).toDF("ids")
    intercept[org.apache.spark.sql.AnalysisException] {
      longIds.select(GraftGlue.column(BpeByteDecodeExpr(
        GraftGlue.expression(col("ids")),
        Array.empty[Int], Array.empty[Int]))).collect()
    }
    // and the correctly-typed forms still pass analysis untouched
    val okCodes = Seq((Array.fill(4)(0L), Array(0, 1))).toDF("vec", "codes")
    assert(okCodes.select(GraftGlue.column(PqAdcDistExpr(
      GraftGlue.expression(col("vec")),
      GraftGlue.expression(col("codes")), cents))).count() == 1)
  }

  test("SignBucketExpr == signBucket HOF bit-for-bit") {
    val planes = V.randomPlanes(12, 4, seed = 7L)
    val rows = vecs.select(
      V.signBucket(col("a"), planes).as("hof"),
      V.signBucketFast(col("a"), planes).as("fast"))
      .as[(Long, Long)].collect()
    rows.foreach { case (h, f) => assert(h == f) }
    // interpreted fallback parity too
    import org.apache.spark.sql.graftglue.GraftGlue
    import graft.functions.SignBucketExpr
    val e = SignBucketExpr(GraftGlue.expression(col("a")), planes)
    assert(e.nullSafeEval(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1f, 2f, 3f, 4f))) ==
      vecs.filter(col("id") === 0).select(V.signBucket(col("a"), planes))
        .as[Long].head())
  }
}
