package graft

import org.apache.spark.sql.functions._
import graft.operators.FingerprintIndex
import graft.functions.Utf8SortedKeys

/** The refresh loop's stable-confirm index: exact membership over md5
  * fingerprints via range-partitioned sorted arrays + driver bounds.
  * The per-trigger claim the drain rests on — probe cost independent of
  * corpus size — only holds if membership is EXACT, so every test here
  * is against a brute-force set reference. */
class FingerprintIndexSpec extends SparkSpec {
  import spark.implicits._

  private def md5s(ids: Range): Seq[String] =
    ids.map(i => java.security.MessageDigest.getInstance("MD5")
      .digest(s"doc-$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)

  test("hits == brute-force set intersection, duplicates and absent " +
      "candidates included, across partition boundaries") {
    val corpus = md5s(0 until 500)
    val ix = FingerprintIndex.build(
      corpus.toDF("__pfp"), numPartitions = 7)
    assert(ix.count == 500L)
    try {
      val present = md5s(100 until 120)
      val absent = md5s(1000 until 1020)
      // duplicates in the candidate set must not duplicate hits
      val cands = (present ++ absent ++ present).toArray
      val got = ix.hits(cands).toSet
      assert(got == present.toSet, s"got ${got.size} hits")
      // extreme keys (below every partition's first, above every last)
      // route out on the driver: provably absent, still correct
      val lo = "0" * 32
      val hi = "f" * 32
      assert(ix.hits(Array(lo, hi)).isEmpty
        || Set(lo, hi).subsetOf(corpus.toSet)) // (md5 collision-free here)
      assert(ix.hits(Array.empty).isEmpty)
    } finally ix.release()
  }

  test("single row, single partition, empty corpus") {
    val one = md5s(0 until 1)
    val ix1 = FingerprintIndex.build(one.toDF("__pfp"), 4)
    try {
      assert(ix1.count == 1L)
      assert(ix1.hits(one.toArray).toSet == one.toSet)
      assert(ix1.hits(md5s(5 until 6).toArray).isEmpty)
    } finally ix1.release()
    val ix0 = FingerprintIndex.build(
      Seq.empty[String].toDF("__pfp"), 4)
    try {
      assert(ix0.count == 0L)
      assert(ix0.hits(one.toArray).isEmpty)
    } finally ix0.release()
    // nulls are dropped at build (null-text rows bypass the confirm)
    val ixN = FingerprintIndex.build(
      (one.map(Option(_)) :+ Option.empty[String]).toDF("__pfp"), 2)
    try assert(ixN.count == 1L) finally ixN.release()
  }

  test("parseHex is a bijection with formatting and fails loudly on " +
      "non-fingerprints") {
    val s = "00ff" * 8
    val (hi, lo) = FingerprintIndex.parseHex(s)
    assert(f"$hi%016x$lo%016x" == s)
    val (h2, l2) = FingerprintIndex.parseHex("f" * 32)
    assert(h2 == -1L && l2 == -1L) // unsigned max parses to all-ones
    intercept[IllegalArgumentException] {
      FingerprintIndex.parseHex("abc")
    }
    // pairLess must equal lexicographic order of the hex strings —
    // the property that makes range bounds valid routing state
    val vals = Seq("0" * 32, "7fffffffffffffff" + "0" * 16,
      "8" + "0" * 31, "f" * 32, md5s(0 until 1).head)
    for (a <- vals; b <- vals)
      assert(FingerprintIndex.pairLess(FingerprintIndex.parseHex(a),
        FingerprintIndex.parseHex(b)) == (a < b),
        s"pairLess($a, $b) disagrees with string order")
  }

  test("Utf8InSortedArrayExpr: binary-search filter matches isin, " +
      "null in -> row kept by the null-bypass disjunct") {
    import org.apache.spark.sql.graftglue.GraftGlue
    val keys = Utf8SortedKeys.sorted(Array("bb", "dd", "ff"))
    val df = Seq(Some("aa"), Some("bb"), Some("cc"), Some("dd"),
      Some("zz"), None).toDF("s")
    val member = GraftGlue.column(graft.functions.Utf8InSortedArrayExpr(
      GraftGlue.expression(df("s")), keys))
    val kept = df.filter(col("s").isNull || !member)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(kept == Set(Some("aa"), Some("cc"), Some("zz"), None))
  }
}
