package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting, trained on the corpus itself — no
  * external vocab, no network (the public BPE algorithm of Sennrich et al.
  * 2016, char-level over a normalized alphabet).
  *
  * Contract (every step mirrored exactly by the DuckDB oracle):
  *  1. normalize: lowercase, then every char outside [a-z ] becomes `¤`
  *     (the corpus is ASCII; the placeholder keeps the alphabet closed).
  *  2. encode: merges are applied IN RANK ORDER, each as one left-to-right
  *     non-overlapping replacement of the 2-char pair with a single
  *     private-use-area char (U+E000+rank). `String.replace`, Spark's
  *     `replace`, and DuckDB's `replace` all share those semantics, so one
  *     chain of replaces IS the encoder on all three engines.
  *  3. tokenCount = length of the fully-merged string (every remaining
  *     char is one token).
  *
  * Training is a bounded DRIVER-side loop (same discipline as the IVF
  * k-means fit): pair frequencies over a deterministic sample, merge the
  * most frequent pair, ties broken lexicographically — bit-reproducible
  * across runs and machines. The trained table is committed as
  * [[BpeVocab.merges]]; BpeSpec retrains from the fixture corpus and
  * asserts equality, so the committed table is provably the trainer's
  * output, not hand-edited.
  *
  * Scale shape: encoding is a row-local chain of codegen'd string
  * replaces — zero shuffle, zero UDF; at 100 TB the cost is one scan.
  * Training cost is bounded by the SAMPLE (not the corpus) and is paid
  * once per vocab version, offline.
  */
object Bpe {
  /** Out-of-alphabet placeholder (U+00A4). */
  val placeholder: Char = '¤'

  /** The single char standing for the token produced by merge `rank`. */
  def mergeChar(rank: Int): Char = {
    require(rank >= 0 && rank < 0x1000, s"merge rank out of PUA budget: $rank")
    (0xE000 + rank).toChar
  }

  /** Driver-side mirror of [[normalize]] (ASCII corpus: `toLowerCase` and
    * SQL `lower` agree on [A-Z]). */
  def normalizeStr(s: String): String =
    s.toLowerCase.map(c => if ((c >= 'a' && c <= 'z') || c == ' ') c else placeholder)

  /** Row-local normalization: lowercase + closed alphabet. */
  def normalize(c: Column): Column =
    regexp_replace(lower(c), "[^a-z ]", placeholder.toString)

  /** Train `nMerges` merges over `texts`: standard BPE — count adjacent
    * pairs (all occurrences), merge the most frequent everywhere, repeat.
    * Ties break on the lexicographically smallest pair, so the result is a
    * pure function of the multiset of texts. Stops early if no pair occurs
    * twice (nothing left worth merging). */
  def train(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1 && nMerges < 0x1000, s"nMerges out of range: $nMerges")
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var cur: Seq[String] = texts.filter(_ != null).map(normalizeStr)
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(Char, Char), Long]
      cur.foreach { s =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s.charAt(i), s.charAt(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        val ((a, b), _) = best.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        val tok = mergeChar(rank).toString
        merges += ((a.toString, b.toString))
        cur = cur.map(_.replace(s"$a$b", tok))
        rank += 1
      }
    }
    merges.toList
  }

  /** Driver-side reference encoder — the parity witness the spec checks
    * against the Spark-side column encoder. */
  def encodeStr(s: String, merges: Seq[(String, String)]): String =
    merges.zipWithIndex.foldLeft(normalizeStr(s)) {
      case (acc, ((a, b), j)) => acc.replace(a + b, mergeChar(j).toString)
    }

  /** The Spark-side encoder: normalize, then one codegen'd `replace` per
    * merge, in rank order. NULL in, NULL out. */
  def applyMerges(c: Column, merges: Seq[(String, String)]): Column =
    merges.zipWithIndex.foldLeft(normalize(c)) {
      case (acc, ((a, b), j)) =>
        replace(acc, lit(a + b), lit(mergeChar(j).toString))
    }

  /** BPE token count of a text column under `merges`. */
  def tokenCount(c: Column, merges: Seq[(String, String)]): Column =
    length(applyMerges(c, merges))

  /** DuckDB replay of [[tokenCount]] over SQL expression `inner`: the same
    * normalize + replace chain, emitted as nested function calls. The
    * alphabet ([a-z ], `¤`, PUA chars) contains no quotes, so literals
    * embed without escaping. */
  def oracleTokenCountSql(inner: String, merges: Seq[(String, String)]): String =
    s"length(${oracleEncodeSql(inner, merges)})"

  /** DuckDB replay of [[applyMerges]] (the encoded string itself). */
  def oracleEncodeSql(inner: String, merges: Seq[(String, String)]): String = {
    val normalized = s"regexp_replace(lower($inner), '[^a-z ]', '$placeholder', 'g')"
    merges.zipWithIndex.foldLeft(normalized) {
      case (acc, ((a, b), j)) => s"replace($acc, '${a + b}', '${mergeChar(j)}')"
    }
  }

  /** Render a merges table as a Scala literal (the committed-vocab format;
    * PUA/merge chars as unicode escapes so the source file stays ASCII). */
  def toScalaLiteral(merges: Seq[(String, String)]): String = {
    def esc(s: String): String = s.flatMap { ch =>
      if (ch >= 'a' && ch <= 'z' || ch == ' ') ch.toString
      else f"\\u${ch.toInt}%04x"
    }
    merges.map { case (a, b) => s"""("${esc(a)}", "${esc(b)}")""" }
      .mkString("Seq(\n    ", ",\n    ", ")")
  }

  // ======================= byte-level tier ===============================
  // The production-size vocabulary ([[BpeByteVocab]], ~1k merges): the
  // SAME merge semantics (rank-order, left-to-right non-overlapping,
  // lexicographic tie-break) over the FULL byte alphabet — no lowercase,
  // no placeholder collapse; case, digits, punctuation and whitespace all
  // carry tokens, as real byte-level tokenizers (GPT-2 style) do. Base
  // symbols are the 256 byte values; merge rank j is symbol 256+j,
  // rendered as the PUA char U+{E000+j} in the committed table and the
  // DuckDB replay. At ~1k merges a chain of per-merge `replace` Columns
  // would blow past codegen limits, so encoding is ONE native expression
  // ([[BpeByteCountExpr]]) doing the whole chain in a single pass per row
  // — still row-local, still zero shuffle. Because merge j's pair members
  // are always symbols older than j, and a merge never deletes symbols,
  // the sequential global-replace chain and the single-pass encoder are
  // provably identical (no later merge can create an earlier pair's
  // adjacency) — pinned against the replace-chain reference in BpeSpec.

  /** Committed-table symbol decode: byte chars map to themselves, PUA
    * chars to 256 + rank. Members of a merge pair are single chars by
    * construction. */
  private[graft] def symbolOf(c: Char): Int =
    if (c < 256) c.toInt
    else if (c >= 0xE000 && c < 0xE000 + 0x1000) 256 + (c - 0xE000)
    else throw new IllegalArgumentException(
      f"not a byte or merge symbol: U+${c.toInt}%04x")

  /** Merge table as parallel symbol arrays (pairA, pairB) — the compact
    * form the native expression carries. */
  private[graft] def pairSymbols(merges: Seq[(String, String)])
      : (Array[Int], Array[Int]) = {
    require(merges.forall(p => p._1.length == 1 && p._2.length == 1),
      "merge pair members must be single symbols")
    (merges.map(p => symbolOf(p._1.charAt(0))).toArray,
      merges.map(p => symbolOf(p._2.charAt(0))).toArray)
  }

  /** Train `nMerges` byte-level merges: identical algorithm to [[train]]
    * (count all adjacent pairs, merge the most frequent everywhere, ties
    * to the lexicographically smallest pair, stop when nothing repeats)
    * over UTF-8 byte sequences instead of the normalized char alphabet.
    * Tight int-array loops — at ~1k merges the naive recount-per-round
    * stays seconds-bounded on the training sample. */
  def trainBytes(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1 && nMerges < 0x1000, s"nMerges out of range: $nMerges")
    var docs: Array[Array[Int]] = texts.filter(_ != null).map(
      _.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff): Int)).toArray
    var lens: Array[Int] = docs.map(_.length)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val counts = scala.collection.mutable.LongMap.empty[Long]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      counts.clear()
      var d = 0
      while (d < docs.length) {
        val s = docs(d)
        val n = lens(d)
        var i = 0
        while (i < n - 1) {
          val k = (s(i).toLong << 32) | s(i + 1).toLong
          counts(k) = counts.getOrElse(k, 0L) + 1L
          i += 1
        }
        d += 1
      }
      var bestK = -1L
      var bestN = 1L // require >= 2 occurrences
      counts.foreachEntry { (k, n) =>
        if (n > bestN || (n == bestN && bestK >= 0 && k < bestK)) {
          bestK = k; bestN = n
        }
      }
      if (bestK < 0) done = true
      else {
        val a = (bestK >> 32).toInt
        val b = (bestK & 0xffffffffL).toInt
        val merged = 256 + rank
        var d2 = 0
        while (d2 < docs.length) {
          val s = docs(d2)
          val n = lens(d2)
          var w = 0
          var r = 0
          while (r < n) {
            if (r + 1 < n && s(r) == a && s(r + 1) == b) {
              s(w) = merged; r += 2
            } else { s(w) = s(r); r += 1 }
            w += 1
          }
          lens(d2) = w
          d2 += 1
        }
        def charOf(sym: Int): String =
          (if (sym < 256) sym.toChar else (0xE000 + (sym - 256)).toChar).toString
        merges += ((charOf(a), charOf(b)))
        rank += 1
      }
    }
    merges.toList
  }

  /** Driver-side reference encoder for the byte tier: the literal
    * replace-chain semantics (what the DuckDB replay executes). ASCII
    * input only — on ASCII, chars == bytes, so this chain is exactly the
    * byte-level merge sequence; the native expression is pinned equal to
    * it in BpeSpec. */
  def encodeBytesStr(s: String, merges: Seq[(String, String)]): String =
    merges.zipWithIndex.foldLeft(s) {
      case (acc, ((a, b), j)) => acc.replace(a + b, mergeChar(j).toString)
    }

  /** Byte-level BPE token count of a text column — ONE native expression
    * for the whole ~1k-merge chain (row-local, codegen'd, zero shuffle).
    * NULL in, NULL out. */
  def byteTokenCount(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    val (pa, pb) = pairSymbols(merges)
    GraftGlue.column(BpeByteCountExpr(GraftGlue.expression(c), pa, pb))
  }

  /** Byte-level BPE token IDS of a text column — the id array a training
    * shard physically holds (bytes 0..255, merge rank j = 256+j), from
    * the SAME single-pass native chain as [[byteTokenCount]] (one shared
    * merge loop, so count == ids.length by construction). NULL in, NULL
    * out. */
  def byteTokenIds(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    val (pa, pb) = pairSymbols(merges)
    GraftGlue.column(BpeByteIdsExpr(GraftGlue.expression(c), pa, pb))
  }

  /** Byte-level BPE DECODE of a token-id array column — the loader side:
    * ids back to the exact text they encode (inverse of [[byteTokenIds]]
    * by construction; fail-loud on ids outside the vocabulary's symbol
    * space). NULL in, NULL out. */
  def byteDecode(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    val (pa, pb) = pairSymbols(merges)
    GraftGlue.column(BpeByteDecodeExpr(GraftGlue.expression(c), pa, pb))
  }

  /** Space-joined decimal token-id serialization of an ids column — the
    * oracle-portable form (arrays hash awkwardly across engines; the
    * joined string pins every id and its position). */
  def idsString(ids: Column): Column =
    array_join(transform(ids, _.cast("string")), " ")

  /** DuckDB mirror of the id array over an `enc` final string `sExpr`:
    * each char of the merged string back to its symbol id (byte chars map
    * to their codepoint — the corpus is ASCII — PUA char U+{E000+j} to
    * 256+j). 57344 = 0xE000. */
  def oracleIdsListSql(sExpr: String): String =
    s"""list_transform(range(1, length($sExpr) + 1),
       |  i -> CASE WHEN unicode($sExpr[i:i]) >= 57344
       |    THEN 256 + unicode($sExpr[i:i]) - 57344
       |    ELSE unicode($sExpr[i:i]) END)""".stripMargin

  /** DuckDB mirror of [[idsString]]: the id list space-joined. */
  def oracleIdsStringSql(sExpr: String): String =
    s"""array_to_string(list_transform(${oracleIdsListSql(sExpr)},
       |  x -> CAST(x AS VARCHAR)), ' ')""".stripMargin

  /** DuckDB replay of the byte-level chain as a RECURSIVE CTE pair —
    * `(mergesCte, encCte)` fragments over relation `rel`'s (idCol,
    * textCol): one VALUES row per merge, one `replace` per iteration.
    * Valid for ASCII corpora (chars == bytes). Returned `enc` relation:
    * (idCol, s, r) with the fully-merged string at r = nMerges. */
  def oracleByteCtes(rel: String, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    val rows = merges.zipWithIndex.map { case ((a, b), j) =>
      s"(${j}, ${q(a + b)}, ${q(mergeChar(j).toString)})"
    }.mkString(", ")
    s"""m(mr, pat, rep) AS (SELECT * FROM (VALUES $rows) v),
       |enc AS (
       |  SELECT $idCol, $textCol AS s, 0 AS r FROM $rel
       |    WHERE $textCol IS NOT NULL
       |  UNION ALL
       |  SELECT e.$idCol, replace(e.s, m.pat, m.rep) AS s, e.r + 1 AS r
       |  FROM enc e JOIN m ON m.mr = e.r)""".stripMargin
  }
}
