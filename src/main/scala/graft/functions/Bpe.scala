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
}
