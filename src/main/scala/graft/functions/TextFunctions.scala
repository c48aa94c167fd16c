package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (BASELINE.json north_star; SURVEY.md §2.8 extensions).
  *
  * Everything here is built from codegen'd Catalyst built-ins / higher-order
  * functions — no UDFs — so the whole battery stays inside whole-stage
  * codegen and scales linearly with no shuffle. All functions are
  * deterministic and mirrorable in ANSI SQL (the DuckDB oracle).
  */
object TextFunctions {

  /** Non-empty whitespace-separated tokens. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, single digits, or single
    * non-alphanumeric glyphs — a cheap proxy for tokenizer cost. */
  def regexTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"))

  /** Mean token length (0.0 for empty docs). */
  def avgTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0)
      .otherwise(
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          size(t))
  }

  /** Count of tokens that appear in `set` (exact match, case-sensitive). */
  def tokenSetCount(c: Column, set: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(set.map(lit(_)): _*)))

  /** Per-language stopword markers for the heuristic language-ID.
    * Tiny on purpose: these are the highest-frequency function words. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我")
  )

  /** Heuristic language ID: argmax of stopword hits, ties broken by the
    * declaration order above; all-zero scores -> "und"; NULL text -> "und"
    * (the HOF chain's fall-through). One codegen pass ([[LangIdExpr]]) —
    * the naive when-chain form re-evaluates every score per branch, ~40
    * `split(text)` lambdas per row (kept as [[langIdHof]] for the parity
    * spec; the DuckDB oracle mirrors that reference form). */
  def langId(c: Column): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    coalesce(GraftGlue.column(LangIdExpr(GraftGlue.expression(c))), lit("und"))
  }

  /** HOF reference form of [[langId]] — bit-parity pinned in
    * CatalystExprSpec; not for hot paths. */
  private[graft] def langIdHof(c: Column): Column = {
    val scores = langMarkers.map { case (lang, words) =>
      lang -> tokenSetCount(c, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s > 0 && s === best, lang).otherwise(rest)
    }
  }

  /** Ratio of ASCII punctuation chars to total chars (0 for empty). */
  def punctRatio(c: Column): Column = {
    val n = length(c)
    val punct = n - length(regexp_replace(c, "[.,!?;:'\"()\\[\\]-]", ""))
    when(n === 0, 0.0).otherwise(punct.cast("double") / n)
  }

  /** Ratio of alphabetic chars to total chars (0 for empty). */
  def alphaRatio(c: Column): Column = {
    val n = length(c)
    val alpha = n - length(regexp_replace(c, "[A-Za-z]", ""))
    when(n === 0, 0.0).otherwise(alpha.cast("double") / n)
  }

  /** English-stopword density — a standard quality signal. */
  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0)
      .otherwise(tokenSetCount(c, langMarkers.head._2).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: length saturation + alpha density +
    * stopword density, weighted 0.4/0.4/0.2, rounded to 4 decimals. One
    * codegen pass ([[QualityRawExpr]]) + Spark's own `round`; the HOF
    * reference form is kept as [[qualityScoreHof]] for the parity spec. */
  def qualityScore(c: Column): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    round(GraftGlue.column(QualityRawExpr(GraftGlue.expression(c))), 4)
  }

  /** HOF reference form of [[qualityScore]] — bit-parity pinned in
    * CatalystExprSpec; not for hot paths. */
  private[graft] def qualityScoreHof(c: Column): Column =
    round(
      least(tokenCount(c).cast("double") / 100.0, lit(1.0)) * 0.4 +
        alphaRatio(c) * 0.4 +
        least(stopwordRatio(c) * 5.0, lit(1.0)) * 0.2,
      4)

  /** 60-bit cross-engine hash: the decimal value of the first 15 hex chars
    * of md5. Computable identically in any engine with an md5() (DuckDB,
    * Trino, Postgres), so fingerprints/sketches built on it can be
    * verified or joined outside Spark. Always non-negative. */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace-normalized lowercase form (dedup canonicalization). */
  def normalized(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Content fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set —
    * invariant to word order and repetition (near-dup bucket key). */
  def bagFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(normalized(c))))))

  /** Content-defined-chunk fingerprints of the raw text (rolling-hash
    * boundaries -> XXH64 per chunk; see CdcChunksExpr). An edit changes
    * O(1) chunk hashes, so shared chunks detect partial duplication and
    * containment — the rolling-hash document fingerprint. */
  def cdcChunks(c: Column, minChunk: Int = 16, maskBits: Int = 6,
                portable: Boolean = false): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(CdcChunksExpr(GraftGlue.expression(c), minChunk,
      maskBits, portable))
  }

  /** Word n-gram shingles of the normalized text (MinHash input).
    *
    * The token array is BOUND as a lambda variable (single-element-array
    * transform) before the per-gram loop: HOFs run interpreted with no
    * subexpression elimination, so a lambda that references the raw
    * `tokens(normalized(c))` expression re-tokenizes the whole document
    * once PER GRAM — the q43-class blowup, measured at ~18x on the q92
    * corpus. Binding makes tokenization once-per-row; the inner lambda
    * then only slices an in-memory array. */
  def shingles(c: Column, n: Int): Column =
    flatten(transform(array(tokens(normalized(c))), t =>
      when(size(t) < n, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))))
}
