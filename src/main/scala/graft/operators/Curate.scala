package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Corpus-curation operators for training-data pipelines (BASELINE.json
  * north_star): deterministic sampling and the standard curation pass
  * (dedup -> language filter -> quality threshold), composed from the
  * oracle-verified primitives in [[Dedup]] and
  * [[graft.functions.TextFunctions]].
  *
  * Scale shape (100 TB): sampling and the lang/quality stages are pure
  * row-local column expressions (no shuffle, no state); the exact-dup
  * stage is the single fingerprint shuffle from [[Dedup.exact]]. The whole
  * audit is ONE window pass + one narrow projection.
  */
object Curate {

  private val two60 = 1L << 60

  /** Deterministic hash-sample: keep a row iff the portable 60-bit hash of
    * `salt:id` falls below `rate` of the hash space. Properties random()
    * sampling lacks: reproducible across runs AND engines
    * ([[T.portableHash64]] is plain SQL), and stable under corpus growth —
    * a row's fate depends only on its own id, so incremental batches
    * sample consistently and train/holdout splits never leak when data is
    * added. Different salts give independent samples (disjoint splits via
    * complementary ranges of ONE salt, not two salts). */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    df.filter(sampleHash(idCol, salt) < math.round(rate * two60))
  }

  /** The sampling hash value (exposed so strata thresholds and oracle SQL
    * can reference the identical expression). */
  def sampleHash(idCol: String, salt: String): Column =
    T.portableHash64(concat(lit(salt), lit(":"), col(idCol).cast("string")))

  /** Stratified deterministic sample: per-stratum rates (e.g. per source:
    * keep 100% of books, 10% of web), `defaultRate` for unlisted strata.
    * Same hash as [[hashSample]], so per-stratum subsamples of one corpus
    * are nested: rate 0.1 is a subset of rate 0.2. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1]: $r"))
    val threshold = rates.foldLeft(
      lit(math.round(defaultRate * two60)): Column) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(math.round(r * two60))).otherwise(acc)
    }
    df.filter(sampleHash(idCol, salt) < threshold)
  }

  /** Curation audit: every row tagged with the FIRST drop reason that
    * applies — `null_text`, `exact_dup` (not the lowest-id copy of its
    * normalized fingerprint), `lang` (language guess not in `keepLangs`),
    * `quality` (score below `minQuality`) — or NULL for keepers. Keeping
    * the audit row (not just the survivor set) is what a production
    * pipeline reports on: per-source drop-reason counts are the curation
    * dashboard. */
  def curationAudit(df: DataFrame, textCol: String, idCol: String,
                    keepLangs: Seq[String],
                    minQuality: Double): DataFrame = {
    // the exact-dup rule is Dedup's, shared — a row is tagged exact_dup
    // iff Dedup.exact would drop it
    df.withColumn("__rep", Dedup.repId(textCol, idCol))
      .withColumn("drop_reason",
        when(col(textCol).isNull, "null_text")
          .when(col(idCol) =!= col("__rep"), "exact_dup")
          .when(!T.langId(col(textCol)).isin(keepLangs.map(lit(_)): _*), "lang")
          .when(T.qualityScore(col(textCol)) < minQuality, "quality"))
      .drop("__rep")
  }

  /** The curated corpus: [[curationAudit]] survivors. */
  def curate(df: DataFrame, textCol: String, idCol: String,
             keepLangs: Seq[String], minQuality: Double): DataFrame =
    curationAudit(df, textCol, idCol, keepLangs, minQuality)
      .filter(col("drop_reason").isNull).drop("drop_reason")

  /** Gopher-style quality-rule audit (Rae et al. 2021 §A1.1 heuristics,
    * re-expressed as Catalyst columns): every row tagged with the FIRST
    * failing rule — `null_text`, `word_count` (outside [minWords,
    * maxWords]), `word_length` (mean token length outside [minMeanLen,
    * maxMeanLen]), `symbol_ratio` (#/ellipsis glyphs per word above
    * maxSymbolRatio), `alpha_words` (fraction of tokens containing a
    * letter below minAlphaWordRatio), `stopword` (fewer than minStopwords
    * DISTINCT English markers present) — or NULL for keepers.
    *
    * Scale shape: entirely row-local, one pass. The token array and the
    * rule statistics are BOUND as intermediate columns so each is computed
    * once per row (CollapseProject never inlines multiply-referenced
    * non-cheap expressions) — the langId round-3 lesson applied here from
    * the start. */
  def gopherAudit(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  minAlphaWordRatio: Double = 0.8,
                  minStopwords: Int = 2): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1 (guards the divisions): $minWords")
    val markers = T.langMarkers.head._2 // the English stop set
    val txt = col(textCol)
    val toks = col("__toks")
    def g(f: String) = col("__gstats").getField(f)
    val out = df
      .withColumn("__toks", T.tokens(txt))
      .withColumn("__gstats", struct(
        size(toks).as("nw"),
        aggregate(toks, lit(0L), (a, x) => a + length(x)).as("sumlen"),
        (regexp_count(txt, lit("#")) + regexp_count(txt, lit("\\.\\.\\.")) +
          regexp_count(txt, lit("…"))).as("nsym"),
        size(filter(toks, w => w.rlike("[A-Za-z]"))).as("nalpha"),
        size(filter(lit(markers.toArray),
          m => array_contains(toks, m))).as("nstop")))
      .withColumn("gopher_reason",
        when(txt.isNull, "null_text")
          .when(g("nw") < minWords || g("nw") > maxWords, "word_count")
          .when(g("sumlen").cast("double") / g("nw") < minMeanLen ||
            g("sumlen").cast("double") / g("nw") > maxMeanLen, "word_length")
          .when(g("nsym").cast("double") / g("nw") > maxSymbolRatio,
            "symbol_ratio")
          .when(g("nalpha").cast("double") / g("nw") < minAlphaWordRatio,
            "alpha_words")
          .when(g("nstop") < minStopwords, "stopword"))
      .drop("__toks", "__gstats")
    out
  }

  /** Compression-ratio quality gate: flag documents that compress POORLY
    * under a corpus-trained byte-level BPE vocabulary. Natural text in the
    * training distribution compresses ~2-3x (bytes per token); gibberish,
    * random strings, base64 blobs and wrong-distribution content stay
    * near 1 byte/token — a single integer signal that catches junk the
    * word-shape gates ([[gopherAudit]]) miss. Published data-curation
    * practice; the vocabulary IS the quality model.
    *
    * Integer-exact keep rule (oracle-replayable, no float ties):
    * pass iff `n_bytes * 10 >= n_tokens * minRatioTenths`
    * (minRatioTenths = 25 means ratio >= 2.5). Adds `n_bytes` (UTF-8
    * octets), `n_tokens` (byte-BPE count), and `compress_reason`
    * (NULL = pass, the [[gopherAudit]] convention). NULL text carries no
    * compression evidence -> "null_text"; EMPTY text passes vacuously
    * (0 >= 0 — route empties to the word-count gate). Row-local, one
    * codegen expression per row — zero shuffle at any scale. */
  def compressionGate(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)],
                      minRatioTenths: Int = 25): DataFrame = {
    require(minRatioTenths >= 10 && minRatioTenths <= 1000,
      s"minRatioTenths out of range: $minRatioTenths")
    val txt = col(textCol)
    df.withColumn("n_bytes",
        when(txt.isNotNull, octet_length(txt).cast("long")))
      .withColumn("n_tokens",
        graft.functions.Bpe.byteTokenCount(txt, merges).cast("long"))
      .withColumn("compress_reason",
        when(txt.isNull, "null_text")
          .when(col("n_bytes") * 10L <
            col("n_tokens") * minRatioTenths.toLong, "low_compression"))
  }

  /** Linear bag-of-words classifier score — the fastText-style quality
    * classifier shape (a trained model is weights + bias; this applies
    * them): logit = bias + (sum over tokens of weight(token)) / n_tokens,
    * label = logit > 0. Unknown tokens weigh 0.
    *
    * Scale shape: entirely row-local whole-stage codegen — the token array
    * binds once, the dot product is ONE `aggregate` fold over a map
    * literal, no shuffle, no UDF. Exactness contract: pass weights as
    * DYADIC rationals (multiples of 2^-20 are plenty for trained models);
    * then the fold is exact in double regardless of token order and the
    * logit is bit-identical across engines — an oracle can verify scores
    * without rounding tolerance.
    *
    * Output: input + `n_tokens`, `logit` (NULL text -> NULL logit),
    * `label`. */
  def classifierScore(df: DataFrame, textCol: String,
                      weights: Map[String, Double],
                      bias: Double = 0.0): DataFrame = {
    require(weights.nonEmpty, "need at least one vocabulary weight")
    val terms = weights.toSeq.sortBy(_._1)
    val wmap = map(terms.flatMap { case (t, w) =>
      Seq(lit(t), lit(w)) }: _*)
    val toks = col("__toks")
    df.withColumn("__toks", T.tokens(col(textCol)))
      // size() is -1 (not NULL) on NULL input under ansi=false — make the
      // NULL-text row report NULL counts, not a sentinel
      .withColumn("n_tokens",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(size(toks).cast("long")))
      .withColumn("logit",
        when(col(textCol).isNull, lit(null).cast("double"))
          .when(col("n_tokens") === 0, lit(bias))
          .otherwise(lit(bias) +
            aggregate(toks, lit(0.0),
              (acc, x) => acc + coalesce(element_at(wmap, x), lit(0.0))) /
              col("n_tokens")))
      .withColumn("label", col("logit") > 0.0)
      .drop("__toks")
  }

  /** Blocklist audit — the badwords/NSFW curation gate: per-row blocked
    * token count and an integer-exact keep decision (`blocked * 1e6 >
    * n_tokens * maxRatePpm` — no double ratio, so the gate is bit-exact at
    * any corpus size). Matching is exact-token, case-insensitive via the
    * normalized token stream ([[T.normalized]]). NULL text keeps (the
    * quality gates own that case). Row-local, one pass, no shuffle.
    *
    * Output: input + `n_tokens`, `n_blocked`, `keep`. */
  def blocklistAudit(df: DataFrame, textCol: String, terms: Seq[String],
                     maxRatePpm: Long = 0L): DataFrame = {
    require(terms.nonEmpty, "need at least one blocklist term")
    require(maxRatePpm >= 0L, s"maxRatePpm must be >= 0: $maxRatePpm")
    // tokens are normalized (lowercased) — the terms must be too, or a
    // mixed-case blocklist entry would silently never match
    val termsLc = terms.map(_.toLowerCase).distinct
    val toks = col("__toks")
    df.withColumn("__toks", T.tokens(T.normalized(col(textCol))))
      // size() is -1 (not NULL) on NULL input under ansi=false
      .withColumn("n_tokens",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(size(toks).cast("long")))
      .withColumn("n_blocked",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(
            size(filter(toks, t => t.isin(termsLc.map(lit(_)): _*)))
              .cast("long")))
      .withColumn("keep",
        col(textCol).isNull ||
          col("n_blocked") * 1000000L <= col("n_tokens") * maxRatePpm)
      .drop("__toks")
  }

  /** Per-stratum corpus report card — the dataset-documentation numbers a
    * training run wants before it starts: document/token/char volume,
    * language mix breadth, mean quality, and the exact-duplicate rate.
    * One row-local projection (token array + langId + quality each bound
    * once) feeding ONE map-side-combined aggregation; the duplicate rate
    * rides the same pass as a COUNT(DISTINCT fingerprint) — no second scan,
    * no join. Sums are decimal-exact (order-independent). NULL text rows
    * are counted in n_docs but contribute no tokens/chars/quality. */
  def corpusReport(df: DataFrame, textCol: String,
                   strataCol: String): DataFrame = {
    val txt = col(textCol)
    df.select(col(strataCol),
        txt.isNull.as("__isnull"),
        // size() is -1 (not NULL) on NULL input under ansi=false; NULL-text
        // rows must contribute nothing to the token sum
        when(txt.isNull, lit(null).cast("long"))
          .otherwise(T.tokenCount(txt).cast("long")).as("__ntok"),
        length(txt).cast("long").as("__nchar"),
        T.langId(txt).as("__lang"),
        T.qualityScore(txt).as("__q"),
        T.fingerprint(txt).as("__fp"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("__isnull"), 1)).as("n_null"),
        coalesce(sum(col("__ntok")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("__nchar")), lit(0L)).as("n_chars"),
        countDistinct(col("__lang")).as("n_langs"),
        // decimal SUM (exact, order-independent) cast to double BEFORE the
        // divide — decimal-division result scales differ across engines
        (sum(col("__q").cast("decimal(27,12)")).cast("double") /
          count(col("__q"))).as("mean_quality"),
        (count(col("__fp")) - countDistinct(col("__fp")))
          .as("n_exact_dups"))
  }

  /** CCNet-style corpus partition by language-model score: per stratum,
    * documents are bucketed `head` / `middle` / `tail` by the EXACT
    * (type-1) quantiles of their mean unigram log-probability — the
    * standard "keep the head, mine the middle, drop the tail" curation
    * split. Scores use [[Relevance.unigramLogProb]] with decimal exact
    * summation (order-independent, engine-portable); thresholds come from
    * [[graft.functions.Stats.exactQuantiles]], so bucket boundaries are
    * actual score VALUES and assignment is bit-deterministic.
    *
    * Scale shape: the score pass is the unigram operator's one term-key
    * window; thresholds are a one-row-per-stratum frame broadcast back;
    * the bucketing itself is a row-local when-chain. NULL-text docs have
    * no tokens, hence no score, and are excluded (curate them with
    * [[curationAudit]] first); docs with a NULL stratum form their own
    * stratum (null-safe threshold join) rather than vanishing. Output:
    * (idCol, strataCol, mean_logprob, bucket). */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                        strataCol: String,
                        loQ: Double = 1.0 / 3,
                        hiQ: Double = 2.0 / 3): DataFrame = {
    require(loQ > 0 && loQ < hiQ && hiQ < 1,
      s"need 0 < loQ < hiQ < 1: ($loQ, $hiQ)")
    // materialize the scoring pass ONCE: it feeds both the threshold
    // branch and the final bucket join, and uncached would recompute the
    // token explode + term window twice in the same action (blocks are
    // freed by the bench's isolation / the ContextCleaner)
    val scores = Relevance.unigramLogProb(df, textCol, idCol,
        exactSum = true)
      .join(df.select(col(idCol), col(strataCol)), Seq(idCol))
      .localCheckpoint(true)
    // labels come from the SAME formatter exactQuantiles uses — no
    // duplicated formula to drift
    val loL = graft.functions.Stats.quantileLabel(loQ)
    val hiL = graft.functions.Stats.quantileLabel(hiQ)
    val thr = graft.functions.Stats.exactQuantiles(scores, Seq(strataCol),
        "mean_logprob", Seq(loQ, hiQ))
      .withColumnRenamed(strataCol, "__thr_strata")
    // null-safe threshold join: exactQuantiles emits a NULL-stratum row
    // (groupBy keeps NULL groups), and docs with missing strata must land
    // in ITS buckets, not silently vanish from the output
    val out = scores.join(broadcast(thr),
        col(strataCol) <=> col("__thr_strata"))
      .withColumn("bucket",
        when(col("mean_logprob") <= col(loL), "tail")
          .when(col("mean_logprob") <= col(hiL), "middle")
          .otherwise("head"))
      .select(col(idCol), col(strataCol), col("mean_logprob"),
        col("bucket"))
      // materialize the final frame, then release the score checkpoint —
      // the same blocks-don't-outlive-the-call discipline as
      // Analytics.pagerank/Dedup.clusters; without this, repeated calls
      // in a long-lived session accumulate checkpoint blocks until GC
      .localCheckpoint(true)
    org.apache.spark.sql.graftglue.GraftGlue.releaseCheckpoint(scores)
    out
  }

  /** Salted pseudonymization: replace identifier columns with a stable
    * 60-bit token derived from `salt:value` via the portable hash — the
    * de-identification step before sharing a derived corpus. The same
    * (salt, value) maps to the same token across tables, engines, and
    * runs, so JOINABILITY on the pseudonym is preserved; re-identification
    * without the salt requires a dictionary attack over the id space, and
    * rotating the salt unlinks every release. NULL stays NULL. Row-local,
    * zero shuffle; replaced columns become LongType. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
                   salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    require(salt.nonEmpty, "an empty salt defeats the purpose")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNull, lit(null).cast("long"))
        .otherwise(T.portableHash64(
          concat(lit(salt), lit(":"), col(c).cast("string"))))))
  }

  /** Intra-document repetition removal: drop every line after its first
    * occurrence (order-preserving) and report the duplicated-line
    * fraction — the standard "repetition filter" companion to corpus-level
    * dedup (boilerplate, chat logs, scraped nav menus repeat WITHIN a
    * doc, which document-level fingerprints never see). Row-local; blank
    * lines count as lines. NULL text stays NULL (fraction 0.0). */
  def dedupLines(df: DataFrame, textCol: String): DataFrame = {
    val ls = col("__lines")
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("dup_line_fraction",
        when(col(textCol).isNull || size(ls) === 0, 0.0)
          .otherwise(lit(1.0) -
            size(array_distinct(ls)).cast("double") / size(ls)))
      .withColumn(s"${textCol}_deduped",
        array_join(filter(ls,
          (l, i) => array_position(ls, l) === i + 1), "\n"))
      .drop("__lines")
  }

  /** PII scrubbing: redact emails, North-American-style phone numbers,
    * IPv4 addresses and long hex secrets to typed placeholder tokens — the
    * standard pre-training redaction pass. Pure `regexp_replace` chain
    * (codegen'd, row-local, no shuffle); patterns deliberately stay inside
    * the RE2-compatible subset (no lookarounds/backrefs) so the DuckDB
    * oracle applies the IDENTICAL regexes. Order matters: emails first
    * (their local part can contain digits a later rule would mangle),
    * then IPs before phones (dotted quads contain phone-length digit
    * runs). */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val rules: Seq[(String, String)] = Seq(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
      "(?:\\+?1[-. ]?)?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>",
      "\\b[0-9a-fA-F]{32,}\\b" -> "<KEY>")
    val scrubbed = rules.foldLeft(col(textCol)) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    df.withColumn(s"${textCol}_scrubbed", scrubbed)
  }

  /** URL canonicalization for crawl curation: the same page arrives under
    * scheme/host-case variants, default ports, tracking parameters and
    * fragments — canonicalize BEFORE URL-level dedup or host statistics,
    * or every variant counts as a distinct page. Rules (each a plain
    * regexp/extract both engines apply identically — no lookarounds, no
    * replacement groups, RE2-safe):
    *   1. drop the `#fragment`;
    *   2. strip tracking parameters (`utm_*`, `fbclid`, `gclid`),
    *      whether mid-query or last;
    *   3. lowercase scheme and host (path/query case is preserved —
    *      paths are case-sensitive by spec);
    *   4. drop a default port (`:80` for http, `:443` for https; other
    *      ports survive);
    *   5. strip trailing slashes at the end of the URL (`/a/b/` = `/a/b`;
    *      a slash before a query survives).
    * Row-local, no shuffle. Non-URL rows (no `scheme://host`) pass
    * through unchanged with a NULL host. Output: input columns +
    * (url_canonical, host). */
  def canonicalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*", "")
    // "p=v&" form first (tracking param followed by another param), then
    // "[?&]p=v$" (tracking as the final param, separator included)
    val trackMid = "(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*&"
    val trackEnd = "[?&](utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*$"
    val clean = regexp_replace(regexp_replace(noFrag, trackMid, ""),
      trackEnd, "")
    val scheme = lower(regexp_extract(clean,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(clean,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = regexp_extract(hostport, "^([^:]+)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rest = regexp_replace(
      regexp_extract(clean, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1),
      "/+$", "")
    val canonical = concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")), rest)
    df.withColumn("url_canonical",
        when(scheme === "", col(urlCol)).otherwise(canonical))
      .withColumn("host", when(scheme === "", lit(null).cast("string"))
        .otherwise(host))
  }

  /** Gopher-style repetition signals: the fraction of word n-gram
    * occurrences that are repeats of an earlier occurrence
    * (`1 - distinct/total`, 0.0 for docs with no n-grams) — high values
    * flag boilerplate/loops that document-level dedup and [[dedupLines]]
    * both miss (repeats need not be line-aligned). Row-local, one pass per
    * n. */
  def repetitionStats(df: DataFrame, textCol: String,
                      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    import org.apache.spark.sql.graftglue.GraftGlue
    ns.foldLeft(df) { (d, n) =>
      // codegen NgramStatsExpr: [total, distinct] in one pass — the HOF
      // shingles + array_distinct form re-ran interpreted slice/concat
      // lambdas per window (40 s at sf0.1 for what is a scan-bound stat)
      val st = col("__st")
      d.withColumn("__st", GraftGlue.column(
          graft.functions.NgramStatsExpr(GraftGlue.expression(
            split(T.normalized(col(textCol)), "\\s+")), n)))
        .withColumn(s"dup_${n}gram_frac",
          when(col(textCol).isNull, 0.0)
            .otherwise(lit(1.0) -
              st.getItem(1).cast("double") / st.getItem(0)))
        .drop("__st")
    }
  }

  /** Sequence packing for training batches: documents are laid out as one
    * concatenated token stream per shard (deterministic `idCol` order)
    * and cut into fixed-`budget` sequences — `seq_id` is which sequence a
    * document STARTS in, `seq_offset` its token offset there (GPT-style
    * packing: a document may straddle a boundary; the loader truncates or
    * continues, this operator owns the layout). One running-sum window
    * per shard: shard by a real column (source, date) at scale so no
    * global sort exists — the window is then one shuffle on the shard
    * key, never a single-partition sort. */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    budget: Int, shardCol: String,
                    tokenCountCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // budget source: a caller-provided count column (e.g. the BPE count
    // from graft.functions.Bpe — tokenizer-faithful packing) or the
    // whitespace proxy. Either way NULL contributes zero tokens (legacy
    // size(NULL) = -1 would corrupt the running sum); exact integer
    // division — the double-going `/` would go inexact past 2^53
    // cumulative tokens
    val cnt = tokenCountCol match {
      case Some(c) => coalesce(col(c).cast("long"), lit(0L))
      case None => when(col(textCol).isNull, lit(0L))
        .otherwise(T.tokenCount(col(textCol)).cast("long"))
    }
    df.withColumn("token_count", cnt)
      .withColumn("__cum", coalesce(sum(col("token_count")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum DIV $budget"))
      .withColumn("seq_offset", (col("__cum") % budget).cast("long"))
      .drop("__cum")
  }

  /** Materialize the packed sequences [[packSequences]] lays out: rows of
    * AT MOST `budget` token ids each — what a training shard physically
    * contains. Same layout contract as [[packSequences]] (per-shard
    * deterministic `idCol` order, documents straddle sequence
    * boundaries), taken to the token level: the concatenated id stream of
    * a shard, cut every `budget` tokens, so every sequence but a shard's
    * last holds exactly `budget` ids.
    *
    * Scale shape: ONE doc-level shuffle total — the running-sum window
    * shuffles doc rows onto the shard key, and the (shard, seq) groupBy
    * reuses that same hashpartitioning (shard is a prefix of the grouping
    * key), so the posexploded token stream is grouped IN PLACE and never
    * crosses an exchange (pinned in PLANS.md: exactly one Exchange).
    * Per-group state is bounded by `budget` (the sort_array runs over
    * <= `budget` elements). NULL ids arrays contribute zero tokens.
    * Output: (shardCol, seq_id, token_ids, n_tokens). */
  def packTokenIds(df: DataFrame, idsCol: String, idCol: String,
                   budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    packFromCum(df.select(col(shardCol), col(idCol),
        coalesce(col(idsCol), array().cast("array<int>")).as("__ids"))
      .withColumn("__cum",
        coalesce(sum(size(col("__ids"))).over(w).cast("long"), lit(0L))),
      budget, shardCol)
  }

  /** The token-level tail both packers share: explode the payload at its
    * per-doc cumulative offset, cut every `budget` tokens, reassemble
    * each sequence's ids in position order. Input must carry `__ids`
    * (non-null array) and `__cum` (the shard-ordered running token count
    * BEFORE the doc). */
  private def packFromCum(withCum: DataFrame, budget: Int,
                          shardCol: String): DataFrame =
    withCum.select(col(shardCol), col("__cum"),
        posexplode(col("__ids")).as(Seq("__p", "__tok")))
      .withColumn("__gp", col("__cum") + col("__p"))
      .withColumn("seq_id", expr(s"__gp DIV $budget"))
      .withColumn("__pos", (col("__gp") % budget).cast("int"))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          _.getField("__tok")).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")))

  /** [[packTokenIds]] for SKEWED shard distributions — bit-identical
    * output, different physical plan. The default packer's one-Exchange
    * shape partitions the PAYLOAD by the shard key, so a hot shard
    * (one `source` holding most of the corpus) serializes its whole
    * token explode + group on a single task: the window, the
    * posexplode, and the map side of the final groupBy all run where
    * the shard's rows landed. Here only a NARROW (shard, id, count)
    * frame rides the skewed window — the hot task sorts ~16-byte rows,
    * not payloads — and the computed offsets rejoin the payload on the
    * (shard, id) key, which distributes by doc, not by shard. The
    * price is one extra exchange of the token stream into the final
    * (shard, seq_id) grouping (the default grouped it in place), i.e.
    * roughly 2x the data movement of the balanced plan — the wall-clock
    * win under skew is that every stage is cluster-parallel instead of
    * hot-task-serial. Measured crossover in SKEW_SCALE.json: prefer
    * this form when one shard holds more than ~a third of the corpus;
    * prefer [[packTokenIds]] otherwise. Rows must be unique on
    * (shardCol, idCol) — the offset join would multiply duplicates the
    * window form would have packed as separate rows; violations FAIL
    * LOUDLY at execution (an in-plan guard window, see [[skewCum]]),
    * never silently inflate packed shards. */
  def packTokenIdsSkewRobust(df: DataFrame, idsCol: String, idCol: String,
                             budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val base = df.select(col(shardCol), col(idCol),
      coalesce(col(idsCol), array().cast("array<int>")).as("__ids"))
    // null-safe join keys (<=>): a null shard or id groups in the
    // window form and must survive the join form identically
    val cum = skewCum(base, shardCol, idCol, "packTokenIdsSkewRobust")
    // merge hint: left to itself Spark broadcasts one side and streams
    // the other — and the streamed side is the WINDOW output, which
    // sits on the hot shard's single partition, re-serializing exactly
    // the explode this variant exists to distribute (measured: slower
    // than the default under 90% skew). The SMJ exchanges BOTH sides
    // on the per-doc join key, so the payload explode and the map side
    // of the final grouping run cluster-wide regardless of shard skew.
    packFromCum(
      base.hint("merge").join(cum, col(shardCol) <=> col("__cs")
          && col(idCol) <=> col("__ci"))
        .drop("__cs", "__ci"),
      budget, shardCol)
  }

  /** The narrow skew-robust running-count frame both skew-robust entry
    * points share: (`__cs`, `__ci`, `__cum`) — the shard-ordered running
    * token count, computed WITHOUT the payload riding the skewed window.
    *
    * Guards the documented unique-(shard, id) precondition IN-PLAN: the
    * offset join downstream would silently MULTIPLY a duplicate key's
    * payload rows (the window form packs them as separate documents),
    * and through `ShardSink.append(skewRobust = true)` that corrupts
    * persistent token mass with no error — so a duplicate key raises at
    * execution instead. The guard is a `count(*) over (shard, id)`
    * window: its clustering requirement is satisfied by the running
    * count's hash-partitioning on the shard alone and its sort by the
    * same (shard, id) order, so it adds NO exchange and NO sort to the
    * plan (pinned in BpeSpec). */
  private def skewCum(base: DataFrame, shardCol: String, idCol: String,
                      verb: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupW = Window.partitionBy(col("__cs"), col("__ci"))
    base
      .select(col(shardCol).as("__cs"), col(idCol).as("__ci"),
        size(col("__ids")).cast("long").as("__n"))
      .withColumn("__cum", coalesce(
        sum(col("__n")).over(Window.partitionBy(col("__cs"))
          .orderBy(col("__ci"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cum", when(count(lit(1)).over(dupW) > 1,
        raise_error(concat(lit(s"$verb: duplicate (shard, id) key ("),
          concat_ws(", ", col("__cs").cast("string"),
            col("__ci").cast("string")),
          lit(") - the skew-robust offset join would multiply this " +
            "key's payload rows; input must be unique on the key"))))
        .otherwise(col("__cum")))
      .drop("__n")
  }

  /** Incremental shard production: append a NEW batch of documents to an
    * existing [[packTokenIds]] layout WITHOUT repacking shipped
    * sequences — the weekly-crawl-refresh shape (the
    * [[graft.operators.Dedup.exactIncremental]] discipline applied to
    * layout). Every already-FULL sequence is untouched and keeps its
    * seq_id forever; each shard's trailing partial sequence (if any) is
    * topped up with the first new tokens, and new sequences continue
    * from there. Returns the DELTA only — the re-emitted (merged)
    * partial plus the new sequences, for shards that received new
    * documents — which the caller overwrites/appends into the shard
    * store.
    *
    * Layout contract: `existing` is a packTokenIds output (every
    * sequence but a shard's last holds exactly `budget` ids — violating
    * rows fail loudly); new documents are appended AFTER the existing
    * stream in `idCol` order. Equivalent to a full repack whenever new
    * ids sort after existing ones; when they interleave, incremental
    * deliberately trades global determinism for shipped-shard stability.
    *
    * Scale shape, two explicit phases so cost is O(new batch + shards)
    * in PAYLOAD terms, never O(existing corpus):
    * phase 1 runs ONE narrow aggregation over (shard, seq_id, n_tokens)
    * — token payloads are column-pruned out of the scan — computing the
    * per-shard audit AND tail coordinates, collected to the driver (one
    * row per shard, the bounded-collect class of the codebook loads);
    * phase 2 fetches ONLY the partial-tail rows' token ids with a keyed
    * (shard AND seq_id) filter that pushes into the parquet scans (at
    * most one row per shard; skipped entirely when no shard has a
    * partial tail). The tails become a LITERAL frame, so the downstream
    * joins never re-evaluate the existing store's plan — the earlier
    * single-plan shape re-executed the (merge-heavy) `existing` plan
    * once per consuming branch and decoded payloads it then threw away,
    * which made a 1% append cost ~24% of a full repack at n=1M
    * (SHARD_SCALE). The new batch then follows [[packTokenIds]]'s exact
    * plan — one doc-level shuffle, token stream grouped in place.
    *
    * The audit (and its two loud failures: over-budget row, non-dense /
    * mid-shard-partial seq_ids) now runs at CALL time as driver checks
    * — callers get the same exceptions, one trigger earlier. */
  def packTokenIdsIncremental(existing: DataFrame, newDocs: DataFrame,
                              idsCol: String, idCol: String,
                              budget: Int, shardCol: String,
                              skewRobust: Boolean = false): DataFrame =
    packTokenIdsIncrementalFromTails(
      shardTails(existing, budget, shardCol),
      existing.schema(shardCol), newDocs, idsCol, idCol, budget,
      shardCol, skewRobust)

  /** One shard's append coordinates: its highest committed seq_id, that
    * tail sequence's token count, and — only when the tail is PARTIAL
    * (`tailNTokens < budget`) — its token ids. Exactly the driver-side
    * state [[packTokenIdsIncrementalFromTails]] packs a new batch
    * against; [[shardTails]] derives it from a store view, and a
    * steady appender (graft.streaming.ShardSink) carries it forward
    * from each committed delta instead of re-deriving it per trigger. */
  final case class ShardTail(shard: Any, maxSeq: Long,
                             tailNTokens: Long, tailIds: Seq[Int])

  /** Phases 1+2 of [[packTokenIdsIncremental]] — audit the existing
    * store view and fetch the partial-tail payloads — returning one
    * [[ShardTail]] per shard. See packTokenIdsIncremental's scaladoc
    * for the audit contract and the two loud failures. */
  def shardTails(existing: DataFrame, budget: Int,
                 shardCol: String): Seq[ShardTail] = {
    require(budget > 0, s"budget must be positive: $budget")
    // phase 1 — the audit, narrow columns only: a corrupted/hand-edited
    // store with a mid-shard PARTIAL sequence or non-dense/duplicated
    // seq_ids would otherwise yield a silently wrong `__base` and
    // overlapping delta positions, since only the tail row feeds the
    // append math. Valid shard: seq_ids exactly {0..n-1}, at most the
    // max seq_id under budget. One collected row per shard.
    val auditRows = existing
      .select(col(shardCol).as("__s"),
        col("seq_id").cast("long").as("__sq"),
        col("n_tokens").cast("long").as("__nt"))
      .groupBy(col("__s")).agg(
        count(lit(1)).as("__an"),
        countDistinct(col("__sq")).as("__and"),
        min(col("__sq")).as("__amn"),
        max(col("__sq")).as("__amx"),
        sum(when(col("__nt") < budget, 1L).otherwise(0L)).as("__ap"),
        max(when(col("__nt") < budget, col("__sq"))).as("__apsq"),
        max(col("__nt")).as("__mnt"),
        max_by(col("__nt"), col("__sq")).as("__tnt"))
      .collect()
    val tailCoords = auditRows.map { r =>
      val s = r.get(0)
      val an = r.getLong(1); val nd = r.getLong(2)
      val amn = r.getLong(3); val amx = r.getLong(4)
      val ap = r.getLong(5)
      val apsq = if (r.isNullAt(6)) -1L else r.getLong(6)
      val mnt = r.getLong(7); val tnt = r.getLong(8)
      if (mnt > budget) throw new IllegalStateException(
        s"packTokenIdsIncremental: sequence exceeds budget $budget: $mnt")
      if (!(amn == 0L && amx == an - 1 && nd == an && ap <= 1 &&
          (ap == 0L || apsq == amx)))
        throw new IllegalStateException(
          s"packTokenIdsIncremental: corrupt shard store in shard $s: " +
            "seq_ids must be dense 0..n-1 with at most a partial tail " +
            s"(n=$an, distinct=$nd, min=$amn, max=$amx, partials=$ap)")
      (s, amx, tnt)
    }
    // phase 2 — partial-tail payloads only, fetched with a keyed filter
    // that pushes into the store's parquet scans (row-group stats on
    // seq_id skip shipped-full history); a store whose every shard ends
    // on a full sequence reads NO payloads at all
    val partials = tailCoords.filter(_._3 < budget)
    val fetchedIds: Map[Any, Seq[Int]] =
      if (partials.isEmpty) Map.empty
      else {
        val pred = partials.map { case (s, q, _) =>
          (col(shardCol) <=> lit(s)) &&
            col("seq_id").cast("long") === lit(q)
        }.reduce(_ || _)
        existing.filter(pred)
          .select(col(shardCol), col("token_ids"))
          .collect()
          .map(r => r.get(0) -> r.getSeq[Int](1).toVector.toSeq).toMap
      }
    tailCoords.toSeq.map { case (s, amx, tnt) =>
      ShardTail(s, amx, tnt,
        if (tnt < budget) fetchedIds.getOrElse(s, Seq.empty[Int])
        else Seq.empty[Int])
    }
  }

  /** Phase 3 of [[packTokenIdsIncremental]]: pack `newDocs` against the
    * given per-shard tail coordinates — the delta frame only. Callers
    * that KNOW the tails (because they committed the previous delta
    * themselves) skip the store audit/fetch entirely; `shardField` is
    * the store schema's shard column (the literal tail frame copies its
    * type and nullability). */
  def packTokenIdsIncrementalFromTails(
      tailState: Seq[ShardTail],
      shardField: org.apache.spark.sql.types.StructField,
      newDocs: DataFrame, idsCol: String, idCol: String,
      budget: Int, shardCol: String,
      skewRobust: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val spark = newDocs.sparkSession
    // the tails as a LITERAL frame — one row per shard, shard-key type
    // copied from the store schema; a PARTIAL tail re-enters the stream
    // at its own start, a full tail contributes nothing (new tokens
    // start a fresh sequence). shard keys may be NULL (the window/
    // groupBy tiers treat a null shard like any other) — every shard
    // join below goes through a single-field struct `__sk`, whose
    // equality treats null fields as equal.
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val tailRows: java.util.List[org.apache.spark.sql.Row] =
      tailState.map { case ShardTail(s, amx, tnt, ids) =>
        val partial = tnt < budget
        org.apache.spark.sql.Row(s, amx * budget + tnt,
          if (partial) amx * budget else (amx + 1) * budget,
          if (partial) ids else Seq.empty[Int])
      }.toList.asJava
    val tails = spark.createDataFrame(tailRows, StructType(Seq(
        shardField.copy(name = shardCol),
        StructField("__base", LongType, nullable = false),
        StructField("__tailStart", LongType, nullable = false),
        StructField("__tailIds", ArrayType(IntegerType),
          nullable = false))))
      .withColumn("__sk", struct(col(shardCol)))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val newBase = newDocs.select(col(shardCol), col(idCol),
      coalesce(col(idsCol), array().cast("array<int>")).as("__ids"))
    // skewRobust: the [[packTokenIdsSkewRobust]] trick applied to the
    // batch's running count — only a narrow (shard, id, count) frame
    // rides the shard-skewed window; offsets rejoin the payload on the
    // per-doc key. Bit-identical __cum, hot shard no longer serial.
    val newCum =
      if (!skewRobust)
        newBase.withColumn("__cum",
          coalesce(sum(size(col("__ids"))).over(w).cast("long"), lit(0L)))
      else {
        val cum = skewCum(newBase, shardCol, idCol,
          "packTokenIdsIncremental(skewRobust)")
        // merge hint: see packTokenIdsSkewRobust — a broadcast here
        // streams the hot shard's window partition and re-serializes
        newBase.hint("merge").join(cum, col(shardCol) <=> col("__cs")
            && col(idCol) <=> col("__ci"))
          .drop("__cs", "__ci")
      }
    val withCum = newCum
      .withColumn("__sk", struct(col(shardCol)))
      .join(broadcast(tails.drop(shardCol)), Seq("__sk"), "left")
      .withColumn("__base", coalesce(col("__base"), lit(0L)))
    val newTok = withCum
      .select(col(shardCol), (col("__base") + col("__cum")).as("__ds"),
        posexplode(col("__ids")).as(Seq("__p", "__tok")))
      .select(col(shardCol), (col("__ds") + col("__p")).as("__gp"),
        col("__tok"))
    // the partial tail's ids re-enter ONLY for shards with new docs
    val tailTok = tails
      .join(newDocs.select(struct(col(shardCol)).as("__sk")).distinct(),
        Seq("__sk"))
      .select(col(shardCol), col("__tailStart"),
        posexplode(col("__tailIds")).as(Seq("__p", "__tok")))
      .select(col(shardCol), (col("__tailStart") + col("__p")).as("__gp"),
        col("__tok"))
    newTok.unionByName(tailTok)
      .withColumn("seq_id", expr(s"__gp DIV $budget"))
      .withColumn("__pos", (col("__gp") % budget).cast("int"))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          _.getField("__tok")).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")))
  }

  /** Per-domain quota cap: keep at most `quota` documents per host,
    * lowest-`idCol` first — the crawl-curation guard against any single
    * domain dominating the training mix (a handful of mega-hosts can be
    * half a crawl). Deterministic: a row's fate depends only on its host,
    * its id, and the ids of its host-mates below it.
    *
    * Scale shape: ONE shuffle on the host key. The `row_number <= quota`
    * filter is the exact pattern Spark's `InferWindowGroupLimit` rewrites
    * into a partial `WindowGroupLimit` BELOW the exchange (pinned in
    * CurateSpec): each map partition forwards at most `quota` rows per
    * host, so a 100M-page host ships `quota x numPartitions` rows through
    * the shuffle, not 100M. row_number's Int rank cannot overflow under
    * that prune (at most quota x partitions rows survive per host). */
  def domainQuota(df: DataFrame, hostCol: String, idCol: String,
                  quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1: $quota")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(hostCol)).orderBy(col(idCol))))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Disjoint deterministic corpus split (train/val/test): each row gets
    * the label of the hash interval its [[sampleHash]] falls in —
    * complementary ranges of ONE salt, exactly the discipline
    * [[hashSample]]'s doc prescribes, so splits are disjoint and exhaustive
    * BY CONSTRUCTION (never two independent coin flips that can both come
    * up heads). Growth-stable: adding documents never moves an existing
    * document between splits, so eval sets stay leak-free across corpus
    * versions. Weights must sum to 1 (+-1e-9); the last split absorbs the
    * hash-space remainder so every row is labeled. Row-local, no shuffle. */
  def splitCorpus(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "graft"): DataFrame =
    df.withColumn("split", splitLabelFor(sampleHash(idCol, salt), splits))

  /** The hash-interval split labeling shared by [[splitCorpus]] and
    * [[leakSafeSplit]] (validates the split spec once, here). */
  private def splitLabelFor(h: Column,
                            splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, s"need at least 2 splits: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names collide: ${splits.map(_._1)}")
    splits.foreach { case (n, w) =>
      require(w > 0.0 && w <= 1.0, s"weight for '$n' must be in (0,1]: $w") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1: $total")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(h < math.round(c * two60), name).otherwise(acc)
    }
  }

  /** LEAK-SAFE corpus split: like [[splitCorpus]], but every near-dup
    * CLUSTER lands in one split — the split hash is taken over the
    * cluster's representative id ([[Dedup.clusters]] min-label), not the
    * row's own id. This closes the classic eval-leak hole: a document and
    * its near-duplicate can never straddle train/test, which per-row
    * hashing cannot guarantee no matter the salt. Rows that pair with
    * nothing hash by their own id, so `leakSafeSplit(df, emptyPairs) ==
    * splitCorpus(df)` — the guarantee composes with growth-stability.
    *
    * Scale shape: the label frame is pairs-bounded (unhinted join, AQE
    * broadcasts when duplication is light); the labeling itself is
    * row-local. One extra join over [[splitCorpus]], nothing else. */
  def leakSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                    splits: Seq[(String, Double)],
                    salt: String = "graft", maxIter: Int = 10): DataFrame = {
    val labels = Dedup.clusters(pairs, maxIter)
      .select(col("id").as("__cid"), col("cluster").as("__cl"))
    val h = T.portableHash64(concat(lit(salt), lit(":"),
      coalesce(col("__cl"), col(idCol)).cast("string")))
    df.join(labels, col(idCol) === col("__cid"), "left")
      .withColumn("split", splitLabelFor(h, splits))
      .drop("__cid", "__cl")
  }

  /** Deterministic epoch shuffle for training order: every row gets a
    * shard and a dense position inside that shard, drawn from ONE salted
    * [[sampleHash]] — the reproducible global permutation an LLM training
    * run needs (re-running with the same salt replays the exact data
    * order; a new salt = a fresh independent epoch permutation; document
    * ids never decide order directly, so corpus sort bias cannot leak
    * into the curriculum).
    *
    * Scale shape: ONE hash-key exchange (partition by shard) + a
    * within-shard sort — no global total order, no single-reducer
    * bottleneck; shards are written/read independently by the trainer.
    * Position ties are impossible (hash ties break by id). Output: input
    * rows + (shard, pos), pos starting at 0 per shard. */
  def trainingOrder(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = "graft-epoch0"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val h = sampleHash(idCol, salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("__shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("shard", col("__shard").cast("long"))
      .drop("__h", "__shard")
  }

  /** Sliding-window token chunker: each document becomes overlapping
    * chunks of `chunkSize` tokens every `stride` tokens (the RAG /
    * embedding-index layout; `stride = chunkSize` gives disjoint chunks).
    * Chunk starts are 0, stride, 2*stride, ... and the LAST chunk starts
    * at the first offset that reaches the end of the document, so every
    * token is covered and no start lies beyond the text. Documents with no
    * tokens (empty or NULL text) emit no chunks.
    *
    * Scale shape: pure row-local generate — the token array is bound ONCE
    * per row, chunk texts are `slice` views of it, and no shuffle exists
    * at all; output size is input tokens x (chunkSize/stride) by
    * construction. Output: (idCol, chunk_id, chunk_text, n_tokens). */
  def chunkSliding(df: DataFrame, textCol: String, idCol: String,
                   chunkSize: Int, stride: Int,
                   tokensCol: Option[String] = None,
                   joinSep: String = " "): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: $stride")
    val tks = col("__toks")
    val n = size(tks)
    val nChunks = when(n <= chunkSize, lit(1L)).otherwise(
      lit(1L) + ceil((n - chunkSize).cast("double") / stride).cast("long"))
    // token source: a caller-provided array column (e.g. BPE tokens via
    // graft.functions.Bpe — then pass joinSep="" so chunk_text re-joins
    // the merged-char encoding losslessly) or the whitespace tokenizer
    val toks = tokensCol match {
      case Some(c) => col(c)
      case None => T.tokens(T.normalized(col(textCol)))
    }
    // "no tokens" must include a caller-supplied [""] — the shape an
    // empty-string BPE encoding takes after split("", "") — or an empty
    // doc would emit one chunk with n_tokens=1 (diverging from the
    // oracle's length(enc) > 0 semantics)
    df.withColumn("__toks", toks)
      .filter(size(tks) > 0 &&
        !(size(tks) === 1 && length(element_at(tks, 1)) === 0))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), nChunks - 1), i => struct(
          array_join(slice(tks, (i * stride + 1).cast("int"),
            lit(chunkSize)), joinSep).as("chunk_text"),
          least(lit(chunkSize.toLong), n.cast("long") - i * stride)
            .as("n_tokens")))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col.chunk_text"), col("col.n_tokens"))
  }

  /** Ingest-time curation for a STREAM: the language/quality/null gates
    * are stateless row filters, and exact-dup removal becomes a
    * watermark-bounded state-store dedup on the content fingerprint
    * (first ARRIVAL wins — a stream has no lowest-id retrospect; the
    * batch [[curate]] over the landed corpus remains the replay-safe
    * authority, mirroring the reference's D1-then-warehouse-guard
    * layering). State is one fingerprint per distinct doc inside the
    * watermark, evicted as event time advances. */
  def curateStream(df: DataFrame, textCol: String, tsCol: String,
                   keepLangs: Seq[String], minQuality: Double,
                   delay: String = "1 hour"): DataFrame =
    df.filter(col(textCol).isNotNull &&
        T.langId(col(textCol)).isin(keepLangs.map(lit(_)): _*) &&
        T.qualityScore(col(textCol)) >= minQuality)
      .withColumn("__fp", T.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  /** Weight-proportional deterministic Bernoulli sample: each row keeps
    * with probability min(1, scale * weight) — the "sample proportional
    * to token count / quality score" corpus thinning, with all of
    * [[hashSample]]'s guarantees (reproducible across engines and runs,
    * growth-stable, nested in `scale`: raising scale only ADDS rows).
    * Row-local: the per-row threshold is floor(p * 2^60) computed from
    * the weight column with the same IEEE double ops an oracle replays.
    * NULL or non-positive weights never sample. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     scale: Double, salt: String = "graft"): DataFrame = {
    require(scale > 0.0, s"scale must be positive: $scale")
    val p = least(lit(1.0), lit(scale) * col(weightCol))
    val thr = floor(p * two60).cast("long")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0.0 &&
      sampleHash(idCol, salt) < thr)
  }

  /** Corpus MIXTURE construction: deterministically downsample each
    * stratum so the surviving corpus approaches `targetShares` under a
    * `budget`-document total — the "reweight web vs books vs code"
    * step every pretraining mix needs. Stratum s of size n_s keeps
    * rate_s = min(1, budget * share_s / n_s); an under-represented
    * stratum saturates at keeping EVERYTHING (rate 1) rather than
    * upsampling, the standard no-duplication discipline. Strata absent
    * from `targetShares` are dropped (share 0).
    *
    * Selection hashes like [[hashSample]] (same salt discipline), so the
    * mix is growth-stable and nested across budgets: raising the budget
    * only ADDS documents. ONE count aggregation (|strata| rows to the
    * driver) fixes the rates; the filter itself is row-local. Thresholds
    * use floor (not round) so an oracle can mirror the arithmetic
    * exactly. */
  def mixCorpus(df: DataFrame, strataCol: String, idCol: String,
                targetShares: Map[String, Double], budget: Long,
                salt: String = "graft",
                weightCol: Option[String] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(targetShares.nonEmpty, "need at least one stratum share")
    targetShares.foreach { case (s, w) =>
      require(w > 0.0 && w <= 1.0, s"share for '$s' must be in (0,1]: $w") }
    val total = targetShares.values.sum
    require(math.abs(total - 1.0) < 1e-9, s"shares must sum to 1: $total")
    // weightCol (e.g. a BPE token count from graft.functions.Bpe) switches
    // the budget to WEIGHT units: stratum mass n_s = sum(weight), rate_s =
    // min(1, budget * share_s / n_s), selection still per-document by the
    // same portable hash — expected kept mass per stratum = budget*share_s,
    // i.e. token-budgeted mixing with all of the doc-count mode's
    // determinism/nesting guarantees
    val counts = strataCounts(df, strataCol, targetShares.keys.toSeq, weightCol)
    val thresholds = targetShares.flatMap { case (s, share) =>
      counts.get(s).map { n =>
        val rate = math.min(1.0, budget.toDouble * share / n.toDouble)
        s -> math.floor(rate * two60).toLong
      }
    }
    val thrCol = thresholds.foldLeft(lit(0L)) { case (acc, (s, thr)) =>
      when(col(strataCol) === s, thr).otherwise(acc)
    }
    df.filter(sampleHash(idCol, salt) < thrCol)
  }

  /** Deterministic ON-CLUSTER classifier training: full-batch perceptron
    * (Rosenblatt's rule, the public algorithm) over INTEGER feature
    * columns with labels in {-1, +1} — the trainable half of the quality
    * -classifier story ([[classifierScore]] applies a model; this fits
    * one). Each epoch computes the batch update
    * `w += sum over misclassified rows of (y * x)` in one map-side
    * -combined aggregation; a row is misclassified iff
    * `y * (w . x + b) <= 0`. All arithmetic is integer (margins in
    * decimal(38,0) so a 10^9-row corpus with 10^6-unit features cannot
    * overflow), so every engine replays the trajectory bit-exactly — no
    * learning-rate float, no sigmoid, no libm.
    *
    * Scale shape: `epochs` passes over the corpus, each ONE aggregation
    * to a single (F+2)-column row; the weight vector lives on the driver
    * between epochs (F is feature count — bounded by construction).
    * Deterministic: integer sums are associative-commutative, so
    * partitioning and row order cannot change the result. Rows with a
    * NULL label or NULL feature contribute NOTHING (margin and update
    * predicates are null-propagating) — pre-clean or impute features if
    * every row must vote.
    * Output: one row per epoch — (epoch, b, w_<feature>..., n_updates)
    * where n_updates counts that epoch's misclassified rows. */
  def trainPerceptron(df: DataFrame, featureCols: Seq[String],
                      labelCol: String, epochs: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    perceptronEpochs(df, featureCols, labelCol, epochs)
      .map { case (e, bb, ww, n) => (e.toLong, bb, ww, n) }
      .toDF("epoch", "b", "w", "n_updates")
      .select((col("epoch") +: col("b") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          col("w")(i).as(s"w_$c") } :+ col("n_updates")): _*)
  }

  /** The [[trainPerceptron]] loop itself: one (F+2)-column aggregation
    * per epoch, weights on the driver between epochs. */
  private def perceptronEpochs(df: DataFrame, featureCols: Seq[String],
                               labelCol: String,
                               epochs: Int): Seq[(Int, Long, Seq[Long], Long)] = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(epochs >= 1 && epochs <= 64, s"epochs out of range: $epochs")
    val feats = df.select(
      (col(labelCol).cast("long").as("__y") +:
        featureCols.map(c => col(c).cast("long").as(s"__x_$c"))): _*)
    var b = 0L
    var w = featureCols.map(_ => 0L)
    val rows = Seq.newBuilder[(Int, Long, Seq[Long], Long)]
    (1 to epochs).foreach { epoch =>
      // margin in decimal(38,0): |w| can reach epochs * sum|x|, so the
      // dot product must not be computed in long
      val margin = featureCols.zip(w).foldLeft(
          lit(b).cast("decimal(38,0)")) { case (acc, (c, wi)) =>
        acc + col(s"__x_$c").cast("decimal(38,0)") * lit(wi) }
      val mis = (col("__y") * margin) <= 0
      val aggs =
        sum(when(mis, col("__y")).otherwise(0L)).as("__db") +:
        featureCols.map(c => sum(when(mis,
          col("__y") * col(s"__x_$c")).otherwise(0L)).as(s"__dw_$c")) :+
        sum(when(mis, 1L).otherwise(0L)).as("__n")
      val r = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
      b += Option(r.getAs[Long]("__db")).getOrElse(0L)
      w = featureCols.zip(w).map { case (c, wi) =>
        wi + Option(r.getAs[Long](s"__dw_$c")).getOrElse(0L) }
      rows += ((epoch, b, w, Option(r.getAs[Long]("__n")).getOrElse(0L)))
    }
    rows.result()
  }

  /** Fit and return just the FINAL weights `(b, w)` — the handoff from
    * training to serving ([[applyPerceptron]]). Same loop, same
    * bit-exact arithmetic as [[trainPerceptron]]. */
  def fitPerceptron(df: DataFrame, featureCols: Seq[String],
                    labelCol: String, epochs: Int = 5): (Long, Seq[Long]) = {
    val last = perceptronEpochs(df, featureCols, labelCol, epochs).last
    (last._2, last._3)
  }

  /** Batch inference with a fitted perceptron: adds `margin`
    * (decimal(38,0) — exact) and `prediction` (+1 when margin > 0 else
    * -1; the boundary convention mirrors training, where margin <= 0
    * counts as misclassified for a +1 row). ROW-LOCAL: weights ride in
    * as literals, no shuffle, no driver involvement — the corpus-scale
    * half of the train/apply pair. NULL features yield NULL margin and
    * NULL prediction (no silent class assignment). */
  def applyPerceptron(df: DataFrame, featureCols: Seq[String],
                      b: Long, w: Seq[Long]): DataFrame = {
    require(w.size == featureCols.size,
      s"weight count ${w.size} != feature count ${featureCols.size}")
    val margin = featureCols.zip(w).foldLeft(
        lit(b).cast("decimal(38,0)")) { case (acc, (c, wi)) =>
      acc + col(c).cast("decimal(38,0)") * lit(wi) }
    df.withColumn("margin", margin)
      .withColumn("prediction",
        when(col("margin") > 0, 1L)
          .when(col("margin") <= 0, -1L))
  }

  /** Stratum sizes for [[mixCorpus]]: pre-filters to the target strata
    * BEFORE the groupBy/collect, so the driver materialization is
    * |targetStrata|-bounded regardless of the stratum column's cardinality
    * (a raw groupBy-collect over e.g. a URL-host column would be a
    * driver-scale collect; dropped strata need no counts anyway).
    * Package-visible so the spec can pin the bound directly. */
  private[graft] def strataCounts(df: DataFrame, strataCol: String,
                                  targetStrata: Seq[String],
                                  weightCol: Option[String] = None): Map[String, Long] = {
    val mass = weightCol match {
      case Some(w) => sum(coalesce(col(w).cast("long"), lit(0L)))
      case None => count(lit(1))
    }
    df.filter(col(strataCol).isin(targetStrata.map(lit(_)): _*))
      .groupBy(col(strataCol)).agg(mass.as("__n"))
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull ->
        r.getLong(1)).toMap
  }

  /** Per-group deterministic k-sample via the
    * [[graft.functions.BottomKSampleAgg]] bounded-heap aggregate: k
    * uniform, growth-stable examples per group, ranked by the SAME
    * portable hash as [[sampleHash]]. Unlike a rank-window sample, only
    * k items per group per map partition ever cross the shuffle.
    * Output: (groupCols..., sample array<string> hash-ascending). */
  def groupSample(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int, salt: String = "graft"): DataFrame = {
    import org.apache.spark.sql.graftglue.GraftGlue
    df.groupBy(groupCols.map(col): _*)
      .agg(GraftGlue.column(graft.functions.BottomKSampleAgg(
          GraftGlue.expression(col(valueCol).cast("string")), k, salt)
        .toAggregateExpression()).as("sample"))
  }
  /** Bit-interleaved Morton (Z-order) value over `cols`, each already
    * scaled into `[0, 2^bitsPer)`: bit i of column j lands at position
    * `i * cols.size + j`. Built from native shift/mask expressions — the
    * whole interleave stays inside whole-stage codegen; no UDF, no custom
    * expression needed. `cols.size * bitsPer` must fit a signed long. */
  def zorderValue(cols: Seq[Column], bitsPer: Int): Column = {
    require(cols.nonEmpty, "zorderValue needs at least one column")
    require(bitsPer >= 1 && cols.size * bitsPer <= 63,
      s"${cols.size} cols x $bitsPer bits must be in [1, 63]")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPer
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Multi-dimensional clustering layout for data skipping: scale each
    * cluster column to its [min, max] range, interleave into a Z-order
    * value, then range-partition and sort by it — so every output file
    * covers a small hyper-rectangle of the clustered dimensions and a
    * reader's min/max (or partition-range) pruning skips most files for
    * point/range predicates on ANY prefix-free subset of the dimensions,
    * not just a lexicographic sort's leading column.
    *
    * Scale shape: ONE min/max aggregation (2N scalars to the driver — the
    * legitimate literal collection), then exactly the one range-exchange
    * any global sort pays; the z-computation itself is row-local codegen.
    * Constant columns scale to 0 and cost no bits in practice. Output:
    * the input rows, clustered; the z column is internal and dropped. */
  def zorderLayout(df: DataFrame, clusterCols: Seq[String],
                   numPartitions: Int, bitsPer: Int = 16): DataFrame = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    val aggs = clusterCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bitsPer) - 1
    val scaled = clusterCols.zipWithIndex.map { case (c, j) =>
      // all-NULL or constant columns contribute a constant 0 lane
      if (mm.isNullAt(2 * j) || mm.isNullAt(2 * j + 1) ||
          mm.getDouble(2 * j) == mm.getDouble(2 * j + 1)) lit(0L)
      else {
        val mn = mm.getDouble(2 * j); val mx = mm.getDouble(2 * j + 1)
        floor((col(c).cast("double") - mn) * (top.toDouble / (mx - mn)))
          .cast("long")
      }
    }
    df.withColumn("__z", zorderValue(scaled, bitsPer))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
