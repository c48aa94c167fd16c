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
                    budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // NULL text contributes zero tokens (legacy size(NULL) = -1 would
    // corrupt the running sum); exact integer division — the double-going
    // `/` would go inexact past 2^53 cumulative tokens
    df.withColumn("token_count",
        when(col(textCol).isNull, lit(0L))
          .otherwise(T.tokenCount(col(textCol)).cast("long")))
      .withColumn("__cum", coalesce(sum(col("token_count")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum DIV $budget"))
      .withColumn("seq_offset", (col("__cum") % budget).cast("long"))
      .drop("__cum")
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
}
