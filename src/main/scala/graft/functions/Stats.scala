package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistics over groups, exactly and distributed: the discrete
  * quantile (type-1, value at rank ceil(p*n)) via a rank window plus a
  * conditional aggregate — no `collect_list`, no driver-side sort, no
  * approximation. Cost is ONE shuffle on the group key (the rank window
  * and the final aggregate share it); ties need no tiebreak because every
  * permutation of equal values puts the same VALUE at the quantile rank.
  * For quick dashboards at 100 TB prefer `approx_percentile` (sketch,
  * no per-group sort); this is the exact contract the oracle checks. */
object Stats {

  /** Output-column label for quantile p in [[exactQuantiles]] — the ONE
    * place the formatting lives; callers that need to reference the
    * threshold columns (e.g. Curate.perplexityBuckets) use this instead
    * of re-deriving the formula and risking silent drift. */
  def quantileLabel(p: Double): String = s"p${math.round(p * 100)}"

  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0,1]: $ps")
    val labels = ps.map(quantileLabel)
    require(labels.distinct.size == labels.size,
      s"quantile labels collide (sub-percent resolution): $ps -> $labels")
    val grp = groupCols.map(col)
    // LONG rank via a running count — row_number() is Int and would wrap
    // past 2^31 rows per group, silently corrupting the match
    val rn = count(lit(1)).over(
      Window.partitionBy(grp: _*).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val n = count(lit(1)).over(Window.partitionBy(grp: _*))
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", rn).withColumn("__n", n)
    val aggs = ps.zip(labels).map { case (p, label) =>
      max(when(col("__rn") === ceil(lit(p) * col("__n")), col(valueCol)))
        .as(label)
    }
    ranked.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group winsorization: clamp `valueCol` into the group's exact
    * [pLo, pHi] quantile band — the standard outlier treatment before
    * means/regressions on heavy-tailed metrics (latencies, doc lengths).
    * Thresholds come from [[exactQuantiles]] (same type-1 contract), so
    * the whole pass is the quantile shuffle plus a BROADCAST join of the
    * one-row-per-group threshold frame back onto the data — the data
    * itself is never shuffled a second time.
    *
    * Clamping is pure VALUE SELECTION (a when-chain, no arithmetic), so
    * winsorized values are bit-identical to inputs or thresholds — exactly
    * mirrorable by a SQL oracle. NULL values pass through NULL; rows of
    * groups with no non-null values keep their value unclamped (their
    * thresholds do not exist). Output: input columns + `lo_threshold`,
    * `hi_threshold`, `<valueCol>_w`. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 < pLo < pHi <= 1: ($pLo, $pHi)")
    val thr = exactQuantiles(df, groupCols, valueCol, Seq(pLo, pHi))
      .withColumnRenamed(s"p${math.round(pLo * 100)}", "lo_threshold")
      .withColumnRenamed(s"p${math.round(pHi * 100)}", "hi_threshold")
    val v = col(valueCol)
    df.join(broadcast(thr), groupCols, "left")
      .withColumn(s"${valueCol}_w",
        when(v.isNull || col("lo_threshold").isNull, v)
          .when(v < col("lo_threshold"), col("lo_threshold"))
          .when(v > col("hi_threshold"), col("hi_threshold"))
          .otherwise(v))
  }
  /** Key-skew diagnosis: the topN heaviest keys with exact counts and
    * parts-per-million share — the report you run BEFORE choosing a
    * partition/salt strategy (a key above ~1/numPartitions share will
    * straggle its shuffle; see [[graft.operators.Joins.saltedJoin]]).
    *
    * Scale shape: one map-side-combined count shuffle on the key, then a
    * TakeOrdered top-N (never an unpartitioned window over all keys) and
    * one scalar count job for the denominator. Share uses integer ppm
    * arithmetic — exact at any corpus size, no double rounding. Output:
    * (keyCols..., cnt, share_ppm, rank), rank 1 = heaviest, ties broken
    * by key ascending. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String],
                    topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(topN >= 1, s"topN must be >= 1: $topN")
    val keyOrder = keyCols.map(col(_).asc)
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val top = counts
      .orderBy(col("cnt").desc +: keyOrder: _*)
      .limit(topN)
    // denominator from the grouped-counts frame itself, NOT a second
    // df.count() scan: both the top-N cut and the total re-aggregate the
    // SAME partial-agg + exchange subtree, so ReuseExchange runs the
    // input scan once. No driver materialization either — |keys| is
    // unbounded at corpus scale, so caching the grouped frame is not an
    // option. greatest(...,1) keeps the empty-input division defined.
    val totalDf = counts
      .agg(greatest(coalesce(sum(col("cnt")), lit(0L)), lit(1L))
        .as("__total"))
    // rank over the topN-row cut WITHOUT a window: an empty-partition
    // WindowExec is the global-window WARN shape (and a lit() partition
    // key constant-folds back to it) — collapse the cut into one sorted
    // array and posexplode, same as Relevance.bm25Rank. Sort key
    // (-cnt, keys...) ascending == (cnt desc, keys asc).
    val withShare = top.crossJoin(totalDf).withColumn("share_ppm",
      ((col("cnt") * lit(1000000L)).cast("decimal(38,0)") / col("__total"))
        .cast("long"))
    val packed = struct(
      (-col("cnt")).as("__nc") +: keyCols.map(col) :+ col("share_ppm"): _*)
    withShare.agg(sort_array(collect_list(packed)).as("__r"))
      .select(posexplode(col("__r")))
      .select(keyCols.map(k => col(s"col.$k")) ++ Seq(
        (-col("col.__nc")).as("cnt"), col("col.share_ppm").as("share_ppm"),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }
  /** Per-group embedding centroid + dispersion, one dimension per row —
    * the embedding-space audit behind semantic clustering / whitening /
    * drift detection: for each (group, dim), the mean and population
    * variance of that coordinate over values quantized to
    * `1/unitsPerValue` (default 1e-9 — the float32 noise floor for
    * unit-scale embeddings, exact for typical stored values).
    *
    * Why quantize: casting arbitrary DOUBLEs to DECIMAL rounds, and
    * engines disagree on the rounding of near-tie values (observed as a
    * 1e-14 cross-engine drift) — whereas `(x * unitsPerValue) cast long`
    * TRUNCATES, which every engine defines identically, and the integer
    * sums after it are exact under any order/partitioning. The derived
    * moments are then bit-deterministic across engines AND partition
    * layouts. Per-element units must stay within long range
    * (|x| * unitsPerValue < 2^63); squares accumulate in DECIMAL(38,0).
    *
    * Scale shape: `posexplode` fans each vector into (dim, value) rows —
    * row-local, no data shuffle yet — then ONE map-side-combined
    * aggregation on the compact (group, dim) key; integer/decimal partials
    * are cheaper than per-element decimal casts. Vectors are validated to
    * have exactly `dim` entries (a ragged corpus fails loudly, not with
    * silently misaligned statistics). NULL vectors are skipped.
    * Output: (groupCols..., dim, n, mean, variance). */
  def embeddingCentroids(df: DataFrame, vecCol: String,
                         groupCols: Seq[String], dim: Int,
                         unitsPerValue: Double = 1e9): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    require(unitsPerValue > 0.0, s"unitsPerValue must be > 0: $unitsPerValue")
    val grp = groupCols.map(col)
    val exploded = df.filter(col(vecCol).isNotNull)
      // ragged-vector guard, row-local and loud: a wrong-width vector
      // would silently misalign every dim statistic after it
      .withColumn("__v", when(size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(lit(s"embeddingCentroids: expected " +
          s"$dim-dim vector, got "), size(col(vecCol)).cast("string")))))
      .select(grp :+ posexplode(col("__v")): _*)
      .withColumnsRenamed(Map("pos" -> "dim", "col" -> "__x"))
      .withColumn("dim", col("dim").cast("long"))
      // double->long cast truncates toward zero: the one float->fixed-point
      // step every engine agrees on bit-for-bit. The magnitude gate runs on
      // the DOUBLE (a long-cast saturates extreme negatives to
      // Long.MinValue, whose abs is still negative — gating after the cast
      // would wave exactly those values through); |q| < 1e14 keeps
      // q^2 <= 1e28, giving the decimal(38,0) sum of squares 10 digits of
      // row headroom per (group, dim) before overflow would NULL it
      // silently under ansi=false. NULL elements inside a vector also fail
      // loudly — moments over silently-skipped dirty elements would
      // misreport every statistic of that dimension.
      .withColumn("__q", {
        val scaled = col("__x").cast("double") * unitsPerValue
        when(col("__x").isNull, raise_error(lit(
          "embeddingCentroids: NULL element inside a vector — clean or " +
            "impute before computing moments")))
          .when(abs(scaled) < 1e14, scaled.cast("long"))
          .otherwise(raise_error(concat(
            lit(s"embeddingCentroids: |value| * $unitsPerValue exceeds " +
              "1e14 units (sum-of-squares overflow risk) — lower " +
              "unitsPerValue; value: "), col("__x").cast("string"))))
      })
    val u = lit(unitsPerValue)
    exploded
      .groupBy((grp :+ col("dim")): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__q").cast("decimal(38,0)")).as("__s"),
        sum(col("__q").cast("decimal(19,0)") *
          col("__q").cast("decimal(19,0)")).as("__s2"))
      // division order matters for bit-parity: (sum -> /n -> /units),
      // mirrored exactly by the oracle generator
      .withColumn("mean", col("__s").cast("double") / col("n") / u)
      .withColumn("variance",
        col("__s2").cast("double") / col("n") / (u * u) -
          col("mean") * col("mean"))
      .drop("__s", "__s2")
  }

  /** Whitening apply-step: per-dimension standardization
    * `(x - mean_d) / std_d` with the corpus moments from
    * [[embeddingCentroids]] (global, no grouping) — the normalization
    * before cosine/IVF indexing when dimensions have unequal spread.
    *
    * Scale shape: the moments frame is DIM-BOUNDED (one row per
    * dimension, 64–4096 rows), so it is collected once and inlined as
    * constant-folded literal arrays; the corpus pass is then a pure
    * row-local projection — no join, no second shuffle (the documented
    * bounded-collect exception, like scd1Partitioned's partition list).
    * `std_d = sqrt(max(variance_d, eps))` floors zero-variance dims;
    * sqrt/subtract/divide are IEEE-correctly-rounded on both engines, so
    * standardized values are bit-deterministic. NULL vectors pass through
    * NULL. Output: input + `<vecCol>_std` (array<double>). */
  def standardizeEmbeddings(df: DataFrame, vecCol: String, dim: Int,
                            unitsPerValue: Double = 1e9,
                            eps: Double = 1e-12): DataFrame = {
    require(eps > 0.0, s"eps must be > 0: $eps")
    val stats = embeddingCentroids(df, vecCol, Nil, dim, unitsPerValue)
      .select(col("dim"), col("mean"), col("variance"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(stats.length == dim,
      s"expected $dim dimension rows, got ${stats.length}")
    val means = array(stats.map(s => lit(s._2)): _*)
    val stds = array(stats.map(s =>
      lit(math.sqrt(math.max(s._3, eps)))): _*)
    df.withColumn(s"${vecCol}_std",
      transform(col(vecCol), (x, i) =>
        (x.cast("double") - element_at(means, i + 1)) /
          element_at(stds, i + 1)))
  }

  /** Order-independent table checksum — the cross-engine "did the
    * migration/compaction/rewrite preserve the data" audit. Each row is
    * canonically serialized (columns joined on \u0001, NULL encoded as
    * \u0002 — distinct from any cast output), hashed with the portable
    * 60-bit md5, and the hashes are summed in DECIMAL(38,0): exact and
    * commutative, so the checksum is identical across engines, partition
    * layouts, and row orders (capacity ~1e38 / 2^60 ≈ 8e19 rows).
    * Output is ONE row: n_rows, checksum (decimal as string), and a NULL
    * count per audited column.
    *
    * Scale shape: row-local hashing + a single partial-aggregated scalar
    * agg — no shuffle of data, only of 1-row partials. Restrict audited
    * columns to types with stable canonical casts (integers, strings,
    * dates); float-to-string rendering differs across engines. */
  def tableChecksum(df: DataFrame, cols: Seq[String],
                    portable: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to checksum")
    import graft.functions.{TextFunctions => T}
    val rowStr = concat_ws("\u0001", cols.map(c =>
      when(col(c).isNull, lit("\u0002"))
        .otherwise(col(c).cast("string"))): _*)
    // same Fast/Portable discipline as the sketch family: Portable (md5)
    // is the DuckDB-mirrorable audit hash; Fast (xxhash64) is the
    // intra-Spark production mode (~3-5x cheaper hashing), equally
    // order/partition-independent but not cross-engine
    val rowHash = if (portable) T.portableHash64(rowStr)
                  else xxhash64(rowStr)
    val aggs =
      sum(rowHash.cast("decimal(38,0)")).cast("string")
        .as("checksum") +:
      cols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
