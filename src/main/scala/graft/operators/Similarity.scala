package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north_star; `embeddings.parquet`: `vec_id,
  * embedding: array<float>, label`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small) probe
  *    set against the corpus; cost O(|corpus| * |probes|), fully codegen'd,
  *    embarrassingly parallel, no shuffle except the final per-probe top-k.
  *  - [[lshTopK]] — the scale path: sign-LSH bucket the corpus once
  *    (a cheap narrow map), join probes to their bucket (one shuffle on the
  *    bucket key), rank within buckets. At 100 TB the corpus-side bucketing
  *    is written once and reused across probe batches.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe. Probes are broadcast —
    * the corpus is never shuffled; the only exchange is the per-probe
    * top-k (a window over probe_id, bounded by k via rank filter).
    * Ties break deterministically by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        V.cosine(col("pv"), col("cv")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors whose
    * sign-bucket is within Hamming distance <= multiprobe of the probe's
    * bucket (multiprobe=0 -> same bucket only). Exact cosine ranks the
    * candidates. Recall rises with multiprobe / falls with nBits. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nBits: Int = 8, multiprobe: Int = 1, dim: Int = 64,
              seed: Long = 42L, vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    val planes = V.randomPlanes(nBits, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      V.signBucket(col(vecCol), planes).as("cb"))
    // expand each probe to its bucket + all Hamming<=multiprobe neighbors
    val baseBuckets = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("pv"), V.signBucket(col(vecCol), planes).as("b0"))
    val probeBuckets =
      if (multiprobe == 0) baseBuckets.withColumn("pb", col("b0"))
      else baseBuckets.withColumn("pb",
        explode(array((col("b0") +: (0 until nBits).map(i =>
          col("b0").bitwiseXOR(lit(1L << i)))): _*)))
    val scored = c.join(broadcast(probeBuckets), col("cb") === col("pb"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        V.cosine(col("pv"), col("cv")).as("cos"))
      .dropDuplicates("probe_id", "neighbor_id")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
