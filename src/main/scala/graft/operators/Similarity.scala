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

  /** All XOR masks over `nBits` bits with popcount <= radius, ascending —
    * i.e. the Hamming ball of the multiprobe expansion. Enumerated by bit
    * combinations (driver-side), so cost is C(nBits, <=radius), not
    * 2^nBits. */
  private[graft] def hammingMasks(nBits: Int, radius: Int): Seq[Long] = {
    require(radius >= 0 && nBits >= 1 && nBits <= 62)
    (0 to math.min(radius, nBits)).flatMap(r =>
      (0 until nBits).combinations(r)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq)
  }

  /** Partition-local exact top-k pruning over a (probe_id, neighbor_id,
    * cos) frame: each input partition keeps only its own k best per probe
    * (bounded heaps, full (cos desc, neighbor asc) ordering so ties at the
    * boundary are never mis-evicted) BEFORE anything is shuffled. The
    * global top-k is a subset of the union of local top-ks, so the final
    * window ranks at most partitions*probes*k rows instead of the full
    * scored volume — at 100 TB this turns the ranking shuffle from
    * |corpus|x|probes| into noise. */
  private def localThenGlobalTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import scala.collection.mutable
    // PriorityQueue dequeues its ordering's MAX; rank the worst element as
    // max (lowest cos, then largest neighbor id) so the heap head is the
    // eviction candidate — mirroring the final window's ordering exactly,
    // including numeric ids (zero-padded strings would mis-order negatives)
    def cmpIds(x: Any, y: Any): Int = (x, y) match {
      case (a: Number, b: Number) =>
        // doubleValue first (fractional ids), longValue to break 2^53+ ties
        val c = java.lang.Double.compare(a.doubleValue(), b.doubleValue())
        if (c != 0) c else java.lang.Long.compare(a.longValue(), b.longValue())
      case _ =>
        // Spark windows order strings by UTF8 binary order, not UTF-16
        org.apache.spark.unsafe.types.UTF8String.fromString(String.valueOf(x))
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(String.valueOf(y)))
    }
    val worstFirst: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val c = java.lang.Double.compare(b.getDouble(2), a.getDouble(2))
        if (c != 0) c else cmpIds(a.get(1), b.get(1))
      }
    }
    implicit val enc = org.apache.spark.sql.Encoders.row(scored.schema)
    val pruned = scored.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(0),
          mutable.PriorityQueue.empty(worstFirst))
        if (h.size < k) h.enqueue(r)
        else if (worstFirst.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors for each probe. Probes are broadcast —
    * the corpus is never shuffled; scored pairs are pruned to k-per-probe
    * inside each scan partition before the (now tiny) ranking exchange.
    * Ties break deterministically by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        V.cosineFast(col("pv"), col("cv")).as("cos"))
    localThenGlobalTopK(scored, k)
  }

  /** A prebuilt IVF (inverted-file) index: the corpus assigned to `nLists`
    * inverted lists by a seeded k-means coarse quantizer, plus the tiny
    * centroid table. BUILD ONCE, PROBE MANY: at 100 TB, `assigned` is
    * written to storage `partitionBy("__list")` once and every probe batch
    * reads only its `nProbe` list-partitions — the k-means fit and the
    * corpus assignment pass are amortized across all future queries
    * instead of re-run per call. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame,
                            nLists: Int)

  /** Fit the coarse quantizer and assign the corpus — one narrow
    * assignment pass; deterministic for a fixed seed. */
  def ivfBuild(corpus: DataFrame, nLists: Int = 64, seed: Long = 42L,
               maxIter: Int = 10, vecCol: String = "embedding",
               idCol: String = "vec_id"): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("__fv", array_to_vector(col("cv")))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__fv").setPredictionCol("__list")
      .fit(c.select("__fv"))
    // persist: without it every ivfQuery would lazily re-run the corpus
    // scan + assignment, and "probe many" would amortize nothing. The
    // caller owns the lifetime (unpersist, or write out partitioned by
    // __list for cross-job reuse).
    val assigned = model.transform(c)
      .select(col("neighbor_id"), col("cv"), col("__list"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centDf = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      .toSeq.toDF("__list", "__centroid")
    IvfIndex(assigned, centDf, nLists)
  }

  /** Probe a prebuilt index: each probe scores only its `nProbe` nearest
    * lists — recall rises with nProbe, scan cost falls with
    * nLists/nProbe; nProbe = nLists is exact. */
  def ivfQuery(index: IvfIndex, probes: DataFrame, k: Int, nProbe: Int = 8,
               vecCol: String = "embedding",
               idCol: String = "vec_id"): DataFrame = {
    // nProbe nearest centroids per probe: centroid set is tiny (nLists
    // rows) -> broadcast cross join + rank, never a corpus-wide op
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val wc = Window.partitionBy("probe_id")
      .orderBy(col("__l2").asc, col("__list"))
    val probeLists = p.crossJoin(broadcast(index.centroids))
      .withColumn("__l2", V.l2sq(col("pv"), col("__centroid")))
      .withColumn("__pr", row_number().over(wc))
      .filter(col("__pr") <= nProbe)
      .select("probe_id", "pv", "__list")
    // each neighbor lives in exactly one list, so a (probe, neighbor) pair
    // can match at most once — no dedup needed before ranking
    val scored = index.assigned.join(broadcast(probeLists), Seq("__list"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        V.cosineFast(col("pv"), col("cv")).as("cos"))
    localThenGlobalTopK(scored, k)
  }

  /** Convenience one-shot: build + query (the q38 shape). Prefer
    * [[ivfBuild]]/[[ivfQuery]] when serving repeated probe batches. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nLists: Int = 64, nProbe: Int = 8, seed: Long = 42L,
              vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame =
    ivfQuery(ivfBuild(corpus, nLists, seed, vecCol = vecCol, idCol = idCol),
      probes, k, nProbe, vecCol, idCol)

  /** LSH-bucketed approximate top-k: candidates are corpus vectors whose
    * sign-bucket is within Hamming distance <= `multiprobe` of the probe's
    * bucket (multiprobe=0 -> same bucket only). Each probe expands to
    * C(nBits, <=multiprobe) bucket ids via XOR masks — the full Hamming
    * ball, not just single-bit flips. Exact cosine ranks the candidates.
    * Recall rises with multiprobe / falls with nBits.
    *
    * The plane dimension is taken from `dim` and fail-fast validated
    * against every vector (no silent null-padded buckets). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nBits: Int = 8, multiprobe: Int = 1, dim: Int = 64,
              seed: Long = 42L, vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    val planes = V.randomPlanes(nBits, dim, seed)
    val masks = hammingMasks(nBits, multiprobe)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      V.signBucketChecked(col(vecCol), planes).as("cb"))
    val probeBuckets = probes.select(col(idCol).as("probe_id"),
        col(vecCol).as("pv"), V.signBucketChecked(col(vecCol), planes).as("b0"))
      .withColumn("pb",
        explode(array(masks.map(m => col("b0").bitwiseXOR(lit(m))): _*)))
    // each (probe, neighbor) matches exactly one mask (mask = b0 XOR cb),
    // so no dedup is needed before ranking
    val scored = c.join(broadcast(probeBuckets), col("cb") === col("pb"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        V.cosineFast(col("pv"), col("cv")).as("cos"))
    localThenGlobalTopK(scored, k)
  }
}
