package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north_star). Four families: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * plus embedding-cosine near-dup.
  *
  * Scale design (100 TB): every family reduces the problem to ONE
  * hash-shuffle on a compact key (fingerprint / band hash / simhash prefix /
  * shingle) before any pairwise work, so no stage is quadratic in corpus
  * size. Pairwise verification only runs inside buckets, whose size is
  * bounded by construction (band width for MinHash, df cap for shingles).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-content fingerprint.
    * One shuffle on the md5 key; survivor choice is deterministic. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(T.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: for each doc, `numHashes` minima of per-seed 64-bit
    * hashes over its word-`shingleN`-gram shingles. Pure column expressions:
    * explode -> one hash-aggregate (partial map-side combine applies). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol),
      explode(array_distinct(T.shingles(col(textCol), shingleN))).as("__sh"))
    val mins = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("__sh"))).as(s"h$j"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(j => col(s"h$j")): _*)
        .as("minhash"))
  }

  /** MinHash+LSH candidate pairs with estimated Jaccard >= threshold.
    * Signatures are banded (`bands` bands of `numHashes/bands` rows); docs
    * sharing any band hash become candidates (self-join on the band key —
    * bounded buckets, no full cross product); candidates are verified with
    * the exact signature-agreement estimate. Output: (a, b, est_jaccard). */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sigs = minhashSignatures(df, textCol, idCol, numHashes, shingleN)
    val banded = sigs.select(col(idCol).as("id"), col("minhash"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("minhash"), b * r + 1, lit(r))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bandhash"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bandhash") === col("y.bandhash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.minhash").as("ma"), col("y.minhash").as("mb"))
      .dropDuplicates("a", "b")
    cand.withColumn("est_jaccard",
        size(filter(zip_with(col("ma"), col("mb"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") /
          numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("a", "b", "est_jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes. Explode -> 64 conditional sums in one hash-aggregate. The sign
    * bit (63) is left clear so the value is a non-negative long. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(T.tokens(T.normalized(col(textCol)))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val bitSums = (0 until 63).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"b$i"))
    tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 63).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance <= maxDist. Candidate
    * generation blocks on `blocks` disjoint bit-segments (pigeonhole: any
    * pair within maxDist agrees on >= one full segment when
    * blocks > maxDist), so the self-join key is a short segment value, never
    * the full corpus. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3, blocks: Int = 4): DataFrame = {
    val segBits = 63 / blocks
    val sh = simhash(df, textCol, idCol).withColumnRenamed(idCol, "id")
    val seg = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftright(col("simhash"), b * segBits)
          .bitwiseAND((1L << segBits) - 1)): _*)))
      .withColumnsRenamed(Map("pos" -> "seg", "col" -> "segval"))
    val hamming: (Column, Column) => Column = (x, y) =>
      bit_count(x.bitwiseXOR(y))
    seg.as("x").join(seg.as("y"),
        col("x.seg") === col("y.seg") && col("x.segval") === col("y.segval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.simhash"), col("y.simhash")).as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxDist)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing at least one shingle.
    * High-document-frequency shingles (df > maxDf) are dropped before the
    * self-join — they contribute little to Jaccard but quadratic bucket
    * growth. Output: (a, b, jaccard). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.2,
                        maxDf: Int = 50): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(T.shingles(col(textCol), n))).as("sh"))
    val sizes = sh.groupBy("id").agg(count("*").as("nsh"))
    val rare = sh.join(
      sh.groupBy("sh").agg(count("*").as("df")).filter(col("df") <= maxDf)
        .select("sh"), Seq("sh"))
    val shared = rare.as("x").join(rare.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count("*").as("shared"))
    shared
      .join(sizes.withColumnsRenamed(Map("id" -> "a", "nsh" -> "na")), "a")
      .join(sizes.withColumnsRenamed(Map("id" -> "b", "nsh" -> "nb")), "b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs: sign-LSH bucket join (one shuffle on
    * the bucket key), exact cosine verify inside buckets. `nBits` trades
    * recall for bucket size; multiprobe is left to Similarity.lshTopK. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            threshold: Double = 0.9, nBits: Int = 8,
                            dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(nBits, dim, seed)
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      V.signBucket(col(vecCol), planes).as("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        V.cosine(col("x.v"), col("y.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
