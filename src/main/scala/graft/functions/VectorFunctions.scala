package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns — no UDFs, no
  * deserialization to Scala objects (BASELINE.json north_star similarity
  * search; embeddings.parquet schema `vec_id, embedding: array<float>, label`).
  *
  * The `zip_with`/`aggregate` higher-order forms here are the readable
  * REFERENCE semantics; their lambdas are interpreted per element (NOT
  * whole-stage-codegen'd), so every hot path has a native codegen twin
  * ([[cosineFast]], [[signBucketFast]]) kept bit-identical by parity specs.
  * All arithmetic is promoted to double BEFORE accumulation and accumulates
  * left-to-right, so results are bit-identical to any engine that sums the
  * list in order (the DuckDB oracle does).
  */
object VectorFunctions {

  /** Sum of an array<double> expression, left-to-right. */
  private def asum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    asum(transform(a, x => x.cast("double") * x.cast("double")))

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; 0.0 when either vector has zero norm. HOF form —
    * the readable reference semantics; see [[cosineFast]] for the hot path. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** [[cosine]] as a native codegen'd Catalyst expression (tight primitive
    * loop; see CosineSimilarityExpr). Bit-identical to the HOF form: same
    * left-to-right double accumulation, NULL on length mismatch, 0.0 on
    * zero norms. Use in per-pair scoring hot paths (ANN, near-dup). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(CosineSimilarityExpr(
      GraftGlue.expression(a), GraftGlue.expression(b)))
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => {
      val dxy = x.cast("double") - y.cast("double")
      dxy * dxy
    }))

  /** Sign-bit LSH bucket: pack the signs of `planes.length` fixed random
    * hyperplane projections into one long. Deterministic — the planes are
    * generated from a seed on the driver and inlined as literals, so the
    * expression stays codegen'd and identical across executors. HOF form —
    * the readable reference semantics; see [[signBucketFast]]. */
  def signBucket(a: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = asum(zip_with(a, lit(p), (x, y) => x.cast("double") * y))
      when(proj >= 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)

  /** [[signBucket]] as a native codegen'd expression (SignBucketExpr):
    * bit-identical (same per-plane left-to-right double accumulation) with
    * one tight nBits x dim loop instead of nBits interpreted HOF passes.
    * `private[graft]`: the expression reads `dim` floats UNGUARDED (an
    * undersized vector would read past its end via unsafe access) — all
    * public paths go through [[signBucketChecked]]'s dimension guard. */
  private[graft] def signBucketFast(a: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(SignBucketExpr(GraftGlue.expression(a), planes))
  }

  /** [[signBucketFast]] with a fail-fast dimension guard: a vector whose
    * length differs from the plane dimension raises instead of silently
    * bucketing to 0 (zip_with would null-pad, making every sign bit 0). A
    * NULL vector stays NULL (drops out of bucket equi-joins) — only a
    * PRESENT wrong-size vector is an error. */
  def signBucketChecked(a: Column, planes: Array[Array[Double]]): Column = {
    val d = planes.head.length
    when(a.isNull, lit(null).cast("long"))
      .when(size(a) === d, signBucketFast(a, planes))
      .otherwise(raise_error(concat(
        lit(s"embedding dimension != plane dimension $d: got "),
        size(a).cast("string"))))
  }

  /** Deterministic pseudo-random unit hyperplanes (driver-side). */
  def randomPlanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits) {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }
}
