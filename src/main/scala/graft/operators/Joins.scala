package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (SURVEY §7.3 "compose
  * existing ops where semantics allow").
  *
  * [[asOf]] — for every left row, attach the single right row with the
  * greatest `rightTime` <= `leftTime` per key (time-series enrichment: an
  * event joined to the dimension version in force at event time).
  *
  * Scale shape: the classic union-and-carry-forward plan — ONE shuffle on
  * the key for a sort-within-partition window, never a per-row range probe
  * and never a key x key cross product. Both inputs are read once;
  * last(ignoreNulls) carries the right payload forward within each key's
  * timeline. */
object Joins {

  /** As-of (backward) join. Right columns (minus keys/time) are appended,
    * NULL when no right row is at-or-before the left row's time. Right
    * rows tied on (key, rightTime) are reduced to the one with the
    * greatest `rightTiebreak` first, so the result is deterministic. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightTiebreak: Option[String] = None): DataFrame = {
    val payloadCols = right.columns.toSeq
      .filterNot(keys.contains).filterNot(_ == rightTime)
    // a NULL-time version is never "at or before" any left time (ASOF
    // semantics; NULLs would otherwise sort first and carry forward)
    val rValid = right.filter(col(rightTime).isNotNull)
    // one version per (key, time): latest tiebreak wins
    val r1 = Merge.keepLatest(rValid, keys :+ rightTime,
      rightTiebreak.getOrElse(rightTime),
      rightTiebreak.map(col(_)).toSeq)

    import org.apache.spark.sql.types.StructType
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val lCols = left.columns.toSeq
    val lRowType = StructType(lCols.map(c => left.schema(c)))

    val lTagged = left
      .select((keys.map(col) :+ col(leftTime).as("__t") :+
        lit(1).as("__is_left") :+
        lit(null).cast(payloadType).as("__payload") :+
        struct(lCols.map(col): _*).as("__lrow")): _*)
    val rTagged = r1.select((keys.map(col) :+
        col(rightTime).as("__t") :+
        lit(0).as("__is_left") :+
        struct(payloadCols.map(col): _*).as("__payload") :+
        lit(null).cast(lRowType).as("__lrow")): _*)
    val unioned = lTagged.unionByName(rTagged)

    // right rows sort BEFORE left rows at equal time (at-or-before):
    // ascending (__t, __is_left) puts is_left=0 first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__payload"), ignoreNulls = true).over(w))

    val out = carried.filter(col("__is_left") === 1)
    val leftOut = lCols.map(c => col(s"__lrow.$c").as(c))
    val rightOut = payloadCols.map(c => col(s"__asof.$c").as(c))
    out.select(leftOut ++ rightOut: _*)
  }
}
