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

  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0,1]: $ps")
    val labels = ps.map(p => s"p${math.round(p * 100)}")
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
}
