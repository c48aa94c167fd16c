package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Windowed heavy hitters over a document stream: per event-time window,
  * the top-k tokens by the [[graft.functions.FrequentItemsAgg]]
  * Misra-Gries sketch — trending-terms / boilerplate-burst detection at
  * ingest time.
  *
  * The sketch buffer is the STREAMING STATE: per window, O(capacity)
  * bytes in the state store regardless of vocabulary size — the property
  * that makes per-window token counting viable on an unbounded stream
  * (an exact groupBy(window, term) would grow state with the vocabulary).
  * Micro-batch partials merge through the same associative
  * mergeable-summaries reduction as the batch path, so the exact-regime
  * results equal [[graft.operators.Relevance.heavyHitters]] run on the
  * window's rows (pinned in StreamingHeavyHittersSpec).
  *
  * Append-mode users must also set a watermark upstream; complete/update
  * mode works as-is. */
object StreamingHeavyHitters {

  def topTokens(df: DataFrame, textCol: String, tsCol: String,
                windowDur: String, capacity: Int = 1024,
                k: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftglue.GraftGlue
    val sketch = GraftGlue.column(graft.functions.FrequentItemsAgg(
      GraftGlue.expression(col("term")), capacity).toAggregateExpression())
    df.select(col(tsCol), explode(T.tokens(T.normalized(col(textCol))))
        .as("term"))
      .groupBy(window(col(tsCol), windowDur))
      .agg(sketch.as("__hh"))
      .select(col("window.start").as("window_start"),
        posexplode(slice(col("__hh"), 1, k)))
      .select(col("window_start"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("item"), col("col.cnt").as("cnt"))
  }
}
