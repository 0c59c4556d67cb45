package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXACT global ranking — the declarative two-pass zipWithIndex:
  * rows bucket by a range expression MONOTONE in the sort value, ranks are
  * per-bucket `row_number` windows plus a broadcast cumulative bucket-offset
  * table. No single-partition window ever appears, so the shape survives any
  * row count; the offset table is |buckets| rows.
  *
  * Shared by the Gini coefficient (x36), equal-frequency binning (x42), and
  * any surrogate-key assignment. Ties break on `tieCols`, so the rank is
  * total and engine-replayable; callers whose aggregates are
  * tie-interchangeable (equal values swap ranks without changing bin
  * populations or Σrank·value) stay exact even when tie columns repeat.
  */
object Ranks {

  /** Append `__rank` (1-based, dense total order by (value, ties…)) to `df`.
    * `bucket` must be monotone non-decreasing in `value` (e.g.
    * `value div 10⁶`). The value relation is pinned (offset census + ranked
    * fold read it); callers release via the session cache registry. */
  def globalRank(df: DataFrame, value: Column, ties: Seq[Column],
                 bucket: Column): DataFrame = {
    val bucketed = graft.core.Caching.shared(df.withColumn("__b", bucket))
    val offsets = bucketed.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val wb = Window.partitionBy("__b").orderBy(value +: ties: _*)
    bucketed.join(broadcast(offsets), "__b")
      .withColumn("__rank", row_number().over(wb) + col("__off"))
      .drop("__b")
  }
}
