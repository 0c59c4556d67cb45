package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * per distinct `minCol` value), then a running-max over the
    * DISTINCT-value relation — O(distinct minCol) sweep rows, never the
    * O(n²) dominance self-join. A row survives iff no strictly-cheaper
    * value reaches its `maxCol` and it attains its own value's maximum;
    * duplicate frontier rows all survive (dominance is strict in at least
    * one coordinate).
    *
    * Scale: pass `bucket` — any function of the `minCol` value that is
    * MONOTONE non-decreasing in it (e.g. `v => floor(v / 100)`) — and the
    * sweep range-partitions: per-bucket running-max windows plus one
    * prefix-max pass over the |buckets|-row per-bucket-maxima relation
    * (broadcast, bounded by construction — the same two-pass shape as
    * [[Ranks.globalRank]]). Without `bucket` the single window is bounded
    * by the distinct-`minCol` count — fine for enum-like value spaces,
    * caller's responsibility past that. Returns the input rows on the
    * frontier, original schema. */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                bucket: Option[Column => Column] = None): DataFrame = {
    val g = df.groupBy(col(minCol).as("__p")).agg(max(maxCol).as("__m"))
    val sky = bucket match {
      case None =>
        val w = Window.orderBy("__p").rowsBetween(Long.MinValue, -1)
        g.withColumn("__runmax", max("__m").over(w))
          .filter(col("__runmax").isNull || col("__m") > col("__runmax"))
          .select(col("__p"), col("__m"))
      case Some(b) =>
        // two-pass merge: (1) per-bucket running max (parallel windows);
        // (2) prefix max over the tiny per-bucket maxima relation gives
        // each bucket the best value of all STRICTLY EARLIER buckets.
        // A point survives iff it beats both the earlier-bucket prefix
        // and its in-bucket predecessors — monotonicity of `b` in __p
        // makes "earlier bucket" ⊆ "cheaper value", so the union of the
        // two comparisons is exactly the global running max.
        val gb = graft.core.Caching.shared(g.withColumn("__b", b(col("__p"))))
        val prior = gb.groupBy("__b").agg(max("__m").as("__bm"))
          .withColumn("__prior", max("__bm").over(
            Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
          .select("__b", "__prior")
        val wb = Window.partitionBy("__b").orderBy("__p")
          .rowsBetween(Window.unboundedPreceding, -1)
        gb.join(broadcast(prior), "__b")
          .withColumn("__runmax", greatest(
            coalesce(max("__m").over(wb), col("__prior")),
            coalesce(col("__prior"), max("__m").over(wb))))
          .filter(col("__runmax").isNull || col("__m") > col("__runmax"))
          .select(col("__p"), col("__m"))
    }
    df.join(broadcast(sky),
        col(minCol) === col("__p") && col(maxCol) === col("__m"))
      .drop("__p", "__m")
  }
}
