package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-summary operators for cardinality/frequency/quantile questions
  * that exact aggregation cannot answer at 100 TB without a vocabulary- or
  * value-sized shuffle. Companions: HLL approx-distinct (x1, Spark
  * built-in), Misra-Gries heavy hitters ([[TextOps.MisraGries]], t26), and
  * the fixed-grid quantile here (x20).
  */
object Sketch {

  /** Fixed-grid quantile approximation — the two-pass histogram sketch
    * (the equi-width special case of Ben-Haim & Tom-Tov's streaming
    * histograms): pass 1 finds per-group [min, max] (map-side-combined
    * min/max, no shuffle beyond the group keys), pass 2 counts values
    * into `buckets` equal-width bins (ditto), and the quantile reads off
    * the cumulative histogram with linear interpolation inside the
    * straddling bucket. Error is bounded by one bucket width — dialed by
    * `buckets`, with state O(groups · buckets) regardless of row count,
    * which is why this is the shape a 100 TB percentile actually runs
    * (exact `percentile()` holds every value per group in memory).
    *
    * Everything after the two counting passes is a pure function of exact
    * integers (bucket counts) and two exact doubles (min, max), evaluated
    * identically under IEEE arithmetic in any engine — so unlike t-digest
    * or KLL the sketch is DETERMINISTIC and oracle-checkable, while
    * keeping their mergeability (bucket counts are sums; min/max are
    * min/max). Output: one row per group with `q25/q50/q75` estimates in
    * exact milli-units and the group count.
    *
    * The cumulative scan is a window over ≤ `buckets` rows per group —
    * state the size of the sketch, never the data. */
  def gridQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                    buckets: Int = 128): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCol)
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("n"))
    // lo/hi/n ride the bin aggregate's grouping keys (functionally
    // dependent on the group), so the bounds relation has exactly ONE
    // consumer — no pin, no second broadcast join, two data passes total
    val binned = df.join(broadcast(bounds), groupCol)
      // degenerate group (all values equal): everything lands in bucket 0
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            floor((v - col("__lo")) / (col("__hi") - col("__lo")) * buckets),
            lit(buckets - 1))).cast("int"))
      .groupBy(col(groupCol), col("__lo"), col("__hi"), col("n"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__b")
    val cum = binned
      .withColumn("__cum", sum("__cnt").over(w))
    // quantile q: target rank ceil(q·n); the straddling bucket is the
    // first with cum ≥ target; interpolate by the rank offset within it
    def est(qNum: Int, qDen: Int): Column = {
      val target = ceil(col("n") * qNum / qDen)
      val width = (col("__hi") - col("__lo")) / buckets
      val frac = (target - (col("__cum") - col("__cnt"))).cast("double") / col("__cnt")
      // exactly one bucket straddles the target rank: cumBefore < target ≤ cum
      val straddles = col("__cum") >= target && (col("__cum") - col("__cnt")) < target
      max(when(straddles, col("__lo") + (col("__b") + frac) * width)).cast("double")
    }
    cum.groupBy(col(groupCol), col("n"))
      .agg(
        floor(est(1, 4) * 1000 + 0.5).cast("long").as("q25_milli"),
        floor(est(2, 4) * 1000 + 0.5).cast("long").as("q50_milli"),
        floor(est(3, 4) * 1000 + 0.5).cast("long").as("q75_milli"))
      .select(col(groupCol), col("q25_milli"), col("q50_milli"),
        col("q75_milli"), col("n"))
  }
}
