package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §4 / the 100 TB checklist).
  *
  * AQE splits skewed SORT-MERGE joins automatically, but a hash AGGREGATE
  * with a hot key still funnels that key's rows into one task's map. Salted
  * two-phase aggregation spreads a hot key over `saltBuckets` partial
  * groups, then combines — the classic fix, packaged so jobs can apply it
  * declaratively to the decomposable aggregates (count/sum/min/max).
  */
object Skew {

  /** Two-phase salted aggregation. `aggs` maps output column name →
    * (phase1 agg over raw rows, phase2 combiner over phase-1 partials).
    * e.g. count: (count(lit(1)), sum), sum(x): (sum(x), sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, c)) => c(col(s"__p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted count aggregation — the rasterize-count shape with hot pixels. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16,
                  outName: String = "value"): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      Map(outName -> (count(lit(1)), (c: Column) => sum(c))))
}
