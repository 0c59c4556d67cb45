package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval-containment join — the operator Spark lacks natively:
  * a raw `p.ts BETWEEN i.start AND i.end` condition (with or without an
  * equi-key) plans as BroadcastNestedLoopJoin, O(|intervals|·|points|), which
  * at 100 TB never finishes. Binning both sides to fixed-width buckets turns
  * it into an EQUI-join on (keys…, bin) with an exact refine filter — the
  * standard range-join optimization (Databricks' range-join hints and
  * Flink's interval joins take the same shape). Each interval explodes to
  * ⌈len/binWidth⌉+1 bins; a point lives in exactly ONE bin, so every
  * qualifying (interval, point) pair meets in exactly one bin and the output
  * needs no dedup.
  *
  * Scale shape: one shuffle of each side keyed by (keys…, bin); skew from a
  * hot key+hour lands on AQE's skew-join splitting; `binWidth` dials the
  * explode factor vs candidate precision (set it near the typical interval
  * length so the blow-up stays ≤ 2×).
  */
object RangeJoin {

  /** Join `points` (event rows with `tsCol`, micros-precision timestamp)
    * into `intervals` (rows with `[startCol, endCol)` timestamps) on shared
    * `keys` plus containment. Output: all interval columns + the point
    * columns EXCEPT the join keys (caller aggregates). `binWidthSec` is the
    * bucket width in seconds. */
  def intervalJoin(intervals: DataFrame, points: DataFrame, keys: Seq[String],
                   startCol: String, endCol: String, tsCol: String,
                   binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, "binWidthSec must be positive")
    val w = binWidthSec * 1000000L // micros
    // unix_micros rejects TIMESTAMP_NTZ; the session timezone is pinned
    // UTC, so the NTZ→TZ cast is a deterministic reinterpretation
    def em(c: Column): Column = unix_micros(c.cast("timestamp"))
    def bin(c: Column): Column = floor(em(c) / w).cast("long")
    val iv = intervals
      .withColumn("__bin", explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val pt = points.withColumn("__bin", bin(col(tsCol)))
    iv.join(pt, keys :+ "__bin")
      .filter(em(col(tsCol)) >= em(col(startCol)) &&
        em(col(tsCol)) < em(col(endCol)))
      .drop("__bin")
  }
}
