package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime within the same key — the canonical "operator
  * Spark lacks" (time-series enrichment; SURVEY §2.3 notes the reference
  * has none, so this is engine surface beyond parity).
  *
  * Implementation is the scalable union-scan form, NOT a range join: tag
  * both sides, sort within key by time, carry the last-seen right row
  * forward with a running `last(_, ignoreNulls)` window, keep left rows.
  * One shuffle on the key, sort within partitions — the same cost as a
  * sort-merge join, with none of the O(left × right-per-key) blowup an
  * inequality join would plan. Ties on rightTime resolve to the largest
  * right struct (deterministic).
  */
object AsOfJoin {

  /** `left` joined to the latest `right` row per key. `rightCols` are the
    * payload columns to carry from the right side. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // union schema: key, time, side tag, left payload struct, right payload struct
    val l = left.select(
      col(leftKey).as("__key"), col(leftTime).as("__time"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)).as("__r"))
    val r = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"), lit(0).as("__side"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.select(leftCols.map(col): _*).schema.fields)).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    // right rows sort before left rows at the same timestamp (side 0 < 1),
    // so an exactly-equal rightTime is visible to the left row (<= semantics);
    // __r in the ordering makes duplicate (key, time) right rows resolve
    // deterministically to the largest right struct
    val w = Window.partitionBy("__key").orderBy(col("__time"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
