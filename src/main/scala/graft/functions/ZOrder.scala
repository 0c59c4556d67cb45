package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) space-filling curve over tile/pixel indices.
  *
  * The scale tool the reference's row-major tile ordering lacks: sorting or
  * range-partitioning a tile set by its Morton code keeps spatial neighbors
  * in the same task/file, so windowed readers hit warm source tiles
  * (WarpReader's per-task LRU), object-store writes land prefix-clustered,
  * and a range-partitioned spatial join co-locates both sides without a
  * per-row geometry test. Pure Catalyst bit arithmetic — codegen'd,
  * O(log bits) ops per code, no UDF.
  *
  * Bit-spreading uses the standard magic-mask doubling ladder, valid for
  * coordinates up to 2^31-1 (zoom-22 tile indices are < 2^22).
  */
object ZOrder {

  private val steps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` to the even bit positions. */
  def spread(c: Column): Column =
    steps.foldLeft(c.cast("long")) { case (x, (sh, m)) =>
      (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(m))
    }

  /** Morton code: bits of x on even positions, bits of y on odd. */
  def morton(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** DuckDB/ANSI rendering of [[spread]] (for oracle parity). */
  def spreadSql(e: String): String =
    steps.foldLeft(s"CAST(($e) AS BIGINT)") { case (s, (sh, m)) =>
      s"((($s) | (($s) << $sh)) & $m)"
    }

  /** DuckDB/ANSI rendering of [[morton]]. */
  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Range-partition by Morton code: each partition covers a contiguous
    * z-range — a compact spatial patch, not a full-width row stripe. The
    * one shuffle it costs replaces the many it saves when downstream
    * operators (mosaic groupBy, warp gathers, neighbor joins) run with
    * spatial locality. */
  def repartitionByZ(df: DataFrame, x: Column, y: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, morton(x, y))
}
