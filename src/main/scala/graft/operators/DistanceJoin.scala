package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distance (ST_DWithin-class) join via grid-cell binning — the 2-D analog
  * of `RangeJoin`'s 1-D interval binning, and the join shape behind
  * "find features within d of each feature" (spatial dedup, cluster
  * seeding, proximity enrichment).
  *
  * A raw `dist(a, b) <= d` join condition plans as a nested-loop cross
  * product — O(|L|·|R|) at any scale. Binning restores an equi-join:
  * bin both sides into a d-sized cell lattice; any pair within d differs
  * by ≤ 1 cell per axis, so replicating the RIGHT side to its 3×3 cell
  * neighborhood and equi-joining on the cell key yields a candidate
  * superset, verified by the exact predicate. Shuffle currency is
  * |L| + 9·|R| keyed rows (put the smaller relation right); each left
  * point lands in exactly ONE cell, so no pair is emitted twice and the
  * output needs no dedup. Hot cells (skewed point clusters) are ordinary
  * hash-join skew, which AQE's skew split already handles — there is no
  * quadratic blowup hidden in a single key unless the DATA is quadratic
  * (that many genuine pairs within d).
  *
  * Inputs carry (idCol, x, y); output is (lid, rid, dist) with dist ≤ d.
  * Planar coordinates — for lon/lat feed projected coordinates (e.g.
  * `Reproject` to WebMercator) like every cell-binned spatial engine.
  */
object DistanceJoin {

  /** Candidate pairs within d with their exact squared distance — the
    * shared binned-join core of [[join]] and [[nearestWithinSq]]. */
  private def candidates(left: DataFrame, right: DataFrame, d: Double,
                         idCol: String, xCol: String, yCol: String): DataFrame = {
    require(d > 0, "distance must be positive")
    val l = left.select(col(idCol).as("lid"), col(xCol).as("__lx"), col(yCol).as("__ly"),
      floor(col(xCol) / d).cast("long").as("__cx"),
      floor(col(yCol) / d).cast("long").as("__cy"))
    val r = right.select(col(idCol).as("rid"), col(xCol).as("__rx"), col(yCol).as("__ry"),
        floor(col(xCol) / d).cast("long").as("__bx"),
        floor(col(yCol) / d).cast("long").as("__by"))
      .withColumn("__cx", explode(array((-1 to 1).map(o => col("__bx") + o): _*)))
      .withColumn("__cy", explode(array((-1 to 1).map(o => col("__by") + o): _*)))
      .drop("__bx", "__by")
    val d2 = (col("__lx") - col("__rx")) * (col("__lx") - col("__rx")) +
      (col("__ly") - col("__ry")) * (col("__ly") - col("__ry"))
    l.join(r, Seq("__cx", "__cy"))
      // verify on the SQUARED distance: products/sums of the raw
      // coordinates stay exact when they are integral, so the boundary
      // d² compare cannot flip across engines
      .filter(d2 <= d * d)
      .withColumn("__d2", d2)
  }

  def join(left: DataFrame, right: DataFrame, d: Double,
           idCol: String = "id", xCol: String = "x", yCol: String = "y"): DataFrame =
    candidates(left, right, d, idCol, xCol, yCol)
      .select(col("lid"), col("rid"), F.sqrt(col("__d2")).as("dist"))

  /** Per-left-point minimum SQUARED distance to any right point within d —
    * the proximity / distance-transform primitive (GDAL's gdal_proximity
    * with maxdist, a11). Squared distance stays in exact integer
    * arithmetic for integral coordinates, so min() is order-independent
    * and oracle-checkable. Left points with no right point within d are
    * ABSENT (the caller left-joins and interprets null as "beyond
    * maxdist", GDAL's nodata convention). Same shuffle currency as
    * [[join]]: |L| + 9·|R| keyed rows, then a map-side-combined min. */
  def nearestWithinSq(left: DataFrame, right: DataFrame, d: Double,
                      idCol: String = "id", xCol: String = "x",
                      yCol: String = "y"): DataFrame =
    candidates(left, right, d, idCol, xCol, yCol)
      .groupBy(col("lid").as(idCol)).agg(min("__d2").as("d2"))
}
