package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component labeling of same-valued raster regions — the
  * region-group behind GDAL's sieve/polygonize family (the reference
  * ecosystem runs these on published layers; cf. gfw_pixetl's GDAL
  * toolchain), re-expressed as relational primitives that scale past a
  * single machine.
  *
  * A pixel belongs to the same region as any 4-connected neighbor with an
  * equal value. Labels are deterministic: each region is named by the
  * smallest linearized pixel id it contains, so the labeling is
  * replayable and oracle-checkable (no flood-fill visitation order).
  *
  * Scale shape: adjacency comes from TWO equi-joins on shifted pixel keys
  * (right neighbor and down neighbor) — hash joins on (px, py, value),
  * never a range or theta join; at cluster scale both sides inherit the
  * raster's grid partitioning, so the shifted join is the same
  * halo-exchange-shaped shuffle [[Focal]] already does. The iterative part
  * is [[Dedup.components]] (min-label propagation + pointer jumping,
  * O(log n) rounds), which giant flat regions stress no harder than the
  * dedup graphs it was built for.
  */
object Regions {

  /** Collision-free linear pixel id (py bounded by the 2^20 row limit). */
  private def pixelId(px: org.apache.spark.sql.Column, py: org.apache.spark.sql.Column) =
    px * 1048576L + py

  /** Label every cell of a (px, py, v) raster relation with its region id
    * (= min pixel id in the 4-connected same-value region). Isolated
    * pixels label themselves. */
  def label(cells: DataFrame): DataFrame = {
    val ids = cells.select(col("px"), col("py"), col("v"),
      pixelId(col("px"), col("py")).as("__id"))
    val right = ids.select((col("px") + 1).as("px"), col("py"), col("v"),
      col("__id").as("doc1"))
      .join(ids.select(col("px"), col("py"), col("v"), col("__id").as("doc2")),
        Seq("px", "py", "v"))
    val down = ids.select(col("px"), (col("py") + 1).as("py"), col("v"),
      col("__id").as("doc1"))
      .join(ids.select(col("px"), col("py"), col("v"), col("__id").as("doc2")),
        Seq("px", "py", "v"))
    val edges = right.select("doc1", "doc2").union(down.select("doc1", "doc2"))
    val groups = Dedup.components(edges)
    ids.join(groups.withColumnRenamed("doc_id", "__id"), Seq("__id"), "left")
      .select(col("px"), col("py"), col("v"),
        coalesce(col("group_id"), col("__id")).as("region_id"))
  }

  /** Per-region size census — the input to a sieve decision (drop/absorb
    * regions under a pixel-count threshold) or a fragmentation report. */
  def regionSizes(cells: DataFrame): DataFrame =
    label(cells)
      .groupBy("v", "region_id")
      .agg(count(lit(1)).as("n_px"))

  /** GDAL-sieve (drop-to-nodata form): null the value of every pixel whose
    * 4-connected region is smaller than `minPx`, as `gdal_sieve` does with
    * no connectedness-8 flag and nodata as the destination. (GDAL's other
    * mode — absorb into the largest neighbor — is a second labeling pass
    * over the sieved output; the drop form is what masking pipelines use.)
    *
    * One labeling, one size census, one region-keyed equi join back: the
    * labeled relation is pinned ([[graft.core.Caching.shared]] —
    * caller-released) because both the census and the final join consume
    * it; the join key (v, region_id) is the census's grouping key, so the
    * census side arrives pre-partitioned and small (one row per region). */
  def sieve(cells: DataFrame, minPx: Long): DataFrame = {
    val labeled = graft.core.Caching.shared(label(cells))
    val sizes = labeled.groupBy("v", "region_id").agg(count(lit(1)).as("n_px"))
    labeled.join(sizes, Seq("v", "region_id"))
      .select(col("px"), col("py"),
        when(col("n_px") >= minPx, col("v")).as("v"), col("n_px"))
  }
}
