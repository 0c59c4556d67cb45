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

  /** Collision-free linear pixel id. The 2^20 row packing is ENFORCED, not
    * assumed: a py at or past 1,048,576 (or any negative coordinate) would
    * silently alias two pixels onto one id and corrupt every label built on
    * it, so the guard is woven into the id value itself — same pattern as
    * the Focal non-uniform-block guard — where the optimizer cannot prune
    * it. Callers with a taller lattice must re-grid (or shift origin). */
  private def pixelId(px: org.apache.spark.sql.Column, py: org.apache.spark.sql.Column) =
    when(px >= 0L && py >= 0L && py < 1048576L, px * 1048576L + py)
      .otherwise(raise_error(format_string(
        "graft regions: pixel (%s, %s) outside the 2^20 row-packing bound " +
          "(0 <= py < 1048576, px >= 0) - labels would alias; re-grid the lattice",
        px, py)))

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

  /** GDAL-sieve, absorb form (`gdal_sieve`'s default): every pixel of a
    * region smaller than `minPx` takes the value of the region's LARGEST
    * 4-connected neighboring region (by pixel count; ties broken by the
    * smaller region id, so the result is deterministic). A small region
    * with no neighbor at all keeps its value, as GDAL keeps islands
    * surrounded by nodata.
    *
    * One pass, by design: GDAL iterates smallest-first until fixpoint,
    * which is inherently sequential; the relational form does a single
    * absorb round (label → census → neighbor argmax → value join), the
    * "second labeling pass over the sieved output" shape. Re-invoke on the
    * output for the iterative polish if a pipeline needs it — each round is
    * the same bounded plan, no flood fill.
    *
    * Scale shape: neighbor adjacency is the SAME two shifted-key equi-joins
    * the labeling already does (on (px, py) alone, cross-region pairs
    * kept), so at cluster scale it rides the grid partitioning; the
    * absorb decision is a per-region argmax over the neighbor census — one
    * row per adjacent region pair, tiny next to the pixel relation. */
  def sieveAbsorb(cells: DataFrame, minPx: Long): DataFrame = {
    val labeled = graft.core.Caching.shared(label(cells))
    val sizes = labeled.groupBy("region_id").agg(count(lit(1)).as("n_px"))

    // Cross-region 4-adjacency: join on position only, keep pairs whose
    // regions differ, symmetrize. One row per (region, neighbor) pair after
    // the distinct — everything downstream is region-keyed and small.
    val a = labeled.select(col("px"), col("py"), col("region_id").as("ra"))
    val b = labeled.select(col("px"), col("py"), col("region_id").as("rb"))
    val right = a.withColumn("px", col("px") + 1).join(b, Seq("px", "py"))
    val down = a.withColumn("py", col("py") + 1).join(b, Seq("px", "py"))
    val touches = right.unionByName(down).select("ra", "rb")
    val pairs = touches
      .unionByName(touches.select(col("rb").as("ra"), col("ra").as("rb")))
      .filter(col("ra") =!= col("rb"))
      .distinct()

    // Largest neighbor, ties to the smaller region id — exact two-step
    // (max size, then min id among the maxima) so no packed ordering key
    // can alias; all relations here are one-row-per-region.
    val regionV = labeled.groupBy("region_id").agg(first(col("v")).as("rv"))
    val nbrSized = pairs.join(sizes.withColumnRenamed("region_id", "rb"), Seq("rb"))
    val best = nbrSized.groupBy("ra").agg(max("n_px").as("__mx"))
    val nbr = nbrSized.join(best, Seq("ra"))
      .filter(col("n_px") === col("__mx"))
      .groupBy("ra")
      .agg(min(col("rb")).as("__rb"))
      .join(regionV.withColumnRenamed("region_id", "__rb"), Seq("__rb"))
      .select(col("ra").as("region_id"), col("rv").as("absorb_v"))

    labeled.join(sizes, Seq("region_id"))
      .join(nbr, Seq("region_id"), "left")
      .select(col("px"), col("py"),
        when(col("n_px") >= minPx, col("v"))
          .otherwise(coalesce(col("absorb_v"), col("v"))).as("v"))
  }
}
