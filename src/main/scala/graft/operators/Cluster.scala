package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Density clustering (DBSCAN) as a composition of the engine's scalable
  * joins — the unsupervised structure-discovery step of an embedding or
  * spatial curation pipeline (e.g. topic islands in a 2-D projection,
  * spatial hot-spot detection).
  *
  * Classic DBSCAN is presented as a sequential flood fill; distributed, it
  * decomposes into exactly the primitives this engine already ships:
  *
  *   1. eps-neighbor pairs: [[DistanceJoin]] self-join — cell-binned
  *      equi-join, never O(n²).
  *   2. core points: neighbor COUNT ≥ minPts (the point itself counts,
  *      scikit-learn convention) — one map-side-combined aggregate.
  *   3. clusters: connected components over CORE-CORE edges
  *      ([[Dedup.components]] — min-label propagation + pointer jumping);
  *      cluster id = the component's minimum point id.
  *   4. border points: non-core with a core eps-neighbor, attached to the
  *      MINIMUM core cluster id (deterministic, unlike the sequential
  *      algorithm's visit-order-dependent assignment).
  *   5. everything else: noise (null cluster).
  *
  * The neighbor relation feeds three consumers (counts, core edges,
  * border attach) and is persisted; so are the small core/label tables.
  * Output: (id, cluster: nullable, role: core|border|noise).
  */
object Cluster {

  def dbscan(pts: DataFrame, eps: Double, minPts: Int,
             idCol: String = "id", xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val nbrs = graft.core.Caching.shared(
      DistanceJoin.join(pts, pts, eps, idCol, xCol, yCol)
        .select("lid", "rid"))
    val core = graft.core.Caching.shared(
      nbrs.groupBy("lid").agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= minPts)
        .select(col("lid").as("id")))
    val coreEdges = nbrs
      .join(core.select(col("id").as("lid")), "lid")
      .join(core.select(col("id").as("rid")), "rid")
      .filter(col("lid") < col("rid"))
      .select(col("lid").as("doc1"), col("rid").as("doc2"))
    val groups = Dedup.components(coreEdges) // (doc_id, group_id)
    // cores with no core neighbor are their own singleton cluster
    val coreLabels = graft.core.Caching.shared(core
      .join(groups.withColumnRenamed("doc_id", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("group_id"), col("id")).as("__cluster")))
    val borderLabels = nbrs
      .join(coreLabels.select(col("id").as("rid"), col("__cluster")), "rid")
      .join(core.select(col("id").as("lid")), Seq("lid"), "left_anti")
      .groupBy(col("lid").as("id"))
      .agg(min("__cluster").as("__bcluster"))
    pts.select(col(idCol).as("id"))
      .join(coreLabels, Seq("id"), "left")
      .join(borderLabels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__cluster"), col("__bcluster")).as("cluster"),
        when(col("__cluster").isNotNull, "core")
          .when(col("__bcluster").isNotNull, "border")
          .otherwise("noise").as("role"))
  }
}
