package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph metrics over pair relations (duplicate graphs, proximity graphs).
  * [[Dedup.components]] already covers connectivity; this adds the local
  * density metric — triangles — used to separate genuinely clustered
  * near-dup groups from chains of borderline pairs.
  */
object Graph {

  /** Per-vertex triangle counts via the classic relational enumeration:
    * canonicalize edges to a < b, build wedges a<b<c by joining adjacency
    * on the middle vertex, close each wedge against the edge set. Every
    * triangle enumerates exactly once (its vertices are totally ordered),
    * so the count needs no division by symmetry. Two shuffle joins on
    * vertex keys — the canonical edge relation is persisted because it
    * feeds both wedge legs AND the closing probe. Skewed high-degree
    * vertices are ordinary join skew (AQE splits them); production
    * refinements (degree-based orientation) drop in here without changing
    * the contract. Input: (doc1, doc2) pairs, any orientation/dupes.
    * Output: (id, n_triangles) for vertices in at least one triangle. */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = graft.core.Caching.shared(pairs.select(
        least(col("doc1"), col("doc2")).as("a"),
        greatest(col("doc1"), col("doc2")).as("b"))
      .filter(col("a") < col("b")) // drop self-loops
      .distinct())
    val wedges = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), "y")
    val tris = wedges.join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}
