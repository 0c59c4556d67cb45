package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 batch 11–16 operator semantics on crafted inputs: multi-source
  * BFS distances, VAD island segmentation, and all-but-the-top residual
  * geometry. */
class Round9eOpsSpec extends SparkSpec {
  import spark.implicits._

  test("multi-source bfs: exact hop distances, seeds share rounds, bound respected") {
    // path 1–2–3–4–5 (undirected via symmetrize), seeds 1 and 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("seed")
    val d3 = Graph.multiSourceBfs(edges, seeds, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d3((1L, 1L)) == 0 && d3((1L, 2L)) == 1 && d3((1L, 3L)) == 2 &&
      d3((1L, 4L)) == 3)
    assert(d3((4L, 5L)) == 1 && d3((4L, 1L)) == 3 && d3((4L, 2L)) == 2)
    // rounds bound: vertex 5 is 4 hops from seed 1 — absent at rounds = 3
    assert(!d3.contains((1L, 5L)))
    graft.core.Caching.release(spark)
  }

  test("vad: islands split on gaps, singletons kept, energies fold exactly") {
    val frames = Seq(
      (1L, 0, 10L, 200L, 5L),  // voiced (≥ 100)
      (1L, 1, 10L, 300L, 5L),  // voiced — same island as frame 0
      (1L, 2, 10L, 50L, 5L),   // silent — splits
      (1L, 3, 10L, 150L, 5L),  // voiced — new island
      (2L, 0, 10L, 90L, 5L)    // silent only → asset 2 absent
    ).toDF("asset_id", "frame_idx", "sum_abs", "sum_sq", "max_abs")
    val segs = Multimodal.vadSegments(frames, minEnergy = 100L)
      .orderBy("asset_id", "start_frame")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(segs.toSeq == Seq((1L, 0, 1, 2L, 500L), (1L, 3, 3, 1L, 150L)))
  }

  test("abtt: residuals are orthogonal to the component up to quantization") {
    // vectors along x = (1e6, 0) plus one off-axis: residual of on-axis
    // vectors is ~0; the off-axis vector keeps only its y component
    val vecs = Seq(
      (0L, Seq(1000000L, 0L)),
      (1L, Seq(500000L, 0L)),
      (2L, Seq(0L, 700000L))
    ).toDF("vec_id", "qv")
    val comp = Seq((0L, 1000000L), (1L, 0L)).toDF("dim", "eig_micro")
    val r = Similarity.abttResiduals(vecs, comp)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // on-axis: c = v·x/|x|² exactly, residual 0
    assert(r(0L) == ((1000000L, 0L)))
    assert(r(1L) == ((500000L, 0L)))
    // orthogonal: coefficient 0, residual = own norm²
    assert(r(2L) == ((0L, 700000L * 700000L)))
    graft.core.Caching.release(spark)
  }

  test("global rank: permutation 1..n, equals the single-window rank") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 200L).map(i => (i, rnd.nextInt(50).toLong)).toDF("id", "v")
    val got = Ranks.globalRank(df, col("v"), Seq(col("id")), expr("v div 7"))
      .select(col("id"), col("__rank"))
    val expected = df.withColumn("__rank",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("v", "id")))
      .select("id", "__rank")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    graft.core.Caching.release(spark)
  }

  test("hll merge: per-group registers max-merge to the global table") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"v$i")).toDF("grp", "k")
    val per = Sketch.hllRegistersBy(df, "grp", "k", m = 32)
    val merged = per.groupBy("bucket").agg(max("register").as("r"))
    val global = Sketch.hllRegisters(df.select("k"), "k", m = 32)
      .filter(col("register") > 0)
    val diff = global.join(merged, "bucket")
      .filter(col("register") =!= col("r")).count()
    assert(diff == 0)
  }
}
