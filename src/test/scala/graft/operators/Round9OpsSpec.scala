package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operator semantics on crafted inputs: Count-Min sketch
  * (overcount-only error + mergeability), HITS (known tiny-graph fixed
  * points), PQ codebook training (per-subspace convergence), and
  * nearest-neighbor image resize (hand-computed rasters). */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates never undercount, exact without collisions") {
    val terms = (Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"))
      .toDF("term")
    val exact = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    // wide sketch: 3 terms in 4×64 cells collide with negligible odds
    val wide = Sketch.countMinLookup(
      Sketch.countMin(terms, "term", depth = 4, width = 64),
      exact, "term", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wide("alpha") == ((5L, 5L)) && wide("beta") == ((3L, 3L)) &&
      wide("gamma") == ((1L, 1L)))
    // width 2: collisions forced; the bound est ≥ cnt must still hold
    val tight = Sketch.countMinLookup(
      Sketch.countMin(terms, "term", depth = 2, width = 2),
      exact, "term", depth = 2, width = 2).collect()
    tight.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"${r.getString(0)}: est ${r.getLong(2)} < cnt ${r.getLong(1)}"))
  }

  test("count-min: sketches merge — build(all) == cellwise sum of partial builds") {
    val all = (1 to 40).map(i => s"t${i % 7}").toDF("term")
    val (h1, h2) = (all.limit(20), all.exceptAll(all.limit(20)))
    val merged = Sketch.countMin(h1, "term", 4, 8)
      .unionAll(Sketch.countMin(h2, "term", 4, 8))
      .groupBy("row", "cell").agg(sum("cnt").as("cnt"))
    val direct = Sketch.countMin(all, "term", 4, 8)
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty)
  }

  test("hits: hubs and authorities separate on a directed star") {
    // 1→3, 2→3: pure hubs 1,2; pure authority 3
    val r = Graph.hits(Seq((1L, 3L), (2L, 3L)).toDF("src", "dst"), iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((1000000L, 0L)) && r(2L) == ((1000000L, 0L)))
    assert(r(3L) == ((0L, 1000000L)))
  }

  test("hits: path graph scores match the hand-unrolled recurrence") {
    // 1→2→3: auth {2,3} = 10⁶, hub {1,2} = 10⁶ after any iteration count
    val r = Graph.hits(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((1000000L, 0L)))
    assert(r(2L) == ((1000000L, 1000000L)))
    assert(r(3L) == ((0L, 1000000L)))
  }

  test("pq training: each subspace converges to its own clusters") {
    // sub0 clusters at {0,0}/{50,50}; sub1 clusters at {100,100}/{0,0} —
    // vectors mix them, so a single full-space k-means could not separate
    val vecs = Seq(
      (1L, Seq(0L, 0L, 100L, 100L)), (2L, Seq(1L, 1L, 99L, 99L)),
      (3L, Seq(50L, 50L, 0L, 0L)), (4L, Seq(51L, 51L, 1L, 1L)))
      .toDF("vec_id", "qv")
    val init = Seq(
      (0, 0, Seq(0L, 0L)), (0, 1, Seq(40L, 40L)),
      (1, 0, Seq(90L, 90L)), (1, 1, Seq(10L, 10L)))
      .toDF("sub", "cid", "c")
    val r = Similarity.pqTrain(vecs, m = 2, dsub = 2, init = init, iters = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    assert(r((1L, 0)) == 0 && r((2L, 0)) == 0 && r((3L, 0)) == 1 && r((4L, 0)) == 1)
    assert(r((1L, 1)) == 0 && r((2L, 1)) == 0 && r((3L, 1)) == 1 && r((4L, 1)) == 1)
  }

  test("pq training: distances are exact against trained centroids") {
    val vecs = Seq((1L, Seq(0L, 0L)), (2L, Seq(2L, 2L)), (3L, Seq(10L, 10L)))
      .toDF("vec_id", "qv")
    val init = Seq((0, 0, Seq(0L, 0L)), (0, 1, Seq(10L, 10L))).toDF("sub", "cid", "c")
    // round 1 assigns {1,2}→cid0, {3}→cid1; update: c0 = floor-avg = [1,1]
    val r = Similarity.pqTrain(vecs, m = 1, dsub = 2, init = init, iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getInt(2), x.getLong(3))).toMap
    assert(r(1L) == ((0, 2L)))  // (0-1)²·2
    assert(r(2L) == ((0, 2L)))  // (2-1)²·2
    assert(r(3L) == ((1, 0L)))
  }

  test("cdc chunking: shared runs dedup across docs and survive an insertion") {
    val shared = (1 to 60).map(i => s"s$i").mkString(" ")
    val docsDf = Seq(
      (1L, s"alpha beta gamma $shared tail one"),
      (2L, s"prefix other words here $shared"),
      (3L, s"INSERTED alpha beta gamma $shared tail one"), // one-token insertion vs doc 1
      (4L, "entirely distinct content with no overlap at all"))
      .toDF("doc_id", "text")
    val r = Dedup.cdcChunkStats(docsDf, window = 4, mask = 4)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // token counts are exact
    assert(r(1L)._3 == 65 && r(2L)._3 == 64 && r(4L)._3 == 8)
    // the shared 60-token run yields common chunks in all three carriers —
    // including doc 3, where a FIXED-window spanner would have every
    // window shifted by the leading insertion
    assert(r(1L)._2 > 0 && r(2L)._2 > 0 && r(3L)._2 > 0,
      s"dup chunks: ${r(1L)._2}/${r(2L)._2}/${r(3L)._2}")
    // unique doc shares nothing
    assert(r(4L)._2 == 0 && r(4L)._4 == 0)
    // dup token mass is bounded by total
    r.values.foreach { case (nc, ndc, nt, ndt) =>
      assert(ndc <= nc && ndt <= nt)
    }
  }

  test("hll registers: multiplicity-insensitive, mergeable by max, full grid out") {
    val vals = (1 to 200).map(i => s"v${i % 50}").toDF("k") // 50 distinct
    val r = Sketch.hllRegisters(vals, "k", m = 64)
    val rows = r.collect()
    assert(rows.length == 64, "one row per bucket, empties included")
    assert(rows.forall(_.getInt(1) >= 0))
    assert(rows.count(_.getInt(1) > 0) > 10, "50 distinct values touch many buckets")
    // duplicates never move a register
    val doubled = Sketch.hllRegisters(vals.unionAll(vals), "k", m = 64)
    assert(r.exceptAll(doubled).isEmpty && doubled.exceptAll(r).isEmpty)
    // shard merge = cellwise max
    val h1 = (1 to 25).map(i => s"v$i").toDF("k")
    val h2 = (26 to 50).map(i => s"v$i").toDF("k")
    val merged = Sketch.hllRegisters(h1, "k", 64)
      .unionAll(Sketch.hllRegisters(h2, "k", 64))
      .groupBy("bucket").agg(max("register").cast("int").as("register"))
    val direct = Sketch.hllRegisters((1 to 50).map(i => s"v$i").toDF("k"), "k", 64)
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty)
    // a single distinct value sets exactly one register
    val one = Sketch.hllRegisters(Seq("x", "x", "x").toDF("k"), "k", 64).collect()
    assert(one.count(_.getInt(1) > 0) == 1)
  }

  test("sparse retrieval ranks by shared-term weight overlap") {
    val docs = Seq(
      (0L, "spark engine spark catalyst"),       // query doc
      (1L, "spark engine catalyst optimizer"),   // shares 3 terms
      (2L, "spark streaming"),                   // shares 1
      (3L, "completely unrelated words here"))   // shares 0 → absent
      .toDF("doc_id", "text")
    val r = TextOps.sparseRetrieval(docs, queryDocId = 0L, k = 10).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L), "doc 3 never scored")
    assert(r.head.getLong(1) > r(1).getLong(1), "more overlap → higher score")
    assert(r.map(_.getInt(2)).toSeq == Seq(1, 2))
  }

  test("compaction: sequential greedy packing, straddling file joins the earlier bin") {
    val files = Seq(
      ("a", 1L, 30L), ("a", 2L, 30L), ("a", 3L, 30L), // cum_before 0,30,60 → bins 0,0,1
      ("b", 1L, 200L),                                // lone oversized file
      ("c", 1L, 10L), ("c", 2L, 10L))
      .toDF("dir", "file", "bytes")
    val bins = Compaction.assignBins(files, targetBytes = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(bins(("a", 1L)) == 0 && bins(("a", 2L)) == 0 && bins(("a", 3L)) == 1)
    assert(bins(("b", 1L)) == 0)
    val plan = Compaction.plan(files, targetBytes = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(plan(("a", 0L)) == ((2L, 60L, 1)))  // straddler joined bin 0: 1 over target
    assert(plan(("a", 1L)) == ((1L, 30L, 0)))
    assert(plan(("b", 0L)) == ((1L, 200L, 0))) // single file: nothing to rewrite
    assert(plan(("c", 0L)) == ((2L, 20L, 1)))
  }

  test("pca power iteration converges to the dominant direction") {
    // a corpus stretched along (3, 4), mean-centered by symmetry: the
    // principal eigenvector is ∝ (3, 4) with the big component at the
    // 10⁶ L∞ gauge
    val vecs = (1 to 40)
      .map(t => (t.toLong, Seq(3000L * (t - 20), 4000L * (t - 20))))
      .toDF("vec_id", "qv")
    // matrixScaleDiv sized to the toy magnitudes (production 10⁹ assumes
    // micro-unit corpora where scatter cells are 10¹²⁺)
    val r = Similarity.pcaPower(vecs, iters = 5, matrixScaleDiv = 1000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(math.abs(r(1L).toDouble / r(0L) - 4.0 / 3.0) < 0.01,
      s"direction ${r(0L)}:${r(1L)}")
    assert(math.abs(r(1L)) >= 1000000L - 20 && math.abs(r(1L)) <= 1000000L + 20)
  }

  test("nearest-neighbor resize: hand-computed rasters, down and up") {
    val px = Array.tabulate(8)(i => (10 * i).toByte) // 4×2: rows (0,10,20,30),(40,50,60,70)
    val media = Seq((1L, Multimodal.encodeGrayPng(4, 2, px))).toDF("asset_id", "payload")
    // down to 2×2: sx = x·4/2 ∈ {0,2}, sy = y·2/2 ∈ {0,1} → 0,20,40,60
    val down = Multimodal.resizeNearestFeatures(media, 2, 2).collect().head
    assert(down.getLong(3) == 120L, s"sum ${down.getLong(3)}")
    assert(down.getLong(4) == 0L * 0 + 20L * 1 + 40L * 2 + 60L * 3)
    // up to 8×4: sx = x·4/8 repeats each source column twice
    val up = Multimodal.resizeNearestFeatures(media, 8, 4).collect().head
    assert(up.getLong(3) == px.map(_.toLong).sum * 4, s"sum ${up.getLong(3)}")
  }
}
