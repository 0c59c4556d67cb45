package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 third-batch operator semantics on crafted inputs: Z&T curvature
  * and the TPI/TRI/roughness family (hand-computed windows), personalized
  * PageRank (hand-unrolled integer recurrence), link prediction (known
  * wedges + hub-cap behavior), bitmap overlap (word/sign-bit edges vs
  * brute-force set algebra), and the skyline sweep vs brute-force
  * dominance. */
class Round9cOpsSpec extends SparkSpec {
  import spark.implicits._

  // one 6×4 block lattice (2×2 blocks of 3×2) with all cells valid
  private def grid(f: (Int, Int) => Double): DataFrame = {
    val (bw, bh, nx, ny) = (3, 2, 2, 2)
    val rows = for { by <- 0 until ny; bx <- 0 until nx } yield {
      val cells = for { y <- 0 until bh; x <- 0 until bw }
        yield f(bx * bw + x, by * bh + y)
      (bx, by, bw, bh, cells.map(java.lang.Double.valueOf),
        cells.map(_ => true))
    }
    rows.toDF("block_x", "block_y", "width", "height", "values", "valid")
  }

  private def cells(out: DataFrame): Map[(Int, Int), Double] =
    out.select(col("block_x"), col("block_y"),
        posexplode(arrays_zip(col("values"), col("valid"))))
      .filter(col("col.valid"))
      .select((col("block_x") * 3 + col("pos") % 3).cast("long").as("gx"),
        (col("block_y") * 2 + floor(col("pos") / 3)).cast("long").as("gy"),
        col("col.values").cast("double").as("v"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2))
      .toMap

  test("curvature: ramps are flat, z = x² has constant −200, edges nodata") {
    val flat = cells(Focal.curvature(grid((x, y) => 3.0 * x + 2.0 * y), 1.0))
    assert(flat.keySet == (for { x <- 1 to 4; y <- 1 to 2 } yield (x, y)).toSet,
      "full 3×3 windows only — the raster edge ring must be nodata")
    flat.values.foreach(v => assert(v == 0.0, s"linear ramp must have zero curvature, got $v"))
    val para = cells(Focal.curvature(grid((x, _) => (x * x).toDouble), 1.0))
    // (x−1)² + (x+1)² − 2x² = 2 in the E–W cross; N–S flat ⇒ curv = −100·2
    para.values.foreach(v => assert(v == -200.0, s"z=x² curvature must be −200, got $v"))
  }

  test("terrain indices: single peak has hand-computed TPI/TRI/roughness") {
    val out = Focal.terrainIndices(grid((x, y) => if ((x, y) == ((2, 1))) 8.0 else 0.0))
      .select(col("block_x"), col("block_y"),
        posexplode(arrays_zip(col("values"), col("valid"))))
      .filter(col("col.valid"))
      .select((col("block_x") * 3 + col("pos") % 3).cast("long").as("gx"),
        (col("block_y") * 2 + floor(col("pos") / 3)).cast("long").as("gy"),
        col("col.values.tpi").as("tpi"), col("col.values.tri").as("tri"),
        col("col.values.rough").as("rough"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // at the peak: TPI = 8 − 0 = 8, TRI = √(8·8²) = √512, rough = 8
    assert(out((2, 1)) == ((8.0, math.sqrt(512.0), 8.0)))
    // beside the peak: TPI = 0 − 8/8 = −1, TRI = √(8²) = 8, rough = 8
    assert(out((1, 1)) == ((-1.0, 8.0, 8.0)))
    // far corner window never sees the peak: all zero
    assert(out((4, 2)) == ((0.0, 0.0, 0.0)))
  }

  test("personalized pagerank: 2-cycle matches the hand-unrolled recurrence") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPagerank(edges, seeds, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = (10⁶, 0); r1 = (125000, 875000); r2 = (125000+765625, 109375)
    assert(r(1L) == 890625L, s"seed rank after 2 rounds: ${r(1L)}")
    assert(r(2L) == 109375L, "non-seed vertex must get NO teleport mass")
  }

  test("personalized pagerank: mass stays inside the seed's reachable set") {
    // two disjoint 2-cycles; seeding {1} must leave {3,4} at exactly zero
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val r = Graph.personalizedPagerank(edges, Seq(1L).toDF("id"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(3L) == 0L && r(4L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
  }

  test("link prediction: square closes both diagonals with jaccard 1") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("doc1", "doc2")
    val got = Graph.linkPrediction(square, maxDeg = 8, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // diagonals (1,3) and (2,4): cn = 2, deg 2 each, jaccard = 2/(2+2−2) = 1
    assert(got.keySet == Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) == ((2L, 2L, 2L, 1.0)))
    assert(got((2L, 4L)) == ((2L, 2L, 2L, 1.0)))
  }

  test("link prediction: hub cap suppresses wedges through high-degree centers") {
    // star center 0 → leaves 1..5: every leaf pair shares only the hub
    val star = (1L to 5L).map(i => (0L, i)).toDF("doc1", "doc2")
    assert(Graph.linkPrediction(star, maxDeg = 3, minCommon = 1).isEmpty,
      "center degree 5 > cap 3 — no wedge may route through it")
    val uncapped = Graph.linkPrediction(star, maxDeg = 8, minCommon = 1)
    assert(uncapped.count() == 10, "cap lifted: all C(5,2) leaf pairs appear")
    // leaf degrees are 1 ⇒ jaccard = 1/(1+1−1) = 1 for every pair
    uncapped.collect().foreach(r => assert(r.getDouble(5) == 1.0))
  }

  test("bitmap overlap: word boundaries and bit 63 match brute-force set algebra") {
    // ids straddle words {0,1,2} incl. 63 (sign bit) and 64 (word edge)
    val members = Map(
      "a" -> Set(0L, 1L, 63L, 64L, 100L),
      "b" -> Set(1L, 63L, 65L, 100L, 128L),
      "c" -> Set(2L, 200L))
    val df = members.toSeq
      .flatMap { case (s, ids) => ids.flatMap(i => Seq(s -> i, s -> i)) } // dupes too
      .toDF("seg", "uid")
    val got = Sketch.bitmapOverlap(df, "seg", "uid")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (Seq(x, y) <- members.keys.toSeq.sorted.combinations(2)) {
      val (sx, sy) = (members(x), members(y))
      val common = (sx & sy).size.toLong
      if (common == 0) assert(!got.contains((x, y)))
      else assert(got((x, y)) ==
        ((sx.size.toLong, sy.size.toLong, common, (sx | sy).size.toLong)))
    }
    assert(got.contains(("a", "b")) && !got.contains(("a", "c")))
  }

  test("D8 flow direction: ramps, peaks, flats, and diagonal dominance") {
    // z = x: steepest descent is due west (code 16) everywhere interior
    val west = cells(Focal.flowDirD8(grid((x, _) => x.toDouble)))
    west.values.foreach(v => assert(v == 16.0, s"x-ramp must drain W, got $v"))
    // flat: no positive drop anywhere — all sinks (0)
    cells(Focal.flowDirD8(grid((_, _) => 5.0))).values
      .foreach(v => assert(v == 0.0))
    // z = x + y (y grows south): NW diagonal drop 2 (key 4) beats the
    // cardinal drops 1 (key 2) — code 32
    cells(Focal.flowDirD8(grid((x, y) => (x + y).toDouble))).values
      .foreach(v => assert(v == 32.0, s"xy-ramp must drain NW, got $v"))
    // single peak: at the peak all 8 drops tie on raw drop, but cardinals
    // carry key 2·drop² — tie among {E,S,W,N} breaks to the smallest code (E=1)
    val peak = cells(Focal.flowDirD8(grid((x, y) => if ((x, y) == ((2, 1))) 8.0 else 0.0)))
    assert(peak((2, 1)) == 1.0)
    // the peak's west neighbor has only the uphill drop — a flat/sink (0)
    assert(peak((1, 1)) == 0.0)
  }

  test("modularity: disjoint triangles score +0.25 each, split edge −0.25 each") {
    val tris = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("doc1", "doc2")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "label")
    val got = Graph.modularity(tris, lab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // per triangle: e_in=3, deg_sum=6, m=6 ⇒ (72−36)/144 = 0.25
    assert(got(1L) == ((3L, 3L, 6L, 250000L)))
    assert(got(4L) == ((3L, 3L, 6L, 250000L)))
    // one edge, endpoints labeled apart: num < 0 exercises the sign-safe
    // magnitude division (floor vs truncate never diverges)
    val split = Graph.modularity(
        Seq((1L, 2L)).toDF("doc1", "doc2"),
        Seq((1L, 10L), (2L, 20L)).toDF("id", "label"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(split(10L) == -250000L && split(20L) == -250000L)
  }

  test("ancestor count: paths and in-trees accumulate exactly") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.ancestorCount(path, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // in-tree: {1,2} → 3 → 4: acc(3) = 2, acc(4) = 3
    val tree = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val t = Graph.ancestorCount(tree, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L))
    // under-iterated: counts are the ≤k-hop truncation, never overshoot
    val short = Graph.ancestorCount(path, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(short == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("majority filter: plurality wins, ties go to the smallest value") {
    // 3×2 patch of 5s on zeros: the patch center's window holds six 5s
    val patch = cells(Focal.majorityFilter(grid((x, y) =>
      if (x >= 1 && x <= 3 && y >= 1 && y <= 2) 5.0 else 0.0)))
    assert(patch((2, 1)) == 5.0 && patch((2, 2)) == 5.0)
    assert(patch((1, 1)) == 0.0, "patch corner sees five 0s vs four 5s")
    // hand window with a 4–4 tie (four 0s, four 5s, one 7) → smallest (0)
    val vals = Map((1, 0) -> 0.0, (2, 0) -> 0.0, (3, 0) -> 0.0, (1, 1) -> 0.0,
      (2, 1) -> 5.0, (3, 1) -> 5.0, (1, 2) -> 5.0, (2, 2) -> 5.0, (3, 2) -> 7.0)
    val tied = cells(Focal.majorityFilter(grid((x, y) =>
      vals.getOrElse((x, y), 9.0))))
    assert(tied((2, 1)) == 0.0, s"4-4 tie must break to the smaller value")
  }

  test("feature hashing: counts fold per slot, index space bounded, no dictionary") {
    val docs = Seq((1L, "alpha beta alpha alpha"), (2L, "beta"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.featureHash(docs, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keys.forall { case (_, idx) => idx >= 0 && idx < 64 })
    // 'alpha' folds to ONE slot with count 3; same token → same slot across docs
    val alphaSlot = got.collect { case ((1L, idx), 3L) => idx }
    assert(alphaSlot.size == 1)
    val betaSlots = got.collect { case ((d, idx), 1L) if d != 3L => (d, idx) }.toSeq
    assert(betaSlots.map(_._2).distinct.size == 1, "beta must hash identically in both docs")
    assert(!got.keys.exists(_._1 == 3L), "empty doc yields no triplets")
  }

  test("skyline sweep equals brute-force dominance on a pseudo-random cloud") {
    val pts = (0 until 300)
      .map(i => (i.toLong, (i * 37 % 101).toDouble, i * 53 % 97))
    val df = pts.toDF("id", "cost", "gain")
    val got = Pareto.skyline2d(df, "cost", "gain")
      .select("id").as[Long].collect().toSet
    val brute = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.map(_._1).toSet
    assert(got == brute, s"sweep=${got.size} brute=${brute.size}")
    assert(got.nonEmpty)
    // the range-partitioned two-pass merge (scale path) returns the SAME
    // frontier: per-bucket windows + a prefix-max over bucket maxima must
    // reconstruct the global running max exactly, including at bucket
    // boundaries and in the first bucket (null prior)
    val bucketed = Pareto.skyline2d(df, "cost", "gain",
        bucket = Some(v => org.apache.spark.sql.functions.floor(v / 10)))
      .select("id").as[Long].collect().toSet
    assert(bucketed == brute, s"bucketed=${bucketed.size} brute=${brute.size}")
  }
}
