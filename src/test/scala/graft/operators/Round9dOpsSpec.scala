package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 batch-8 operator semantics on crafted inputs: prefix-filter
  * set-similarity join (completeness vs brute force — the algorithm's
  * zero-false-negative guarantee) and perceptual average-hash (hand-computed
  * rasters, mean-threshold boundary).
  */
class Round9dOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over a lazy dog"),       // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 1
    (4L, "entirely different words about spark and catalyst"),
    (5L, "words about spark and catalyst mostly different"), // overlaps 4
    (6L, "the a of and to in is it")                          // stopwords only
  ).toDF("doc_id", "text")

  test("prefix filter: complete — every brute-force pair ≥ t is found") {
    val t = 0.5
    // brute force: all pairs, exact Jaccard, threshold by cross-multiply
    val ids = corpus.select(col("doc_id"))
    val allPairs = ids.select(col("doc_id").as("doc1"))
      .crossJoin(ids.select(col("doc_id").as("doc2")))
      .filter(col("doc1") < col("doc2"))
    val brute = Dedup.jaccard(corpus, allPairs)
      .filter(col("inter") * 1000000L >= col("uni") * 500000L)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pf = Dedup.prefixFilterJoin(corpus, t)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pf == brute, s"prefix-filter $pf != brute $brute")
    // and the fixture is non-trivial: it contains true pairs
    assert(brute.contains((1L, 3L)) && brute.contains((1L, 2L)))
    graft.core.Caching.release(spark)
  }

  test("prefix filter: completeness holds across seeded random corpora and thresholds") {
    // fixed-seed random corpora: the completeness theorem must hold for
    // any token distribution and any threshold, not just the crafted one
    for (seed <- Seq(7, 42); t <- Seq(0.3, 0.6, 0.85)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "g", "hh", "iii", "jj")
      val docs = (1L to 30L).map { id =>
        val n = 2 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val ids = docs.select(col("doc_id"))
      val allPairs = ids.select(col("doc_id").as("doc1"))
        .crossJoin(ids.select(col("doc_id").as("doc2")))
        .filter(col("doc1") < col("doc2"))
      val tMicro = math.round(t * 1e6)
      val brute = Dedup.jaccard(docs, allPairs)
        .filter(col("inter") * 1000000L >= col("uni") * tMicro)
        .select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pf = Dedup.prefixFilterJoin(docs, t)
        .select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pf == brute, s"seed=$seed t=$t: pf $pf != brute $brute")
      graft.core.Caching.release(spark)
    }
  }

  test("prefix filter: no false positives below the threshold") {
    val pairs = Dedup.prefixFilterJoin(corpus, 0.9)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the exact dup survives a 0.9 bar
    assert(pairs == Set((1L, 3L)))
    graft.core.Caching.release(spark)
  }

  test("prefix filter: maxPostingLen drops a pathological posting list loudly, " +
      "clean pairs unchanged") {
    // 20 two-token docs {common, uniq_i}: sz=2 at t=0.5 keeps BOTH tokens
    // in the prefix, so "common"'s posting list is corpus-sized — the
    // quadratic-candidate pathology the guard exists for. Docs 100/101 are
    // an exact dup pair whose tokens are all rare (df=2) — they must
    // survive the cap. Docs 200/201 are single-token {common} docs whose
    // ONLY shared prefix token is the dropped one — the documented
    // false-negative cost of capping.
    val docs = ((1L to 20L).map(i => (i, s"common uniq$i")) ++
      Seq((100L, "alpha beta gamma delta"), (101L, "alpha beta gamma delta"),
        (200L, "common"), (201L, "common"))).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.prefixFilterJoin(docs, 0.5, maxPostingLen = cap)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    // {common,uniq_i} vs {common} is Jaccard exactly 1/2 → every (i, 200/201)
    // pair qualifies at t=0.5; (i, j) pairs are 1/3 and never appear
    val viaCommon = (1L to 20L).flatMap(i => Seq((i, 200L), (i, 201L))).toSet
    assert(uncapped == viaCommon + ((100L, 101L)) + ((200L, 201L)))
    // cap 5 < 22 occurrences of "common": its list drops; the rare-token
    // dup pair survives, every common-mediated pair is the explicit loss
    val capped = pairs(5)
    assert(capped == Set((100L, 101L)))
    // a cap the corpus never reaches is a no-op (clean-corpus contract)
    assert(pairs(1000) == uncapped)
    graft.core.Caching.release(spark)
  }

  test("ahash: hand-computed 2×2 raster, mean-threshold boundary") {
    // pixels row-major [10, 20, 30, 40]: sum 100, n 4 → bit iff 4v ≥ 100,
    // so cells 30 (i=2, since 30·4=120) and 40 (i=3) set, 20 (80<100) not
    val media = Seq((7L, "image", "image/png",
      Multimodal.encodeGrayPng(2, 2, Array[Byte](10, 20, 30, 40))))
      .toDF("asset_id", "modality", "mime", "payload")
    val r = Multimodal.averageHash(media, size = 2).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 0L)                   // hash_hi
    assert(r(0).getLong(2) == (1L << 2 | 1L << 3))  // hash_lo = 12
  }

  test("ahash: uniform raster sets every bit (v·n ≥ Σv at equality)") {
    val media = Seq((8L, "image", "image/png",
      Multimodal.encodeGrayPng(4, 4, Array.fill[Byte](16)(77))))
      .toDF("asset_id", "modality", "mime", "payload")
    val r = Multimodal.averageHash(media, size = 8).collect()
    assert(r(0).getLong(1) == 0xFFFFFFFFL && r(0).getLong(2) == 0xFFFFFFFFL)
  }

  test("neighbor agg: hand-computed 2-hop means, sign-safe truncation") {
    // 1→{2,3}, 2→{3}, 3→{2}; f(1)=[10], f(2)=[-7], f(3)=[4]
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val feats = Seq((1L, Seq(10L)), (2L, Seq(-7L)), (3L, Seq(4L)))
      .toDF("id", "f")
    // hop1: h(1) = (-7+4)/2 = -3/2 → -1 (toward zero), h(2) = 4, h(3) = -7
    val h1 = Graph.neighborMeanAgg(edges, feats, hops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h1 == Map(1L -> -1L, 2L -> 4L, 3L -> -7L))
    // hop2: h(1) = (4 + -7)/2 → -1, h(2) = -7, h(3) = 4
    val h2 = Graph.neighborMeanAgg(edges, feats, hops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h2 == Map(1L -> -1L, 2L -> -7L, 3L -> 4L))
    graft.core.Caching.release(spark)
  }

  test("neighbor agg: sourceless vertices drop; duplicate edges weight twice") {
    // 1→2 twice and 1→3 once: mean = (2·5 + 8)/3 = 6
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val feats = Seq((1L, Seq(100L)), (2L, Seq(5L)), (3L, Seq(8L))).toDF("id", "f")
    val r = Graph.neighborMeanAgg(edges, feats, hops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r == Map(1L -> 6L)) // 2 and 3 have no out-edges → absent
    graft.core.Caching.release(spark)
  }

  test("terminal label: two basins resolve, sinks label themselves, over-iterating is safe") {
    // chain 1→2→3 (sink 3 via self-edge), star 5→4, 6→4 (sink 4)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 3L), (5L, 4L), (6L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val r = Graph.terminalLabel(edges, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("terminal label: rounds cover 2^rounds path length exactly") {
    // path of 8 edges: 0→1→…→8 (sink 8); 3 rounds (2³ = 8) suffice
    val edges = ((0L until 8L).map(i => (i, i + 1)) :+ ((8L, 8L))).toDF("src", "dst")
    val r3 = Graph.terminalLabel(edges, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((0L to 8L).forall(i => r3(i) == 8L), s"got $r3")
  }

  test("ahash: identical images hash identically, different images differ") {
    val docs = Seq(10L, 11L, 10L).zipWithIndex
      .map { case (seed, i) => (i.toLong, seed) }.toDF("asset_id", "seed")
    // build payloads from the seed so rows 0 and 2 carry the same image
    val media = Multimodal.syntheticPngs(
      docs.select(col("seed").as("doc_id")), "doc_id")
    val hashes = Multimodal.averageHash(media, size = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashes(10L) != hashes(11L))
  }
}
