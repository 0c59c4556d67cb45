package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup / similarity / text / multimodal operator semantics on crafted
  * inputs (the testdata-driven paths are covered by the oracle gate). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "a"),  // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog", "a"),  // near dup
    (4L, "completely different text about spark engines", "b"))
    .toDF("doc_id", "text", "source")

  test("exact dedup groups identical texts, keeps lowest id") {
    val r = Dedup.exact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap // keep_id -> n_copies
    assert(r(1L) == 2)
    assert(r(3L) == 1 && r(4L) == 1)
  }

  test("minhash: identical docs → identical signatures; near dups mostly agree") {
    val sigs = Dedup.minhashSignatures(docs, k = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree >= 4, s"near-dup should share most minhashes, got $agree/8")
    assert(sigs(1L) != sigs(4L))
  }

  test("LSH candidates surface the dup pairs without a cross join") {
    val sigs = Dedup.minhashSignatures(docs, k = 8)
    val pairs = Dedup.lshCandidates(Dedup.lshBuckets(sigs, k = 8, rowsPerBand = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("LSH bucket cap drops degenerate buckets (no O(n²) blowup)") {
    // 40 identical docs: every band bucket holds all 40, so the uncapped
    // self-join emits the full 40·39/2 quadratic pair set; a cap below 40
    // drops those buckets entirely (and logs it), a cap above keeps them.
    val boiler = spark.range(40).select(
      col("id").as("doc_id"), lit("same shared boilerplate text").as("text"))
    val buckets = Dedup.lshBuckets(Dedup.minhashSignatures(boiler, k = 8), k = 8, rowsPerBand = 2)
    assert(Dedup.lshCandidates(buckets).count() == 40L * 39 / 2)
    assert(Dedup.lshCandidates(buckets, maxBucketSize = 10).count() == 0)
    assert(Dedup.lshCandidates(buckets, maxBucketSize = 64).count() == 40L * 39 / 2)
  }

  test("components: chains collapse via pointer jumping; cliques and isolates label to min id") {
    // a 50-vertex path (worst case for plain propagation — needs the
    // O(log n) shortcut to converge inside the default round budget),
    // a 3-clique, and one extra pair
    val path = (0L until 49L).map(i => (i, i + 1))
    val pairs = (path ++ Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L)))
      .toDF("doc1", "doc2")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 50L) assert(got(i) == 0L, s"path vertex $i → ${got(i)}")
    for (i <- Seq(100L, 101L, 102L)) assert(got(i) == 100L)
    assert(got(200L) == 200L && got(201L) == 200L)
    assert(got.size == 55) // only vertices that appear in pairs
    // degenerate: no candidate pairs at all → empty labeling, no NPE
    val empty = Dedup.components(pairs.limit(0))
    assert(empty.count() == 0)
  }

  test("simhash: identical docs equal, near dups within small Hamming distance") {
    val s = Dedup.simhash(docs, bits = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    val ham = java.lang.Long.bitCount(s(1L) ^ s(3L))
    assert(ham <= 4, s"near dup hamming $ham")
  }

  test("jaccard: dup=1.0, near-dup high, unrelated absent (same-source pairs)") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    val j = Dedup.jaccard(docs, pairs).collect()
      .map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2")) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.7 && j((1L, 3L)) < 1.0)
  }

  test("cosine top-k: identical vector ranks first with cosine 1.0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(top.head._1 == 2L && math.abs(top.head._2 - 1.0) < 1e-12)
    assert(top.map(_._1).toSeq == Seq(2L, 4L, 3L))
  }

  test("LSH bucketing puts identical vectors in the same bucket") {
    val vecs = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val b = vecs.withColumn("bucket", Similarity.lshBucket(col("embedding"), 8, 6))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(1L) == b(2L))
  }

  test("IVF: full-probe search equals brute force; partial probe is sane") {
    // 30 vectors in 3 well-separated clusters with small deterministic jitter
    val base = Seq(Array(10f, 0f, 0f), Array(0f, 10f, 0f), Array(0f, 0f, 10f))
    val vecs = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) => x + ((i * 7 + d) % 5) * 0.1f })
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, k = 3, iters = 4)
    assert(cents.length == 3 && cents.map(_._2).distinct.length == 3)
    val queries = vecs.filter($"vec_id" < 3)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing every list degenerates to exact search — must match brute force
    val full = pairs(Similarity.ivfTopK(vecs, queries, cents, nprobe = 3, k = 3))
    assert(full == pairs(Similarity.bruteForceTopK(vecs, queries, k = 3)))
    // one-list probe returns k results per query from the probed subset
    val partial = Similarity.ivfTopK(vecs, queries, cents, nprobe = 1, k = 3).collect()
    assert(partial.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("k-means converges to the fixed-centroid assignment on a separable corpus") {
    // e5 stays rows-only in the correctness ledger (float centroids drift
    // across engines); this pins the CONVERGENCE instead: on well-separated
    // clusters, learned centroids must induce the exact same partition as
    // the ground-truth cluster means (the e7 fixed-centroid machinery).
    val base = Seq(Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0), Array(0.0, 0.0, 10.0))
    val rows = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d) % 5) * 0.1).toFloat })
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val learned = Similarity.kmeansCentroids(vecs, k = 3, iters = 5)
    // ground-truth means per true cluster, cast to the fixed-centroid shape
    val truth = rows.groupBy(_._1 % 3).toSeq.sortBy(_._1).zipWithIndex.map {
      case ((_, members), cid) =>
        val dim = members.head._2.length
        (cid, (0 until dim).map(d => members.map(_._2(d).toDouble).sum / members.size))
    }
    def assign(cents: Seq[(Int, Seq[Double])]): Map[Long, Int] =
      vecs.select(col("vec_id"),
          Similarity.nearestCentroid(col("embedding").cast("array<double>"), cents).as("cid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val la = assign(learned)
    val ta = assign(truth)
    // same PARTITION (cluster ids may permute): group the vec_ids and compare
    def partition(a: Map[Long, Int]): Set[Set[Long]] =
      a.groupBy(_._2).values.map(_.keySet.toSet).toSet
    assert(partition(la) == partition(ta),
      s"learned partition ${partition(la)} != ground truth ${partition(ta)}")
    // and the learned centroids ARE the cluster means (converged, not just
    // compatible): every learned centroid coincides with one truth mean
    for ((_, c) <- learned)
      assert(truth.exists { case (_, t) =>
        t.zip(c).map { case (a, b) => math.abs(a - b) }.max < 1e-9
      }, s"centroid $c not at a cluster mean")
  }

  test("int8 quantization: scale-invariant codes, zero vector → zeros") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(5.0f, -10.0f, 2.5f)),  // same direction, 10x scale
      (3L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", Similarity.absMax(col("v")))
      .withColumn("q", Similarity.quantizeInt8(col("v"), col("scale")))
    val r = vecs.collect().map(x => x.getAs[Long]("vec_id") ->
      (x.getAs[Double]("scale"), x.getSeq[Long](3))).toMap
    assert(r(1L)._2 == Seq(64L, -127L, 32L))
    assert(r(1L)._2 == r(2L)._2) // codes are scale-invariant
    assert(r(3L)._2 == Seq(0L, 0L, 0L) && r(3L)._1 == 0.0)
  }

  test("chunk windows: 32-token windows every 24, short docs → one chunk") {
    val doc = Seq((1L, (1 to 80).map(i => s"w$i").mkString(" ")), (2L, "tiny doc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), filter(split(col("text"), "\\s+"), t => length(t) > 0).as("toks"))
      .select(col("doc_id"), posexplode(TextOps.chunkTexts(col("toks"), 32, 24)))
    val chunks = doc.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(chunks((1L, 0)).startsWith("w1 w2") && chunks((1L, 0)).endsWith(" w32"))
    assert(chunks((1L, 1)).startsWith("w25") && chunks((1L, 1)).endsWith(" w56"))
    assert(chunks((1L, 3)).startsWith("w73") && chunks((1L, 3)).endsWith(" w80"))
    assert(!chunks.contains((1L, 4)))  // 80 tokens → starts 0,24,48,72
    assert(chunks((2L, 0)) == "tiny doc" && !chunks.contains((2L, 1)))
  }

  test("as-of join picks the latest right row at-or-before each left time") {
    val trades = Seq((1L, 10L, 100L), (2L, 25L, 100L), (3L, 5L, 100L))
      .toDF("trade_id", "t", "k")
    val quotes = Seq((9L, 100L, 1.0), (10L, 100L, 2.0), (20L, 100L, 3.0), (25L, 100L, 4.0))
      .toDF("qt", "k", "price")
    val joined = AsOfJoin.asof(trades, quotes, "k", "k", "t", "qt",
      Seq("price", "qt")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(joined(1L) == ((Some(2.0), Some(10L))))  // t=10 → quote at 10 (<=)
    assert(joined(2L) == ((Some(4.0), Some(25L))))  // exact match wins
    assert(joined(3L) == ((None, None)))            // before any quote → null
  }

  test("text ops on known strings") {
    val df = Seq((1L, "The cat and the dog, in the house!")).toDF("doc_id", "text")
    val r = df.select(
      TextOps.tokenCount(col("text")).as("nt"),
      TextOps.subwordCount(col("text")).as("ns"),
      TextOps.langId(col("text")).as("lang")).collect()(0)
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) == 8)
    assert(r.getString(2) == "en")
  }

  test("simhash Hamming-ball pairs: pigeonhole-complete at distance 3, verified exactly") {
    // synthetic signatures: 2 differs from 1 in 3 bits spread over 3 bands
    // (one band still matches → pigeonhole catches it); 3 differs in 5 bits
    // (caught as candidate via a matching band but dropped by the verify);
    // 4 differs in every band and beyond distance 3
    val sigs = Seq(
      (1L, 0x0000L),
      (2L, 0x0111L), // bits 0,4,8 set → bands 0,1,2 differ, band 3 matches
      (3L, 0x011FL), // 5 bits
      (4L, 0xFFFFL))
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashCandidates(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 2L)) == 3)
    assert(!got.contains((1L, 3L))) // candidate (band 3 matches) but Hamming 5
    assert(!got.contains((1L, 4L)))
    assert(got.contains((2L, 3L)) && got((2L, 3L)) == 3) // 0x111⊕0x11F = 0xE
  }

  test("simhash pairs: 64-bit signatures with the sign bit set bucket correctly") {
    // the production config (64-bit sigs, 16-bit bands): docs 1 and 2 differ
    // ONLY in bit 63, so bands 0-2 are bit-identical (value 0xABCD ≠ 0).
    // An arithmetic shiftright sign-extends doc 2's shifted values, and a
    // signed % maps them to negative residues — identical band bits then
    // land in different buckets and the pair is silently missed. The
    // unsigned shift + Long mask must find it.
    val sigs = Seq(
      (1L, 0x0000ABCDABCDABCDL),
      (2L, 0x8000ABCDABCDABCDL), // Hamming 1 from doc 1 (bit 63)
      (3L, 0x7FFF543254325432L)) // far from both
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashCandidates(sigs, bits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 2L) -> 1))
    // band width 64 (bands=1) cannot be expressed in a Long mask: loud guard,
    // not a wrapped `1 << 64` modulus that dumps the corpus in one bucket
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(sigs, bits = 64, bands = 1, maxHamming = 0)
    }
  }

  test("pii: counts and scrub find emails, ips, phone shapes; clean text untouched") {
    val rows = Seq(
      (1L, "reach me at bob.smith+x@mail-host.co.uk or 192.168.001.7 ext 555-0199"),
      (2L, "no pii here, just 3.14 and version 2.0 and a dash-word"))
      .toDF("doc_id", "text")
    val got = TextOps.piiSignals(rows)
      .withColumn("red", TextOps.scrubPii(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1 && got(1L)._3 == 1)
    assert(got(1L)._4 == "reach me at [EMAIL] or [IP] ext [PHONE]")
    assert(got(2L) == ((0, 0, 0, "no pii here, just 3.14 and version 2.0 and a dash-word")))
  }

  test("sequence packing: per-shard offsets, spanning docs, separator accounting") {
    // shard a: docs of 3, 5, 2 tokens; seqLen 8.
    //   doc 1 occupies [0,3] (3 toks + sep), doc 2 [4,9] → spans seqs 0-1,
    //   doc 3 [10,12] → seq 1. shard b packs independently from offset 0.
    val rows = Seq(
      (1L, "a", "t t t"), (2L, "a", "t t t t t"), (3L, "a", "t t"),
      (7L, "b", "x x x x x x x x x x"))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text"))
    val got = TextOps.packSequences(rows, seqLen = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap // doc -> (tok_offset, first_seq, last_seq, n_seqs)
    assert(got(1L) == ((0L, 0L, 0L, 1L)))
    assert(got(2L) == ((4L, 0L, 1L, 2L)))   // straddles the seq-8 boundary
    assert(got(3L) == ((10L, 1L, 1L, 1L)))
    assert(got(7L) == ((0L, 0L, 1L, 2L)))   // shard b restarts at 0
  }

  test("domain stats: per-domain means and exact-dup share") {
    val rows = Seq(
      (1L, "d1", "same text here"), (2L, "d1", "same text here"),
      (3L, "d1", "unique text one"), (4L, "d2", "unique text two"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.domainStats(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("d1")._1 == 3 && got("d2")._1 == 1)
    assert(got("d1")._2 == 3.0)             // mean tokens
    assert(math.abs(got("d1")._3 - 2.0 / 3) < 1e-3) // 2 of 3 docs are exact dups
    assert(got("d2")._3 == 0.0)
  }

  test("incremental dedup: batch probes corpus buckets, no self-pairs, cap applies") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog"), // corpus-internal dup
      (12L, "completely different text about spark engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"), // dup of corpus
      (21L, "brand new content never seen before anywhere"))
      .toDF("doc_id", "text")
    def buckets(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshBuckets(Dedup.minhashSignatures(df, k = 8), k = 8, rowsPerBand = 2)
    val pairs = Dedup.lshCandidatesCross(buckets(batch), buckets(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((20L, 10L)) && pairs.contains((20L, 11L)))
    // pairs are strictly batch-vs-corpus: no (10,11) corpus pair, no batch ids
    // in the corpus column
    assert(pairs.forall { case (p, c) => p >= 20L && c < 20L })
    // a cap of 1 drops every bucket of the identical corpus pair (10, 11) —
    // no batch doc can pair with them anymore
    val capped = Dedup.lshCandidatesCross(buckets(batch), buckets(corpus),
      maxBucketSize = 1).collect().map(_.getLong(1)).toSet
    assert(!capped.contains(10L) && !capped.contains(11L))
  }

  test("hash split: deterministic, boundary-correct, append-stable") {
    val ids = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = TextOps.hashSplit(ids).select("doc_id", "bucket", "split").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val b = TextOps.hashSplit(ids).select("doc_id", "bucket", "split").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(a == b) // no RNG, no partition-order dependence
    a.values.foreach { case (bk, sp) =>
      assert(bk >= 0 && bk < 100)
      assert(sp == (if (bk < 90) "train" else if (bk < 95) "val" else "test"))
    }
    assert(a.values.map(_._2).toSet.size == 3, "200 ids should hit all splits")
    // appending rows never reassigns existing docs
    val grown = TextOps.hashSplit(
        (0L until 400L).map(i => (i, s"t$i")).toDF("doc_id", "text"))
      .select("doc_id", "bucket", "split").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert((0L until 200L).forall(i => grown(i) == a(i)))
  }

  test("tfidf matches hand computation on a two-doc corpus") {
    val corpus = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextOps.tfidf(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // N=2; df(a)=2 → idf = ln(3/3)+1 = 1; df(b)=df(c)=1 → idf = ln(3/2)+1
    assert(got((1L, "a")) == ((2L, 2L, 2.0)))
    val idf1 = math.log(1.5) + 1
    assert(math.abs(got((1L, "b"))._3 - idf1) < 1e-12)
    assert(math.abs(got((2L, "c"))._3 - idf1) < 1e-12)
    assert(got((2L, "a"))._3 == 1.0)
    assert(got.size == 4)
  }

  test("pagerank: a cycle is an exact fixed point of the integer recurrence") {
    // a→b→c→a, outdeg 1 everywhere: contribution = 1e6*7 div 8 = 875000,
    // rank = 125000 + 875000 = 1000000 every round — bit-exact, no drift
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pagerank: hubs accumulate, dangling vertices keep teleport only") {
    // 1→3, 2→3, 3 dangling. Round 1: r(3) = 125000 + 2*875000 = 1875000;
    // r(1) = r(2) = 125000 (teleport only). Round 2+: r(3) = 125000 +
    // 2*(125000*7 div 8) = 125000 + 2*109375 = 343750, then stationary.
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 125000L && r(2L) == 125000L)
    assert(r(3L) == 343750L)
    val one = Graph.pagerank(edges, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(one(3L) == 1875000L)
  }

  test("pagerank deduplicates parallel edges and is deterministic") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = Graph.pagerank(edges, iters = 4).collect().map(_.toSeq).toSet
    val b = Graph.pagerank(edges.repartition(7), iters = 4).collect().map(_.toSeq).toSet
    assert(a == b)
    // symmetric 2-cycle: both vertices pin at 1e6 like any cycle
    assert(a == Set(Seq(1L, 1000000L), Seq(2L, 1000000L)))
  }

  test("audio frames: byte round-trip is exact, partial frames drop") {
    val media = Multimodal.syntheticPcm(Seq(3L, 7L).toDF("id"), "id")
    val feats = Multimodal.audioFrameFeatures(media).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // asset 3: (5 + 3%5)·160 = 1280 samples → 8 full frames of 160
    assert(feats.keys.count(_._1 == 3L) == 8)
    // hand-compute frame 0 of asset 3 from the generating formula
    val vals = (0 until 160).map(j => (31 * 3 + 17 * j) % 4096 - 2048)
    assert(feats((3L, 0)) ==
      (vals.map(v => math.abs(v).toLong).sum,
        vals.map(v => v.toLong * v).sum,
        vals.map(v => math.abs(v).toLong).max))
    // an 8-byte tail beyond the last full frame must not emit a frame
    val ragged = media.limit(1).selectExpr("asset_id", "modality",
      "concat(payload, CAST(x'0102030405060708' AS BINARY)) AS payload")
    val n0 = feats.keys.count(_._1 == 3L)
    assert(Multimodal.audioFrameFeatures(ragged).count() == n0)
  }

  test("dft bin energy: pure tone concentrates in its bin, fold is exact") {
    // payload = 1 frame of a pure bin-2 cosine at amplitude 1000 (16-bit LE)
    val n = 160
    val tone = Array.tabulate(n)(j =>
      math.round(1000.0 * math.cos(2.0 * math.Pi * 2 * j / n)).toShort)
    val bytes = new Array[Byte](n * 2)
    tone.zipWithIndex.foreach { case (v, j) =>
      bytes(2 * j) = (v & 0xff).toByte; bytes(2 * j + 1) = ((v >> 8) & 0xff).toByte
    }
    val media = Seq((1L, "audio", bytes)).toDF("asset_id", "modality", "payload")
    val out = Multimodal.dftBinEnergy(media).collect()
      .map(r => r.getInt(2) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Set(1, 2, 4, 8))
    // bin 2 carries ~N/2·amp·10³ in re; off bins only quantization residue
    assert(out(2)._3 > 100L * out(1)._3)
    assert(out(2)._3 > 100L * out(4)._3)
    assert(out(2)._3 > 100L * out(8)._3)
    // exact replay: same quantized tables, independent BigInt-free fold
    val expected = Seq(1, 2, 4, 8).map { k =>
      val re = (0 until n).map(j => tone(j).toLong *
        math.floor(math.cos(2.0 * math.Pi * k * j / n) * 1000 + 0.5).toLong).sum
      val im = (0 until n).map(j => tone(j).toLong *
        math.floor(math.sin(2.0 * math.Pi * k * j / n) * 1000 + 0.5).toLong).sum
      k -> ((re, im, re * re + im * im))
    }.toMap
    assert(out == expected)
  }

  test("dft bin energy: full-scale 16-bit input fails loudly, never wraps") {
    val n = 160
    def pcm(tone: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](tone.length * 2)
      tone.zipWithIndex.foreach { case (v, j) =>
        bytes(2 * j) = (v & 0xff).toByte; bytes(2 * j + 1) = ((v >> 8) & 0xff).toByte
      }
      bytes
    }
    // a FULL-SCALE square wave phase-locked to bin 1: |re| ≈ 32767·Σ|cos·10³|
    // ≈ 3.3e9 > 2³¹−1, so power = re²+im² would wrap Long — the guard must
    // throw with the offending frame identified, not emit garbage
    val hot = Array.tabulate(n) { j =>
      val c = math.cos(2.0 * math.Pi * j / n)
      (if (c >= 0) 32767 else -32768).toShort
    }
    val bad = Seq((9L, "audio", pcm(hot))).toDF("asset_id", "modality", "payload")
    val e = intercept[Throwable](Multimodal.dftBinEnergy(bad).collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).flatMap(t => Option(t.getMessage)).exists(_.contains("correlator overflow")),
      s"expected loud overflow, got $e")
    // full-scale NOISE (not bin-locked) stays within the bound and succeeds:
    // full-scale alone is not the trigger, amplitude x coherence is
    val noisy = Array.tabulate(n)(j =>
      (((j * 2654435761L) % 65536L) - 32768L).toShort)
    val ok = Seq((10L, "audio", pcm(noisy))).toDF("asset_id", "modality", "payload")
    val rows = Multimodal.dftBinEnergy(ok).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (re, im, p) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p == re * re + im * im && p >= 0)
    }
  }

  test("sssp: relaxation finds min-cost paths, not min-hop paths") {
    // 1→2→3 costs 1+1=2 beats the direct 1→3 edge of cost 5;
    // parallel edges collapse to the cheapest; 9 is unreachable → absent
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (1L, 3L, 7L),
      (3L, 4L, 2L), (9L, 9L, 1L)).toDF("src", "dst", "w")
    val r = Graph.sssp(edges.filter($"src" =!= 9L), sourceId = 1L, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
  }

  test("sssp: k rounds bound path length by k edges; order-independent") {
    val chain = (1L until 6L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val two = Graph.sssp(chain, sourceId = 1L, iters = 2).collect()
      .map(x => x.getLong(0)).toSet
    assert(two == Set(1L, 2L, 3L)) // frontier after 2 rounds: ≤ 2 hops
    val full = Graph.sssp(chain.repartition(5), sourceId = 1L, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(full == (1L to 6L).map(i => i -> (i - 1)).toMap)
  }

  test("bm25 matches hand computation and ranks rarer terms higher") {
    val corpus = Seq(
      (1L, "a a b"),   // tf(a)=2, dl=3
      (2L, "a c"),     // tf(a)=1, tf(c)=1, dl=2
      (3L, "b b b")    // no query terms
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(corpus, Seq("a", "c")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no query term
    // N=3, avgdl=8/3; df(a)=2 → idf=ln(1+1.5/2.5); df(c)=1 → idf=ln(1+2.5/1.5)
    def term(tf: Double, df: Double, dl: Double): Long = {
      val idf = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      val t = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0)))
      math.floor(t * 1e6 + 0.5).toLong
    }
    def disp(micro: Long): Double =
      BigDecimal(micro / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((1L, term(2, 2, 3), disp(term(2, 2, 3)))))
    val d2 = term(1, 2, 2) + term(1, 1, 2)
    assert(got(2L)._1 == 2L && got(2L)._2 == d2)
    // the rare term c dominates: doc 2 outranks doc 1
    assert(got(2L)._2 > got(1L)._2)
  }

  test("bm25 incremental: merge-maintained stats score identically to rebuild") {
    val corpus = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "b b b"), (4L, "c c a b"), (5L, "")
    ).toDF("doc_id", "text")
    // batch 1+2 folded into stats of 3+4+5, vs one full build — and the
    // scores from the maintained table must equal the aggregate-form bm25
    val merged = TextOps.bm25MergeStats(
      TextOps.bm25Stats(corpus.filter($"doc_id" >= 3L)),
      corpus.filter($"doc_id" < 3L))
    val rebuilt = TextOps.bm25Stats(corpus)
    assert(merged.collect().toSet == rebuilt.collect().toSet)
    val viaStats = TextOps.bm25WithStats(corpus, merged, Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = TextOps.bm25(corpus, Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaStats == direct)
  }

  test("pqTopK: codes are nearest sub-codewords, ADC is the exact lut sum") {
    // 4-dim vectors, m=2 → two 2-dim subspaces; codebook of two codewords
    val cb = Seq(Seq(0.0, 0.0, 10.0, 10.0), Seq(4.0, 0.0, 10.0, 14.0))
    val corpus = Seq(
      (1L, Seq(0.5f, 0.0f, 10.0f, 10.0f)), // sub0 → cw0 (0.25 vs 12.25), sub1 → cw0 (0 vs 16)
      (2L, Seq(3.5f, 0.0f, 10.0f, 13.0f)), // sub0 → cw1 (12.25 vs 0.25), sub1 → cw1 (9 vs 1)
      (3L, Seq(2.0f, 0.0f, 10.0f, 12.0f))  // sub0 TIE (4 vs 4) → cw0; sub1 tie (4 vs 4) → cw0
    ).toDF("vec_id", "embedding")
    val query = Seq(0.0, 0.0, 10.0, 10.0) // = cw0: lut0 = [0, 16e6], lut1 = [0, 16e6]
    val got = Similarity.pqTopK(corpus, cb, query, m = 2, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    assert(got(1L) == ((0, 0, 0L, 1)))           // both codes 0 → adc 0
    assert(got(3L) == ((0, 0, 0L, 2)))           // ties go to the lowest codeword
    assert(got(2L) == ((1, 1, 32000000L, 3)))    // 16e6 + 16e6
  }

  test("rrfFuse: integer nano fusion, consensus count, total order") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val fused = Similarity.rrfFuse(Seq(r1, r2)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    def c(rank: Int): Long = 1000000000L / (60 + rank)
    assert(fused(10L) == ((c(1) + c(2), 2L, 1)))  // 1/61+1/62 beats 1/61+1/62? see below
    assert(fused(20L) == ((c(2) + c(1), 2L, 2)))  // same mass, id tiebreak
    assert(fused(30L) == ((c(3), 1L, 3)))
    assert(fused(40L) == ((c(3), 1L, 4)))
  }

  test("fingerprint is order-sensitive (rolling-hash class)") {
    val df = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) != fps(2L))
  }

  test("multimodal: non-image payloads take the byte-feature fallback") {
    val media = Multimodal.syntheticFromText(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.asset_id -> f).toMap
    assert(feats(1L).checksum == feats(2L).checksum) // same payload → same checksum
    assert(feats(1L).checksum != feats(4L).checksum)
    assert(feats(1L).feature.sum > 0.99 && feats(1L).feature.sum < 1.01) // normalized hist
    assert(feats(1L).n_bytes == "the quick brown fox jumps over the lazy dog".length)
    assert(feats(1L).width.isEmpty && feats(1L).height.isEmpty) // not a decodable image
  }

  test("multimodal: PNG payloads decode for real through javax.imageio") {
    // 3×2 gray raster with known samples; PNG is lossless so the decoded
    // features must be exact
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val png = Multimodal.encodeGrayPng(3, 2, px)
    val f = Multimodal.decodeImage(png).get
    assert(f.width == 3 && f.height == 2)
    assert(f.sumV == 210)
    // position-weighted: Σ v·(x + w·y) with row-major index as the weight
    assert(f.wsumV == px.zipWithIndex.map { case (v, i) => (v & 0xff).toLong * i }.sum)
    var expectChecksum = 0L
    px.foreach(v => expectChecksum = (expectChecksum * 31 + (v & 0xff)) & 0x7fffffffffffffL)
    assert(f.checksum == expectChecksum)
    // garbage bytes are not an image
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)

    // and through the batched Dataset path: geometry populated, synthetic
    // formula reproduced end to end (encode → decode → aggregate)
    val media = Multimodal.syntheticPngs(docs, "doc_id")
    val feats = Multimodal.imagePixelFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 4L)) {
      val w = (id % 5 + 4).toInt; val h = (id % 3 + 4).toInt
      val expSum = (for (y <- 0 until h; x <- 0 until w)
        yield (7 * id + 3 * x + 5 * y) % 256).sum
      val row = feats(id)
      assert(row.getInt(1) == w && row.getInt(2) == h)
      assert(row.getLong(4) == expSum, s"asset $id sum_v")
    }
    val ext = Multimodal.extractFeatures(media).collect().map(f => f.asset_id -> f).toMap
    assert(ext(1L).width.contains(5) && ext(1L).height.contains(5))
  }

  test("span dedup: spans shared across docs are flagged, unique docs are clean") {
    val d = Seq(
      (1L, "a b c d e f g h"), // window=4 → spans "a b c d" | "e f g h"
      (2L, "a b c d x y z w"), // shares "a b c d" with doc 1
      (3L, "p q r s t u v ww")).toDF("doc_id", "text")
    val r = Dedup.spanDupStats(d, window = 4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)))
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((2L, 0L, 0.0)))
    // a span repeated only WITHIN one doc is not cross-doc boilerplate
    val self = Seq((9L, "a b a b")).toDF("doc_id", "text")
    assert(Dedup.spanDupStats(self, window = 2).collect()(0).getLong(2) == 0L)
  }

  test("contamination: distinct n-gram overlap against a broadcast benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"), // 4 distinct 5-grams, 1 hit
      (2L, "totally unrelated words appear here now then"),
      (3L, "too short")).toDF("doc_id", "text") // < n tokens → no grams, no row
    val r = Dedup.contamination(corpus, bench, n = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4L, 1L, 0.25)))
    assert(r(2L)._2 == 0L && r(2L)._3 == 0.0)
    assert(!r.contains(3L))
  }

  test("repetition signals: duplicate-bigram and top-bigram fractions") {
    val d = Seq(
      (1L, "spam spam spam spam"),   // 1 distinct token; bigram "spam spam" ×3
      (2L, "all words here differ"), // 3 distinct bigrams
      (3L, "one")).toDF("doc_id", "text") // no bigrams → null fractions
    val r = TextOps.repetitionSignals(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 4 && r(1L).getDouble(2) == 0.25)
    assert(r(1L).getDouble(3) == 0.6667 && r(1L).getDouble(4) == 1.0)
    assert(r(2L).getDouble(3) == 0.0 && r(2L).getDouble(4) == 0.3333)
    assert(r(3L).isNullAt(3) && r(3L).isNullAt(4))
  }

  test("stratified sample: deterministic per-group keep rates, no RNG") {
    val base = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("xx").as("lang"))
    val kept = TextOps.stratifiedSample(base, Map("en" -> 50), defaultPct = 10)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") > 150 && counts("en") < 350) // ≈250 of 500 at 50%
    assert(counts("xx") > 10 && counts("xx") < 120)  // ≈50 of 500 at 10%
    // buckets honor the rate cut exactly
    assert(kept.filter(col("lang") === "en" && col("bucket") >= 50).count() == 0)
    assert(kept.filter(col("lang") === "xx" && col("bucket") >= 10).count() == 0)
    // deterministic: identical id set on re-run
    val again = TextOps.stratifiedSample(base, Map("en" -> 50), defaultPct = 10)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() == 0)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("mixture sample: exact quotas, availability caps visible, deterministic") {
    // 4 domains × 100 docs; weights 5:3:2 and budget 90 → quotas 45/27/18
    // for a/b/c, 0 for the unweighted d. Shrink domain c to 10 docs so the
    // availability-capped path (quota 18 > 10 present) is exercised too.
    val base = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 4)).as("source"))
      .filter(!(col("source") === "s2" && col("doc_id") >= 40))
    val kept = TextOps.mixtureSample(base,
      Map("s0" -> 5L, "s1" -> 3L, "s2" -> 2L), budget = 90L)
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 45L, "s1" -> 27L, "s2" -> 10L)) // s2 capped, s3 absent
    // quota column reports the TARGET even when availability falls short
    assert(kept.filter(col("source") === "s2").select(max("mix_quota"))
      .head.getLong(0) == 18L)
    assert(kept.filter(col("mix_rank") > col("mix_quota")).count() == 0)
    // deterministic: identical doc set on recompute
    val again = TextOps.mixtureSample(base,
      Map("s0" -> 5L, "s1" -> 3L, "s2" -> 2L), budget = 90L)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() == 0)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
    // degenerate weights rejected loudly
    intercept[IllegalArgumentException] {
      TextOps.mixtureSample(base, Map("s0" -> 0L), budget = 10L)
    }
  }

  test("components converges on a long path graph (pointer jumping, multi-round)") {
    // 0-1-2-…-199 as a single chain: min-label propagation alone needs 199
    // rounds; pointer jumping must close it within maxIters=20 (O(log n)),
    // and the propagation-based convergence check must not exit early
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val r = Dedup.components(chain, maxIters = 20).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 200)
    assert(r.values.forall(_ == 0L), s"non-zero labels: ${r.filter(_._2 != 0L).take(5)}")
    // two disjoint cliques stay separate
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc1", "doc2")
    val g = Dedup.components(two).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // empty pair relation converges immediately to an empty labeling
    assert(Dedup.components(Seq.empty[(Long, Long)].toDF("doc1", "doc2")).count() == 0)
  }

  test("near-dedup keepers: end-to-end keep/drop over exact, near, and unique docs") {
    val r = Dedup.nearDedupKeepers(docs, k = 8, rowsPerBand = 2, minJaccard = 0.5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getInt(2)))).toMap
    assert(r(1L) == ((1L, 1)))  // group representative
    assert(r(2L) == ((1L, 0)))  // exact dup → dropped
    assert(r(3L)._2 == (if (r(3L)._1 == 3L) 1 else 0)) // near dup may fold into group 1
    assert(r(4L) == ((4L, 1)))  // unique → own group, kept
    assert(r.size == 4)         // every corpus doc gets a decision
  }

  test("interval join: bucketized containment equals the naive inequality join") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq(
      (1L, 7L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00")),
      (2L, 7L, t("2026-01-01 10:30:00"), t("2026-01-01 10:45:00")), // spans no bin edge
      (3L, 8L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00"))) // other key
      .toDF("iv_id", "user_id", "w_start", "w_end")
    val pts = Seq(
      (7L, t("2026-01-01 10:40:00")), // in 1 and 2
      (7L, t("2026-01-01 10:59:59")), // in 1 only (bin boundary area)
      (7L, t("2026-01-01 11:00:00")), // end-exclusive → in none
      (8L, t("2026-01-01 10:10:00"))) // key 8 → interval 3 only
      .toDF("user_id", "ts")
    val got = RangeJoin.intervalJoin(iv, pts, Seq("user_id"),
        "w_start", "w_end", "ts", binWidthSec = 1800)
      .groupBy("iv_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // each qualifying pair meets in exactly one bin — no dup rows pre-agg
    val raw = RangeJoin.intervalJoin(iv, pts, Seq("user_id"),
      "w_start", "w_end", "ts", binWidthSec = 60)
    assert(raw.count() == raw.dropDuplicates("iv_id", "ts").count())
  }

  test("substring dup coverage: overlapping windows union into passage intervals") {
    // docs 1 and 2 share the 10-token passage w1..w10 at different offsets;
    // doc 3 shares nothing. window=8 → passage yields 3 dup windows per doc
    // whose union covers exactly the 10 passage tokens.
    val passage = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"$passage alpha beta gamma delta epsilon"),
      (2L, s"pre1 pre2 pre3 $passage tail1 tail2"),
      (3L, "nothing here repeats anywhere in the corpus at all"))
      .toDF("doc_id", "text")
    val r = Dedup.substringDupCoverage(d, window = 8).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((15L, 10L, 0.6667)))
    assert(r(2L) == ((15L, 10L, 0.6667)))
    assert(!r.contains(3L)) // no duplicated span → not reported
    // a doc REPEATING its own passage is self-duplicated
    val selfDup = Seq((9L, s"$passage filler1 filler2 $passage")).toDF("doc_id", "text")
    val s = Dedup.substringDupCoverage(selfDup, window = 8).collect()(0)
    assert(s.getLong(2) == 20L) // both passage occurrences covered
  }

  test("unigram surprisal: common tokens score low, rare tokens high, exact mean") {
    val d = Seq(
      (1L, "common common common common"), // p=4/8 → -ln(.5) ≈ 0.6931
      (2L, "rare1 rare2 rare3 rare4"))     // each p=1/8 → ln 8 ≈ 2.0794
      .toDF("doc_id", "text")
    val r = TextOps.unigramSurprisal(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((4L, 0.6931)))
    assert(r(2L) == ((4L, 2.0794)))
    assert(r(1L)._2 < r(2L)._2) // templated text is less surprising
  }

  test("quality gate keeps the exact top fraction per group, ties on doc_id") {
    val good = ("the quick brown fox jumps over the lazy dog. " * 6).trim
    val d = (1L to 10L).map(i => (i, if (i <= 4) good else "bad", "en"))
      .toDF("doc_id", "text", "lang")
    // 10 docs, keep 3/10 → exactly 3; docs 1-4 tie at top quality → 1,2,3
    val kept = TextOps.qualityGate(d, keepNum = 3, keepDen = 10)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L))
    // a group smaller than the fraction still keeps its best single doc
    val tiny = Seq((1L, good, "fr"), (2L, "bad", "fr")).toDF("doc_id", "text", "lang")
    assert(TextOps.qualityGate(tiny, 1, 10).select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("token-budget sample: hash-order prefix per group, budget never exceeded") {
    val d = (1L to 20L).map(i => (i, ("tok " * 10).trim, if (i <= 10) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.tokenBudgetSample(d, budget = 35L)
    val got = r.collect()
    // every kept row's running total respects the budget; 10 tokens/doc → 3 kept per group
    assert(got.forall(_.getLong(3) <= 35L))
    assert(got.count(_.getString(1) == "a") == 3 && got.count(_.getString(1) == "b") == 3)
    // deterministic replay: identical kept set
    assert(r.except(TextOps.tokenBudgetSample(d, budget = 35L)).isEmpty)
    // the kept set is the PREFIX of the hash ordering, not an arbitrary subset
    val orderA = d.filter(col("source") === "a")
      .select(col("doc_id"), graft.functions.PortableHash.hash32(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").select("doc_id").as[Long].collect().take(3).toSet
    assert(got.filter(_.getString(1) == "a").map(_.getLong(0)).toSet == orderA)
  }

  test("semantic dup: identical embeddings collapse to lowest id, distinct ones survive") {
    val v1 = Array.tabulate(8)(i => 1.0f / (i + 1))
    val v2 = v1.map(x => x * 2.0f)                       // cosine 1 with v1
    val v3 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f) // far from v1
    val e = Seq((10L, v1.toSeq), (20L, v2.toSeq), (30L, v3.toSeq))
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDup(e, dim = 8, bits = 4, tau = 0.9).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    assert(r(10L).isEmpty)            // representative
    assert(r(20L).contains(10L))      // parallel vector → dup of the lowest id
    assert(r(30L).isEmpty)            // dissimilar → kept
    // a degenerate bucket above the cap is dropped: its members are all kept
    val capped = Similarity.semanticDup(e, dim = 8, bits = 4, tau = 0.9,
        maxBucketSize = 1).collect()
    assert(capped.forall(_.isNullAt(2)), "capped buckets must not pair")
    assert(capped.length == 3)
  }

  test("adaptiveBits: exact integer ladder, boundary-stable (VERDICT r16 #1)") {
    import graft.operators.Similarity.adaptiveBits
    // smallest b in [min, max] with n ≤ target·2^b — the e6 sizing rule
    assert(adaptiveBits(0, 24, 4, 16) == 4)
    assert(adaptiveBits(1, 24, 4, 16) == 4)
    assert(adaptiveBits(24L << 4, 24, 4, 16) == 4)      // exact boundary stays
    assert(adaptiveBits((24L << 4) + 1, 24, 4, 16) == 5) // one past it steps
    assert(adaptiveBits(500, 24, 4, 16) == 5)   // sf0.01 embeddings
    assert(adaptiveBits(2000, 24, 4, 16) == 7)  // sf0.1
    assert(adaptiveBits(20000, 24, 4, 16) == 10) // sf1
    assert(adaptiveBits(200000, 24, 4, 16) == 14) // sf10
    assert(adaptiveBits(Long.MaxValue, 24, 4, 16) == 16) // clamped at max
    // oracle-ladder identity: the SQL CASE the e6 oracle generates makes
    // the same comparisons (cnt <= target << b ascending, ELSE max)
    for (n <- Seq(1L, 383L, 384L, 385L, 6144L, 6145L, 999999L)) {
      val sqlLadder = (4 until 16).find(b => n <= (24L << b)).getOrElse(16)
      assert(adaptiveBits(n, 24, 4, 16) == sqlLadder, s"n=$n")
    }
  }

  test("multimodal: frame-sample plan from metadata only") {
    val media = Seq((1L, "video", 2500L)).toDF("asset_id", "modality", "duration_ms")
      .select(col("asset_id"), col("modality"),
        struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          col("duration_ms"), lit(null).cast("int").as("sample_rate")).as("meta"))
    val frames = Multimodal.sampleFramePlan(media, everyMs = 1000).collect()
    assert(frames.map(_.getLong(2)).toSeq == Seq(0L, 1000L, 2000L))
  }

  test("edit verify: levenshtein over candidate pairs only, corpus not self-joined") {
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("doc1", "doc2")
    val r = Dedup.editVerify(docs, pairs, prefixLen = 80).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getInt(2)).toMap
    assert(r((1L, 3L)) == 3) // jumps → leaps: one 1-char and one 2-char edit run
    assert(r((1L, 4L)) > 20) // unrelated texts are far apart
    assert(r.size == 2)      // exactly the candidate relation, nothing more
  }

  test("minhash estimate: identical docs 1.0, near dups fractional, exact rational") {
    val sigs = Dedup.minhashSignatures(docs, k = 8)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    val r = Dedup.minhashEstimate(sigs, pairs, k = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getInt(2), x.getDouble(3))).toMap
    assert(r((1L, 2L)) == ((8, 1.0)))
    val (eq13, est13) = r((1L, 3L))
    assert(eq13 < 8 && est13 == eq13 / 8.0)
  }

  test("bigram surprisal: repeated word order scores lower than shuffled order") {
    // corpus: 'a b' appears 3×, 'b a' once → P(b|a) high, P(a|b) low
    val c = Seq((1L, "a b a b a b"), (2L, "b a"), (3L, "a b"))
      .toDF("doc_id", "text")
    val r = TextOps.bigramSurprisal(c).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L)._1 == 5) // 6 tokens → 5 bigrams
    assert(r(3L)._1 == 1)
    // the lone reversed bigram is more surprising than the common one
    assert(r(2L)._2 > r(3L)._2)
    // single-token docs have no bigrams and are absent
    val single = TextOps.bigramSurprisal(Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(single.isEmpty)
  }

  test("distance join: cell binning equals the naive cross join, pairs emitted once") {
    val l = Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 9.9, 0.1))
      .toDF("id", "x", "y")
    val r = Seq((10L, 0.5, 0.5), (11L, 5.0, 6.9), (12L, 20.0, 20.0),
      (13L, 10.0, 0.0)).toDF("id", "x", "y")
    val got = DistanceJoin.join(l, r, d = 2.0).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val want = (for {
      a <- Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 9.9, 0.1))
      b <- Seq((10L, 0.5, 0.5), (11L, 5.0, 6.9), (12L, 20.0, 20.0), (13L, 10.0, 0.0))
      d = math.sqrt(math.pow(a._2 - b._2, 2) + math.pow(a._3 - b._3, 2))
      if d <= 2.0
    } yield (a._1, b._1) -> d).toMap
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12)
    // cross-cell pair (3,13): points in different cells, still found once
    assert(got.contains((3L, 13L)))
  }

  test("nearestWithinSq: exact integer min-d², self hits zero, beyond-radius absent") {
    val pts = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 10L, 10L), (4L, 30L, 30L))
      .toDF("id", "x", "y")
    val targets = pts.filter($"id" =!= 4L && $"id" =!= 3L) // targets: 1, 2
    val got = DistanceJoin.nearestWithinSq(pts, targets, d = 3.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 2 are themselves targets → 0; 3 and 4 beyond radius → absent
    assert(got == Map(1L -> 0L, 2L -> 0L))
    val asym = DistanceJoin.nearestWithinSq(
      Seq((9L, 1L, 1L)).toDF("id", "x", "y"), targets, d = 3.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asym == Map(9L -> 2L)) // min((1-0)²+1², (1-2)²+1²) = 2
  }

  test("distance join: negative coordinates bin on the floor lattice, not truncation") {
    // all three close pairs straddle cell boundaries at negative
    // coordinates — truncation-based binning (cast instead of floor) maps
    // -0.1 and 0.1 to the SAME cell 0 and breaks neighbor enumeration
    val l = Seq((1L, -0.1, 0.0), (2L, -2.9, -3.1)).toDF("id", "x", "y")
    val r = Seq((10L, 0.1, 0.0), (11L, -3.1, -2.9), (12L, -0.9, -0.9))
      .toDF("id", "x", "y")
    val got = DistanceJoin.join(l, r, d = 1.5).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L), (1L, 12L)))
  }

  test("dbscan: two dense blobs cluster separately, bridge point is border, outlier is noise") {
    // blob A: 4 points within eps of each other around (0,0); blob B around (10,10);
    // point 100 is within eps of one core of A but has too few neighbors itself;
    // point 200 is far from everything
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5), (4L, 0.5, 0.5),
      (11L, 10.0, 10.0), (12L, 10.5, 10.0), (13L, 10.0, 10.5), (14L, 10.5, 10.5),
      (100L, 1.4, 0.5), // eps-reaches 2/4 only → border of A
      (200L, 50.0, 50.0))
      .toDF("id", "x", "y")
    val r = Cluster.dbscan(pts, eps = 1.0, minPts = 4).collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)).map(_.asInstanceOf[Long]), x.getString(2)))
      .toMap
    for (i <- Seq(1L, 2L, 3L, 4L)) assert(r(i) == ((Some(1L), "core")), s"pt $i: ${r(i)}")
    for (i <- Seq(11L, 12L, 13L, 14L)) assert(r(i) == ((Some(11L), "core")), s"pt $i: ${r(i)}")
    assert(r(100L) == ((Some(1L), "border")))
    assert(r(200L) == ((None, "noise")))
  }

  test("triangles: each triangle counts once per vertex, chains have none") {
    // K4 on {1,2,3,4} (4 triangles, 3 per vertex) + a chain 5-6-7 (0 triangles);
    // reversed/duplicate edges must not double-count
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L), (2L, 1L), // duplicates, reversed
      (5L, 6L), (6L, 7L)).toDF("doc1", "doc2")
    val r = Graph.triangles(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: degree orientation keeps hub wedges bounded") {
    // 200-leaf star: under (degree, id) orientation every star edge points
    // INTO the hub (leaves have degree 1 or 2, hub 201), so the hub pairs
    // no out-neighbors — the id-ordered enumeration would have generated
    // C(200,2) = 19,900 wedges from it. One rim edge 5—6 closes exactly one
    // triangle; the remaining 199 leaves stay triangle-free.
    val hub = 1000L
    val star = (1L to 200L).map(i => (hub, i))
    val edges = (star :+ (5L, 6L)).toDF("doc1", "doc2")
    val counted = Graph.triangles(edges)
    val r = counted.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(hub -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("inverted index: numeric-ordered postings, df filter at the aggregate") {
    val idx = TextOps.invertedIndex(docs, minDf = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(idx("the") == ((3L, "1,2,3")))   // distinct per doc: df=3 not 6
    assert(idx("jumps") == ((2L, "1,2")))
    assert(!idx.contains("spark"))          // df=1 pruned
  }

  test("span scrub: corpus-duplicated spans removed from EVERY carrier") {
    // window=3: docs 1/2 share span "a b c" (dropped from both); each keeps
    // its distinct tail span; doc 3 is untouched (all spans unique to it)
    val d = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c p q r"),
      (3L, "u v w m n o"))
      .toDF("doc_id", "text")
    val r = Dedup.scrubDupSpans(d, window = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))))
      .toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == ((2L, 1L, 3L, m("x y z"))))
    assert(r(2L) == ((2L, 1L, 3L, m("p q r"))))
    assert(r(3L) == ((2L, 2L, 6L, m("u v w m n o"))))
    // same span TWICE in one doc is not a corpus dup (distinct-doc census)
    val solo = Seq((7L, "a b c a b c")).toDF("doc_id", "text")
    val s7 = Dedup.scrubDupSpans(solo, window = 3).collect().head
    assert(s7.getLong(2) == 2L && s7.getString(4) == m("a b c a b c"))
  }

  test("misra-gries: mergeable summary is a certain heavy-hitter superset") {
    val mg = new TextOps.MisraGries(4)
    // stream: 40 a, 30 b, 5 c..g singles spread across two partitions
    val p1 = Seq.fill(25)("a") ++ Seq.fill(10)("b") ++ Seq("c", "d", "e")
    val p2 = Seq.fill(15)("a") ++ Seq.fill(20)("b") ++ Seq("f", "g")
    val merged = mg.merge(
      p1.foldLeft(mg.zero)(mg.reduce), p2.foldLeft(mg.zero)(mg.reduce))
    assert(merged.size <= 4)
    // N=75, k=4 ⇒ anything with freq > 15 is guaranteed present, and the
    // estimate undercounts by at most N/(k+1) = 15
    assert(merged.contains("a") && merged("a") >= 40L - 15L)
    assert(merged.contains("b") && merged("b") >= 30L - 15L)
  }

  test("heavy hitters: two-pass output equals the exact threshold count") {
    val d = Seq(
      (1L, "x x x x x x x x y y y y z w"),
      (2L, "x x y y z q r s t u v")).toDF("doc_id", "text")
    // N=25 tokens; support=5 ⇒ threshold cnt*5 >= 25 ⇒ cnt >= 5
    val r = TextOps.heavyHitters(d, support = 5).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getInt(2)))
    assert(r.toSeq == Seq(("x", 10L, 1), ("y", 6L, 2)))
  }

  test("label propagation: communities split at the bridge, ties to min") {
    // two triangles joined by one bridge edge 3—4: LPA converges to the
    // min label of each triangle; the bridge never outvotes the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("doc1", "doc2")
    val r = Graph.labelPropagation(edges, iters = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L && r(2L) == 1L && r(3L) == 1L)
    assert(Set(4L, 5L, 6L).map(r).size == 1, s"right triangle one community: $r")
    assert(r(4L) != r(1L) || r(5L) != r(2L), s"bridge must not merge all: $r")
  }

  test("kcore peel: clique survives, pendant chain cascades off") {
    // 4-clique (deg 3 each) with a chain 4—5—6 hanging off vertex 4:
    // k=3 round 1 removes 6 (deg 1) and 5 (deg 2); round 2 sees vertex 4
    // back at clique degree 3 — the cascade never touches the clique
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("doc1", "doc2")
    val r = Graph.kcorePeel(edges, k = 3, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("grid quantiles: hand-computed interpolation, degenerate group") {
    val d = Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "value")
    val r = Sketch.gridQuantiles(d, "value", "g", buckets = 2).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    // group a: lo=0 hi=3, width 1.5, counts (2,2) → q25=.75 q50=1.5 q75=2.25
    assert(r("a") == ((750L, 1500L, 2250L, 4L)))
    // all-equal group: every quantile is the value itself
    assert(r("b") == ((7000L, 7000L, 7000L, 2L)))
  }

  test("kmeansExact: integer Lloyd rounds, floor-mean update, ties to min cid") {
    val vecs = Seq((0L, Seq(0L)), (1L, Seq(4L)), (2L, Seq(6L))).toDF("vec_id", "qv")
    val init = Seq((0, Seq(0L)), (1, Seq(9L))).toDF("cid", "c")
    val r = Similarity.kmeansExact(vecs, init, iters = 2).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(2)))).toMap
    // round 1 assigns {0,4}→c0, {6}→c1; update: c0 = floor(4/2) = 2, c1 = 6
    // round 2: vec 4 sits distance² 4 from BOTH centroids → tie → cid 0
    assert(r(0L) == ((0, 4L)))
    assert(r(1L) == ((0, 4L)))
    assert(r(2L) == ((1, 0L)))
  }

  test("normalize: case fold, strip non-alnum, collapse whitespace") {
    val d = Seq((1L, "  Hello,   WORLD!! 42  "), (2L, "a\tb\nc")).toDF("doc_id", "text")
    val r = d.select(col("doc_id"), TextOps.normalizeText(col("text")).as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "hello world 42")
    assert(r(2L) == "a b c")
  }

  test("gopher rules: each rule individually actionable, keep = conjunction") {
    val fifty = (1 to 50).map(i => s"w$i").mkString(" ")  // 50 short tokens
    val d = Seq(
      (1L, fifty + " the and of to"),                   // all rules pass
      (2L, "too short the and"),                        // fails n_tokens
      (3L, fifty.replace(" ", "xxxxxxxxxx ") + " the and")) // long words
      .toDF("doc_id", "text")
    val r = TextOps.gopherRules(d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4), x.getInt(5))))
      .toMap
    assert(r(1L) == ((1, 1, 1, 1, 1)))
    assert(r(2L)._1 == 0 && r(2L)._5 == 0)
    assert(r(3L)._2 == 0 && r(3L)._5 == 0)
  }
}
