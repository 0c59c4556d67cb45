package graft.operators

import graft.functions.PortableHash._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Beyond-reference surface (BASELINE.json north star). Every variant is a
  * pure DataFrame program whose only wide operations are the groupBys /
  * joins that the algorithm fundamentally requires:
  *
  *  - exact:   one hash aggregate on a 32-hex digest (not the raw text, so
  *             shuffle rows are 32 bytes + ids at 100 TB, not documents).
  *  - minhash: explode → per-doc signature (k mins, map-side combined) →
  *             band-bucket join. Candidate pairs only within LSH buckets —
  *             never the O(n²) cross join.
  *  - simhash: per-doc 16-bit signature via weighted bit votes; near-dups
  *             share signatures within Hamming radius (bucket on signature).
  *  - jaccard: token-set similarity verified on LSH candidates only.
  */
object Dedup {

  /** Lowercased word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Exact dedup (keep lowest doc_id per identical text). */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .groupBy("digest")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signature: k affine permutations over distinct token
    * hashes, computed as ONE per-row array fold — a narrow map with ZERO
    * shuffle. The equivalent explode + groupBy shuffles a (doc_id, token)
    * row per corpus token, which at 100 TB is the single largest exchange
    * of the whole dedup pipeline; this form keeps signature building fused
    * into the scan and leaves the (inherent) shuffling to the band join.
    *
    * The fold carries all k running mins in one array accumulator, so the
    * token hash materializes once per token (not once per permutation).
    * The struct-of-mins is selected as an attribute before the per-field
    * projection: `aggregate` is non-cheap, so CollapseProject keeps the
    * barrier instead of inlining the fold k times. Docs with no tokens
    * have no signature (same contract as the explode form, whose groupBy
    * never saw them). */
  def minhashSignatures(docs: DataFrame, k: Int, keep: Seq[String] = Nil): DataFrame = {
    val carried = ("doc_id" +: keep).map(col)
    // ONE primitive-loop kernel call per document (TextKernels.MinHashSig,
    // round 16): per token, one MD5 over raw bytes + k fused multiply-min
    // updates in a JIT'd loop. The HOF fold this replaces ran interpreted
    // per token per permutation (zip_with allocating the accumulator each
    // step, the md5 hex string re-parsed through conv) — the dominant
    // scalar cost of signature building once the bench stopped letting
    // count() prune it. Bit-identical output (TextKernelsSpec asserts the
    // kernel against the HOF form); duplicate tokens need no distinct —
    // min is idempotent. The split stays in Catalyst (codegen'd); docs
    // with no surviving token yield a null signature and are dropped,
    // exactly the rows the old size(__toks) > 0 filter removed.
    val sigs = docs
      .select(carried :+ graft.functions.TextKernels
        .minhashSig(split(lower(col("text")), "\\s+"), k).as("__mins"): _*)
      .filter(col("__mins").isNotNull)
    // __mins is a multi-referenced non-cheap alias: CollapseProject keeps
    // the barrier, so the kernel runs once per row, not k times
    sigs.select(carried ++
      (0 until k).map(i => element_at(col("__mins"), i + 1).as(s"mh$i")): _*)
  }

  /** LSH band buckets: rows of (band, bucket, doc_id). Docs sharing a
    * bucket in ANY band are near-dup candidates. The bucket key is the raw
    * struct of the band's `rowsPerBand` minhash values — native longs hash
    * and compare far cheaper through the bucket join than a digest string,
    * and at 100 TB that join's probe side is the whole corpus. */
  def lshBuckets(sigs: DataFrame, k: Int, rowsPerBand: Int,
                 keep: Seq[String] = Nil): DataFrame = {
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .zipWithIndex.map { case (i, j) => col(s"mh$i").as(s"v$j") }
      struct(lit(b).as("band"), struct(cols: _*).as("bucket"))
    }
    val carried = ("doc_id" +: keep).map(col)
    sigs.select(carried :+ explode(array(bands: _*)).as("bb"): _*)
      .select(col("bb.band") +: col("bb.bucket") +: carried: _*)
  }

  /** Shared degenerate-bucket guard: drop (band, bucket) groups larger than
    * `maxBucketSize` from a bucket relation. The oversized set is tiny by
    * definition (few degenerate buckets) and the per-bucket count is one
    * map-side-combined aggregate — never O(corpus) on one node. The
    * aggregate runs ONCE: its rows are collected (they drive the log line
    * AND become a local relation for the anti-join), so the corpus bucket
    * scan is not repeated for the join. */
  private def dropOversized(buckets: DataFrame, maxBucketSize: Int,
                            tag: String): DataFrame = {
    val over = buckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bsz")).filter(col("__bsz") > maxBucketSize)
    val rows = over.collect()
    if (rows.isEmpty) buckets
    else {
      System.err.println(
        s"[graft] $tag: dropping ${rows.length} buckets " +
          s"(${rows.map(_.getLong(2)).sum} rows) above cap $maxBucketSize")
      val local = buckets.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), over.schema)
      buckets.join(broadcast(local.select("band", "bucket")),
        Seq("band", "bucket"), "left_anti")
    }
  }

  /** Candidate near-dup pairs from LSH buckets (doc1 < doc2, distinct).
    *
    * The probe side is repartitioned first: a broadcast bucket join emits
    * its (possibly huge) pair output with the STREAM side's partitioning,
    * and the bucket relation is tiny — without the spread, the downstream
    * distinct of millions of pairs runs in a couple of tasks. Spreading the
    * 10k-row probe side costs nothing and restores full parallelism.
    *
    * `maxBucketSize` guards the within-bucket self-join: a degenerate
    * bucket (shared boilerplate, tiny vocab) otherwise emits O(n²) pairs
    * and a boilerplate-heavy corpus at 100 TB never finishes. Buckets above
    * the cap are dropped entirely — standard LSH practice: members of an
    * oversized bucket are near-everything, so the bucket carries no
    * discriminating signal, and true near-dups still meet in their other
    * bands. Dropped bucket/row counts are logged — note the logging runs
    * the bucket-count aggregate EAGERLY at plan construction (one small
    * extra job); pass 0 to disable the cap and stay fully lazy. */
  /** Arrival-ordered near-dup verdicts — the batch twin of
    * [[graft.streaming.StreamJob.streamingNearDup]] (st7): doc D is a
    * near-dup of the SMALLEST-id EARLIER doc E (doc_id = arrival order)
    * that shares an LSH band bucket with D and agrees on ≥ `minMatch` of
    * the k minhash components. Output: one row per signed doc with a
    * nullable `dup_of` — `NULL` = kept (novel) — i.e. the verdict column
    * a dedup-at-ingest pipeline writes next to every accepted document.
    *
    * Scale shape: bucket-keyed self-join only (degenerate buckets above
    * `maxBucketSize` dropped — d3's guard), the similarity check is a
    * fixed k-component compare per CANDIDATE pair (doc-keyed signature
    * joins, pair-local), then one min aggregate per doc. Never all-pairs. */
  def nearDupVerdicts(docs: DataFrame, k: Int = 4, rowsPerBand: Int = 2,
                      minMatch: Int = 3, maxBucketSize: Int = 0): DataFrame = {
    require(minMatch >= rowsPerBand && minMatch <= k,
      s"minMatch $minMatch outside [$rowsPerBand, $k]")
    val sigs = graft.core.Caching.shared(minhashSignatures(docs, k))
    val buckets = lshBuckets(sigs, k, rowsPerBand)
    val kept =
      if (maxBucketSize <= 0) buckets
      else dropOversized(graft.core.Caching.shared(buckets),
        maxBucketSize, "nearDupVerdicts")
    val pairs = kept.as("ka").join(kept.as("kb"),
        col("ka.band") === col("kb.band") && col("ka.bucket") === col("kb.bucket") &&
          col("ka.doc_id") < col("kb.doc_id"))
      .select(col("ka.doc_id").as("cand"), col("kb.doc_id").as("doc_id"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("cand") +:
      (0 until k).map(i => col(s"mh$i").as(s"__a$i")): _*)
    val sb = sigs.select(col("doc_id") +:
      (0 until k).map(i => col(s"mh$i").as(s"__b$i")): _*)
    val sim = (0 until k).map(i =>
      when(col(s"__a$i") === col(s"__b$i"), 1).otherwise(0)).reduce(_ + _)
    val dups = pairs.join(sa, "cand").join(sb, "doc_id")
      .filter(sim >= minMatch)
      .groupBy("doc_id").agg(min("cand").as("dup_of"))
    sigs.select("doc_id").join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"))
  }

  def lshCandidates(buckets: DataFrame, maxBucketSize: Int = 0): DataFrame = {
    // static session intent — a numeric repartition() disables AQE
    // coalescing for that exchange, so the AQE initial ceiling must not
    // leak in here (graft.core.Partitions scaladoc)
    val parts = graft.core.Partitions.sessionParallelism(buckets.sparkSession)
    // the bucket relation is consumed up to three times below (cap count +
    // both self-join sides), and each scan would otherwise re-run the whole
    // minhash signature pipeline. Persist it: rows are (band, bucket-longs,
    // doc_id) — tens of bytes/doc, MEMORY_AND_DISK spills rather than OOMs
    // at corpus scale, and production pipelines materialize the bucket
    // store anyway (the d10 incremental path probes exactly this relation).
    val bucketsP = graft.core.Caching.shared(buckets)
    val kept =
      if (maxBucketSize <= 0) bucketsP
      else dropOversized(bucketsP, maxBucketSize, "lshCandidates")
    val a = kept.repartition(parts, col("doc_id")).as("a")
    val b = kept.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
  }

  /** Incremental (batch-vs-corpus) LSH candidates — the ingest path of a
    * production dedup pipeline: every new batch is probed against the
    * already-curated corpus WITHOUT re-joining the corpus against itself.
    * `probe` and `corpus` are bucket relations from [[lshBuckets]]; output
    * is distinct (probe_id, corpus_id) pairs whose docs share a bucket in
    * any band.
    *
    * Scale shape: the corpus side is bucketed once (in practice its bucket
    * relation is precomputed and stored with the corpus); the batch side is
    * small relative to 100 TB, so AQE broadcasts it and the corpus never
    * shuffles for the probe. No self-join exists on either side — cost is
    * linear in corpus buckets + output pairs. The `maxBucketSize` cap
    * drops degenerate corpus buckets exactly like [[lshCandidates]]
    * (members of an oversized bucket are near-everything; a batch doc
    * landing there would pair with the whole bucket). */
  def lshCandidatesCross(probe: DataFrame, corpus: DataFrame,
                         maxBucketSize: Int = 0): DataFrame = {
    // same persistence rationale as lshCandidates: the corpus buckets feed
    // both the cap aggregate and the probe join
    val corpusP = graft.core.Caching.shared(corpus)
    val kept =
      if (maxBucketSize <= 0) corpusP
      else dropOversized(corpusP, maxBucketSize, "lshCandidatesCross")
    probe.select(col("band"), col("bucket"), col("doc_id").as("probe_id"))
      .join(kept.select(col("band"), col("bucket"), col("doc_id").as("corpus_id")),
        Seq("band", "bucket"))
      .select("probe_id", "corpus_id")
      .distinct()
  }

  /** SimHash near-dup candidate pairs via a Hamming-ball band join: split
    * the `bits`-bit signature into `bands` equal bands; by pigeonhole, two
    * signatures within Hamming distance `bands - 1` share at least one
    * band EXACTLY, so the bucket join is a complete (no-miss) candidate
    * generator for `maxHamming ≤ bands - 1`; the bit_count verify then
    * drops false positives. Reuses [[lshCandidates]], so the degenerate-
    * bucket cap applies unchanged. For production-scale corpora use wider
    * signatures (64-bit, 16-bit bands) — 4-bit band keys are for the
    * 16-bit demo signature. */
  def simhashCandidates(sigs: DataFrame, bits: Int = 16, bands: Int = 4,
                        maxHamming: Int = 3, maxBucketSize: Int = 0): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    require(maxHamming <= bands - 1,
      s"pigeonhole completeness needs maxHamming <= bands-1 = ${bands - 1}")
    val w = bits / bands
    require(w < 64, s"band width $w must be < 64 (use more bands)")
    // zero-fill shift + Long mask: arithmetic shiftright sign-extends, so a
    // signature with the sign bit set (the 64-bit production config) would
    // put identical band bits in different buckets; and `1 << w` in Int
    // arithmetic wraps at w >= 32 (w=32 -> modulus 1 -> one giant bucket).
    // Masking AFTER the unsigned shift also makes any sign-extension from
    // the long cast of a 32-bit signature irrelevant.
    def bandKey(b: Int): Column =
      shiftrightunsigned(col("simhash").cast("long"), b * w)
        .bitwiseAND(lit((1L << w) - 1))
    val bucketed = sigs.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          struct(bandKey(b).as("v0")).as("bucket"))): _*)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"), col("doc_id"))
    val pairs = lshCandidates(bucketed, maxBucketSize)
    pairs
      .join(sigs.select(col("doc_id").as("doc1"), col("simhash").as("sh1")), "doc1")
      .join(sigs.select(col("doc_id").as("doc2"), col("simhash").as("sh2")), "doc2")
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc1", "doc2", "hamming")
  }

  /** Connected components over a duplicate-pair relation — the grouping
    * step a real dedup pipeline needs after LSH: candidate pairs cluster
    * into groups, every member labeled with the group's minimum doc_id (the
    * canonical keeper; `keep = doc_id == group_id`).
    *
    * Iterative min-label propagation with a pointer-jumping shortcut
    * (label := label-of-label each round), so pathological chains converge
    * in O(log n) rounds, and the clique-ish clusters LSH actually emits in
    * one or two. Each round is one map-side-combined min shuffle over
    * (vertex, label) id pairs — never documents — so a round's shuffle is
    * O(|E|) longs at 100 TB; the loop itself runs at the RDD level on a
    * fixed hash partitioning (see the in-body note), which keeps lineage
    * flat without checkpoints — on a cluster with unreliable executors,
    * persist `labels` to a reliable store every few rounds. Fails loudly
    * if `maxIters` rounds don't converge rather than returning a
    * silently-partial labeling. Output: (doc_id, group_id), vertices of
    * `pairs` only — left-join the corpus to label singletons as their own
    * group.
    */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // RDD-driven fixpoint (VERDICT r13 #5): the round body is pure integer
    // min-propagation, so after one declarative projection of the pair
    // relation the loop runs at the RDD level — zero Catalyst re-analysis /
    // re-codegen per round and no lazy-checkpoint fill-in jobs (at toy SF
    // those constants were ~98% of d6's cost: plan 2.26 s vs exec 0.05 s in
    // the r13 quiet record; a10/a12/a13 inherit the same win through this
    // call). The dataflow is the one that survives 100 TB, unchanged: the
    // symmetrized edge relation is hash-partitioned ONCE (its shuffle
    // output is reused by every round — Spark never recomputes a completed
    // shuffle stage within a job group), each round is one min-combine
    // shuffle over (vertex, label) longs plus co-partitioned narrow joins,
    // and labels only ever shrink. min over longs is order-independent, so
    // the labeling is bit-identical to the declarative form.
    val spark = pairs.sparkSession
    import spark.implicits._
    val pairRel = pairs
      .select(col("doc1").cast("long"), col("doc2").cast("long"))
      .as[(Long, Long)]
    // partition count from the EDGE RELATION's size estimate (×2 for
    // symmetrization), not the session default — see graft.core.Fixpoint;
    // sized off the SAME Dataset `.rdd` consumes (one optimization pass)
    val p = graft.core.Fixpoint.partitioner(pairRel, replication = 2)
    val edges = pairRel.rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p)
    var labels = edges.reduceByKey(p, math.min(_: Long, _: Long)) // narrow: pre-partitioned
      .mapPartitions(_.map { case (v, nbr) => (v, math.min(v, nbr)) },
        preservesPartitioning = true)
    // Per-round diagnostic (VERDICT r18 #2): SPARK_GRAFT_FIXPOINT_TRACE=1
    // logs each round's wall, whether it probed (non-probe rounds only
    // extend lineage — their shuffles materialize inside the NEXT probe's
    // job), and an approximate task count from a throwaway listener, so a
    // decade-ratio drift decomposes into "which rounds got wider/slower"
    // instead of one opaque build number. Zero cost when unset.
    val trace = sys.env.get("SPARK_GRAFT_FIXPOINT_TRACE").contains("1")
    val traceTasks = new java.util.concurrent.atomic.AtomicLong
    val traceListener = if (!trace) None else {
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          traceTasks.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      Some(l)
    }
    if (trace) System.err.println(
      s"[fixpoint] components: |parts|=${p.numPartitions}")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val roundT0 = System.nanoTime()
      val tasks0 = traceTasks.get()
      // propagate the best label across one hop (map-side-combined min),
      // carrying a per-vertex "did propagation improve this" flag
      val prop = edges.join(labels, p) // narrow both sides
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(p, math.min(_: Long, _: Long)) // the round's main shuffle
      val stepped = labels.join(prop, p) // narrow: symmetrized edges ⇒
        // every vertex receives a propagated label, so inner is total
        .mapPartitions(_.map { case (v, (l, pl)) =>
          (v, (math.min(l, pl), pl < l)) }, preservesPartitioning = true)
      // pointer-jumping shortcut: adopt the label's own label. Every label
      // is a vertex id so the left join resolves 1:1 against the unique-
      // keyed stepped relation; labels only ever shrink. This is what makes
      // pathological chains converge in O(log n) rounds, not O(diameter).
      val jumped = stepped
        .map { case (v, (l, chg)) => (l, (v, chg)) }
        .leftOuterJoin(stepped, p) // stepped side narrow
        .map { case (l, ((v, chg), ll)) => (v, (ll.map(_._1).getOrElse(l), chg)) }
        .partitionBy(p)
      // Convergence test: edges are SYMMETRIZED, so "no vertex improved"
      // means every neighbor's label >= the vertex's own in both directions
      // of each edge — the global fixpoint. The action materializes the
      // round's shuffles, which every later consumer then reuses.
      //
      // Probed in BATCHES (VERDICT r14 #7): each isEmpty is one driver
      // round-trip per iteration — at toy SF it dominated d6, on a cluster
      // it serializes rounds against driver latency. Labels only ever
      // shrink, so over-iterating past the fixpoint is a no-op; probe the
      // first two rounds (the clique-ish clusters LSH emits converge in
      // 1-2) then every 2nd round, and always at the iteration cap so the
      // loud non-convergence guarantee is exact. Skipped rounds' shuffles
      // are not lost — the next probe's job materializes them and every
      // later round reuses the completed stages.
      iter += 1
      val probed = iter <= 2 || (iter & 1) == 1 || iter >= maxIters
      if (probed)
        converged = jumped.filter(_._2._2).isEmpty()
      labels = jumped.mapPartitions(_.map { case (v, (l, _)) => (v, l) },
        preservesPartitioning = true)
      if (trace) {
        Thread.sleep(100) // listener bus is async; drain before the delta
        System.err.println(f"[fixpoint] round $iter%d wall=${(System.nanoTime() - roundT0) / 1e6}%.0f ms probed=$probed%b converged=$converged%b tasks≈${traceTasks.get() - tasks0}%d")
      }
    }
    traceListener.foreach(spark.sparkContext.removeSparkListener)
    require(converged, s"components did not converge in $maxIters rounds")
    labels.toDF("doc_id", "group_id")
  }

  /** End-to-end near-dedup decision — the one-call API a curation pipeline
    * actually runs: MinHash signatures → banded LSH candidates (degenerate
    * buckets capped) → exact Jaccard verify at `minJaccard` → connected
    * components → EVERY corpus document labeled with its duplicate-group id
    * and the keep decision (lowest doc_id per group survives; singletons
    * are their own group and kept). Output: (doc_id, group_id, keep 0/1).
    *
    * Composes the scalable pieces unchanged, so the plan inherits their
    * shapes: zero-shuffle signature folds, native-long bucket join with the
    * O(n²) cap, candidates-only Jaccard, lineage-truncated label
    * propagation. The two multi-consumer relations (candidates, verified
    * pairs) are persisted — each feeds two downstream scans. */
  def nearDedupKeepers(docs: DataFrame, k: Int = 4, rowsPerBand: Int = 2,
                       minJaccard: Double = 0.5, maxBucketSize: Int = 0): DataFrame = {
    val sigs = minhashSignatures(docs, k)
    val cands = graft.core.Caching.shared(
      lshCandidates(lshBuckets(sigs, k, rowsPerBand), maxBucketSize))
    val verified = graft.core.Caching.shared(jaccard(docs, cands)
      .filter(round(col("jaccard"), 4) >= minJaccard)
      .select("doc1", "doc2"))
    val groups = components(verified)
    docs.select(col("doc_id"))
      .join(groups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
      .withColumn("keep", (col("doc_id") === col("group_id")).cast("int"))
  }

  /** SimHash per doc: for each bit, sum +1/-1 votes of each distinct
    * token's hash bit; sign → signature bit. Like [[minhashSignatures]],
    * a single per-row array fold — zero shuffle; the fold counts set bits
    * per position (votes > 0 ⟺ 2·ones > n), and the count array crosses a
    * projection barrier before the per-bit select so the fold runs once,
    * not `bits` times. */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame =
    // one primitive kernel call per document (TextKernels.SimHashSig,
    // round 16 — same altitude move as minhashSignatures above): dedupe
    // tokens in a per-row hash set (distinctness matters here: each
    // distinct token votes once per bit), one MD5 per distinct token,
    // `bits` add-bit updates, sign fold. Replaces an interpreted HOF fold
    // PLUS a bits-wide CaseWhen chain per row. Bit-identical
    // (TextKernelsSpec); null-signature rows are the empty-token docs the
    // old size filter dropped.
    docs
      .select(col("doc_id"), graft.functions.TextKernels
        .simhashSig(split(lower(col("text")), "\\s+"), bits).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** Span-level duplicate statistics — the paragraph-dedup analog
    * (RefinedWeb/CCNet strip duplicated *lines* across a corpus; for
    * line-less text the unit is a NON-overlapping `window`-token span).
    * Each doc is chunked, each span hashed, and a corpus-wide aggregate
    * counts how many distinct documents contain each span; per doc we
    * report the fraction of its spans that also appear in some other
    * document — the boilerplate share a curation pipeline would strip or
    * filter on.
    *
    * Scale shape: the shuffle carries (doc_id, span-hash) longs, never
    * text; the frequency aggregate is map-side combined; the join back is
    * a long-keyed equi-join that AQE can skew-split. No O(n²) anywhere —
    * cost is linear in corpus tokens. Docs with no tokens are excluded
    * (no spans to speak of). */
  def spanDupStats(docs: DataFrame, window: Int = 16): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val spans = toks
      .select(col("doc_id"),
        explode(TextOps.chunkTexts(col("toks"), window, window)).as("span"))
      .select(col("doc_id"), hash32(col("span")).as("h"))
    // "appears in >1 distinct doc" needs no count_distinct: doc_id ids are
    // totally ordered, so the span is cross-doc duplicated iff
    // min(doc_id) != max(doc_id). count_distinct plans TWO exchanges (a
    // distinct (h, doc_id) pair shuffle, then the per-h count); min/max is
    // one ordinary map-side-combined aggregate — one exchange of one row
    // per distinct h per map task (round 19, guide §2.3/§2.4).
    val freq = spans.groupBy("h")
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("__dup"))
    spans.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 4))
  }

  /** Span-level dedup SCRUB — the removal step [[spanDupStats]] only
    * measures: every non-overlapping `window`-token span whose exact
    * content appears in MORE THAN ONE document is deleted from every
    * document carrying it (the CCNet/RefinedWeb duplicated-line discipline:
    * boilerplate lines are dropped everywhere, not kept once — for
    * line-less text the unit is the aligned token span). Output per doc:
    * span census plus the md5 of the scrubbed text, so the gate verifies
    * the REWRITE itself without shipping documents through the compare.
    *
    * The census key is the md5 digest of the span text (not a 32-bit
    * hash): 128 bits makes corpus-scale collisions ignorable AND the digest
    * replays exactly in any engine, so the scrub is oracle-checkable.
    * Scale shape: the span relation is pinned once and feeds both the
    * frequency aggregate (shuffles digest+doc_id only — Catalyst prunes
    * the text) and the digest-keyed join back; reassembly is one per-doc
    * aggregate whose collect_list holds a single document's spans — the
    * same order of state as the document itself, which any rewrite op must
    * hold. Nothing is O(n²); cost is linear in corpus tokens. */
  def scrubDupSpans(docs: DataFrame, window: Int = 16): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val spans = graft.core.Caching.shared(toks
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - 1, lit(window)),
          st => slice(col("toks"), st + 1, lit(window)))))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("col")).as("span"),
        size(col("col")).cast("long").as("span_len"))
      // the census key is INTERNAL (never output): shuffle it as the
      // 16-byte binary digest, not the 32-hex-char string — unhex is
      // injective on md5 output, so grouping/joining is unchanged while
      // the census exchange, pinned cache and broadcast carry half the
      // key bytes (round 20, guide §2.3 "narrower types")
      .withColumn("dig", unhex(md5(col("span")))))
    // a span is KEPT iff its digest lives in exactly one distinct doc —
    // which over totally-ordered doc_ids is min(doc_id) == max(doc_id).
    // The count_distinct form planned an extra full exchange of distinct
    // (dig, doc_id) pairs (32-hex-char keys) ahead of the per-dig count;
    // min/max is one ordinary map-side-combined aggregate, halving the
    // digest-side shuffle stages (round 19, guide §2.3/§2.4). Same result:
    // a span repeated WITHIN one doc still has min==max, exactly as
    // count_distinct(doc_id)==1 classified it.
    val freq = spans.groupBy("dig")
      .agg((min(col("doc_id")) === max(col("doc_id"))).as("__uniq"))
    spans.join(freq, "dig")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__uniq"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__uniq"), col("span_len")).otherwise(0L)).as("n_tokens_kept"),
        // kept spans, original order: collect_list skips the nulls the
        // when() leaves for dropped spans; struct sort orders by pos
        md5(concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__uniq"), struct(col("pos"), col("span"))))),
          x => x("span")))).as("scrubbed_md5"))
  }

  /** Exact duplicated-substring coverage — the token-granular form of the
    * exact-substring dedup signal (suffix-array method of "Deduplicating
    * Training Data Makes Language Models Better"): every OVERLAPPING
    * `window`-token span is rolling-hashed; a span whose hash repeats
    * corpus-wide (any second occurrence, same doc or not) is duplicated;
    * per doc, overlapping duplicated spans are UNIONED (gaps-and-islands
    * over span starts) and the output reports how many of the doc's tokens
    * sit inside some duplicated substring. Unlike [[spanDupStats]]'s
    * non-overlapping chunks, this detects duplicated passages at ANY
    * offset — the signal a substring-level scrubber would cut on.
    *
    * Scale shape: the explode emits one (doc_id, start, hash) long-triple
    * per corpus token — linear, the same order as the token relation every
    * other dedup op shuffles; the repeat filter is one map-side-combined
    * count; the interval union is a per-doc window over dup spans only
    * (integer arithmetic, exact in any engine). Docs with fewer than
    * `window` tokens have no spans and are excluded. */
  def substringDupCoverage(docs: DataFrame, window: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= window)
    // starts iterate a computed sequence but only ever SLICE the `toks`
    // attribute (the per-element recompute trap needs indexing into a
    // computed array, which this avoids — same shape as `contamination`)
    val wins = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")) - (window - 1)),
          i => hash32(concat_ws(" ", slice(col("toks"), i, lit(window)))))))
      .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("i"),
        col("col").as("h"))
    val dupH = wins.groupBy("h").agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
    val dups = wins.join(dupH.select("h"), "h")
    // interval union: each dup span covers [i, i+window-1]; its NEW tokens
    // are those past both the previous running max end and its own start
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    dups
      .withColumn("__pme", max(col("i") + (window - 1)).over(w))
      .withColumn("__cov", greatest(lit(0L),
        (col("i") + (window - 1)) - greatest(coalesce(col("__pme"), col("i") - 1), col("i") - 1)))
      .groupBy("doc_id", "n")
      .agg(sum("__cov").as("dup_tokens"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n"), 4).as("dup_frac"))
  }

  /** Benchmark-contamination check: the share of each corpus document's
    * distinct word `n`-grams that appear anywhere in a benchmark/eval set
    * (the GPT-3/PaLM decontamination methodology, at a demo-sized n).
    *
    * The benchmark side reduces to a DISTINCT set of n-gram hashes and is
    * broadcast — eval suites are control-plane small next to a 100 TB
    * corpus — so the corpus side never shuffles for the membership probe:
    * explode → hash → broadcast left-join → per-doc re-aggregate (map-side
    * combined). Docs with fewer than `n` tokens have no n-grams and are
    * excluded. */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 5): DataFrame = {
    def grams(df: DataFrame): DataFrame = {
      val t = df.select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= n)
      // idx iterates a computed sequence but only ever SLICES the `toks`
      // attribute — the per-element recompute trap needs indexing into a
      // computed array, which this avoids
      t.select(col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n)))))).as("g"))
        .select(col("doc_id"), hash32(col("g")).as("g"))
    }
    val benchSet = grams(bench).select("g").distinct()
    grams(docs)
      .join(broadcast(benchSet.withColumn("__hit", lit(1))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0)).cast("long")).as("n_hits"))
      .withColumn("contamination",
        round(col("n_hits").cast("double") / col("n_grams"), 4))
  }

  /** Exact n-gram (word shingle) Jaccard similarity for candidate pairs.
    * `pairs` has (doc1, doc2); result adds inter/union/jaccard. The join
    * reuses the exploded-token relation on both sides — shuffles by token
    * once, never materializes full cross products. (A candidate-doc
    * semi-join prune was tried and MEASURED slower here: each consumer of
    * the pruned relation re-executes the LSH pipeline, and Spark's
    * recompute semantics eat the win — callers with genuinely sparse
    * candidate sets should pre-filter `docs` themselves, once.) */
  def jaccard(docs: DataFrame, pairs: DataFrame, n: Int = 1): DataFrame = {
    val shingles = array_distinct(
      if (n == 1) tokens(col("text"))
      else {
        val toks = tokens(col("text"))
        val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
        transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
      })
    // pair-LOCAL intersection (round 16): attach each side's distinct
    // shingle SET to the pair (two doc-keyed joins of ~word-sized arrays)
    // and count the overlap in one primitive kernel call per pair
    // (TextKernels.IntersectCount, hash-set build + probe). The
    // token-keyed join + count aggregate this replaces exchanged
    // O(pairs · tokens) rows and re-aggregated them per pair — same
    // bytes moved as the set arrays, but two extra shuffle stages and
    // the chain that made d5's wall time swing 2× between quiet runs.
    // Both joins read this relation; persist so the corpus shingle
    // build runs once, not once per side.
    val docSets = graft.core.Caching.shared(
      docs.select(col("doc_id"), shingles.as("__set")))
    pairs
      .join(docSets.select(col("doc_id").as("doc1"), col("__set").as("__s1")), "doc1")
      .join(docSets.select(col("doc_id").as("doc2"), col("__set").as("__s2")), "doc2")
      .withColumn("inter",
        graft.functions.TextKernels.intersectCount(col("__s1"), col("__s2")))
      .withColumn("sz1", size(col("__s1")))
      .withColumn("sz2", size(col("__s2")))
      .drop("__s1", "__s2")
      .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
  }

  /** Edit-distance verification of candidate pairs — the character-level
    * near-dup check (catches reorder-free edits token-level Jaccard
    * under-weights). Levenshtein is O(len²) per pair, so it only ever runs
    * on the LSH candidate relation, never all-pairs, and on a bounded
    * `prefixLen`-char prefix: at 100 TB the cost is |candidates|·L², not
    * |corpus|²·len². The codegen'd `levenshtein` builtin does the work;
    * the candidate relation (pairs surviving the bucket cap) broadcasts to
    * the corpus scan, so the corpus is never shuffled for the verify. */
  def editVerify(docs: DataFrame, pairs: DataFrame, prefixLen: Int = 80): DataFrame = {
    val prefixed = docs.select(col("doc_id"), substring(col("text"), 1, prefixLen).as("__p"))
    // both joins stream the corpus and broadcast the (small) pair relation —
    // first bare, then carrying doc1's prefix
    val half = prefixed
      .join(broadcast(pairs), col("doc_id") === col("doc1"))
      .withColumnRenamed("__p", "__p1").drop("doc_id")
    prefixed
      .join(broadcast(half), col("doc_id") === col("doc2"))
      .withColumn("edit_dist", levenshtein(col("__p1"), col("__p")))
      .select(pairs.columns.map(col) :+ col("edit_dist"): _*)
  }

  /** MinHash Jaccard ESTIMATE per candidate pair: the fraction of equal
    * signature components — the sketch-side similarity that decides which
    * pairs earn the exact verify. Pure integer arithmetic over the already
    * computed signatures (zero extra passes over text); emitted as an
    * exact rational (`eq_k` of `k`) plus the rounded estimate. */
  def minhashEstimate(sigs: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val sigCols = (0 until k).map(i => s"mh$i")
    def side(as: String) = sigs.select(
      col("doc_id").as(as) +: sigCols.map(c => col(c).as(s"${c}_$as")): _*)
    // the signature relation is corpus-sized — stream it through two joins
    // against the broadcast pair relation, never the other way around
    val half = side("doc1").join(broadcast(pairs), "doc1")
    side("doc2")
      .join(broadcast(half), "doc2")
      .withColumn("eq_k", sigCols.map(c =>
        when(col(s"${c}_doc1") === col(s"${c}_doc2"), 1).otherwise(0)).reduce(_ + _))
      .withColumn("jaccard_est", col("eq_k").cast("double") / k)
      .select("doc1", "doc2", "eq_k", "jaccard_est")
  }

  /** Content-defined chunking + chunk-level dedup stats — the
    * insertion-robust sibling of [[spanDupStats]]'s fixed windows: a
    * chunk boundary falls AFTER any token whose trailing `window`-token
    * rolling context hashes to 0 mod `mask` (the rsync/LBFS/FastCDC
    * principle — boundaries derive from CONTENT, so inserting one token
    * reshuffles only the chunk it lands in, where fixed spans shift every
    * downstream window and miss the duplication). Expected chunk length
    * is `mask` tokens, dialed by `mask`.
    *
    * Everything replays cross-engine: the context is the literal last-w
    * tokens joined by spaces pushed through the portable md5 hash, chunk
    * ids are a window cumsum of boundary flags, chunk identity is the md5
    * of the position-ordered chunk text. Output per doc: chunk count,
    * corpus-duplicated chunk count, token counts for both — the
    * boilerplate-fraction signal at chunk granularity.
    *
    * Scale shape: two per-doc window passes (lag context + boundary
    * cumsum) over ONE (doc, pos) sort — per-doc state, embarrassingly
    * parallel across docs; the chunk census is a digest-keyed aggregate;
    * the pinned chunk relation feeds the census and the join-back (the
    * t25 discipline). CDC is inherently sequential WITHIN a document —
    * per-doc windows are exactly the parallel grain a 100 TB corpus
    * wants. */
  def cdcChunkStats(docs: DataFrame, window: Int = 4, mask: Int = 16): DataFrame = {
    require(window >= 2 && mask >= 2, "window and mask must be ≥ 2")
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // concat_ws skips the null lags at pos < window-1; the boundary test
    // gates on pos ≥ window-1, so short contexts never mark
    val ctx = concat_ws(" ",
      ((window - 1) to 1 by -1).map(i => lag("tok", i).over(w)) :+ col("tok"): _*)
    val marked = tok.withColumn("__b",
      when(col("pos") >= window - 1 && hash32(ctx) % mask === 0, 1L)
        .otherwise(0L))
    val chunked = marked.withColumn("chunk",
      coalesce(sum("__b").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val chunks = graft.core.Caching.shared(
      chunked.groupBy("doc_id", "chunk")
        .agg(count(lit(1)).as("n_tokens"),
          // internal-only census key: 16-byte binary digest, not the
          // 32-hex string — unhex is injective on md5 output, so the
          // census grouping/join is unchanged at half the key bytes
          // (round 20, guide §2.3 "narrower types")
          unhex(md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok")), " "))).as("digest")))
    // cross-doc duplication over totally-ordered doc_ids is
    // min(doc_id) != max(doc_id) — one map-side-combined aggregate where
    // count_distinct planned an extra distinct-pair exchange over the
    // 32-hex-char digests (round 19, guide §2.3/§2.4; same rewrite as
    // spanDupStats / scrubDupSpans)
    val census = chunks.groupBy("digest")
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("__dup"))
    chunks.join(census, "digest")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("__dup"), col("n_tokens")).otherwise(0L))
          .as("n_dup_tokens"))
  }

  /** EXACT all-pairs set-similarity join via prefix filtering (AllPairs /
    * PPJoin family — Bayardo et al., WWW'07; Xiao et al., WWW'08): every
    * pair with token-set Jaccard ≥ `minJaccard`, with NO false negatives —
    * the deterministic sibling of the probabilistic LSH path (d3/d5).
    *
    * Principle: order each doc's distinct tokens by ascending global
    * document frequency (rarest first, ties by token) and keep only the
    * PREFIX of length |s| − ⌈t·|s|⌉ + 1. Two sets with Jaccard ≥ t must
    * share at least one prefix token (pigeonhole on the ≥ ⌈t·|s|⌉ overlap
    * a qualifying pair needs), so candidates are pairs meeting in the
    * prefix inverted index — and because prefixes hold the RAREST tokens,
    * posting lists stay short exactly where a naive token join explodes
    * (stopwords land in the suffix and never generate a single pair).
    * The size filter t·max(|a|,|b|) ≤ min(|a|,|b|) prunes before the
    * distinct; the exact Jaccard verify ([[jaccard]]) keeps only true
    * positives. The threshold compare is integer cross-multiplication
    * (inter·10⁶ ≥ t_micro·union) — no float boundary at any scale.
    *
    * Scale shape: one token explode (pinned: df census + both index legs),
    * one per-doc prefix window (doc-keyed — embarrassingly parallel), one
    * token-keyed equi-join, then the LSH-candidate verify machinery. At
    * 100 TB the prefix index is the stored artifact (like the LSH bucket
    * store) and batches probe it incrementally; df skew is self-limiting
    * (high-df tokens are exactly the ones prefixes exclude). */
  def prefixFilterJoin(docs: DataFrame, minJaccard: Double,
                       maxPostingLen: Int = 0): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, "minJaccard must be in (0, 1]")
    val tMicro = math.round(minJaccard * 1e6)
    // distinct-token relation: df census + prefix build read it; the exact
    // verify builds its own pinned shingle relation inside `jaccard`
    val toks = graft.core.Caching.shared(
      docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok")))
    val dfTab = toks.groupBy("tok").agg(count(lit(1)).as("__df"))
    val szW = Window.partitionBy("doc_id")
    val ordW = szW.orderBy(col("__df"), col("tok"))
    // prefix length p = sz − ⌈t·sz⌉ + 1, all-integer ceiling
    val prefix = graft.core.Caching.shared(
      toks.join(dfTab, "tok")
        .withColumn("__sz", count(lit(1)).over(szW))
        .withColumn("__rn", row_number().over(ordW))
        .filter(col("__rn") <=
          col("__sz") - expr(s"(__sz * ${tMicro}L + 999999) div 1000000") + 1)
        .select(col("doc_id"), col("tok"), col("__sz")))
    // Posting-length guard (the dropOversized discipline on the prefix
    // index): df-ordered prefixes bound posting lists on natural corpora,
    // but one adversarial token that stays "rare enough" to land in many
    // prefixes could still explode the self-join quadratically. With
    // maxPostingLen > 0 those lists drop LOUDLY (logged count + entries);
    // pairs whose ONLY shared prefix token was dropped are lost, which is
    // the explicit cost of the cap — d17 runs uncapped for the exact
    // ground-truth, a 100 TB deployment sets the cap like d3's
    // maxBucketSize. Off by default: exactness is d17's contract.
    val guarded =
      if (maxPostingLen <= 0) prefix
      else {
        val over = prefix.groupBy("tok").agg(count(lit(1)).as("__plen"))
          .filter(col("__plen") > maxPostingLen)
        val rows = over.collect()
        if (rows.isEmpty) prefix
        else {
          System.err.println(
            s"[graft] prefixFilterJoin: dropping ${rows.length} posting lists " +
              s"(${rows.map(_.getLong(1)).sum} entries) above cap $maxPostingLen")
          val local = prefix.sparkSession.createDataFrame(
            java.util.Arrays.asList(rows: _*), over.schema)
          prefix.join(broadcast(local.select("tok")), Seq("tok"), "left_anti")
        }
      }
    val cands = guarded.select(col("doc_id").as("doc1"), col("tok"), col("__sz").as("__sz1"))
      .join(guarded.select(col("doc_id").as("doc2"), col("tok"), col("__sz").as("__sz2")), "tok")
      .filter(col("doc1") < col("doc2") &&
        least(col("__sz1"), col("__sz2")) * 1000000L >=
          greatest(col("__sz1"), col("__sz2")) * tMicro)
      .select("doc1", "doc2")
      .distinct()
    jaccard(docs, cands)
      .filter(col("inter") * 1000000L >= col("uni") * tMicro)
  }
}
