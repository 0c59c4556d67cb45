package graft

/** Physical-plan contracts — the claims PLANS.md documents, enforced so they
  * cannot silently rot: filters reach the parquet scan, catalog joins
  * broadcast, partial aggregates combine map-side, nothing degenerates to a
  * cartesian product, and multi-consumer persists actually reuse cache. */
class PlanContractSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("q1: predicate pushdown + map-side partial aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("f2: range filter reaches the scan") {
    val p = plan("f2_range_filter")
    assert(p.contains("GreaterThan"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
  }

  test("j2: catalog spatial join builds the broadcast side") {
    assert(plan("j2_file_catalog_join").contains("Broadcast"))
  }

  test("c2: per-language counts broadcast back, no shuffle of the corpus for them") {
    assert(plan("c2_quality_gate").contains("BroadcastHashJoin"))
  }

  test("dedup pipeline never degenerates to a cartesian product") {
    Seq("d3_lsh_candidates", "d5_jaccard_pairs", "d12_near_dedup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
    }
  }

  test("x7: the bucketized interval join is an equi-join, not a nested loop") {
    assert(!plan("x7_interval_join").contains("NestedLoopJoin"))
  }

  test("r5: pyramid levels reuse the persisted previous level") {
    assert(plan("r5_pyramid").contains("InMemoryTableScan"))
  }

  test("r6/r7: focal halo exchange is UDF-free and join-free") {
    Seq("r6_focal_mean", "r7_convolve", "r8_slope").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q must stay in codegen: ${p.take(1500)}")
      // scatter→gather is ONE aggregation exchange — never a self-join of
      // the block lattice
      assert(!p.contains("Join"), s"$q: ${p.take(1500)}")
    }
  }

  test("g1: the distance join is a cell-keyed equi-join, not a nested loop") {
    val p = plan("g1_distance_join")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("d13/d14: candidate verifies broadcast the pair relation, never shuffle the corpus") {
    Seq("d13_edit_distance", "d14_minhash_est").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(1500)}")
      assert(!p.contains("SortMergeJoin"), s"$q: corpus side must not sort-merge: ${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
    }
  }

  test("t25: the pinned span relation is reused, the scrub never self-joins text") {
    val p = plan("t25_span_scrub")
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(1500))
  }

  test("t25/d8/d16: dup census aggregates min/max, never a distinct-pair " +
      "double exchange") {
    // round 19: "appears in >1 distinct doc" is min(doc_id)!=max(doc_id) —
    // one map-side-combined aggregate. count_distinct planned an EXTRA
    // full exchange of distinct (digest, doc_id) pairs ahead of the
    // per-digest count; this pin keeps the cheaper shape from rotting.
    Seq("t25_span_scrub", "d8_span_dedup", "d16_cdc_chunks").foreach { q =>
      val p = plan(q)
      assert(!p.contains("count(distinct"), s"$q: ${p.take(1500)}")
      // doc_id-specific: the census min/max must be over doc_id itself
      // (ADVICE r19: a bare partial_min( fallback made this a tautology)
      assert(p.contains("partial_min(doc_id"), s"$q: ${p.take(1500)}")
    }
  }

  test("t25/d16: census keys shuffle as 16-byte binary digests, not hex strings") {
    // round 20 (guide §2.3 narrower types): the internal-only census key is
    // unhex(md5(...)) — a plan that re-grows the 32-hex-char string key
    // doubles the census exchange bytes. Checked on the ANALYZED plan: the
    // physical toString truncates the cached-relation subtree that builds
    // the digest.
    Seq("t25_span_scrub", "d16_cdc_chunks").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf()).queryExecution.analyzed.toString
      assert(p.contains("unhex(md5("), s"$q census key must be binary")
    }
  }

  test("w1: two-phase argmax stays hash-aggregated — no SortAggregate, no window") {
    // round 20 (VERDICT r19 #7): the struct-buffer argmax planned a
    // SortAggregate pair = a full per-partition sort of the fact table;
    // the two-phase form is two hash aggregates + a broadcast join-back
    val p = plan("w1_ordered_burn_rank")
    assert(!p.contains("SortAggregate"), p.take(2000))
    assert(p.contains("HashAggregate") && p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("q21: ONE per-order aggregate level — the pair-level aggregate is gone") {
    // round 19: nsupp>1 is min(skey)!=max(skey), nlate==1 is
    // min(late skey)==max(late skey) — the distinct (order, supplier,
    // late) pair aggregate (and its exchange at broadcast-join SFs)
    // collapsed into the per-order min/max aggregate.
    val p = plan("q21_waiting_supplier")
    assert(!p.contains("is_late"), p.take(2000))
    assert(p.contains("partial_min"), p.take(2000))
  }

  test("x20: grid quantiles scan the data exactly twice (bounds + binning)") {
    val p = plan("x20_approx_quantile")
    // one scan feeds the bounds aggregate, one the binning pass — the
    // single-consumer-bounds restructure must not regress to a third
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("NestedLoopJoin"), p.take(1500))
  }

  test("g7/g8: per-round graph ops stay equi-join + aggregate, no windows or loops") {
    Seq("g7_label_prop", "g8_kcore").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
        s"$q: ${p.take(1500)}")
      // argmax-by-count is a struct-max INSIDE the aggregate, never a
      // window sort over the neighbor relation
      assert(!p.contains("Window"), s"$q: ${p.take(1500)}")
    }
  }

  test("t29/e13: sketch and PQ training never cross-join, pinned relations reuse") {
    Seq("t29_count_min", "e13_pq_train").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      // the token stream / exploded subvector relation feeds multiple
      // consumers from ONE InMemoryRelation — never a recompute per leg
      assert(p.contains("InMemoryTableScan"), s"$q: ${p.take(1500)}")
    }
  }

  test("g9: HITS per-round shape combines sums map-side, no cartesian product") {
    // rounds 1..n-1 are checkpoint-flattened (the g4/g7 discipline); the
    // final round stays a plan, so the per-iteration shape is visible
    val p = plan("g9_hits")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("m5: resize is one narrow decode pass — no joins, no mid-plan shuffle") {
    val p = plan("m5_image_resize")
    assert(!p.contains("Join"), p.take(1500))
    // the only exchange is the output ordering's range partitioning
    assert(!p.contains("hashpartitioning"), p.take(1500))
  }

  test("x22: compaction planning exchanges once on the directory key") {
    val p = plan("x22_compaction_plan")
    assert(!p.contains("Join"), p.take(1500))
    assert(p.split("hashpartitioning").length - 1 <= 1, p.take(2000))
  }

  test("x26: bitmap overlap pins the mask relation and joins word-keyed") {
    val p = plan("x26_bitmap_overlap")
    // all four consumers (two join legs, two cardinality lookups) read
    // the pinned mask relation — the string shows each cached read as an
    // InMemoryTableScan (whose printed child subsumes the one real scan)
    assert(p.split("InMemoryTableScan").length - 1 >= 4,
      s"all consumers must read the cache: ${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(1500))
  }

  test("x25: skyline never plans the O(n²) dominance self-join") {
    val p = plan("x25_skyline")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(1500))
    // the frontier broadcasts into the join-back; the fact table never
    // shuffles for the dominance test
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("x27: sequence patterns are one user-keyed aggregate — no joins") {
    val p = plan("x27_event_pattern")
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      p.take(1500))
  }

  test("r12/r13/r15: struct-kernel focal passes stay UDF-free and join-free") {
    Seq("r12_terrain_idx", "r13_flow_dir", "r15_majority").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q must stay in codegen: ${p.take(1500)}")
      assert(!p.contains("Join"), s"$q: ${p.take(1500)}")
    }
  }

  test("x29: every audit constraint is one conditional aggregate, no nested loop") {
    val p = plan("x29_dq_audit")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(1500))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1500))
  }

  test("d17: prefix index is pinned across both legs; never a cartesian pair join") {
    val p = plan("d17_prefix_filter")
    // token explode (df census + verify) and the prefix relation (both
    // self-join legs) are each cached — ≥ 4 cached reads in the plan
    assert(p.split("InMemoryTableScan").length - 1 >= 4, p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      p.take(1500))
    graft.core.Caching.release(spark)
  }

  test("x33: quartile table broadcasts back — the fact scan never re-shuffles") {
    val p = plan("x33_iqr_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("x34: chi-square is one user-keyed aggregate plus a 1-row fold — no joins") {
    val p = plan("x34_chi_square")
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("partial_"), p.take(1500))
  }

  test("m6/m7: decode-side multimodal passes never shuffle payloads") {
    val p6 = plan("m6_ahash")
    assert(!p6.contains("Join"), p6.take(1500))
    assert(!p6.contains("hashpartitioning"), p6.take(1500))
    // VAD aggregates frames AFTER the narrow decode: the only hash
    // exchange keys (asset, island) rows, never payload bytes
    val p7 = plan("m7_vad_segments")
    assert(!p7.contains("Join"), p7.take(1500))
  }

  test("x36: gini's global rank uses bucket windows, not one partition") {
    val p = plan("x36_gini")
    // the offsets table broadcasts; the value relation is pinned for its
    // two consumers (offset census + ranked fold)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("InMemoryTableScan"), p.take(1500))
    graft.core.Caching.release(spark)
  }

  test("k5 dataflow: one exchange per halving, quarters combine map-side") {
    import org.apache.spark.sql.functions._
    // the overview build's contract: downsample is a pure projection (no
    // exchange), regroup2x exchanges ONCE on the parent-block key with
    // first-of-quarter partials combining map-side before it
    val blocks = spark.range(64).select(
      lit("t").as("tile_id"), lit(0.0).as("left"), lit(0.0).as("top"),
      (col("id") / 8).cast("int").as("block_row"),
      (col("id") % 8).cast("int").as("block_col"),
      transform(sequence(lit(1), lit(64)), _.cast("double")).as("band_1"))
    val half = blocks.withColumn("band_1",
      graft.operators.Resample.downsample(col("band_1"), 8, 8, 2, "average"))
    val parent = graft.operators.Resample.regroup2x(half, 8, Seq("band_1"),
      Seq("tile_id", "left", "top"))
    val p = parent.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("partial_first"), p.take(1500))
  }

  test("seam-exact downsample: planes never shuffle, primitive patch pipeline") {
    import org.apache.spark.sql.functions._
    // the seam-exact overview contract (VERDICT r17 #1, patch
    // architecture): the pixel planes stay map-side — only the
    // O(perimeter) region packs shuffle (gather_cells → one keyed
    // exchange → assemble_seam_plane → frame-only block_downsample), and
    // the seam band merges back positionally (merge_frame). Neither the
    // interpreted map_from_entries + per-element transform rebuild nor a
    // whole-plane exchange may reappear.
    val blocks = spark.range(16).select(
      lit("t").as("tile_id"),
      (col("id") / 4).cast("int").as("block_x"),
      (col("id") % 4).cast("int").as("block_y"),
      transform(sequence(lit(1), lit(64)), _.cast("double")).as("values"))
    val out = graft.operators.Resample.downsampleSeamExact(
      blocks, 8, 8, 2, "cubic", keyCols = Seq("tile_id"))
    val p = out.queryExecution.executedPlan.toString
    // kernel presence reads the optimized LOGICAL plan: the physical
    // string hides the patch projection inside ObjectHashAggregate's
    // unprinted resultExpressions
    val lp = out.queryExecution.optimizedPlan.toString
    for (k <- Seq("gather_cells", "assemble_seam_plane", "block_downsample",
        "merge_frame"))
      assert(lp.contains(k), s"missing $k: ${lp.take(2000)}")
    assert(!lp.contains("map_from_entries"), lp.take(2000))
    // two exchanges max: the perimeter-pack gather, and the patch join's
    // co-partitioning of the LOCAL side (absent when the input is already
    // partitioned on the key, or when AQE broadcasts the patch side)
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(2500))
    // the plane-bearing local leg computes BELOW its exchange: block-local
    // block_downsample appears under the join's local side, so only
    // quarter-size output planes ever move even when unpartitioned
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("g13: per-hop aggregate combines map-side; no cartesian message join") {
    val p = plan("g13_neigh_agg")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    graft.core.Caching.release(spark)
  }

  /** Queries whose plans contain a partition-less WindowExec that is
    * BOUNDED BY CONSTRUCTION — each entry records the relation the window
    * ranks and why its row count cannot grow with the data. Any ledger
    * query outside this map that plans a global window FAILS the sweep:
    * x38 showed the "bounded by convention" discipline is one unreviewed
    * query away from a single-task global sort at 100×. */
  private val auditedGlobalWindows: Map[String, String] = Map(
    // Ranks.globalRank offset census: sum(__c) over the |buckets|-row
    // per-bucket count relation — bounded by the bucket domain, never by
    // row count (Ranks.scala:28-32)
    "x36_gini" -> "globalRank offset census, |buckets| = cents div 1e6 domain",
    "x38_conversion_latency" -> "globalRank offset census, |buckets| = latency hours",
    "x42_quantile_binning" -> "globalRank offset census, |buckets| = cents div 1e5 domain",
    "x50_pareto" -> "globalRank offset census + bucket-sum prefix, |buckets| = cents div 1e6 domain",
    // Pareto/watermark two-pass merges: prefix max/sum over the
    // per-bucket maxima relation, |buckets| rows by construction
    "x25_skyline" -> "bucketed sweep prefix-max, |buckets| = dollar-price domain",
    "x45_watermark_audit" -> "per-bucket hwm prefix-max, |buckets| = event_id div 1000",
    // rank-the-survivors: row_number AFTER orderBy().limit(k) (a
    // distributed TakeOrdered) — the window input is k rows
    "t19_bpe_pairs" -> "rank after limit(15)",
    "t31_bpe_round2" -> "rank after limit(15)",
    "t20_bm25" -> "rank after limit(20)",
    "t22_bm25_incremental" -> "rank after limit(20)",
    "t30_sparse_retrieval" -> "rank after limit(20) (TextOps.sparseRetrieval:859-861)",
    "t33_zipf_slope" -> "rank after limit(100)",
    "e8_rrf" -> "lexical leg ranks after limit(50); fusion ranks the <=100-row union",
    "e9_pq_adc" -> "rank after limit(20) (Similarity.pqTopK:282)",
    "e10_ivf_pq" -> "rank after limit(10) (Similarity.pqTopK:282)",
    // candidate-set ranking: Misra-Gries nominates <= 2*support = 128
    // candidates; the window ranks only the confirmed subset
    "t26_heavy_hitters" -> "rank over <=128 MG candidates (TextOps.scala:777-779)")

  test("ledger-wide: no partition-less WindowExec outside the audited " +
      "allowlist; ZERO CartesianProductExec anywhere") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec

    // walk the physical tree INCLUDING the places collect() won't reach:
    // AQE wrappers, cached-relation child plans, and subquery plans
    def walk(p: SparkPlan): (Seq[String], Int) = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          (Seq(w.windowExpression.map(_.sql).mkString(", ").take(120)), 0)
        case _: CartesianProductExec => (Nil, 1)
        case _ => (Nil, 0)
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(walk(a.inputPlan))
        case s: InMemoryTableScanExec => Seq(walk(s.relation.cachedPlan))
        case _ => Nil
      }
      val all = self +: (nested ++ p.children.map(walk) ++ p.subqueries.map(walk))
      (all.flatMap(_._1), all.map(_._2).sum)
    }

    val windowOffenders = scala.collection.mutable.ListBuffer.empty[String]
    val cartesianOffenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val (windows, cartesians) =
        try walk(SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan)
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      if (windows.nonEmpty && !auditedGlobalWindows.contains(name))
        windowOffenders += s"$name: ${windows.head}"
      if (cartesians > 0) cartesianOffenders += s"$name ($cartesians)"
      graft.core.Caching.release(spark)
    }
    assert(windowOffenders.isEmpty,
      s"partition-less windows outside the audited allowlist " +
        s"(rank via Ranks.globalRank or audit + allowlist):\n${windowOffenders.mkString("\n")}")
    // a non-broadcast cartesian product is never acceptable at 100 TB —
    // no allowlist exists for this one (the audited bounded patterns are
    // all BROADCAST nested-loop joins of 1-row/k-row relations, a
    // different operator)
    assert(cartesianOffenders.isEmpty,
      s"CartesianProductExec in ledger plans: ${cartesianOffenders.mkString(", ")}")
    // the allowlist must not rot either: every audited entry still names
    // a live ledger query
    val stale = auditedGlobalWindows.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries for dead queries: $stale")
  }

  test("block-relation plans carry ZERO ScalaUDFs (st_* stays control-plane)") {
    // GeoFunctions' st_* surface is plain UDFs BY DOCUMENTED CONTRACT
    // (GeoFunctions header + VERDICT r17 #8): file catalogs and tile
    // footprints only — thousands of rows, broadcast side — never per
    // pixel. This sweep pins the boundary mechanically: every ledger query
    // whose plan moves packed pixel arrays must be UDF-free END TO END,
    // walked through AQE wrappers, cached relations, subqueries, and
    // aggregate resultExpressions (where plan STRINGS hide expressions).
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def hasUdf(p: SparkPlan): Boolean = {
      val self = p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))
      val nested = p match {
        case a: AdaptiveSparkPlanExec => hasUdf(a.inputPlan)
        case s: InMemoryTableScanExec => hasUdf(s.relation.cachedPlan)
        case _ => false
      }
      self || nested || p.children.exists(hasUdf) || p.subqueries.exists(hasUdf)
    }
    val blockQueries = SparkEntry.queries.keys.filter(n =>
      n.matches("r\\d+_.*|a(1[0-4]|[1-5])_.*|j[34]_.*|p[12]_.*|k[56]_.*|s5_.*")).toSeq.sorted
    assert(blockQueries.size >= 35, s"sweep lost its targets: $blockQueries")
    val offenders = blockQueries.filter { q =>
      val bad = hasUdf(SparkEntry.queries(q)(spark, sf()).queryExecution.executedPlan)
      graft.core.Caching.release(spark)
      bad
    }
    assert(offenders.isEmpty,
      s"ScalaUDF on a block-relation plan (st_* is control-plane-only): $offenders")
  }

  test("signature builders run the primitive kernels, not interpreted HOF folds") {
    // round 16 moved minhash/simhash/fingerprint to per-document
    // primitive-loop expressions (TextKernels); a regression to the HOF
    // forms (transform/zip_with/aggregate — no codegen, interpreted per
    // token per permutation) would re-open the dedup pipeline's dominant
    // scalar cost at corpus scale
    Seq("d2_minhash_sig" -> "minhash_sig",
        "d4_simhash" -> "simhash_sig",
        "t4_fingerprint" -> "token_fingerprint").foreach { case (q, kernel) =>
      val p = plan(q)
      assert(p.contains(kernel), s"$q must call $kernel: ${p.take(1200)}")
      assert(!p.contains("zip_with") && !p.contains("aggregate(lambda"),
        s"$q must not fold signatures through HOFs: ${p.take(1200)}")
    }
  }
}
