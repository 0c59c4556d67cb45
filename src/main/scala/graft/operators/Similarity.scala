package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Beyond-reference surface (BASELINE.json north star).
  *
  * Two paths:
  *  - brute-force cosine top-k: the correctness baseline. Queries broadcast
  *    (small side), corpus streams once; the only wide op is the per-query
  *    top-k (window rank over a shuffle keyed by query id).
  *  - random-hyperplane LSH: each vector gets a b-bit bucket from signs of
  *    dot products with b FIXED pseudo-random hyperplanes (deterministic,
  *    derived from dimension index — replayable with no RNG state). At
  *    100 TB the bucket join replaces the O(|Q|·|C|) scan with
  *    O(candidates-in-bucket); brute force stays as the verifier.
  *
  * All vector math is codegen'd higher-order functions (zip_with +
  * aggregate) — no UDFs, no driver collect.
  */
object Similarity {

  /** Σ aᵢ·bᵢ via zip_with + aggregate (both codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for each query vector.
    * `queries` must be small (broadcast); ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.vec_cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random unit-ish hyperplane component for
    * (plane p, dimension d) — Knuth multiplicative hash scaled to
    * [-0.5, 0.5). No RNG: replayable anywhere. */
  def planeComponent(p: Int, d: Int): Double =
    (((p * 1000003L + d) * 2654435761L % 1000L).toDouble / 1000.0 + 1.0) % 1.0 - 0.5

  /** Smallest bit count b in [minBits, maxBits] with n ≤ targetBucket·2^b —
    * the SemDeDup cluster-count dial expressed for the sign-LSH stand-in:
    * bucket count tracks corpus size so EXPECTED occupancy stays ≤
    * targetBucket and within-bucket pairwise work is ~n·targetBucket
    * (linear in n), never the fixed-bits n²/2^b quadratic that a 10×
    * corpus turns into ~100× pair evals (VERDICT r16 #1). Pure integer
    * ladder — no float log2 edge cases — so an oracle replays the exact
    * same comparisons. */
  def adaptiveBits(n: Long, targetBucket: Int, minBits: Int, maxBits: Int): Int = {
    var b = minBits
    while (b < maxBits && n > (targetBucket.toLong << b)) b += 1
    b
  }

  /** b-bit LSH bucket id from sign bits of hyperplane dot products. */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dot(vec.cast("array<double>"), plane) >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Deterministic mini k-means for IVF coarse quantization: initial
    * centroids are the k corpus vectors with the smallest portable hash of
    * their id (pseudo-random spread, no RNG state), then `iters` Lloyd
    * rounds. Assignment is a broadcast argmin over k centroid literals
    * (array_min over (dist², cid) structs — ties to the lower cid, fully
    * deterministic); the update is a posexplode → per-(cluster, dim) avg —
    * one narrow shuffle per round, map-side combined. k and iters are
    * control-plane small; the corpus streams, never collects. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    import graft.functions.PortableHash
    val v = col("embedding").cast("array<double>")
    var centroids: Seq[(Int, Seq[Double])] = corpus
      .select(col("vec_id"), v.as("v"))
      .withColumn("h", PortableHash.hash32(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    for (_ <- 0 until iters) {
      val assigned = corpus.select(v.as("v"))
        .withColumn("cid", nearestCentroid(col("v"), centroids))
      val updated = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy("cid", "pos").agg(avg("col").as("m"))
        .groupBy("cid")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      // empty clusters keep their previous centroid (standard practice)
      val byId = updated.toMap
      centroids = centroids.map { case (cid, c) => (cid, byId.getOrElse(cid, c)) }
    }
    centroids
  }

  /** Argmin over centroid literals: struct comparison picks the smallest
    * (dist², cid) — deterministic ties. */
  def nearestCentroid(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      val cl = array(c.map(lit): _*)
      struct(
        aggregate(zip_with(vec, cl, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, d) => a + d).as("d"),
        lit(cid).as("cid"))
    }: _*))("cid")

  /** IVF ANN: corpus vectors are inverted-listed by nearest centroid; each
    * query probes its `nprobe` nearest lists and scores exact cosine only
    * within them — the classic recall/cost dial. At 100 TB the cluster id
    * is a partition key: probe joins touch nprobe/k of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              centroids: Seq[(Int, Seq[Double])], nprobe: Int, k: Int): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val listed = corpus.withColumn("cid", nearestCentroid(v, centroids))
    // nprobe nearest centroids per query: sorted (dist², cid) structs
    val probes = array(centroids.map { case (cid, c) =>
      val cl = array(c.map(lit): _*)
      struct(aggregate(zip_with(v, cl, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, d) => a + d).as("d"), lit(cid).as("cid"))
    }: _*)
    val q = broadcast(queries
      .withColumn("probe", explode(transform(
        slice(sort_array(probes), 1, nprobe), s => s("cid"))))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("probe").as("cid")))
    val scored = q.join(listed, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.vec_cosine(
          col("qv").cast("array<double>"), v))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** SemDeDup-style semantic dedup over embeddings: vectors are grouped by
    * a deterministic LSH sign bucket (the cheap, replayable stand-in for
    * the k-means cluster assignment of the SemDeDup recipe — swap in
    * [[nearestCentroid]] ids at production scale, where the cluster count
    * tracks corpus size so the within-cluster pairwise stays bounded), and
    * a vector is marked a duplicate of the SMALLEST-id vector in its bucket
    * whose cosine similarity reaches `tau`. Output: every corpus vector
    * with (bucket, dup_of); `dup_of IS NULL` = kept representative.
    *
    * Scale shape: the self-join shuffles both sides by the bucket key once;
    * pairwise cost is Σ bucketᵢ² — `bits` dials bucket granularity, and
    * `maxBucketSize > 0` drops degenerate buckets exactly like
    * [[graft.operators.Dedup.lshCandidates]] (their members would pair
    * with near-everything and carry no discriminating signal; dropped
    * vectors surface as kept representatives). Never all-pairs. */
  def semanticDup(corpus: DataFrame, dim: Int, bits: Int, tau: Double,
                  maxBucketSize: Int = 0): DataFrame = {
    val bucketed = graft.core.Caching.shared(
      corpus.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), dim, bits).as("bucket")))
    val paired =
      if (maxBucketSize <= 0) bucketed
      else {
        val over = bucketed.groupBy("bucket")
          .agg(count(lit(1)).as("__bsz")).filter(col("__bsz") > maxBucketSize)
        val rows = over.collect()
        if (rows.isEmpty) bucketed
        else {
          System.err.println(
            s"[graft] semanticDup: dropping ${rows.length} buckets " +
              s"(${rows.map(_.getLong(1)).sum} rows) above cap $maxBucketSize")
          bucketed.join(broadcast(
              bucketed.sparkSession.createDataFrame(
                java.util.Arrays.asList(rows: _*), over.schema).select("bucket")),
            Seq("bucket"), "left_anti")
        }
      }
    val a = paired.select(col("bucket"), col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = paired.select(col("bucket"), col("vec_id").as("id2"), col("embedding").as("v2"))
    val dups = a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.vec_cosine(
          col("v1").cast("array<double>"), col("v2").cast("array<double>")))
      .filter(col("cosine") >= tau)
      .groupBy(col("id2").as("vec_id")).agg(min("id1").as("dup_of"))
    bucketed.select("vec_id", "bucket")
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("dup_of"))
  }

  /** Per-vector max |xᵢ| — the symmetric-quantization scale. */
  def absMax(vec: Column): Column =
    array_max(transform(vec.cast("array<double>"), x => abs(x)))

  /** Symmetric int8 quantization of an embedding column — the storage-path
    * op of a 100 TB vector corpus (4× smaller than float32, dot products
    * stay rank-preserving within a vector's scale). qᵢ = ⌊127·xᵢ/scale +
    * 0.5⌋ (explicit half-up floor so the oracle's rounding mode can't
    * diverge); zero vectors quantize to zeros. `scale` must be a
    * pre-projected ATTRIBUTE (from [[absMax]]) — passing the aggregate
    * expression itself would let Catalyst inline it per element (the
    * CollapseProject O(n²) trap). Pure higher-order functions, no UDF. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec.cast("array<double>"), x =>
      when(scale === 0, lit(0L)).otherwise(floor(x * 127.0 / scale + 0.5).cast("long")))

  /** LSH-bucketed ANN: candidates = same bucket, then exact cosine + top-k
    * within candidates. Recall < 1 by construction; bits trades recall for
    * candidate-set size. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, bits: Int, k: Int): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), dim, bits))
    val q = broadcast(queries
      .withColumn("bucket", lshBucket(col("embedding"), dim, bits))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket")))
    val scored = q.join(bucketed, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.vec_cosine(col("qv"), col("embedding")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Product-quantization ANN — the memory side of the IVF-PQ pairing that
    * makes billion-vector search tractable: each vector compresses to `m`
    * sub-space codebook indices (here m bytes), and query distance is
    * answered from the codes alone via an asymmetric-distance (ADC) lookup
    * table, never touching the original floats.
    *
    * Determinism discipline: every sub-space distance quantizes to integer
    * MICRO-units before it is compared (encode argmin, ties to the lowest
    * codeword) or summed (ADC = Σ_m lut[m][code_m], an exact integer sum) —
    * so both the codes and the ranking replay bit-for-bit in any engine.
    * The codebook is caller-fixed (data-derived like e7's centroids or
    * trained offline); the ADC lookup table is computed driver-side with
    * the same left-to-right fold the engines use and enters the plan as
    * `m` literal arrays.
    *
    * Scale shape: encode is pure per-row expressions fused into the scan
    * (no shuffle, no UDF — plan-time-unrolled like [[graft.operators.Focal]]'s
    * kernels); the only wide op is the final distributed TakeOrdered. At
    * 100 TB the encoded corpus is 8 bytes/vector + id — the artifact you
    * actually store — and any query is a literal-table rescan of it. */
  def pqTopK(corpus: DataFrame, codebook: Seq[Seq[Double]], query: Seq[Double],
             m: Int, k: Int): DataFrame = {
    val dim = query.length
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(codebook.nonEmpty && codebook.forall(_.length == dim),
      "codebook entries must be full-dimension vectors")
    val sub = dim / m
    // micro-unit ‖a−b‖² with the engines' left-to-right fold order
    def microDist(a: Seq[Double], b: Seq[Double]): Long = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      math.floor(d * 1e6 + 0.5).toLong
    }
    val v = col("embedding").cast("array<double>")
    def subDist(ms: Int, cw: Seq[Double]): Column = {
      val cLit = array(cw.map(lit): _*)
      floor(aggregate(
        zip_with(slice(v, ms * sub + 1, sub), cLit, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d) * 1e6 + 0.5).cast("long")
    }
    val withCodes = (0 until m).foldLeft(corpus) { (df, ms) =>
      val dists = array(codebook.indices.map(j =>
        subDist(ms, codebook(j).slice(ms * sub, ms * sub + sub))): _*)
      // array_position returns the FIRST index of the min: lowest-codeword
      // tie-break, 1-based
      df.withColumn(s"__c$ms", (array_position(dists, array_min(dists)) - 1).cast("int"))
    }
    val luts = (0 until m).map { ms =>
      val qSub = query.slice(ms * sub, ms * sub + sub)
      array(codebook.map(cw =>
        lit(microDist(qSub, cw.slice(ms * sub, ms * sub + sub)))): _*)
    }
    val adc = (0 until m).map(ms => element_at(luts(ms), col(s"__c$ms") + 1))
      .reduce(_ + _)
    val coded = withCodes.withColumn("adc_micro", adc)
    val top = coded.orderBy(col("adc_micro").asc, col("vec_id").asc).limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("adc_micro").asc, col("vec_id").asc)))
      .select(Seq(col("vec_id")) ++ (0 until m).map(ms => col(s"__c$ms").as(s"code$ms")) ++
        Seq(col("adc_micro"), col("rank")): _*)
  }

  /** Reciprocal-rank fusion of any number of rankers over a shared id
    * space — the standard way to combine a lexical retriever (BM25) with a
    * dense one (cosine ANN) without calibrating their score scales:
    * RRF(d) = Σ_lists 1/(k0 + rank_list(d)), k0 = 60 (Cormack et al.'s
    * constant).
    *
    * Each term is quantized to integer NANO-units via floor division
    * (10⁹ div (k0 + rank)) before the sum, so fusion is exact integer
    * arithmetic replayable by any engine — no float accumulation, and the
    * fused ordering is total (ties broken by id). `n_lists` reports how
    * many rankers surfaced the id (a useful quality signal: consensus vs
    * single-retriever hits).
    *
    * Scale shape: a union of the (already tiny, top-k-sized) rank lists
    * and ONE hash aggregate on the id — no join grows with corpus size;
    * fusing r rankers of depth k touches r·k rows regardless of the corpus
    * behind them. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val nano = rankings.map(_.select(col("id"),
      expr(s"CAST(1000000000 div ($k0 + rank) AS BIGINT)").as("__c")))
    val fused = nano.reduce(_.unionAll(_))
      .groupBy("id")
      .agg(sum("__c").as("rrf_nano"), count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_nano").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w))
  }

  /** Micro-quantize a float vector to exact integer micro-units
    * (half-up, the e4/pq discipline). */
  def quantizeMicro(vec: Column): Column =
    transform(vec, x => floor(x * 1e6 + 0.5).cast("long"))

  /** INTEGER-EXACT Lloyd k-means — the oracle-checkable sibling of
    * [[kmeansCentroids]] (e5's float form is rows-only by declaration:
    * float means drift across engines). Vectors quantize once to
    * micro-units; every subsequent step is exact: squared distances are
    * BIGINT folds, the assignment argmin ties to the smallest cluster id,
    * and the centroid update is floor(Σ/n) per dimension — floor of an
    * IEEE-exact quotient of sub-2⁵³ integers, identical in any engine. A
    * fixed round count replaces convergence testing, so the whole
    * trajectory (not just the fixed point) replays bit-for-bit.
    *
    * Scale shape per round: assignment is vectors × k distance folds with
    * the k-row centroid relation BROADCAST (the corpus never shuffles for
    * it); the update explodes assigned vectors to (cid, dim, value) rows —
    * the one unavoidable shuffle, map-side combined to k·dim partials.
    * Clusters that empty simply drop out (mirrored exactly by the oracle).
    * localCheckpoint keeps lineage flat across rounds.
    *
    * `vectors`: (vec_id, qv: array<long>); `init`: (cid, c: array<long>).
    * Output: final-round assignment (vec_id, cid, d) with d the exact
    * squared micro-distance. */
  def kmeansExact(vectors: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    val pinned = graft.core.Caching.shared(vectors)
    assignExact(pinned, centroidRounds(pinned, init, iters))
  }

  /** The trained CENTROID relation of [[kmeansExact]] — the (cid,
    * c: array<long>) state after `iters - 1` integer Lloyd update rounds
    * (iters = 2 ⇒ one assign → floor-mean update, e12's trajectory).
    * Exposed so an IVF index can be built on trained-and-still-replayable
    * centroids: micro-unit longs convert to doubles with one exact
    * widening + one correctly-rounded division, so the downstream float
    * probe arithmetic (`ivfTopK`) is bit-identical cross-engine — the
    * property float Lloyd means can never give (e5 was rows-only until
    * this existed). */
  def kmeansExactCentroids(vectors: DataFrame, init: DataFrame, iters: Int): DataFrame =
    centroidRounds(graft.core.Caching.shared(vectors), init, iters)

  /** The Lloyd update rounds over an ALREADY-PINNED vector relation —
    * shared so [[kmeansExact]] pins exactly once for both the rounds and
    * its final assignment. */
  private def centroidRounds(pinned: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "kmeansExact needs at least one round")
    var cents = init
    for (_ <- 1 until iters) {
      val a = assignExact(pinned, cents)
      cents = a.join(pinned, "vec_id")
        .select(col("cid"), posexplode(col("qv")))
        .groupBy(col("cid"), col("pos"))
        .agg(floor(sum(col("col")).cast("double") / count(lit(1))).cast("long")
          .as("__cv"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("__cv")))),
          x => x("__cv")).as("c"))
        .localCheckpoint(eager = false)
    }
    cents
  }

  /** One exact assignment round: BIGINT distance folds against the
    * BROADCAST k-row centroid relation, argmin ties to the smallest cid. */
  private def assignExact(pinned: DataFrame, cents: DataFrame): DataFrame =
    pinned.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        aggregate(zip_with(col("qv"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("__m"))
      .select(col("vec_id"), col("__m.cid").as("cid"), col("__m.d").as("d"))

  /** Principal component of an embedding corpus by integer-exact POWER
    * ITERATION — the analysis/whitening primitive (dominant-direction
    * removal à la all-but-the-top, drift monitoring, PCA-guided IVF
    * splits) made oracle-checkable: covariance accumulation, the
    * matrix-vector products, and every normalization are integer
    * arithmetic with sign-safe magnitude division (|x| div d re-signed —
    * Spark's `div` truncates toward zero while SQL's `//` floors, so
    * negative divisions NEVER happen), hence bit-identical under any
    * accumulation order.
    *
    * Steps: per-dimension integer mean → centered components → the d×d
    * scatter matrix M(i,j) = Σ c_i·c_j (one self-join on the vector id,
    * map-side-combined — d² rows total regardless of corpus size) →
    * `iters` rounds of x ← M·x with L∞ renormalization to 10⁶ (the
    * [[graft.operators.Graph.hits]] gauge; the 1-row max-abs broadcasts).
    * Scatter cells pre-scale by `matrixScaleDiv` to keep x·M inside
    * BIGINT at any corpus size. Convergence is the standard power-method
    * rate (λ₂/λ₁ per round); fixed `iters` keeps it replayable.
    *
    * Scale shape: the component explode is the only corpus-sized
    * relation (pinned — it feeds mean and scatter); everything after is
    * d²-sized. At 100 TB the scatter aggregate is exactly how a
    * distributed covariance is built: partial d² partials per partition,
    * one exchange. */
  def pcaPower(vectors: DataFrame, iters: Int = 3,
               matrixScaleDiv: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "pcaPower needs at least one iteration")
    val comp = graft.core.Caching.shared(
      vectors.select(col("vec_id"), posexplode(col("qv")).as(Seq("i", "v"))))
    // sign-safe integer division over NAMED columns: |num| div den,
    // re-signed — truncation-vs-floor never diverges cross-engine because
    // a negative numerator never reaches the div
    def signSafe(num: String, den: String): Column =
      expr(s"CASE WHEN $num < 0 THEN -(abs($num) div $den) ELSE $num div $den END")
    val mean = comp.groupBy("i")
      .agg(sum("v").as("__s"), count(lit(1)).as("__n"))
      .select(col("i"), signSafe("__s", "__n").as("mu"))
    val centered = graft.core.Caching.shared(
      comp.join(broadcast(mean), "i")
        .select(col("vec_id"), col("i"), (col("v") - col("mu")).as("c")))
    val scatter = graft.core.Caching.shared(
      centered.join(
          centered.select(col("vec_id"), col("i").as("j"), col("c").as("cj")),
          "vec_id")
        .groupBy("i", "j").agg(sum(col("c") * col("cj")).as("__m"))
        .select(col("i"), col("j"),
          signSafe("__m", matrixScaleDiv.toString).as("m")))
    val scale = 1000000L
    var x = scatter.select(col("j")).distinct()
      .select(col("j"), lit(scale).as("x"))
    for (k <- 1 to iters) {
      val raw = graft.core.Caching.shared(
        scatter.join(x, "j")
          .groupBy(col("i")).agg(sum(col("m") * col("x")).as("__r")))
      // L∞ gauge via a unit divisor (max|raw| div 10⁶) instead of
      // multiplying raw by 10⁶ — raw·10⁶ would overflow BIGINT at scale
      x = raw
        .crossJoin(broadcast(raw.agg(max(abs(col("__r"))).as("__mx"))))
        .withColumn("__unit", greatest(lit(1L), expr(s"__mx div $scale")))
        .select(col("i").as("j"), signSafe("__r", "__unit").as("x"))
      if (k < iters) x = x.localCheckpoint(eager = false)
    }
    x.select(col("j").cast("long").as("dim"), col("x").as("eig_micro"))
  }

  /** All-but-the-top dominant-direction removal (Mu & Viswanath,
    * ICLR'18) — the embedding post-processing step that subtracts each
    * vector's projection onto the corpus' principal component
    * ([[pcaPower]]'s output), isotropizing the space before similarity
    * search. Exact integers end to end: the projection coefficient
    * c_micro = (v·x)·10⁶ / (x·x) lifts to DECIMAL(38) for its one
    * division (sign-safe magnitude form — Spark `div` truncates, SQL
    * `//` floors); per-dimension projections then divide back by 10⁶
    * under the same discipline, so the residual and its norm are
    * bit-identical in any engine.
    *
    * Scale shape: the component explode is pinned (coefficient fold +
    * residual fold both read it); the d-row principal component and the
    * 1-row x·x broadcast; per-vector coefficients broadcast back into
    * the residual fold. Output: (vec_id, c_micro, resid_norm2). */
  def abttResiduals(vectors: DataFrame, component: DataFrame): DataFrame = {
    val comp = graft.core.Caching.shared(
      vectors.select(col("vec_id"), posexplode(col("qv")).as(Seq("dim", "v"))))
    val x = graft.core.Caching.shared(
      component.select(col("dim"), col("eig_micro")))
    val xx = x.agg(sum(col("eig_micro") * col("eig_micro")).as("__xx"))
    val coefs = comp.join(broadcast(x), "dim")
      .groupBy("vec_id").agg(sum(col("v") * col("eig_micro")).as("__dot"))
      .crossJoin(broadcast(xx))
      .withColumn("c_micro", expr(
        """CASE WHEN __xx = 0 THEN CAST(0 AS BIGINT)
          |  WHEN __dot < 0
          |    THEN CAST(-((CAST(-__dot AS DECIMAL(38,0)) * 1000000)
          |      div CAST(__xx AS DECIMAL(38,0))) AS BIGINT)
          |  ELSE CAST((CAST(__dot AS DECIMAL(38,0)) * 1000000)
          |    div CAST(__xx AS DECIMAL(38,0)) AS BIGINT) END""".stripMargin))
      .select(col("vec_id"), col("c_micro"))
    comp.join(broadcast(x), "dim")
      .join(broadcast(coefs), "vec_id")
      .withColumn("__p", expr(
        """CASE WHEN c_micro * eig_micro < 0
          |  THEN -((-(c_micro * eig_micro)) div 1000000)
          |  ELSE (c_micro * eig_micro) div 1000000 END""".stripMargin))
      .withColumn("__r", col("v") - col("__p"))
      .groupBy("vec_id")
      .agg(max("c_micro").as("c_micro"),
        sum(col("__r") * col("__r")).as("resid_norm2"))
  }

  /** PQ codebook TRAINING — integer-exact Lloyd per subspace, closing the
    * one hand-set link in the PQ chain: e9/e10 encode and probe against
    * FIXED codebooks; this learns them from the corpus (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", §III: independent
    * k-means in each of the m subspaces). Same arithmetic discipline as
    * [[kmeansExact]] — micro-quantized BIGINT vectors, zip_with/aggregate
    * distance folds, floor(Σ/n) centroid updates — with the subspace id as
    * an extra key everywhere, so all m codebooks train in the SAME jobs
    * (one assignment shuffle + one update shuffle per round, never m
    * sequential k-means). The full trajectory replays bit-for-bit in SQL
    * (e13). At scale: centroid relations are m·k rows (broadcast), the
    * exploded subvector relation is m rows per vector with dsub-length
    * arrays — the same bytes as the input, partitioned by vector.
    *
    * `vectors`: (vec_id, qv) with |qv| = m·dsub. `init`: (sub, cid, c)
    * seed codebooks. Output: (vec_id, sub, cid, d) — the trained-codebook
    * PQ code word per subspace plus its exact squared distance. */
  def pqTrain(vectors: DataFrame, m: Int, dsub: Int,
              init: DataFrame, iters: Int): DataFrame = {
    require(m >= 1 && dsub >= 1 && iters >= 1, "pqTrain needs m, dsub, iters ≥ 1")
    val subs = graft.core.Caching.shared(
      vectors.select(col("vec_id"), posexplode(
          array((0 until m).map(s1 => slice(col("qv"), s1 * dsub + 1, dsub)): _*))
        .as(Seq("sub", "sv"))))
    def assign(cents: DataFrame): DataFrame =
      subs.join(broadcast(cents), "sub")
        .select(col("vec_id"), col("sub"), col("cid"),
          aggregate(zip_with(col("sv"), col("c"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"))
        .groupBy("vec_id", "sub")
        .agg(min(struct(col("d"), col("cid"))).as("__m"))
        .select(col("vec_id"), col("sub"),
          col("__m.cid").as("cid"), col("__m.d").as("d"))
    var cents = init
    for (_ <- 1 until iters) {
      val a = assign(cents)
      cents = a.join(subs, Seq("vec_id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("sv")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(floor(sum(col("col")).cast("double") / count(lit(1))).cast("long")
          .as("__cv"))
        .groupBy("sub", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("__cv")))),
          x => x("__cv")).as("c"))
        .localCheckpoint(eager = false)
    }
    assign(cents)
  }
}
