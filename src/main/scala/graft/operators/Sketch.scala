package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-summary operators for cardinality/frequency/quantile questions
  * that exact aggregation cannot answer at 100 TB without a vocabulary- or
  * value-sized shuffle. Companions: HLL approx-distinct (x1, Spark
  * built-in), Misra-Gries heavy hitters ([[TextOps.MisraGries]], t26), and
  * the fixed-grid quantile here (x20).
  */
object Sketch {

  /** Fixed-grid quantile approximation — the two-pass histogram sketch
    * (the equi-width special case of Ben-Haim & Tom-Tov's streaming
    * histograms): pass 1 finds per-group [min, max] (map-side-combined
    * min/max, no shuffle beyond the group keys), pass 2 counts values
    * into `buckets` equal-width bins (ditto), and the quantile reads off
    * the cumulative histogram with linear interpolation inside the
    * straddling bucket. Error is bounded by one bucket width — dialed by
    * `buckets`, with state O(groups · buckets) regardless of row count,
    * which is why this is the shape a 100 TB percentile actually runs
    * (exact `percentile()` holds every value per group in memory).
    *
    * Everything after the two counting passes is a pure function of exact
    * integers (bucket counts) and two exact doubles (min, max), evaluated
    * identically under IEEE arithmetic in any engine — so unlike t-digest
    * or KLL the sketch is DETERMINISTIC and oracle-checkable, while
    * keeping their mergeability (bucket counts are sums; min/max are
    * min/max). Output: one row per group with `q25/q50/q75` estimates in
    * exact milli-units and the group count.
    *
    * The cumulative scan is a window over ≤ `buckets` rows per group —
    * state the size of the sketch, never the data. */
  def gridQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                    buckets: Int = 128): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCol)
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("n"))
    // lo/hi/n ride the bin aggregate's grouping keys (functionally
    // dependent on the group), so the bounds relation has exactly ONE
    // consumer — no pin, no second broadcast join, two data passes total
    val binned = df.join(broadcast(bounds), groupCol)
      // degenerate group (all values equal): everything lands in bucket 0
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            floor((v - col("__lo")) / (col("__hi") - col("__lo")) * buckets),
            lit(buckets - 1))).cast("int"))
      .groupBy(col(groupCol), col("__lo"), col("__hi"), col("n"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__b")
    val cum = binned
      .withColumn("__cum", sum("__cnt").over(w))
    // quantile q: target rank ceil(q·n); the straddling bucket is the
    // first with cum ≥ target; interpolate by the rank offset within it
    def est(qNum: Int, qDen: Int): Column = {
      val target = ceil(col("n") * qNum / qDen)
      val width = (col("__hi") - col("__lo")) / buckets
      val frac = (target - (col("__cum") - col("__cnt"))).cast("double") / col("__cnt")
      // exactly one bucket straddles the target rank: cumBefore < target ≤ cum
      val straddles = col("__cum") >= target && (col("__cum") - col("__cnt")) < target
      max(when(straddles, col("__lo") + (col("__b") + frac) * width)).cast("double")
    }
    cum.groupBy(col(groupCol), col("n"))
      .agg(
        floor(est(1, 4) * 1000 + 0.5).cast("long").as("q25_milli"),
        floor(est(2, 4) * 1000 + 0.5).cast("long").as("q50_milli"),
        floor(est(3, 4) * 1000 + 0.5).cast("long").as("q75_milli"))
      .select(col(groupCol), col("q25_milli"), col("q50_milli"),
        col("q75_milli"), col("n"))
  }

  /** The `depth` Count-Min cell indices for a term: the engine's portable
    * md5-based 32-bit hash pushed through the minhash affine permutation
    * family, reduced mod `width` — every hop reproducible in plain SQL,
    * so the whole sketch (not just its error bound) is oracle-checkable. */
  private[graft] def cmCells(term: Column, depth: Int, width: Int): Column = {
    val h = PortableHash.hash32(term)
    array((0 until depth).map(i => PortableHash.minhashTerm(h, i) % width): _*)
  }

  /** Count-Min sketch build (Cormode & Muthukrishnan 2005): a depth×width
    * grid of counters where occurrence of term t increments cell
    * (i, h_i(t)) for each of the `depth` pairwise-independent hash rows.
    * THE mergeable frequency summary for a 100 TB vocabulary: the
    * aggregate's key space is ≤ depth·width cells regardless of corpus or
    * vocabulary size, so map-side combine compresses every partition to a
    * constant-size partial and the shuffle moves O(depth·width) rows per
    * partition — never a vocabulary-sized exchange (the same reason
    * [[graft.operators.TextOps.heavyHitters]] sketches before it counts).
    * Estimates only OVERcount (collisions add, never subtract):
    * true ≤ est ≤ true + εN with ε = e/width at the standard depth
    * ln(1/δ). Hash rows are the deterministic md5-affine family
    * ([[graft.functions.PortableHash]]) — no RNG, replayable anywhere.
    *
    * Input: one row per token occurrence. Output: (row, cell, cnt) — only
    * touched cells; absent cells are zero.
    *
    * The md5-affine hash runs per DISTINCT TERM, not per token: the token
    * stream pre-aggregates to (term, weight) first — a map-side-combined
    * exchange bounded by the vocabulary — and the sketch cells sum the
    * weights. Bit-identical sketch (Σ over tokens of cell increments =
    * Σ over terms of weight · increments), but the portable hash — ~300 ns
    * and a string allocation per call — prices once per term instead of
    * once per occurrence (measured r15: 7.3 s → the explode cost alone on
    * the sf1 token stream). */
  def countMin(terms: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, "count-min needs depth ≥ 1, width ≥ 2")
    terms.groupBy(termCol).agg(count(lit(1)).as("__w"))
      .select(col("__w"),
        posexplode(cmCells(col(termCol), depth, width)).as(Seq("row", "cell")))
      .groupBy("row", "cell").agg(sum("__w").as("cnt"))
  }

  /** HyperLogLog register table under the PORTABLE hash — the
    * oracle-checkable face of approx-distinct (x1 runs Spark's built-in
    * `approx_count_distinct`, whose internal hash no other engine can
    * replay; these registers use the md5-based [[PortableHash]], so the
    * sketch STATE itself hash-checks in SQL — the e12-for-e5 discipline
    * applied to cardinality). Flajolet et al. 2007: bucket = h mod m,
    * rank = leading-zero count of the remaining hash bits + 1, register =
    * max rank per bucket. The estimator (α·m²/Σ2^(−reg), linear-counting
    * fallback below 2.5m) is a scalar over m integers — driver-side
    * post-processing, deliberately NOT a float column in the gate.
    *
    * Rank arithmetic is `bin()`-based (27 − length of the binary suffix,
    * both engines strip leading zeros identically) — pure codegen, no
    * UDF. Scale: the aggregate's key space is m buckets; map-side combine
    * reduces every partition to ≤ m rows — the same
    * constant-state-per-partition shape as [[countMin]], and exactly how
    * a 100 TB distinct-count actually ships its partials. Registers merge
    * across shards/streams by max — the property HLL exists for.
    *
    * Output: (bucket, register) for all m buckets (empty = 0). */
  def hllRegisters(df: DataFrame, valueCol: String, m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")
    val suffixBits = 32 - Integer.numberOfTrailingZeros(m)
    val occupied = df
      .select(PortableHash.hash32(col(valueCol)).as("__h"))
      // integer div/mod (Column./ is double division — a 2^26 suffix must
      // not round-trip through a double even when it happens to be exact)
      .select(expr(s"__h % $m").as("bucket"), expr(s"__h div $m").as("__sfx"))
      .withColumn("__rank",
        when(col("__sfx") === 0, lit(suffixBits + 1))
          .otherwise(lit(suffixBits + 1) - length(bin(col("__sfx")))))
      .groupBy("bucket").agg(max("__rank").as("register"))
    val all = df.sparkSession.range(m).select(col("id").as("bucket"))
    all.join(occupied, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0)).cast("int").as("register"))
  }

  /** Per-group [[hllRegisters]] — one register table per `keyCol` value,
    * in the SAME two jobs regardless of group count (the group key rides
    * in the aggregate). Registers merge across groups by bucket-wise
    * max — the property that lets a 100 TB lake keep per-partition
    * sketches and answer any union cardinality without rescanning
    * (x40 hash-proves merged ≡ whole-corpus registers). Only occupied
    * (key, bucket) cells emit (absent ⇒ register 0); the merge side
    * zero-fills. */
  def hllRegistersBy(df: DataFrame, keyCol: String, valueCol: String,
                     m: Int = 64): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")
    val suffixBits = 32 - Integer.numberOfTrailingZeros(m)
    df
      .select(col(keyCol), PortableHash.hash32(col(valueCol)).as("__h"))
      .select(col(keyCol), expr(s"__h % $m").as("bucket"),
        expr(s"__h div $m").as("__sfx"))
      .withColumn("__rank",
        when(col("__sfx") === 0, lit(suffixBits + 1))
          .otherwise(lit(suffixBits + 1) - length(bin(col("__sfx")))))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max("__rank").cast("int").as("register"))
  }

  /** Point query against a [[countMin]] sketch: est(t) = min over rows of
    * the t-addressed cells. `probes` rows pass through with an `est`
    * column appended. The probe relation is the small side (a term list),
    * so the cell join broadcasts it; the min-over-depth aggregate touches
    * depth rows per probe. */
  def countMinLookup(sketch: DataFrame, probes: DataFrame, termCol: String,
                     depth: Int = 4, width: Int = 512): DataFrame = {
    val keyed = probes.select(col("*"),
      posexplode(cmCells(col(termCol), depth, width)).as(Seq("row", "cell")))
    val passThrough = probes.columns.map(col).toSeq
    keyed.join(sketch.withColumnRenamed("cnt", "__cellcnt"), Seq("row", "cell"))
      .groupBy(passThrough: _*)
      .agg(min("__cellcnt").as("est"))
  }

  /** Exact 64-bit word bitmaps per segment — the bitmap-index shape
    * (ClickHouse groupBitmap / Druid) for membership set algebra over an
    * integer id space: id folds to (word = id div 64, bit = id mod 64)
    * and a segment's members aggregate to one mask long per occupied
    * word via `bit_or` (mergeable, map-side combined — a member never
    * shuffles twice however often it recurs). Output: (seg, word, bm).
    * State is |members|/64 longs per segment, NOT |rows|. */
  def bitmapWords(df: DataFrame, segCol: String, idCol: String): DataFrame =
    df.select(col(segCol).as("seg"), expr(s"$idCol div 64").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($idCol % 64 AS INT))").as("__bit"))
      .groupBy("seg", "word")
      .agg(expr("bit_or(__bit)").as("bm"))

  /** Pairwise segment overlap from [[bitmapWords]] masks: cardinalities
    * are Σ popcount(word), intersections Σ popcount(AND) over a
    * word-keyed equi self-join of the tiny bitmap relation — exact (no
    * sketch error), all-integer, and never a (segment, id)-grain shuffle.
    * Output per unordered pair with n_common > 0:
    * (seg1, seg2, n1, n2, n_common, n_union). */
  def bitmapOverlap(df: DataFrame, segCol: String, idCol: String): DataFrame = {
    // pin the mask relation: it feeds both join legs AND both cardinality
    // lookups — unpinned, the corpus would scan four times
    val words = graft.core.Caching.shared(bitmapWords(df, segCol, idCol))
    val card = words.groupBy("seg").agg(sum(expr("bit_count(bm)")).as("n"))
    val a = words.select(col("seg").as("seg1"), col("word"), col("bm").as("bm1"))
    val b = words.select(col("seg").as("seg2"), col("word"), col("bm").as("bm2"))
    a.join(b, Seq("word")).filter(col("seg1") < col("seg2"))
      .groupBy("seg1", "seg2")
      .agg(sum(expr("bit_count(bm1 & bm2)")).as("n_common"))
      .filter(col("n_common") > 0)
      .join(broadcast(card.select(col("seg").as("seg1"), col("n").as("n1"))), "seg1")
      .join(broadcast(card.select(col("seg").as("seg2"), col("n").as("n2"))), "seg2")
      .select(col("seg1"), col("seg2"), col("n1"), col("n2"), col("n_common"),
        (col("n1") + col("n2") - col("n_common")).as("n_union"))
  }

}
