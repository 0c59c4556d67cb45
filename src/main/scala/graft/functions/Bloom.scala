package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter semi-join pruning — the runtime-filter pattern
  * that makes selective dimension joins cheap at 100 TB: instead of
  * shuffling the whole fact table into the join, an 8 KB–1 MB bitset
  * summarizing the (filtered) dimension keys rides to every fact scan and
  * drops non-matching rows BEFORE the shuffle. False positives survive the
  * prune and are removed by the exact join that follows, so composing
  * `prunedEquiJoin` is always semantically identical to the plain join
  * (the b1 oracle is literally the plain join) — only the bytes moved
  * change. Spark's AQE has an automatic variant behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`; this explicit form
  * works on any plan shape and documents the size/fp-rate contract.
  *
  * Everything is pure Catalyst: the SAME `xxhash64`-derived bit positions
  * are used to build the bitset (distributed `bit_or` aggregate — the
  * driver only collects ≤ mBits/64 words, control-plane-sized like a
  * k-means centroid set) and to probe it (literal array + shift/mask
  * arithmetic, whole-stage codegen, no UDF anywhere).
  */
object Bloom {

  /** The k bit positions of `key`: xxhash64 seeded by the hash index via a
    * leading literal column (identical expression on build and probe
    * sides, so there is no JVM-vs-codegen hash mismatch to chase). */
  private def bitPositions(key: Column, mBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(j => pmod(xxhash64(lit(j), key), lit(mBits.toLong)))

  /** Aggregate the distinct keys of `keys(keyCol)` into an mBits-wide
    * bitset (packed little-endian into longs). One narrow aggregate over
    * the dimension side; materializes a job (collect of mBits/64 words). */
  def build(keys: DataFrame, keyCol: String,
            mBits: Int = 1 << 16, numHashes: Int = 3): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    val words = keys
      .select(explode(array(bitPositions(col(keyCol), mBits, numHashes): _*)).as("bit"))
      .select(expr("bit div 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("m"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership probe against a built bitset: k codegen'd
    * element_at + mask tests, AND-ed. No false negatives ever; false
    * positives at the standard (1 − e^(−kn/m))^k rate. */
  def mightContain(bits: Array[Long], key: Column, numHashes: Int = 3): Column = {
    val mBits = bits.length * 64
    val arr = typedLit(bits)
    bitPositions(key, mBits, numHashes).map { b =>
      val word = element_at(arr, (shiftright(b, 6) + lit(1)).cast("int"))
      val mask = call_function("shiftleft", lit(1L), (b % 64).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Exact equi-join with Bloom pre-pruning of the fact side: build the
    * bitset over `dim(dimKey)`, filter `fact` rows whose `factKey` cannot
    * match, then run the ordinary exact join. Result ≡ plain join. */
  def prunedEquiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     mBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    val bits = build(dim, dimKey, mBits, numHashes)
    fact.filter(mightContain(bits, col(factKey), numHashes))
      .join(dim, col(factKey) === col(dimKey))
  }
}
