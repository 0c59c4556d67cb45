package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-DOCUMENT primitive-loop kernels for the token-pipeline hot paths —
  * the text twin of [[BlockKernels]], and the same altitude argument:
  * Spark's higher-order functions have no codegen, so the HOF forms of
  * minhash / simhash / fingerprinting paid interpreted `Expression.eval`
  * dispatch (plus an accumulator-array allocation in `zip_with`, plus a
  * `array(k)` build, plus an md5-hex-string parse through `conv`) PER
  * TOKEN PER PERMUTATION. Round 16's forced-evaluation bench exposed the
  * real cost (d2_minhash_sig and t4_fingerprint were 3.7× under-measured
  * under `count()`): at 100-TB corpus scale these folds run once per
  * corpus token and sit squarely on the dedup pipeline's critical path.
  *
  * Each kernel is one Catalyst expression call per document: the
  * interpreted-dispatch cost is paid once per row, and the loop body —
  * one MD5 over the token bytes (digest bytes consumed directly, no hex
  * round-trip) and k fused multiply-min updates — JITs like hand-written
  * Scala. Semantics replicate the HOF forms BIT-FOR-BIT (same hash, same
  * affine permutations, same int-overflow and modulo semantics, same
  * null/empty contracts), so every oracle hash is unchanged; the HOF
  * equivalence is asserted in TextKernelsSpec.
  *
  * Inputs are the RAW `split(lower(text), "\\s+")` arrays: the kernels
  * skip empty-string tokens themselves (the `filter` HOF the old forms
  * used was itself interpreted per token) and return null when no token
  * survives — exactly the rows the old `.filter(size > 0)` dropped.
  */
object TextKernels {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** k-permutation MinHash signature (array<long>, null if no tokens). */
  def minhashSig(tokens: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k))

  /** Positionally-weighted rolling fingerprint (long, null if no tokens). */
  def fingerprint(tokens: Column): Column =
    ColumnBridge.column(TokenFingerprint(ColumnBridge.expression(tokens)))

  /** Sign-of-votes SimHash over DISTINCT tokens (long, null if none). */
  def simhashSig(tokens: Column, bits: Int): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(tokens), bits))

  /** Per-document term frequencies: array<struct<tok,tf>> (null if no
    * tokens). Term counting is doc-LOCAL — as a kernel it needs no
    * exchange at all, where the explode→groupBy(doc, tok) form it
    * replaces shuffled one row per corpus token occurrence. */
  def termCounts(tokens: Column): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(tokens)))

  /** |a ∩ b| over two string arrays (exact count of distinct matches —
    * duplicates in either side count once). */
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** MessageDigest is stateful — one per thread, reset per token. */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [[PortableHash.hash32]] twin on raw digest bytes: the first 8 hex
    * chars of md5 = the first 4 digest bytes as an unsigned 32-bit value
    * (the Column form string-parses them through `conv`; same number). */
  private[functions] def hash32(t: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(t.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** MinHash signature of one document in one pass: for each non-empty
  * token, one MD5 and k affine-permutation min updates. Duplicate tokens
  * are harmless (min is idempotent), so the old `array_distinct` is not
  * replicated — the signature is provably identical. */
case class MinHashSig(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {
  require(k > 0, s"minhash k must be positive, got $k")
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val as = Array.tabulate(k)(i => PortableHash.perm(i)._1)
  private val bs = Array.tabulate(k)(i => PortableHash.perm(i)._2)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          seen = true
          val h = TextKernels.hash32(t)
          var j = 0
          while (j < k) {
            val m = (h * as(j) + bs(j)) % PortableHash.prime
            if (m < mins(j)) mins(j) = m
            j += 1
          }
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-sensitive fingerprint fp = foldl((acc + h(tokᵢ)·(2i+1)) mod p, 0)
  * over non-empty tokens — i counts KEPT tokens, and the (2i+1) weight is
  * computed in Int like the HOF's `sequence` index was. */
case class TokenFingerprint(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "token_fingerprint"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var idx = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          val h = TextKernels.hash32(t)
          acc = (acc + h * (idx * 2 + 1).toLong) % PortableHash.prime
          idx += 1
        }
      }
      i += 1
    }
    if (idx == 0) null else java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Term-frequency fold of one document: (token → occurrence count) over
  * non-empty tokens, emitted as array<struct<tok string, tf bigint>> in
  * first-seen order (deterministic; consumers aggregate or join, so order
  * carries no semantics). Null when no token survives — explode() then
  * drops the row exactly like the old empty explode did. */
case class TermCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "term_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          val slot = counts.get(t)
          if (slot != null) slot(0) += 1
          // defensive copy: the array element may be a view over a shared
          // buffer that later elements overwrite
          else counts.put(t.clone(), Array(1L))
        }
      }
      i += 1
    }
    if (counts.isEmpty) null
    else {
      val out = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](e.getKey, e.getValue()(0)))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct-intersection size of two token-set arrays — the pair-local
  * half of an exact Jaccard verify: hash-set build over the smaller side,
  * probe from the larger, each distinct match counted once. One kernel
  * call per candidate PAIR replaces a token-keyed join + count aggregate
  * (an O(pairs·tokens) exchange) in the candidates-verify pipeline. */
case class IntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {
  override def prettyName: String = "intersect_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[ArrayData]
    var b = r.asInstanceOf[ArrayData]
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val small = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) small.add(a.getUTF8String(i).clone())
      i += 1
    }
    var n = 0L
    val nb = b.numElements()
    var j = 0
    while (j < nb) {
      // remove-on-match: duplicates on the probe side count once
      if (!b.isNullAt(j) && small.remove(b.getUTF8String(j))) n += 1
      j += 1
    }
    java.lang.Long.valueOf(n)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash of one document: per bit b < bits, count DISTINCT tokens whose
  * hash has bit b set; signature bit set iff 2·ones(b) > n(distinct).
  * Distinctness matters here (each distinct token votes once), so the
  * kernel dedupes token strings in a per-row hash set — still one pass. */
case class SimHashSig(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 32, s"simhash bits must be in 1..32, got $bits")
  override def prettyName: String = "simhash_sig"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val ones = new Array[Long](bits)
    var distinct = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        // HashSet holds a defensive copy: getUTF8String may expose a view
        // over a shared buffer that later elements overwrite
        if (t.numBytes() > 0 && seen.add(t.clone())) {
          distinct += 1
          val h = TextKernels.hash32(t)
          var b = 0
          while (b < bits) {
            ones(b) += (h >>> b) & 1L
            b += 1
          }
        }
      }
      i += 1
    }
    if (distinct == 0) null
    else {
      var sig = 0L
      var b = 0
      while (b < bits) {
        if (ones(b) * 2 > distinct) sig |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
