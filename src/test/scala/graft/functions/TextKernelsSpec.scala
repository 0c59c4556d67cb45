package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The per-document text kernels must replicate the interpreted HOF forms
  * they replaced BIT-FOR-BIT — the HOF expressions are kept HERE as the
  * independent reference (they are the shapes the DuckDB oracles replay). */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  // the round-15 HOF forms, verbatim
  private def hofTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private def hofMinhash(text: Column, k: Int): Column = {
    val hashed = transform(array_distinct(hofTokens(text)),
      t => PortableHash.hash32(t))
    aggregate(hashed, array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc,
        array((0 until k).map(i => PortableHash.minhashTerm(h, i)): _*),
        (a, m) => least(a, m)))
  }

  private def hofFingerprint(text: Column): Column = {
    val hashed = transform(hofTokens(text), t => PortableHash.hash32(t))
    aggregate(
      zip_with(hashed, sequence(lit(0), greatest(size(hashed) - 1, lit(0))),
        (h, i) => h * (i * 2 + 1)),
      lit(0L), (acc, v) => (acc + v) % lit(PortableHash.prime))
  }

  private def hofSimhash(text: Column, bits: Int): Column = {
    val toks = array_distinct(hofTokens(text))
    val hashed = transform(toks, t => PortableHash.hash32(t))
    val ones = aggregate(hashed, array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc,
        array((0 until bits).map(b => shiftright(h, b) % 2): _*),
        (a, o) => a + o))
    val n = size(toks).cast("long")
    (0 until bits).map { b =>
      when(element_at(ones, b + 1) * 2 > n, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  // empty, whitespace-only, dup tokens, mixed case, unicode, punctuation,
  // single token, long doc — the edge surface of tokenize-then-hash
  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the",
    "", "   ", "\t\n ",
    "Hello WORLD hello world HeLLo",
    "café naïve 中文 emoji",
    "one",
    Seq.tabulate(500)(i => s"tok${i % 97}").mkString(" "),
    "a b c d e f g h i j k l m n o p q r s t u v w x y z")
  private lazy val docs = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def splitCol = split(lower(col("text")), "\\s+")

  test("MinHashSig matches the HOF fold on every corpus edge case") {
    val both = docs.select(col("doc_id"),
      TextKernels.minhashSig(splitCol, 4).as("kern"),
      hofMinhash(col("text"), 4).as("hof"),
      size(hofTokens(col("text"))).as("ntok")).collect()
    both.foreach { r =>
      val ntok = r.getInt(3)
      if (ntok <= 0 || r.isNullAt(3)) assert(r.isNullAt(1), s"doc ${r.getLong(0)}")
      else assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("TokenFingerprint matches the HOF fold, including the null contract") {
    val both = docs.select(col("doc_id"),
      TextKernels.fingerprint(splitCol).as("kern"),
      hofFingerprint(col("text")).as("hof")).collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"doc ${r.getLong(0)} nullness")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("SimHashSig matches the HOF vote fold (distinct-token votes)") {
    val both = docs.select(col("doc_id"),
      TextKernels.simhashSig(splitCol, 16).as("kern"),
      hofSimhash(col("text"), 16).as("hof"),
      size(hofTokens(col("text"))).as("ntok")).collect()
    both.foreach { r =>
      if (r.isNullAt(3) || r.getInt(3) <= 0) assert(r.isNullAt(1))
      else assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("null text yields null from all three kernels") {
    val row = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(TextKernels.minhashSig(splitCol, 4),
        TextKernels.fingerprint(splitCol),
        TextKernels.simhashSig(splitCol, 16)).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("TermCounts matches explode+groupBy term frequencies exactly") {
    val kern = docs.select(col("doc_id"),
        explode(TextKernels.termCounts(splitCol)).as("tc"))
      .select(col("doc_id"), col("tc.tok"), col("tc.tf"))
      .as[(Long, String, Long)].collect().toSet
    val hof = docs.select(col("doc_id"), explode(hofTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(kern == hof)
  }

  test("IntersectCount: distinct matches, duplicates count once, nulls skip") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2L),
      (Seq("a", "a", "b"), Seq("a"), 1L),            // dup on build side
      (Seq("a"), Seq("a", "a"), 1L),                 // dup on probe side
      (Seq.empty[String], Seq("a"), 0L),
      (Seq("x"), Seq.empty[String], 0L),
      (Seq("中文", "café"), Seq("café", "x"), 1L))
    rows.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(TextKernels.intersectCount(col("a"), col("b")))
        .as[Long].collect()(0)
      assert(got == want, s"$a ∩ $b")
    }
    // null input array → null out
    val r = Seq((Option.empty[Seq[String]], Option(Seq("a"))))
      .toDF("a", "b")
      .select(TextKernels.intersectCount(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("kernel hash32 equals the portable column hash on unicode tokens") {
    val toks = Seq("the", "café", "中文", "x").map(t => Tuple1(t))
    val got = toks.toDF("t")
      .select(PortableHash.hash32(col("t"))).as[Long].collect().toSeq
    val want = toks.map(t => TextKernels.hash32(
      org.apache.spark.unsafe.types.UTF8String.fromString(t._1)))
    assert(got == want)
  }
}
