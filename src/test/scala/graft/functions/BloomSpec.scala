package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built key probes true") {
    val keys = (0L until 500L).map(_ * 37 + 11).toDF("k")
    val bits = Bloom.build(keys, "k", mBits = 1 << 12)
    val missed = keys.filter(!Bloom.mightContain(bits, col("k"))).count()
    assert(missed == 0)
  }

  test("prunes aggressively at the design point (fp rate near formula)") {
    val keys = (0L until 100L).toDF("k")
    val bits = Bloom.build(keys, "k", mBits = 1 << 14)
    // 100k foreign probes: (1 - e^(-3*100/16384))^3 ≈ 5.5e-6 → expect ~0-2 fps
    val probes = (1000000L until 1100000L).toDF("k")
    val fps = probes.filter(Bloom.mightContain(bits, col("k"))).count()
    assert(fps <= 10, s"false-positive blowup: $fps of 100000")
  }

  test("prunedEquiJoin ≡ plain join, and the probe stays codegen (no UDF)") {
    val fact = (0L until 2000L).map(i => (i % 400, i)).toDF("fk", "v")
    val dim = (0L until 50L).map(i => (i * 8, s"d$i")).toDF("dk", "name")
    val pruned = Bloom.prunedEquiJoin(fact, "fk", dim, "dk")
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(pruned.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }

  test("bitset is key-set deterministic: partitioning cannot change it") {
    val keys = (0L until 300L).map(_ * 13).toDF("k")
    val a = Bloom.build(keys, "k")
    val b = Bloom.build(keys.repartition(17), "k")
    assert(a.toSeq == b.toSeq)
  }
}
