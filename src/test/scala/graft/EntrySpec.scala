package graft

/** Driver-contract smoke: entry() yields rows; every query key has an
  * oracle or is knowingly oracle-free; all queries run at sf0.001. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (except declared sketch ops)") {
    // rows-only by declaration: HLL sketch internals and iterative float
    // k-means have no cross-engine oracle (IVFSpec pins e5's recall)
    val oracleFree = Set("x1_approx_distinct", "e5_knn_ivf")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleFree
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf()).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
