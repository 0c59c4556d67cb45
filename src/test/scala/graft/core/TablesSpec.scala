package graft.core

import graft.SparkSpec

/** Tables.rowCount — the driver-side parquet-footer sweep that replaces
  * count() jobs for sizing inputs (VERDICT r17 #6). */
class TablesSpec extends SparkSpec {

  test("rowCount reads exact counts from parquet footers, zero Spark jobs") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val n = Tables.rowCount(spark, sf(), "region")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(n == spark.read.parquet(s"${sf()}/region.parquet").count())
    assert(after == before, "the footer sweep must schedule no Spark job")
  }

  test("rowCount cache is keyed on file (name, mtime, length) — a " +
      "regenerated dataset under the same path re-sweeps (VERDICT r18 #8)") {
    import spark.implicits._
    val dir = new java.io.File("target/tmp/tables_stale").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (1L to 7L).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.rowCount(spark, dir, "t") == 7L)
    // regenerate IN PLACE with a different count; bump mtimes explicitly —
    // same-second rewrites can carry equal timestamps, and the length of a
    // 3-row vs 7-row single-column file may collide under compression
    (1L to 3L).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val files = new java.io.File(s"$dir/t.parquet").listFiles()
    files.foreach(f => f.setLastModified(f.lastModified() + 2000))
    assert(Tables.rowCount(spark, dir, "t") == 3L,
      "stale cached count served after the dataset was regenerated")
    // and the refreshed signature is itself cached (idempotent re-read)
    assert(Tables.rowCount(spark, dir, "t") == 3L)
  }
}
