package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout contracts, asserted on the PHYSICAL PLAN: co-bucketed
  * joins must not shuffle, partitioned reads must prune directories. */
class BucketedStoreSpec extends SparkSpec {

  test("co-bucketed tables equi-join with zero shuffle on either side") {
    val docs = spark.range(1000).select(col("id").as("doc_id"), (col("id") % 7).as("v"))
    val meta = spark.range(1000).select(col("id").as("doc_id"), (col("id") % 13).as("m"))
    BucketedStore.writeBucketed(docs, "bk_docs", Seq("doc_id"), buckets = 4,
      sortCols = Seq("doc_id"))
    BucketedStore.writeBucketed(meta, "bk_meta", Seq("doc_id"), buckets = 4,
      sortCols = Seq("doc_id"))
    // force the non-broadcast path: the point is the co-partitioned merge
    // join, which a tiny test table would otherwise broadcast around
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_docs").join(spark.table("bk_meta"), "doc_id")
      assert(j.count() == 1000)
      assert(BucketedStore.shuffleFree(j),
        j.queryExecution.executedPlan.toString)
      // contrast: the same join over plain parquet exchanges both sides
      val p1 = new java.io.File("target/tmp/plain_docs").getAbsolutePath
      val p2 = new java.io.File("target/tmp/plain_meta").getAbsolutePath
      docs.write.mode("overwrite").parquet(p1)
      meta.write.mode("overwrite").parquet(p2)
      val plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "doc_id")
      assert(!BucketedStore.shuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned corpus layout prunes directories at planning time") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      element_at(array(lit("en"), lit("fr"), lit("de")), (col("id") % 3 + 1).cast("int")).as("lang"),
      (col("id") * 7).as("payload"))
    val path = new java.io.File("target/tmp/part_corpus").getAbsolutePath
    BucketedStore.writePartitioned(docs, path, Seq("lang"))
    val r = spark.read.parquet(path).filter(col("lang") === "en")
    assert(r.count() == 100)
    val scan = r.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
  }
}
