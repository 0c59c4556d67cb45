package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-partitioning strategy for repeated
  * big⋈big joins at 100 TB (SURVEY §4 "shuffle/exchange" row): bucketing
  * both fact tables on the join key removes the exchange from every
  * subsequent join. Asserted on the physical plan, not just results. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf())
    val o = Tables.orders(spark, sf())
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the in-memory catalog is fresh per JVM; clear any stale table dirs
    // left by previous runs or the DROP can't see them
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val dir = new java.io.File(s"target/tmp/warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not reshuffle either bucketed side
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side reshuffled:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side reshuffled:\n$plan")
      // and results match the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
