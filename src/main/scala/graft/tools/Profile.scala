package graft.tools

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy dedup queries (not part of the
  * driver contract; used to attribute wall clock between the signature
  * computation, the bucket join, the distinct, and the output sort). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("profile")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    val sigs = Dedup.minhashSignatures(docs, k = 4)
    time("sigs")(sigs.count())
    val buckets = Dedup.lshBuckets(sigs, k = 4, rowsPerBand = 2)
    time("buckets")(buckets.count())
    val a = buckets.repartition(32, col("doc_id")).as("a"); val b = buckets.as("b")
    val joined = a.join(b,
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
    time("join (no distinct)")(joined.count())
    time("join+distinct")(joined.distinct().count())
    time("join+distinct+sort")(joined.distinct().orderBy("doc1", "doc2").count())
    spark.stop()
  }
}
