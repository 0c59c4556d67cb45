package graft

import org.apache.spark.sql.SparkSession

// Scratch profiler for round-9 hotspot analysis. NOT part of the library;
// deleted before commit.
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once, then 2 timed runs cold-cache
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name run$i: $dt%.3f s ($n rows)")
        if (i == 3) {
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"/tmp/plan_$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExtendedMode))
        }
        graft.core.Caching.release(spark)
      }
    }
    spark.stop()
  }
}
