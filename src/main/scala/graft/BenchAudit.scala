package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off audit main behind VERDICT r15 ask #2: for every headline query,
  * time the old `count()` action against the new forced `noop`-sink write
  * (see [[Bench.forceAll]]) and print the ratio — quantifying exactly how
  * much work Catalyst's column pruning was deleting from each count-timed
  * measurement. Results are recorded in COVERAGE.md ("bench action audit");
  * the main stays in-tree so the audit is re-runnable after plan changes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchAudit"
  */
object BenchAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val only = args.toSet
    val names = Bench.headline.filter(SparkEntry.queries.contains)
      .filter(n => only.isEmpty || only(n))
    println(f"${"query"}%-28s ${"count_s"}%8s ${"noop_s"}%8s ${"ratio"}%6s")
    names.foreach { name =>
      def time(action: DataFrame => Unit): Double = {
        val t0 = System.nanoTime()
        action(SparkEntry.queries(name)(spark, sfDir))
        val s = (System.nanoTime() - t0) / 1e9
        graft.core.Caching.release(spark)
        s
      }
      try {
        val countAction = (df: DataFrame) => { df.count(); () }
        val noopAction = (df: DataFrame) =>
          df.write.format("noop").mode("overwrite").save()
        time(countAction) // JIT/IO warm-up run, untimed role
        val c = math.min(time(countAction), time(countAction))
        val n = math.min(time(noopAction), time(noopAction))
        println(f"$name%-28s $c%8.3f $n%8.3f ${n / c}%6.2f")
      } catch { case e: Throwable =>
        println(s"$name FAILED: $e")
      }
    }
    spark.stop()
  }
}
