package graft

import graft.core.GraftSession

/** Plan-inspection tool: dump `.explain("formatted")` for selected queries
  * (all of Bench.headline by default) to stdout. Used to keep the plans
  * honest: pushed filters reaching the parquet scan, broadcasts on catalog
  * joins, wide WholeStageCodegen spans, no accidental shuffles. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val spark = GraftSession.local("explain", cores = "4")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
