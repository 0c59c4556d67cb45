package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Opt-in focal throughput probe (GRAFT_FOCAL_PERF=1): focalMean + slope
  * over a 67-Mpx lattice of 512² blocks — records Mpx/s for the r18
  * compiled-window A/B. */
class FocalPerfSpec extends SparkSpec {
  test("focal throughput probe") {
    assume(sys.env.get("GRAFT_FOCAL_PERF").contains("1"), "opt-in")
    val bs = 512
    val grid = sys.env.get("GRAFT_FOCAL_GRID").map(_.toInt).getOrElse(16)
    val blocks = spark.range(grid.toLong * grid).select(
      (col("id") / grid).cast("int").as("block_x"),
      (col("id") % grid).cast("int").as("block_y"),
      lit(bs).as("width"), lit(bs).as("height"),
      transform(sequence(lit(1), lit(bs * bs)),
        i => (i % 251).cast("double")).as("values"),
      transform(sequence(lit(1), lit(bs * bs)),
        i => (i % 97 =!= 0)).as("valid"))
      .repartition(32)
    blocks.persist().count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.agg(sum(element_at(col("values"), 1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = Seq(once(), once()).min
      info(f"$tag: $t%.2f s = ${grid.toLong * grid * bs * bs / t / 1e6}%.0f Mpx/s")
    }
    time("focalMean r1")(Focal.focalMean(blocks))
    time("slope")(Focal.slope(blocks, 30.0))
    time("majority")(Focal.majorityFilter(blocks))
    blocks.unpersist()
  }
}
