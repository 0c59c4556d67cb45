package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton-code correctness (vs a bit-by-bit reference) and the locality
  * property that makes it worth a shuffle: z-range partitions are compact
  * 2-D patches, not full-width stripes. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("morton matches the bit-by-bit reference, incl. 31-bit coords") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1), ((1L << 22) - 1, (1L << 22) - 3))
    val got = pts.toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y"))).as[Long].collect()
    got.zip(pts).foreach { case (g, (x, y)) => assert(g == ref(x, y), s"($x,$y)") }
  }

  test("codes are unique and quadrant-bounded on a 64x64 grid") {
    val df = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val codes = df.select(ZOrder.morton(col("x"), col("y")).as("z")).as[Long].collect()
    assert(codes.distinct.length == 64 * 64)
    assert(codes.forall(z => z >= 0 && z < 4096)) // 2^6 × 2^6 stays in 2^12
  }

  test("repartitionByZ yields compact patches, not full-width stripes") {
    val df = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val parts = ZOrder.repartitionByZ(df, col("x"), col("y"), 16)
      .groupBy(spark_partition_id().as("p"))
      .agg((max("x") - min("x") + max("y") - min("y")).as("semi"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.length == 16)
    // a 16-way row-major stripe has bbox semi-perimeter 63 + 3 = 66; aligned
    // z ranges of 256 codes are 16×16 patches (semi-perimeter 30) — allow
    // range-sampling slack but stay far from stripes
    val mean = parts.map(_.getAs[Int]("semi").toDouble).sum / parts.length
    assert(mean < 50, s"mean bbox semi-perimeter $mean — partitions look like stripes")
  }
}
