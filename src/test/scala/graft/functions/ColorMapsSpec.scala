package graft.functions

import graft.SparkSpec
import graft.core.{RGBA, Symbology}
import org.apache.spark.sql.functions._

class ColorMapsSpec extends SparkSpec {
  import spark.implicits._

  private def bake(values: Seq[java.lang.Double], sym: Symbology,
                   noData: Option[Double] = None): Map[String, Seq[Int]] = {
    val df = Seq(Tuple1(values)).toDF("band")
    val out = ColorMaps.applyColormap(col("band"), sym, noData)
      .foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
      .collect()(0)
    Seq("r", "g", "b", "a").map(n =>
      n -> out.getAs[scala.collection.Seq[Int]](n).toList).toMap
  }

  test("discrete: exact keys map, unmapped and null go transparent") {
    val sym = Symbology("discrete", Map(
      1.0 -> RGBA(10, 20, 30), 2.0 -> RGBA(200, 100, 50, 128)))
    val got = bake(Seq(1.0, 2.0, 3.0, null), sym)
    assert(got("r") == Seq(10, 200, 0, 0))
    assert(got("g") == Seq(20, 100, 0, 0))
    assert(got("b") == Seq(30, 50, 0, 0))
    assert(got("a") == Seq(255, 128, 0, 0))
  }

  test("gradient: endpoints exact, midpoints interpolate, range clamps") {
    val sym = Symbology("gradient", Map(
      0.0 -> RGBA(0, 200, 255), 100.0 -> RGBA(100, 0, 55)))
    val got = bake(Seq(-5.0, 0.0, 25.0, 50.0, 100.0, 300.0, null), sym)
    // r: clamp 0, 0, 25, 50, 100, clamp 100, null->0
    assert(got("r") == Seq(0, 0, 25, 50, 100, 100, 0))
    // g: 200 -> 0 : 200 - 2*v
    assert(got("g") == Seq(200, 200, 150, 100, 0, 0, 0))
    // b: 255 -> 55 : 255 - 2*v
    assert(got("b") == Seq(255, 255, 205, 155, 55, 55, 0))
    // alpha defaults 255 at both stops
    assert(got("a") == Seq(255, 255, 255, 255, 255, 255, 0))
  }

  test("gradient rounds half-up via floor(x + 0.5); nodata masks") {
    // 0->(0,...), 3->(1,...): v=1 -> 1/3 -> 0; v=2 -> 2/3 -> 1
    val sym = Symbology("gradient", Map(0.0 -> RGBA(0, 0, 0), 3.0 -> RGBA(1, 3, 9)))
    val got = bake(Seq(1.0, 2.0, 7.0), sym, noData = Some(7.0))
    assert(got("r") == Seq(0, 1, 0))
    assert(got("g") == Seq(1, 2, 0))   // 3*v/3 = v
    assert(got("b") == Seq(3, 6, 0))
    assert(got("a") == Seq(255, 255, 0))
  }

  test("intensity variants and empty maps are rejected loudly") {
    intercept[Exception](bake(Seq(1.0),
      Symbology("gradient_intensity", Map(0.0 -> RGBA(0, 0, 0)))))
    intercept[Exception](bake(Seq(1.0), Symbology("discrete", Map.empty)))
  }
}
