package graft.functions

import graft.core.{RGBA, Symbology}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Colormap BAKE — turn a value band into RGBA channel bands.
  *
  * The reference carries `symbology` on every layer
  * (`gfw_pixetl/models/pydantic.py:30-33`, types `discrete` / `gradient`,
  * `gfw_pixetl/models/enums.py:19-24`) but only stores it; the actual
  * value→color application happens downstream in the tile-render service.
  * At 100 TB that bake is a full-corpus per-pixel pass, so it belongs in
  * the engine: everything here is a codegen'd `when`-ladder / `transform`
  * over the packed pixel arrays — no UDF, no shuffle, runs inside the
  * same whole-stage-codegen span as the calc that produced the band.
  *
  * - `discrete`: exact-key lookup; unmapped values → transparent (0,0,0,0),
  *   the GDAL color-table convention for missing entries.
  * - `gradient`: piecewise-LINEAR interpolation between sorted breakpoints
  *   (the `gdaldem color-relief` rule), clamped to the end colors outside
  *   the range, each channel `floor(c0 + (c1-c0)*(v-k0)/(k1-k0) + 0.5)` —
  *   plain IEEE ops in a fixed association, so any engine replays it
  *   bit-identically.
  * - masked pixels (null, or the layer nodata) → (0,0,0,0).
  *
  * The `*_intensity` enum variants are downstream-renderer blends with no
  * public spec; they are rejected loudly rather than guessed at.
  */
object ColorMaps {

  private val channels: Seq[(String, RGBA => Int)] = Seq(
    ("r", _.red), ("g", _.green), ("b", _.blue), ("a", _.alpha))

  /** One interpolated/looked-up channel for a SCALAR value column. */
  private def channel(v: Column, sym: Symbology, pick: RGBA => Int): Column = {
    val stops = sym.colormap.toSeq.sortBy(_._1).map { case (k, c) => (k, pick(c)) }
    require(stops.nonEmpty, "empty colormap")
    sym.`type` match {
      case "discrete" =>
        stops.foldLeft(when(lit(false), lit(0))) { case (acc, (k, c)) =>
          acc.when(v === k, lit(c))
        }.otherwise(lit(0))
      case "gradient" =>
        val ladder = stops.sliding(2).collect { case Seq((k0, c0), (k1, c1)) =>
          (k0, c0, k1, c1)
        }.foldLeft(when(v <= stops.head._1, lit(stops.head._2))) {
          case (acc, (k0, c0, k1, c1)) =>
            acc.when(v <= k1,
              floor(lit(c0.toDouble) + lit((c1 - c0).toDouble) * (v - lit(k0)) /
                lit(k1 - k0) + lit(0.5)).cast("int"))
        }
        ladder.otherwise(lit(stops.last._2))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported symbology type '$other' (discrete | gradient; the " +
            "*_intensity variants are renderer-side blends with no public spec)")
    }
  }

  /** RGBA channel ARRAYS for a packed pixel-array band: four
    * `(suffix, column)` pairs (`r`, `g`, `b`, `a`), each an array<int> of
    * the input length. Null / nodata pixels map to (0,0,0,0) — fully
    * transparent, never a phantom color. */
  def applyColormap(band: Column, sym: Symbology,
                    noData: Option[Double] = None,
                    castTo: Option[String] = None): Seq[(String, Column)] =
    channels.map { case (name, pick) =>
      name -> transform(band, v => {
        // NaN must bake transparent too: Spark orders NaN above every
        // number, so an unguarded gradient ladder would fall through to
        // the TOP-of-ramp color at full alpha for NaN holes
        val notNan = !isnan(v.cast("double"))
        val valid = noData.fold(v.isNotNull && notNan)(nd =>
          v.isNotNull && notNan && v =!= nd)
        val c = when(valid, channel(v, sym, pick)).otherwise(lit(0))
        // cast INSIDE the one transform — a second transform per channel
        // would walk and re-allocate every block array twice
        castTo.fold(c)(c.cast)
      })
    }

  /** Bake a 1-band block relation into the 4-band RGBA relation the K1
    * sink writes directly: `band_1` is replaced by `band_1..band_4` =
    * (r, g, b, a) double arrays — pair with a `uint8`, `bandCount = 4`,
    * `photometric = RGB` profile in
    * [[graft.sources.GeoTiffSpark.writeTiles]] for a render-ready RGBA
    * tiff. Purely columnar: the bake stays in the same codegen span as
    * the block read; no extra shuffle enters the write plan. */
  def bakeBlocks(blocks: org.apache.spark.sql.DataFrame, sym: Symbology,
                 noData: Option[Double] = None): org.apache.spark.sql.DataFrame = {
    val baked = applyColormap(col("band_1"), sym, noData,
        castTo = Some("double")).zipWithIndex
      .foldLeft(blocks) { case (df, ((_, c), i)) =>
        df.withColumn(s"__band_${i + 1}", c)
      }
    (1 to 4).foldLeft(baked.drop("band_1")) { case (df, i) =>
      df.withColumnRenamed(s"__band_$i", s"band_$i")
    }
  }
}
