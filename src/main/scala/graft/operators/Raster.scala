package graft.operators

import graft.core.grid.Grid
import graft.functions.Calc
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pixel data plane: `Dataset[Block]`-shaped DataFrames.
  *
  * A block is one memory-bounded window of one band of one tile — the unit
  * the reference reads/writes per forked process
  * (`gfw_pixetl/tiles/raster_src_tile.py:343-378`). Here a block is a ROW:
  *
  *   (tile_id, band, block_row, block_col, width, height,
  *    values: array<double>, valid: array<boolean>)
  *
  * `values`+`valid` mirror the reference's numpy MaskedArray value/mask
  * planes (`tiles/utils/transform.py:25-33`). Pixels stay packed in arrays —
  * one row per pixel would be 40000² rows/tile; one row per block is
  * ~10k rows/tile at 512-px blocks, so a 648-tile world job is ~6M rows:
  * comfortable shuffle currency at 100 TB. All per-pixel math runs as
  * codegen'd higher-order array functions (transform/zip_with/aggregate)
  * inside whole-stage codegen — no UDFs on the hot path.
  */
object Raster {

  /** Expand a tiles seed into its block grid, distributed (operator:
    * tile→windows flatMap, `raster_src_tile.py:328-378`). Generates
    * (blocksPerSide)² block rows per tile via `explode(sequence(...))` —
    * pure Catalyst, no driver loop, no shuffle. */
  def tilesToBlocks(tiles: DataFrame, grid: Grid): DataFrame = {
    val n = grid.cols / grid.blockSize
    tiles
      .withColumn("block_row", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("block_col", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("width", lit(grid.blockSize))
      .withColumn("height", lit(grid.blockSize))
  }

  /** Deterministic synthetic pixel fill for tests/bench — value =
    * f(tile, band, block, pixel index) so any block can be regenerated
    * anywhere (replaces the reference's unseeded `randint` fixtures,
    * `tests/conftest.py:37-68`). `nodataEvery` masks every n-th pixel to
    * exercise masked semantics. */
  def synthesizeBand(blocks: DataFrame, band: Int, nodataEvery: Int = 0): DataFrame = {
    val seed = xxhash64(col("tile_id"), col("block_row"), col("block_col"), lit(band))
    val idx = sequence(lit(0), (col("width") * col("height") - 1).cast("int"))
    val value = transform(idx, i => pmod(abs(seed + i * lit(2654435761L)), lit(255)).cast("double"))
    val masked =
      if (nodataEvery <= 0) transform(idx, _ => lit(true))
      else transform(idx, i => pmod(abs(seed + i), lit(nodataEvery)) =!= 0)
    blocks
      .withColumn("band", lit(band))
      .withColumn("values", value)
      .withColumn("valid", masked)
  }

  /** Apply a masked scalar op elementwise over a (values, valid) pair. */
  def maskedMap(values: Column, valid: Column)(f: Column => Column): (Column, Column) =
    (zip_with(values, valid, (v, ok) => when(ok, f(v))), valid)

  /** Per-pixel calc over aligned band columns (operator P1 on the block
    * plane). `bandValues`/`bandValid` are the per-band value/mask arrays of
    * one block, already zip-joined (J4). The calc compiles once to a scalar
    * Column tree, then runs elementwise via zip_with over the band arrays —
    * masked pixels are nulls, matching `array_utils.py:61-85`. */
  def blockCalc(calc: String, bandValues: Seq[Column], bandValid: Seq[Column]): Seq[Column] = {
    require(bandValues.nonEmpty && bandValues.length == bandValid.length)
    val names = bandValues.indices.map(i => ('A' + i).toChar.toString)
    // Null out masked pixels so the scalar tree sees numpy-masked semantics.
    val masked = bandValues.zip(bandValid).map { case (v, ok) =>
      zip_with(v, ok, (x, o) => when(o, x))
    }
    // How many output bands does this calc produce? (compile once with dummies)
    val nOut = Calc.compile(calc, names.map(_ -> lit(0)).toMap).length
    // ONE pass over the pixel arrays per output band. The lambda-bound
    // element variables keep this O(pixels): never index a computed array
    // with element_at inside a transform — that re-evaluates the whole
    // array per element (O(pixels²) per block).
    (0 until nOut).map { b =>
      masked match {
        case Seq(a) =>
          transform(a, x => Calc.compile(calc, Map(names(0) -> x))(b))
        case Seq(a, bb) =>
          zip_with(a, bb, (x, y) =>
            Calc.compile(calc, Map(names(0) -> x, names(1) -> y))(b))
        case many =>
          // N>2: zip into array<struct> once, then map elementwise
          val zipped = arrays_zip(many.zipWithIndex.map { case (m, i) => m.as(s"b$i") }: _*)
          transform(zipped, s => {
            val bands = names.zipWithIndex.map { case (nm, i) => nm -> s.getField(s"b$i") }.toMap
            Calc.compile(calc, bands)(b)
          })
      }
    }
  }

  /** Cast + nodata fill (operator P2): masked → sentinel, then cast
    * (`array_utils.py:12-41`). */
  def castFill(values: Column, noData: Option[Double], sparkType: String): Column = {
    val filled = noData match {
      case Some(nd) => transform(values, v => coalesce(v, lit(nd)))
      case None     => values
    }
    transform(filled, _.cast(sparkType))
  }

  /** Valid-pixel count per block (A5) — drives the empty-block filter F5
    * (`array_utils.py:44-58`). Pure `aggregate` over the mask array. */
  def validCount(valid: Column): Column =
    aggregate(valid, lit(0), (acc, ok) => acc + when(ok, 1).otherwise(0))

  /** Per-block partial stats (min/max/sum/sumsq/count) in ONE array pass.
    * This is the map-side combine of operator A3: per-band stats over a
    * 10-Gpx tile never explode pixels into rows — blocks fold to 5 numbers
    * each, then an ordinary groupBy combines ~10k partials per tile.
    * At 100 TB this is the difference between a shuffle of 10^13 pixel rows
    * and 10^7 partial rows. */
  def blockPartialStats(values: Column, valid: Column): Column = {
    val vals = zip_with(values, valid, (v, ok) => when(ok, v))
    aggregate(
      vals,
      struct(
        lit(Double.MaxValue).as("mn"), lit(Double.MinValue).as("mx"),
        lit(0.0).as("sum"), lit(0.0).as("sumsq"), lit(0L).as("cnt")),
      (acc, v) => struct(
        when(v.isNotNull && v < acc("mn"), v).otherwise(acc("mn")).as("mn"),
        when(v.isNotNull && v > acc("mx"), v).otherwise(acc("mx")).as("mx"),
        (acc("sum") + coalesce(v, lit(0.0))).as("sum"),
        (acc("sumsq") + coalesce(v * v, lit(0.0))).as("sumsq"),
        (acc("cnt") + when(v.isNotNull, 1L).otherwise(0L)).as("cnt")))
  }

  /** Combine block partials into per-(tile, band) statistics (A3 final). */
  def combineStats(blocks: DataFrame, keys: Seq[String]): DataFrame = {
    val p = col("partial")
    blocks
      .groupBy(keys.map(col): _*)
      .agg(
        min(p("mn")).as("stat_min"),
        max(p("mx")).as("stat_max"),
        sum(p("sum")).as("s"),
        sum(p("sumsq")).as("ss"),
        sum(p("cnt")).as("n"))
      .withColumn("stat_mean", col("s") / col("n"))
      .withColumn("stat_std",
        sqrt(greatest(col("ss") / col("n") - pow(col("s") / col("n"), 2), lit(0.0))))
      .drop("s", "ss")
  }

  /** Per-pixel histogram bucket index (A4 map side; `gdalinfo -hist`
    * semantics: n equal buckets over [lo, hi], out-of-range clamps to the
    * edge buckets). Pure zip_with arithmetic — invalid/nodata pixels map
    * to null — so the consumer's explode + count hash-aggregate builds
    * the histogram entirely inside whole-stage codegen, map-side combined
    * to ≤ n rows per task before any shuffle. This replaced the last UDF
    * on the raster hot path: the per-block boxed-Seq UDF paid more in
    * (de)serializing a 100k-element Seq[java.lang.Double] than its
    * imperative fill ever saved. */
  def bucketIndex(values: Column, valid: Column, lo: Double, hi: Double, n: Int): Column = {
    val width = (hi - lo) / n
    zip_with(values, valid, (v, ok) =>
      when(ok && v.isNotNull,
        least(greatest(floor((v - lo) / width), lit(0.0)),
          lit((n - 1).toDouble)).cast("int")))
  }
}
