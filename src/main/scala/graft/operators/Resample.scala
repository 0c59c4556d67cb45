package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resampling kernels (SURVEY §2.9) — re-expression of the reference's
  * rasterio/GDAL kernel enum (`gfw_pixetl/resampling.py:9-25`, applied via
  * WarpedVRT at `tiles/raster_src_tile.py:200-208`).
  *
  * Key insight: GDAL's non-nearest kernels ARE aggregations — each target
  * pixel aggregates the k×k source pixels it covers. Here a block downsample
  * by integer factor k runs as one Catalyst expression over the packed pixel
  * array: transform over target indices, folding the k×k window. Window
  * reads index an ATTRIBUTE array with element_at (O(1) per access), so cost
  * is O(out_pixels · k²) — the optimum — and stays in whole-stage codegen.
  *
  * Masked (null) source pixels are excluded from window aggregates like
  * GDAL's nodata handling; a window with no valid pixel yields null.
  */
object Resample {

  val methods: Seq[String] =
    Seq("nearest", "average", "sum", "min", "max", "mode", "med", "q1", "q3",
      "bilinear", "cubic", "cubic_spline", "lanczos", "rms")

  /** Overview pyramid over a (px, py, value) pixel relation: `levels`
    * factor-2 SUM reductions, each level computed from the PREVIOUS level —
    * the overview-build pattern (GDAL's gdaladdo, tile-server pyramids):
    * total work is O(N · Σ 4⁻ᵏ) < 4N/3, not O(N · levels) from raw. Output
    * is the union of all levels tagged with `level` (0 = the input).
    * Each level persists because it feeds BOTH the output union and the
    * next reduction — without the pin the union's branches would re-derive
    * every level from the base. SUM is the exactly-reaggregable kernel
    * (avg needs sum+count partials; min/max work verbatim). Pixel coords
    * must be non-negative (grid coords are by construction): `div`
    * truncates toward zero, so negative coords would split cells
    * differently than a floor division. */
  def pyramidSum(base: DataFrame, levels: Int): DataFrame = {
    require(levels >= 0, "levels must be >= 0")
    val lvls = Iterator.iterate(base.select(col("px"), col("py"), col("value"))) { prev =>
      prev.groupBy(expr("px div 2").as("px"), expr("py div 2").as("py"))
        .agg(sum("value").as("value"))
    }.take(levels + 1).zipWithIndex.map { case (df, i) =>
      graft.core.Caching.shared(df)
        .select(lit(i).as("level"), col("px"), col("py"), col("value"))
    }.toSeq
    lvls.reduce(_.unionAll(_))
  }

  /** Downsample one block band by integer factor k. `values` is the packed
    * row-major (w×h) pixel array with nulls for masked pixels; returns the
    * (w/k × h/k) packed array. */
  def downsample(values: Column, width: Int, height: Int, k: Int, method: String): Column = {
    require(width % k == 0 && height % k == 0, s"block $width x $height not divisible by $k")
    val ow = width / k
    val oh = height / k
    val outIdx = sequence(lit(0), lit(ow * oh - 1))

    def window(i: Column): Seq[Column] = {
      val oy = (i / ow).cast("int")
      val ox = (i % ow).cast("int")
      for (dy <- 0 until k; dx <- 0 until k) yield
        element_at(values, (oy * k + dy) * width + (ox * k + dx) + 1)
    }

    def fold(i: Column)(zero: Column, step: (Column, Column) => Column): Column =
      window(i).foldLeft(zero)(step)

    method match {
      case "nearest" =>
        // GDAL nearest picks the top-left source pixel of the window
        transform(outIdx, i =>
          element_at(values, ((i / ow).cast("int") * k) * width + (i % ow).cast("int") * k + 1))
      case "sum" =>
        transform(outIdx, i => {
          val s = fold(i)(lit(null).cast("double"), (acc, v) =>
            when(v.isNull, acc).when(acc.isNull, v).otherwise(acc + v))
          s
        })
      case "average" =>
        transform(outIdx, i => {
          val s = fold(i)(lit(0.0), (acc, v) => acc + coalesce(v, lit(0.0)))
          val n = fold(i)(lit(0), (acc, v) => acc + when(v.isNotNull, 1).otherwise(0))
          when(n > 0, s / n)
        })
      case "min" =>
        transform(outIdx, i => fold(i)(lit(null).cast("double"), (acc, v) =>
          when(v.isNull, acc).when(acc.isNull, v).otherwise(least(acc, v))))
      case "max" =>
        transform(outIdx, i => fold(i)(lit(null).cast("double"), (acc, v) =>
          when(v.isNull, acc).when(acc.isNull, v).otherwise(greatest(acc, v))))
      case "rms" =>
        transform(outIdx, i => {
          val s = fold(i)(lit(0.0), (acc, v) => acc + coalesce(v * v, lit(0.0)))
          val n = fold(i)(lit(0), (acc, v) => acc + when(v.isNotNull, 1).otherwise(0))
          when(n > 0, sqrt(s / n))
        })
      case "mode" =>
        // most frequent value in the window; ties → smallest value
        // (deterministic, unlike GDAL's scan-order dependence)
        transform(outIdx, i => {
          val vals = array(window(i): _*)
          val valid = filter(vals, _.isNotNull)
          val counted = transform(valid, v =>
            struct(size(filter(valid, x => x === v)).as("n"), (-v).as("negv")))
          when(size(valid) > 0, -array_max(counted).getField("negv"))
        })
      case "med" | "q1" | "q3" =>
        val q = method match { case "med" => 0.5; case "q1" => 0.25; case _ => 0.75 }
        transform(outIdx, i => {
          val valid = array_sort(filter(array(window(i): _*), _.isNotNull))
          val n = size(valid)
          // nearest-rank quantile over the sorted window
          when(n > 0, element_at(valid,
            greatest(lit(1), ceil(n * q).cast("int"))))
        })
      case "bilinear" | "cubic" | "cubic_spline" | "lanczos" =>
        // interpolating kernels degrade to average on integer decimation
        // (GDAL's behavior at exact factor-of-k shrink is a box filter);
        // fractional-warp variants live with the raster reader (SURVEY §7.4.2)
        downsample(values, width, height, k, "average")
      case other => throw new IllegalArgumentException(s"Unknown resampling method: $other")
    }
  }

  /** Merge 2×2 neighbouring HALF-size blocks into full-size blocks of the
    * overview's own block grid — the step between [[downsample]] (per
    * block, map-side, 4× data reduction, NO shuffle) and a tiled sink
    * that wants constant block size at every pyramid level. This is where
    * the one keyed exchange of an overview build happens, and it moves
    * only the already-reduced data: at 100 TB the shuffle is 1/4 of the
    * base scan, and deeper levels shrink geometrically.
    *
    * `halfBlocks` carries `keyCols`, `block_row`, `block_col` and
    * `bandCols` packed arrays of (blockSize/2)² pixels (the output shape
    * of a factor-2 [[downsample]] at base block coordinates). Output rows
    * are parent blocks (`block_row/2`, `block_col/2`) with assembled
    * blockSize² arrays; quarters missing at the image edge fill with
    * null (the masked-pixel convention — the sink's nodata pad applies
    * downstream). Assembly is pure Catalyst (first-of-quarter aggregates
    * + one transform), so it partial-aggregates map-side and stays off
    * the interpreted path. */
  def regroup2x(halfBlocks: DataFrame, blockSize: Int,
                bandCols: Seq[String], keyCols: Seq[String]): DataFrame = {
    require(blockSize % 2 == 0, s"blockSize $blockSize must be even")
    val half = blockSize / 2
    def q(b: String, r: Int, c: Int) = s"__${b}_q$r$c"
    val tagged = halfBlocks
      .withColumn("__qr", pmod(col("block_row"), lit(2)))
      .withColumn("__qc", pmod(col("block_col"), lit(2)))
    val quadAggs = for (b <- bandCols; r <- 0 to 1; c <- 0 to 1) yield
      first(when(col("__qr") === r && col("__qc") === c, col(b)),
        ignoreNulls = true).as(q(b, r, c))
    val grouped = tagged
      .groupBy((keyCols.map(col) :+
        (col("block_row") / 2).cast("int").as("block_row") :+
        (col("block_col") / 2).cast("int").as("block_col")): _*)
      .agg(quadAggs.head, quadAggs.tail: _*)
    val assembled = bandCols.map { b =>
      transform(sequence(lit(0), lit(blockSize * blockSize - 1)), j => {
        val r = (j / blockSize).cast("int"); val c = (j % blockSize).cast("int")
        val quarter = when(r < half && c < half, col(q(b, 0, 0)))
          .when(r < half, col(q(b, 0, 1)))
          .when(c < half, col(q(b, 1, 0)))
          .otherwise(col(q(b, 1, 1)))
        // element_at on a missing (null) quarter is null = masked
        element_at(quarter, (r % half) * half + (c % half) + 1)
      }).as(b)
    }
    grouped.select((keyCols.map(col) :+ col("block_row") :+ col("block_col"))
      ++ assembled: _*)
  }
}
