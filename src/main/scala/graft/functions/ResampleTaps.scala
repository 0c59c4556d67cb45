package graft.functions

/** Separable interpolating-kernel taps shared by the two resampling paths:
  * the warping block reader ([[graft.sources.WarpReader]], per-pixel gather
  * at arbitrary ratios/CRS) and the integer-decimation block kernel
  * ([[BlockKernels]]/[[BlockDownsample]], one primitive loop per block).
  * One definition means the two paths agree bit-for-bit on tap weights —
  * a factor-k decimation computed either way blends the same source pixels
  * with the same coefficients.
  *
  * Kernels and radii follow GDAL's warp kernels (the reference exposes the
  * rasterio enum at `gfw_pixetl/resampling.py:9-25`): `bilinear` (radius 1),
  * `cubic` (cubic convolution, a = -0.5, radius 2), `cubic_spline` (cubic
  * B-spline, radius 2 — smoothing, like GDAL no prefilter is applied),
  * `lanczos` (3-lobe windowed sinc, radius 3). Taps run dx = 1-r .. r
  * around floor(g) with weight(dx - frac(g)).
  */
object ResampleTaps {

  /** Tap radius per interpolating kernel (taps run 1-r .. r). */
  val radius: Map[String, Int] =
    Map("bilinear" -> 1, "cubic" -> 2, "cubic_spline" -> 2, "lanczos" -> 3)

  /** GDAL cubic-convolution kernel weight (a = -0.5, the `cubic` default). */
  private def cubicW(tIn: Double): Double = {
    val a = -0.5
    val t = math.abs(tIn)
    if (t <= 1) (a + 2) * t * t * t - (a + 3) * t * t + 1
    else if (t < 2) a * t * t * t - 5 * a * t * t + 8 * a * t - 4 * a
    else 0.0
  }

  /** Cubic B-spline weight (GDAL `cubicspline`, radius 2). Non-negative,
    * smoothing rather than interpolating — like GDAL, no prefilter is
    * applied, so grid-aligned output is the smoothed (1/6, 4/6, 1/6) blend,
    * not the original sample. Linear fields still reproduce exactly. */
  private def bsplineW(tIn: Double): Double = {
    val t = math.abs(tIn)
    if (t <= 1) (4.0 + t * t * (3.0 * t - 6.0)) / 6.0
    else if (t < 2) { val u = 2.0 - t; u * u * u / 6.0 }
    else 0.0
  }

  /** Lanczos windowed-sinc weight (GDAL `lanczos`, 3 lobes, radius 3). */
  private def lanczosW(tIn: Double): Double = {
    val t = math.abs(tIn)
    if (t < 1e-12) 1.0
    else if (t < 3.0) {
      val pt = math.Pi * t
      3.0 * math.sin(pt) * math.sin(pt / 3.0) / (pt * pt)
    } else 0.0
  }

  def weight(kernel: String): Double => Double = kernel match {
    case "bilinear"     => t => { val a = math.abs(t); if (a < 1) 1 - a else 0.0 }
    case "cubic"        => cubicW
    case "cubic_spline" => bsplineW
    case "lanczos"      => lanczosW
  }
}
