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
    Map("bilinear" -> 1, "cubic" -> 2, "cubic_spline" -> 2, "lanczos" -> 3,
      "gauss" -> 2)

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

  /** Gaussian weight (rasterio/GDAL expose `gauss` as an overview method —
    * the last member of the reference's dynamically-built enum,
    * `gfw_pixetl/resampling.py:9-15`). GDAL's overview gauss applies the
    * discrete binomial matrices (1,2,1)/4 (factor 2) and (1,4,6,4,1)/16
    * per axis; 2^(−t²) reproduces the 3-tap binomial EXACTLY on the
    * integer lattice (2^(−1) = 1/2 per edge tap), which is where our
    * odd-factor phase-0 taps land. Truncating at |t| ≥ 2 keeps those
    * odd-factor taps symmetric (the 2r-tap lattice would otherwise pick
    * up a lone 2^(−4) tail on one side). Even factors sample at
    * half-phase, giving the exact per-axis vector (1,4,4,1)/10
    * (2^(−2.25)/2^(−0.25) = 1/4). Non-negative everywhere, so the
    * negative-lobe nearest-fallback never triggers for gauss. */
  private def gaussW(tIn: Double): Double = {
    val t = math.abs(tIn)
    if (t >= 2.0) 0.0 else math.pow(2.0, -t * t)
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
    case "gauss"        => gaussW
  }

  /** Seam geometry of a factor-`k` decimation with `kernel`'s taps:
    * `s` = how many output rows/cols per block edge have a NONZERO tap
    * crossing the block boundary (the only outputs where block-local
    * drop-and-renormalize can differ from the whole-raster convolution —
    * s = 0 means block-local IS seam-exact, e.g. bilinear at k = 2, cubic
    * at k = 4), and `q` = how many of the block's OWN edge source
    * rows/cols those s seam outputs read (the own-pixel strip a
    * perimeter-only seam correction must ship alongside the radius-deep
    * neighbor halo). Derived from the same precomputed tap vector as
    * [[graft.functions.BlockDownsample]]: output ox reads source columns
    * ox·k + tapBase + d for nonzero-weight offsets d ∈ [minD, maxD]. */
  def frameSpec(kernel: String, k: Int): (Int, Int) = {
    val r = radius.getOrElse(kernel,
      throw new IllegalArgumentException(s"$kernel is not an interpolating kernel"))
    val wf = weight(kernel)
    val frac = if (k % 2 == 0) 0.5 else 0.0
    val ds = (0 until 2 * r).map(1 - r + _).filter(d => wf(d - frac) != 0.0)
    val tapBase = (k - 1) >> 1
    val minD = ds.min; val maxD = ds.max
    val sLo = math.ceil(math.max(0, -(tapBase + minD)) / k.toDouble).toInt
    val sHi = math.ceil(math.max(0, tapBase + maxD - (k - 1)) / k.toDouble).toInt
    val s = math.max(sLo, sHi)
    val q =
      if (s == 0) 0
      else math.max((s - 1) * k + tapBase + maxD + 1, s * k - tapBase - minD)
    (s, q)
  }
}
