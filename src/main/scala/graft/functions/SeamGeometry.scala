package graft.functions

/** Deterministic region layout of the seam-exact patch exchange — ONE
  * definition read by both sides of the shuffle: the scatter's
  * [[GatherCells]] packs each region's pixels as a plain double array and
  * the gather's [[AssembleSeamPlane]] scatters them back by region index,
  * so the wire format carries NO per-cell addressing (the earlier
  * `struct<at:int, v:array<double>>` entries cost 48+ bytes per 8-byte
  * pixel — the "O(perimeter)" exchange was a quarter of the plane in
  * BYTES).
  *
  * For a w×h block with halo radius `p` (neighbor reach of the seam
  * outputs' taps) and own-ring depth `q` (how deep those outputs read
  * into their OWN block, [[ResampleTaps.frameSpec]]):
  * regions 0–7 are the strips shipped to the 8 lattice neighbors
  * (receiver-relative offset (dx, dy): the emitter at (bx, by) sends
  * region r to block (bx − r.dx, by − r.dy)), regions 8+ are the
  * emitter's own q-deep edge ring addressed to itself. (r0, r1, c0, c1)
  * index the emitter's pixels; (oy, ox) place the region's top-left in
  * the receiver's (w+2p)×(h+2p) padded plane. The regions tile their
  * targets disjointly; degenerate own regions (h ≤ 2q, w ≤ 2q) are
  * omitted so region indices stay dense.
  */
object SeamGeometry {

  final case class Region(dx: Int, dy: Int, r0: Int, r1: Int,
      c0: Int, c1: Int, oy: Int, ox: Int) {
    val rows: Int = r1 - r0 + 1
    val cols: Int = c1 - c0 + 1
    val cells: Int = rows * cols
  }

  def regions(w: Int, h: Int, p: Int, q: Int): IndexedSeq[Region] = {
    require(p >= 1 && q >= 1 && w >= p && h >= p && w >= q && h >= q,
      s"invalid seam geometry: block $w x $h, halo $p, ring $q")
    val pw = w + 2 * p
    def stripCols(dx: Int): (Int, Int, Int) = dx match {
      case -1 => (w - p, w - 1, 0)      // receiver right of me → my right cols
      case 1  => (0, p - 1, pw - p)     // receiver left of me  → my left cols
      case _  => (0, w - 1, p)
    }
    def stripRows(dy: Int): (Int, Int, Int) = dy match {
      case -1 => (h - p, h - 1, 0)      // receiver below → my bottom rows
      case 1  => (0, p - 1, h + p)      // receiver above → my top rows
      case _  => (0, h - 1, p)
    }
    val neighbors = for {
      dy <- -1 to 1; dx <- -1 to 1 if (dx, dy) != ((0, 0))
    } yield {
      val (c0, c1, ox) = stripCols(dx)
      val (r0, r1, oy) = stripRows(dy)
      Region(dx, dy, r0, r1, c0, c1, oy, ox)
    }
    // own edge ring: top/bottom q rows full width, middle rows' side cols
    val own = IndexedSeq(
      (0, math.min(q, h) - 1, 0, w - 1),
      (math.max(h - q, q), h - 1, 0, w - 1),
      (q, h - q - 1, 0, math.min(q, w) - 1),
      (q, h - q - 1, math.max(w - q, q), w - 1))
      .filter { case (r0, r1, c0, c1) => r1 >= r0 && c1 >= c0 }
      .map { case (r0, r1, c0, c1) =>
        Region(0, 0, r0, r1, c0, c1, r0 + p, c0 + p) }
    neighbors.toIndexedSeq ++ own
  }
}
