package graft.core

/** Hierarchical spatial cell index (H3/S2-style, built from scratch —
  * no external index library is available in this environment).
  *
  * Design: a quadkey over the equirectangular-normalized plane.
  *   x = (lon + 180) / 360   ∈ [0, 1]
  *   y = (90 - lat) / 180    ∈ [0, 1]
  *   xi = clamp(floor(x · 2^res)), yi likewise; cell = interleave2(xi, yi)
  * with xi occupying odd bit positions and yi even ones (2 bits per level).
  *
  * Equirectangular (not Web-Mercator) normalization is deliberate: it uses
  * only exactly-rounded IEEE ops (add/div/mul/floor), so cell assignment is
  * bit-identical across JVMs, SQL engines and C — a requirement for the
  * "same tile assignments at any parallelism" invariant. Mercator is still
  * available for CRS work (see [[Mercator]]); an index cell is a pure
  * partitioning key, it never needs conformal geometry.
  *
  * res ≤ 30 (60 bits + res tag headroom in a Long).
  */
object CellIndex {
  val MaxRes = 30

  /** Hard cap on one cover's size: a near-global bbox at high res would
    * otherwise overflow the Int allocation (2^32 cells at res 16) — and an
    * 8M-cell cover is a planning bug, not a real probe. SQL-exposed via
    * the cell_cover expression, so user queries can hit it. */
  val MaxCoverCells = 1L << 23

  /** Spread the low 31 bits of v so bit k moves to bit 2k (morton part). */
  @inline def spreadBits(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8))  & 0x00ff00ff00ff00ffL
    v = (v | (v << 4))  & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** Compact even bits of v back into the low bits (inverse of spreadBits). */
  @inline def compactBits(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >>> 1)) & 0x3333333333333333L
    v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >>> 16)) & 0x00000000ffffffffL
    v
  }

  @inline def clampIdx(i: Long, res: Int): Long = {
    val max = (1L << res) - 1
    if (i < 0) 0L else if (i > max) max else i
  }

  @inline def xIndex(lon: Double, res: Int): Long =
    clampIdx(math.floor((lon + 180.0) / 360.0 * (1L << res).toDouble).toLong, res)

  @inline def yIndex(lat: Double, res: Int): Long =
    clampIdx(math.floor((90.0 - lat) / 180.0 * (1L << res).toDouble).toLong, res)

  /** Morton-encode grid indices (xi odd bits, yi even bits). */
  @inline def encode(xi: Long, yi: Long): Long =
    (spreadBits(xi) << 1) | spreadBits(yi)

  /** Cell id of a point at resolution res. */
  def cellId(lat: Double, lon: Double, res: Int): Long =
    encode(xIndex(lon, res), yIndex(lat, res))

  /** Decode cell id → (xi, yi). */
  def decode(cell: Long): (Long, Long) =
    (compactBits(cell >>> 1), compactBits(cell))

  /** Parent cell at a coarser resolution (drop 2 bits per level). */
  def parent(cell: Long, res: Int, parentRes: Int): Long = {
    require(parentRes <= res)
    cell >>> (2 * (res - parentRes))
  }

  /** All cells at `res` whose bounds intersect the lat/lon bbox.
    * Used to cover tile/window bounds for the cell equi-join
    * (the engine's replacement for an R-tree probe). */
  def cellCover(minLat: Double, minLon: Double, maxLat: Double, maxLon: Double,
                res: Int): Array[Long] = {
    val x0 = xIndex(minLon, res); val x1 = xIndex(maxLon, res)
    // y axis is inverted (north=0)
    val y0 = yIndex(maxLat, res); val y1 = yIndex(minLat, res)
    val nCells = (x1 - x0 + 1) * (y1 - y0 + 1) // Long: no Int overflow
    require(nCells <= MaxCoverCells,
      s"cellCover: bbox covers $nCells cells at res=$res (cap $MaxCoverCells); " +
        "lower the resolution or split the bbox")
    val out = new Array[Long](nCells.toInt)
    var k = 0
    var yi = y0
    while (yi <= y1) {
      var xi = x0
      while (xi <= x1) { out(k) = encode(xi, yi); k += 1; xi += 1 }
      yi += 1
    }
    out
  }

  /** Ring-k neighborhood of a cell (Chebyshev ring), clamped to the grid.
    * kRing(c, 0) = [c]; ring k returns only the ring's shell cells so the
    * kNN expansion never re-probes inner candidates. */
  def kRingShell(cell: Long, k: Int, res: Int): Array[Long] = {
    val (cx, cy) = decode(cell)
    if (k == 0) return Array(cell)
    val max = (1L << res) - 1
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          val x = cx + dx; val y = cy + dy
          if (x >= 0 && x <= max && y >= 0 && y <= max) buf += encode(x, y)
        }
        dy += 1
      }
      dx += 1
    }
    buf.toArray
  }

  /** Full disk of radius k (all rings 0..k), clamped. */
  def kRing(cell: Long, k: Int, res: Int): Array[Long] = {
    val (cx, cy) = decode(cell)
    val max = (1L << res) - 1
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        val x = cx + dx; val y = cy + dy
        if (x >= 0 && x <= max && y >= 0 && y <= max) buf += encode(x, y)
        dy += 1
      }
      dx += 1
    }
    buf.toArray
  }

  /** Lat/lon bbox of a cell: (minLat, minLon, maxLat, maxLon). */
  def cellBounds(cell: Long, res: Int): (Double, Double, Double, Double) = {
    val (xi, yi) = decode(cell)
    val n = (1L << res).toDouble
    val minLon = xi / n * 360.0 - 180.0
    val maxLon = (xi + 1) / n * 360.0 - 180.0
    val maxLat = 90.0 - yi / n * 180.0
    val minLat = 90.0 - (yi + 1) / n * 180.0
    (minLat, minLon, maxLat, maxLon)
  }
}

/** Closed-form EPSG:4326 ↔ EPSG:3857 reprojection — the only CRS pair the
  * reference's tests exercise (reference: satproc/utils.py:242-268 via
  * pyproj; tests pin epsg:3857 in tests/test_generalize.py:21). */
object Mercator {
  val R = 6378137.0
  private val MaxLat = 85.06 // beyond Mercator validity, clamp like proj does not — callers stay in range

  def toMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = math.toRadians(lon) * R
    val y = math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)) * R
    (x, y)
  }

  def toLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / R)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0)
    (lon, lat)
  }
}

/** splitmix64 — the deterministic PRNG used by the fixture synthesizers
  * (FIXTURES.md): every derived value is a pure function of the row index. */
object SplitMix64 {
  @inline def next(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from the k-th stream value of `seed`. */
  def unitDouble(seed: Long, k: Int): Double = {
    var s = seed
    var i = 0
    var v = 0L
    while (i <= k) { v = next(s); s = v; i += 1 }
    (v >>> 11).toDouble / (1L << 53).toDouble
  }
}
