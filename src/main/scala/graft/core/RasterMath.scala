package graft.core

/** Pixel-level raster math, ported for bit-parity with the reference's
  * numpy/skimage/OpenCV stack. All functions are pure and operate on
  * band-major Array[Array[Float]] (band → row-major pixels) so they can run
  * inside typed Dataset maps without shuffles.
  */
object RasterMath {

  /** numpy.percentile, default "linear" interpolation, computed in double
    * precision (reference: satproc/utils.py:114 `np.percentile(image, range,
    * axis=(1,2))`). q in [0, 100]. */
  def percentile(values: Array[Float], q: Double): Double = {
    val n = values.length
    require(n > 0, "percentile of empty array")
    val s = values.map(_.toDouble).sorted
    if (n == 1) return s(0)
    val pos = (n - 1).toDouble * q / 100.0
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, n - 1)
    val frac = pos - lo
    s(lo) + (s(hi) - s(lo)) * frac
  }

  /** skimage.exposure.rescale_intensity(band, in_range=(lo,hi),
    * out_range=(1,255)).astype(uint8) (reference: satproc/utils.py:131-138):
    * clip → scale to [0,1] → ·254 + 1 → truncate toward zero. */
  def rescaleBandToByte(band: Array[Float], lo: Double, hi: Double): Array[Byte] = {
    val out = new Array[Byte](band.length)
    val span = hi - lo
    var i = 0
    while (i < band.length) {
      val x = band(i).toDouble
      val clipped = if (x < lo) lo else if (x > hi) hi else x
      val unit = if (span != 0.0) (clipped - lo) / span else clipped // skimage: no div when imin==imax
      out(i) = (unit * 254.0 + 1.0).toInt.toByte // uint8 truncation
      i += 1
    }
    out
  }

  /** Per-band input ranges for the three rescale modes
    * (reference: satproc/utils.py:93-129). Returns (lo, hi) per band. */
  def rescaleRanges(bands: Array[Array[Float]], mode: String,
                    range: (Double, Double)): Array[(Double, Double)] = mode match {
    case "percentiles" =>
      bands.map(b => (percentile(b, range._1), percentile(b, range._2)))
    case "values" =>
      // None bounds (NaN here) default to the global min/max over ALL bands
      // (np.min(image) over the whole array, utils.py:117-120)
      val all = bands.flatten
      val lo = if (range._1.isNaN) all.min.toDouble else range._1
      val hi = if (range._2.isNaN) all.max.toDouble else range._2
      bands.map(_ => (lo, hi))
    case "s2_rgb_extra" =>
      val ranges = bands.map(b => (percentile(b, range._1), percentile(b, range._2)))
      var i = 0
      while (i < math.min(3, ranges.length)) { ranges(i) = (0.0, 0.3); i += 1 }
      ranges
    case other => throw new IllegalArgumentException(s"unknown rescale_mode $other")
  }

  /** Full rescale_intensity over a multiband chip → uint8 bands. */
  def rescaleIntensity(bands: Array[Array[Float]], mode: String,
                       range: (Double, Double)): Array[Array[Byte]] = {
    val rs = rescaleRanges(bands, mode, range)
    bands.zip(rs).map { case (b, (lo, hi)) => rescaleBandToByte(b, lo, hi) }
  }

  /** skimage.exposure.is_low_contrast(img, 0.05, lower=1, upper=99) on a
    * float image (dtype limits (-1, 1) ⇒ full range 2.0) or uint8 (0..255)
    * (reference: satproc/chips.py:242). */
  def isLowContrast(values: Array[Float], isByteData: Boolean,
                    threshold: Double = 0.05): Boolean = {
    val p1 = percentile(values, 1.0)
    val p99 = percentile(values, 99.0)
    val fullRange = if (isByteData) 255.0 else 2.0
    (p99 - p1) / fullRange < threshold
  }

  /** Elementwise NaN→0 (np.nan_to_num, reference: satproc/chips.py:236). */
  def nanToNum(band: Array[Float]): Array[Float] = {
    val out = new Array[Float](band.length)
    var i = 0
    while (i < band.length) {
      val v = band(i)
      out(i) = if (v.isNaN) 0f else if (v.isPosInfinity) Float.MaxValue
               else if (v.isNegInfinity) Float.MinValue else v
      i += 1
    }
    out
  }

  /** min-max scale one band to 0..1 (reference: satproc/scale.py:53-78). */
  def minmaxScale(band: Array[Float], mn: Double, mx: Double): Array[Float] = {
    val out = new Array[Float](band.length)
    val span = mx - mn
    var i = 0
    while (i < band.length) { out(i) = ((band(i) - mn) / span).toFloat; i += 1 }
    out
  }

  /** Two-pass 3×3 chamfer distance transform with OpenCV's DIST_L2
    * masksize-3 coefficients a=0.955, b=1.3693, then uint8 truncation
    * (reference: satproc/masks.py:218-221 `cv2.distanceTransform(m,
    * DIST_L2, 3).astype(np.uint8)`). Distance of nonzero pixels to the
    * nearest zero pixel. */
  def distanceTransformL2(mask: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val A = 0.955f; val B = 1.3693f
    val INF = Float.MaxValue / 4
    val d = new Array[Float](w * h)
    var i = 0
    while (i < w * h) { d(i) = if (mask(i) == 0) 0f else INF; i += 1 }
    // forward pass
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y * w + x
        var v = d(idx)
        if (v != 0f) {
          if (x > 0) v = math.min(v, d(idx - 1) + A)
          if (y > 0) {
            v = math.min(v, d(idx - w) + A)
            if (x > 0) v = math.min(v, d(idx - w - 1) + B)
            if (x < w - 1) v = math.min(v, d(idx - w + 1) + B)
          }
          d(idx) = v
        }
        x += 1
      }
      y += 1
    }
    // backward pass
    y = h - 1
    while (y >= 0) {
      var x = w - 1
      while (x >= 0) {
        val idx = y * w + x
        var v = d(idx)
        if (v != 0f) {
          if (x < w - 1) v = math.min(v, d(idx + 1) + A)
          if (y < h - 1) {
            v = math.min(v, d(idx + w) + A)
            if (x < w - 1) v = math.min(v, d(idx + w + 1) + B)
            if (x > 0) v = math.min(v, d(idx + w - 1) + B)
          }
          d(idx) = v
        }
        x -= 1
      }
      y -= 1
    }
    val out = new Array[Byte](w * h)
    i = 0
    while (i < w * h) { out(i) = d(i).toInt.toByte; i += 1 } // float→uint8 truncation
    out
  }

  /** scipy.signal.triang(n): symmetric triangular window
    * (reference: satproc/postprocess/smooth.py:27-30). */
  def triang(n: Int): Array[Double] = {
    val out = new Array[Double](n)
    if (n % 2 == 1) {
      val half = (n + 1) / 2
      var i = 0
      while (i < half) { out(i) = 2.0 * (i + 1) / (n + 1); i += 1 }
      while (i < n) { out(i) = out(n - 1 - i); i += 1 }
    } else {
      val half = n / 2
      var i = 0
      while (i < half) { out(i) = (2.0 * (i + 1) - 1.0) / n; i += 1 }
      while (i < n) { out(i) = out(n - 1 - i); i += 1 }
    }
    out
  }

  /** 1-D squared spline window (reference: smooth.py:21-36): outer/inner
    * triangular pieces, normalized by the mean. */
  def splineWindow(size: Int, power: Double): Array[Double] = {
    val intersection = size / 4
    val t = triang(size)
    val windOuter = t.map(v => math.pow(math.abs(2.0 * v), power) / 2.0)
    var i = intersection
    while (i < size - intersection) { windOuter(i) = 0.0; i += 1 }
    val windInner = t.map(v => 1.0 - math.pow(math.abs(2.0 * (v - 1.0)), power) / 2.0)
    i = 0
    while (i < intersection) { windInner(i) = 0.0; i += 1 }
    i = size - intersection
    while (i < size) { windInner(i) = 0.0; i += 1 }
    val wind = new Array[Double](size)
    i = 0
    while (i < size) { wind(i) = windInner(i) + windOuter(i); i += 1 }
    val avg = wind.sum / size
    wind.map(_ / avg)
  }

  /** 2-D normalized spline weight window (reference: smooth.py:39-44,63-64):
    * outer product / 4, then min-max normalized to [0,1]. */
  def splineWindow2D(size: Int, power: Double): Array[Double] = {
    val w1 = splineWindow(size, power)
    val w2 = new Array[Double](size * size)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) { w2(y * size + x) = w1(y) * w1(x) / 4.0; x += 1 }
      y += 1
    }
    val mn = w2.min; val mx = w2.max
    val span = mx - mn
    w2.map(v => (v - mn) / span)
  }

  /** OpenCV getGaussianKernel parity: fixed small kernels for ksize 1/3/5/7
    * with sigma<=0, else exp formula with the derived sigma
    * σ = 0.3·((ksize−1)·0.5 − 1) + 0.8 (reference: spatial_filter.py:37
    * calls cv2.GaussianBlur(img, (s,s), 0)). */
  def gaussianKernel(ksize: Int): Array[Double] = {
    val fixed: Map[Int, Array[Double]] = Map(
      1 -> Array(1.0),
      3 -> Array(0.25, 0.5, 0.25),
      5 -> Array(0.0625, 0.25, 0.375, 0.25, 0.0625),
      7 -> Array(0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125))
    fixed.getOrElse(ksize, {
      val sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
      val c = (ksize - 1) / 2.0
      val raw = Array.tabulate(ksize)(i => math.exp(-(i - c) * (i - c) / (2 * sigma * sigma)))
      val s = raw.sum
      raw.map(_ / s)
    })
  }

  @inline private def reflect101(i: Int, n: Int): Int = {
    // OpenCV BORDER_REFLECT_101: gfedcb|abcdefgh|gfedcba
    var x = i
    if (n == 1) return 0
    while (x < 0 || x >= n) {
      if (x < 0) x = -x
      if (x >= n) x = 2 * n - 2 - x
    }
    x
  }

  /** Separable Gaussian blur of one band with BORDER_REFLECT_101. */
  def gaussianBlur(band: Array[Float], w: Int, h: Int, ksize: Int): Array[Float] = {
    val k = gaussianKernel(ksize)
    val r = ksize / 2
    val tmp = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var t = -r
        while (t <= r) { acc += band(y * w + reflect101(x + t, w)) * k(t + r); t += 1 }
        tmp(y * w + x) = acc
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var t = -r
        while (t <= r) { acc += tmp(reflect101(y + t, h) * w + x) * k(t + r); t += 1 }
        out(y * w + x) = acc.toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Median blur of one band with BORDER_REPLICATE (OpenCV medianBlur). */
  def medianBlur(band: Array[Float], w: Int, h: Int, ksize: Int): Array[Float] = {
    val r = ksize / 2
    val out = new Array[Float](w * h)
    val win = new Array[Float](ksize * ksize)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var n = 0
        var dy = -r
        while (dy <= r) {
          val yy = math.min(math.max(y + dy, 0), h - 1)
          var dx = -r
          while (dx <= r) {
            val xx = math.min(math.max(x + dx, 0), w - 1)
            win(n) = band(yy * w + xx); n += 1
            dx += 1
          }
          dy += 1
        }
        java.util.Arrays.sort(win)
        out(y * w + x) = win(win.length / 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** skimage match_histograms with no channel axis: one joint CDF over all
    * bands (_match_cumulative_cdf): matched = interp(srcQuantile, refQuantiles,
    * refValues) (reference: satproc/histogram.py:108). */
  def matchHistograms(src: Array[Float], ref: Array[Float]): Array[Float] = {
    // unique values with counts for src and ref
    def cdf(a: Array[Float]): (Array[Float], Array[Double]) = {
      val sorted = a.clone(); java.util.Arrays.sort(sorted)
      val vals = scala.collection.mutable.ArrayBuffer.empty[Float]
      val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j) == sorted(i)) j += 1
        vals += sorted(i); counts += (j - i).toLong
        i = j
      }
      val quantiles = new Array[Double](vals.length)
      var cum = 0L
      i = 0
      while (i < vals.length) { cum += counts(i); quantiles(i) = cum.toDouble / a.length; i += 1 }
      (vals.toArray, quantiles)
    }
    val (srcVals, srcQ) = cdf(src)
    val (refVals, refQ) = cdf(ref)
    // map each src value → interpolated ref value by quantile
    val mapped = new Array[Float](srcVals.length)
    var i = 0
    while (i < srcVals.length) {
      val q = srcQ(i)
      // np.interp(q, refQ, refVals)
      val pos = java.util.Arrays.binarySearch(refQ, q)
      mapped(i) =
        if (pos >= 0) refVals(pos)
        else {
          val ins = -pos - 1
          if (ins == 0) refVals(0)
          else if (ins >= refQ.length) refVals(refVals.length - 1)
          else {
            val q0 = refQ(ins - 1); val q1 = refQ(ins)
            val v0 = refVals(ins - 1); val v1 = refVals(ins)
            (v0 + (v1 - v0) * ((q - q0) / (q1 - q0))).toFloat
          }
        }
      i += 1
    }
    // srcVals is sorted; binary search index for each pixel
    val out = new Array[Float](src.length)
    i = 0
    while (i < src.length) {
      val idx = java.util.Arrays.binarySearch(srcVals, src(i))
      out(i) = mapped(idx)
      i += 1
    }
    out
  }
}
