package graft.core

/**
 * S2 cell ids, implemented from the published S2 geometry spec
 * (s2geometry.io and the public C++/Java sources): cube face ->
 * quadratic (s,t) projection -> 2^30 x 2^30 leaf grid -> Hilbert-curve
 * position, packed as [face:3 | pos:2*level | 1 | 0...] in 64 bits.
 *
 * This is the spherical partitioning key required by the north rule
 * ("H3/S2 index", BASELINE.json). Exact spatial predicates stay planar
 * (graft.core.Geom) — S2 is a shuffle/prefilter key.
 *
 * Correctness is property-tested (round-trip, parent containment by id
 * prefix, level arithmetic) since the offline sandbox carries no official
 * test vectors.
 */
object S2 {
  val MaxLevel   = 30
  val LookupBits = 4
  val SwapMask   = 0x01
  val InvertMask = 0x02

  // Hilbert sub-cell traversal tables (public constants from the spec).
  private val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical order
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)  // swapped & inverted
  )
  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIJ  = new Array[Int](1 << (2 * LookupBits + 2))

  private def initLookup(level: Int, i: Int, j: Int, origOrient: Int,
                         pos: Int, orient: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrient) = (pos << 2) + orient
      lookupIJ((pos << 2) + origOrient) = (ij << 2) + orient
    } else {
      val l = level + 1; val i2 = i << 1; val j2 = j << 1; val p2 = pos << 2
      val r = PosToIJ(orient)
      var sub = 0
      while (sub < 4) {
        val ij = r(sub)
        initLookup(l, i2 + (ij >> 1), j2 + (ij & 1), origOrient,
          p2 + sub, orient ^ PosToOrientation(sub))
        sub += 1
      }
    }
  }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, 0, SwapMask)
  initLookup(0, 0, 0, InvertMask, 0, InvertMask)
  initLookup(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  /** The IJ->Hilbert-position lookup table, exposed so the DuckDB oracle
    * can mirror fromFaceIJ as a relational 8-step fold over a VALUES LUT. */
  private[graft] def lookupPosTable: IndexedSeq[Int] = lookupPos.toIndexedSeq

  // ------------------------------------------------------------ projection

  /** Quadratic ST<->UV transform (the spec's default, low max distortion). */
  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  def latLngToXyz(latDeg: Double, lngDeg: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val theta = math.toRadians(lngDeg)
    val cos = math.cos(phi)
    (cos * math.cos(theta), cos * math.sin(theta), math.sin(phi))
  }

  def xyzToLatLng(x: Double, y: Double, z: Double): (Double, Double) =
    (math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))),
     math.toDegrees(math.atan2(y, x)))

  def xyzToFaceUv(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (az >= ax && az >= ay) 2 else if (ay >= ax) 1 else 0
    val face = axis + (axis match {
      case 0 => if (x < 0) 3 else 0
      case 1 => if (y < 0) 3 else 0
      case _ => if (z < 0) 3 else 0
    })
    val (u, v) = face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }
    (face, u, v)
  }

  def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  // --------------------------------------------------------------- cell id

  private def stToIJ(s: Double): Int =
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * (1 << MaxLevel)).toInt))

  def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var n = face.toLong << 60
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      val mask = (1 << LookupBits) - 1
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask) << 2
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  /** Leaf cell id (level 30) for a lat/lng in degrees. */
  def leafCellId(latDeg: Double, lngDeg: Double): Long = {
    val (x, y, z) = latLngToXyz(latDeg, lngDeg)
    val (face, u, v) = xyzToFaceUv(x, y, z)
    fromFaceIJ(face, stToIJ(uvToSt(u)), stToIJ(uvToSt(v)))
  }

  def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  /** Cell id at `level` containing the lat/lng. */
  def cellId(latDeg: Double, lngDeg: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel)
    val leaf = leafCellId(latDeg, lngDeg)
    val lsb = lsbForLevel(level)
    (leaf & -lsb) | lsb
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def parent(id: Long, parentLevel: Int): Long = {
    val lsb = lsbForLevel(parentLevel)
    (id & -lsb) | lsb
  }

  /** True iff `id` contains `other` (id-range prefix containment). */
  def contains(id: Long, other: Long): Boolean = {
    val lsb = id & -id
    // unsigned comparison: range is [id - (lsb-1), id + (lsb-1)]
    java.lang.Long.compareUnsigned(other, id - (lsb - 1)) >= 0 &&
      java.lang.Long.compareUnsigned(other, id + (lsb - 1)) <= 0
  }

  /** Inverse of fromFaceIJ: (face, i, j, orientation) of a leaf-aligned id. */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var bits = face & SwapMask
    var i = 0; var j = 0
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * LookupBits else LookupBits
      bits += (((id >>> (k * 2 * LookupBits + 1)) & ((1 << (2 * nbits)) - 1)).toInt) << 2
      bits = lookupIJ(bits)
      i += (bits >> (LookupBits + 2)) << (k * LookupBits)
      j += ((bits >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  /** Center lat/lng (degrees) of a cell id at any level. */
  def cellCenterLatLng(id: Long): (Double, Double) = {
    val lev = level(id)
    val (face, i, j) = toFaceIJ(id)
    // center of the cell = leaf (i,j) truncated to level, + half cell
    val cellBits = MaxLevel - lev
    val size = 1 << cellBits
    // leaf cells (size 1): the center sits half a leaf past the corner.
    // NON-leaf cells: corner + size/2 IS the exact center in leaf units —
    // adding the half-leaf there would bias the center by half a leaf
    // (25% of the cell at level 29)
    val half = if (cellBits == 0) 0.5 else 0.0
    val iC = (i >> cellBits << cellBits) + size / 2
    val jC = (j >> cellBits << cellBits) + size / 2
    val u = stToUv((iC + half) / (1 << MaxLevel))
    val v = stToUv((jC + half) / (1 << MaxLevel))
    val (x, y, z) = faceUvToXyz(face, u, v)
    xyzToLatLng(x, y, z)
  }

  /** Hex token (id with trailing zeros stripped), matching the public
    * S2 token format. */
  def token(id: Long): String = {
    if (id == 0) return "X"
    val hex = f"$id%016x"
    hex.reverse.dropWhile(_ == '0').reverse
  }

  /** The four corner lat/lngs of a cell (S2 cells are convex spherical
    * quads, so the farthest cell point from the center is a corner —
    * what the circumradius-bound property test measures). */
  def cellVertexLatLngs(id: Long): Array[(Double, Double)] = {
    val lev = level(id)
    val (face, i, j) = toFaceIJ(id)
    val cellBits = MaxLevel - lev
    val size = 1 << cellBits
    val i0 = i >> cellBits << cellBits
    val j0 = j >> cellBits << cellBits
    Array((i0, j0), (i0 + size, j0), (i0, j0 + size), (i0 + size, j0 + size))
      .map { case (ii, jj) =>
        val u = stToUv(ii.toDouble / (1 << MaxLevel))
        val v = stToUv(jj.toDouble / (1 << MaxLevel))
        val (x, y, z) = faceUvToXyz(face, u, v)
        xyzToLatLng(x, y, z)
      }
  }

  /** The four children of a cell (one level deeper). */
  def children(id: Long): Array[Long] = {
    val lsb = id & -id
    val childLsb = lsb >>> 2
    Array(id - lsb + childLsb, id - lsb + 3 * childLsb,
      id - lsb + 5 * childLsb, id - lsb + 7 * childLsb)
  }

  /** Face cell ids (level 0). */
  def faceCells: Array[Long] =
    Array.tabulate(6)(f => (f.toLong << 61) | lsbForLevel(0))

  /** Safe upper bound (radians) on the angular distance from a level-l
    * cell's center to ANY point of the cell. Level 0: the exact face
    * circumradius acos(1/sqrt(3)) ~ 0.9554. Deeper levels: cells halve
    * in uv per level and the quadratic st->uv projection's stretch is
    * bounded, so radius <= C * 2^-l; C = 1.6 carries a ~60% margin over
    * the worst measured stretch (property-verified against random cells
    * at levels 0..12 in CoreSpec — the margin absorbs the uv->angle
    * distortion bound rather than deriving it sharply). */
  def circumradiusBound(l: Int): Double =
    if (l == 0) 0.9554 else 1.6 * math.pow(2.0, -l)

  /** Conservative cover of a lat/lng rectangle with level-`level` cells:
    * hierarchical descent from the 6 faces, keeping any cell whose
    * CENTER lies within the rect expanded by the level's circumradius
    * bound — every cell that intersects the rect has its center within
    * that expansion, so the cover can only over-approximate (the join
    * prefilter built on it never drops a matching point; extras are
    * removed by the exact refine). Longitudes must satisfy lngLo <=
    * lngHi (split antimeridian-crossing rects before calling). Near the
    * poles the lng expansion saturates to the full circle. */
  def coverLatLngRect(latLo: Double, latHi: Double,
                      lngLo: Double, lngHi: Double, level: Int): Seq[Long] = {
    require(latLo <= latHi && lngLo <= lngHi,
      s"bad rect: [$latLo,$latHi]x[$lngLo,$lngHi]")
    require(level >= 0 && level <= MaxLevel)
    // the slack terms depend only on the level — hoisted out of the
    // descent (hits() runs per visited cell, thousands for wide rects)
    val slack = Array.tabulate(level + 1) { l =>
      val theta = circumradiusBound(l)
      val slackDeg = math.toDegrees(theta)
      val la0 = math.max(-90.0, latLo - slackDeg)
      val la1 = math.min(90.0, latHi + slackDeg)
      // exact lng widening from the haversine lower bound: two points
      // within angular distance theta whose |lat| stays <= maxAbsLat
      // satisfy sin(dLng/2) <= sin(theta/2)/cos(maxAbsLat); saturate to
      // the full circle when that exceeds 1 (polar band)
      val maxAbsLat = math.max(math.abs(la0), math.abs(la1))
      val cosLat = math.cos(math.toRadians(maxAbsLat))
      val s = math.sin(theta / 2)
      val lngSlack =
        if (s >= cosLat) 360.0
        else math.toDegrees(2 * math.asin(s / cosLat))
      (la0, la1, lngSlack)
    }
    def hits(id: Long, l: Int): Boolean = {
      val (la0, la1, lngSlack) = slack(l)
      val (cLat, cLng) = cellCenterLatLng(id)
      val latOk = cLat >= la0 && cLat <= la1
      // lng containment with wrap: distance from cLng to [lngLo, lngHi]
      val lo = lngLo - lngSlack
      val hi = lngHi + lngSlack
      val lngOk = (hi - lo >= 360.0) || {
        // normalize cLng into [lo, lo + 360)
        val c = lo + (((cLng - lo) % 360.0) + 360.0) % 360.0
        c <= hi
      }
      latOk && lngOk
    }
    val out = Seq.newBuilder[Long]
    def descend(id: Long, l: Int): Unit =
      if (hits(id, l)) {
        if (l == level) out += id
        else children(id).foreach(descend(_, l + 1))
      }
    faceCells.foreach(descend(_, 0))
    out.result()
  }
}
