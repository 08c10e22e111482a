package graft.core

/**
 * H3-style hierarchical hexagon index: aperture-7 hex grids where each
 * successive resolution shrinks the hex edge by sqrt(7) and rotates the
 * lattice by atan(sqrt(3)/5) (~19.1066°), exactly the aperture-7 geometry
 * of the public H3 spec. Resolutions 0..15; the engine uses 7-11 per the
 * north rule.
 *
 * Deliberate deviation, documented per SURVEY §7 hard-point 1: cells live
 * on the engine's planar CRS (the same plane all exact predicates use;
 * the reference's geotransform math is planar as well,
 * /root/reference/geospatial_learn/raster.py:260-266) rather than on the
 * icosahedron, and ids are therefore NOT bit-compatible with Uber H3 (no
 * official vectors resolvable in the zero-egress sandbox). The algebra
 * the engine relies on — aperture-7 hierarchy, axial k-ring expansion,
 * rounding containment — is property-tested instead.
 *
 * Cell id layout: [1:marker | res:4 | q-zigzag:29 | r-zigzag:29] so hex
 * ids can't collide with GridIndex ids (which keep bit 62+ clear).
 */
object Hex {
  val MaxRes = 15

  /** Hex "size" (center-to-vertex) at res 0, in world units. */
  val BaseSize = 65536.0
  private val Ap7Angle = math.atan2(math.sqrt(3.0), 5.0) // aperture-7 rotation
  private val Sqrt7 = math.sqrt(7.0)
  private val Sqrt3 = math.sqrt(3.0)

  def size(res: Int): Double = BaseSize / math.pow(Sqrt7, res)

  private def rotation(res: Int): Double = res * Ap7Angle

  /** Axial (q, r) of the hex containing planar (x, y) at `res`
    * (pointy-top lattice, cube rounding). */
  def pointToAxial(x: Double, y: Double, res: Int): (Long, Long) = {
    val a = -rotation(res)
    val c = math.cos(a); val s = math.sin(a)
    val rx = x * c - y * s
    val ry = x * s + y * c
    val sz = size(res)
    val qf = (Sqrt3 / 3.0 * rx - 1.0 / 3.0 * ry) / sz
    val rf = (2.0 / 3.0 * ry) / sz
    cubeRound(qf, rf)
  }

  private def cubeRound(qf: Double, rf: Double): (Long, Long) = {
    val sf = -qf - rf
    var q = math.round(qf); var r = math.round(rf); val s = math.round(sf)
    val dq = math.abs(q - qf); val dr = math.abs(r - rf); val ds = math.abs(s - sf)
    if (dq > dr && dq > ds) q = -r - s
    else if (dr > ds) r = -q - s
    (q, r)
  }

  /** Planar center of an axial hex. */
  def axialToPoint(q: Long, r: Long, res: Int): (Double, Double) = {
    val sz = size(res)
    val x0 = sz * (Sqrt3 * q + Sqrt3 / 2.0 * r)
    val y0 = sz * (1.5 * r)
    val a = rotation(res)
    val c = math.cos(a); val s = math.sin(a)
    (x0 * c - y0 * s, x0 * s + y0 * c)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  def pack(res: Int, q: Long, r: Long): Long = {
    val zq = zigzag(q); val zr = zigzag(r)
    require(zq < (1L << 29) && zr < (1L << 29), s"hex coord overflow: $q,$r")
    (1L << 62) | (res.toLong << 58) | (zq << 29) | zr
  }

  def res(cell: Long): Int = ((cell >> 58) & 0xf).toInt
  def q(cell: Long): Long = unzigzag((cell >> 29) & 0x1fffffffL)
  def r(cell: Long): Long = unzigzag(cell & 0x1fffffffL)

  def cellId(x: Double, y: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes)
    val (qq, rr) = pointToAxial(x, y, res)
    pack(res, qq, rr)
  }

  def center(cell: Long): (Double, Double) = axialToPoint(q(cell), r(cell), res(cell))

  /** Geometric parent: the res-1 hex containing this cell's center.
    * (Aperture-7 children straddle parent boundaries — same as real H3,
    * where child containment is also approximate.) */
  def parent(cell: Long): Long = {
    val (cx, cy) = center(cell)
    cellId(cx, cy, res(cell) - 1)
  }

  /** All hexes within hex-grid distance k — H3's kRing, used for the kNN
    * expansion join (north rule "kNN via H3 k-ring expansion"). */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val rs = res(cell); val cq = q(cell); val cr = r(cell)
    val out = new scala.collection.mutable.ArrayBuffer[Long](3 * k * (k + 1) + 1)
    var dq = -k
    while (dq <= k) {
      var dr = math.max(-k, -dq - k)
      val hi = math.min(k, -dq + k)
      while (dr <= hi) {
        out += pack(rs, cq + dq, cr + dr)
        dr += 1
      }
      dq += 1
    }
    out.toArray
  }

  /** Hex-grid (cube) distance between two same-res cells. */
  def gridDistance(a: Long, b: Long): Long = {
    require(res(a) == res(b))
    val dq = q(a) - q(b); val dr = r(a) - r(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** The 6 boundary vertices of a hex cell (pointy-top, rotated). */
  def boundary(cell: Long): Array[(Double, Double)] = {
    val rs = res(cell)
    val (cx, cy) = center(cell)
    val sz = size(rs); val rot = rotation(rs)
    Array.tabulate(6) { i =>
      val ang = math.Pi / 180.0 * (60 * i - 30) + rot
      (cx + sz * math.cos(ang), cy + sz * math.sin(ang))
    }
  }
}
