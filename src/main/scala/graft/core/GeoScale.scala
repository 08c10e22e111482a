package graft.core

/**
 * Latitude-aware (geodesic-lite) scaling for lat/lng imagery — the
 * reference's local-equirectangular convention (raster.py:647-648:
 * meters-per-degree-longitude = 111320 * cos(lat)) lifted onto the
 * engine's planar world domain.
 *
 * Planar world units are 64 m, so the whole Earth
 * (lng ±180° -> ±313,088 units; lat ±90° -> ±156,544) fits inside the
 * GridIndex domain [-2^19, 2^19). Grid cells at res r therefore span
 * 2^(26-r) ground meters (res 13 ≈ 8.2 km, res 20 = 64 m — the same
 * 7-11-ish operating band the north rule names for hex); finer-than-64 m
 * work stays on a projected local CRS through the planar entry points.
 *
 * The scaling is exact east-west at every latitude (that is the
 * equirectangular property the reference relies on) and distorts only
 * across large north-south spans, like the reference's own math.
 */
object GeoScale {
  /** raster.py:647-648. */
  val MetersPerDegree = 111320.0
  val MetersPerUnit = 64.0
  val DegScale: Double = MetersPerDegree / MetersPerUnit // units per degree

  def x(lat: Double, lng: Double): Double =
    lng * DegScale * math.cos(math.toRadians(lat))

  def y(lat: Double): Double = lat * DegScale

  def toPlanar(lat: Double, lng: Double): (Double, Double) = (x(lat, lng), y(lat))
}
