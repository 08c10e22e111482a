package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{PolyRow, Pt}
import graft.core.Geom

/**
 * Vector-layer operators (SURVEY §2.1-2.3 vector rows).
 */
object VectorOps {

  /** sqlfilter (shape.py:621-654): OGR SQL over a layer == spark.sql over
    * a registered view of the attribute relation. The layer is any
    * DataFrame (OGR layers are attribute tables; geometry is just a
    * column here), so the op works over polygon relations and plain
    * tables alike. Catalyst plans the user SQL like any other query —
    * predicates push to the scan, unused columns prune.
    *
    * The OGR contract fixes the view name (`layer`), so concurrent
    * calls on one session would race on the catalog entry. The
    * register -> analyze -> drop window is serialized per session;
    * `spark.sql` analyzes eagerly and analysis INLINES the view into
    * the returned plan, so dropping the view immediately after is safe
    * and nothing leaks into the caller's catalog. */
  def sqlFilter(layer: DataFrame, sql: String)
               (implicit spark: SparkSession): DataFrame =
    spark.synchronized {
      layer.createOrReplaceTempView("layer")
      try spark.sql(sql)
      finally spark.catalog.dropTempView("layer")
    }

  /** filter_shp (shape.py:657-699): attribute predicate writes a label
    * onto matching rows (schema mutation -> withColumn); non-matching
    * rows keep a NULL label, as OGR leaves their field unset. */
  def filterLabel(layer: DataFrame, predicate: org.apache.spark.sql.Column,
                  labelCol: String, label: String): DataFrame =
    layer.withColumn(labelCol, when(predicate, lit(label)))

  /** write_id_field (shape.py:1536-1564): sequential FID assignment.
    * Distributed sort + RDD zipWithIndex instead of a global
    * Window.orderBy (which would sort EVERYTHING in one partition).
    * zipWithIndex's count pass and the final pass both execute the SAME
    * RDD instance, so the range-sampler's RDD-id-derived seed — and
    * therefore the partition boundaries — are identical across the two
    * jobs (re-deriving the plan per action would not guarantee that).
    * Ties on `orderCol` break by a hash of the WHOLE row: without it,
    * tied rows sort by shuffle-fetch arrival, so a task retry or an
    * independent re-run could permute their fids. With it, the output
    * multiset is deterministic — rows identical in every column are
    * interchangeable, so their arbitrary relative order is
    * unobservable. */
  def writeIdField(df: DataFrame, orderCol: String, idCol: String = "fid"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StructField}
    // df.col (not col): a column named "a.b" must resolve as ITSELF,
    // not as field b of struct a. Map-typed columns are unhashable
    // (xxhash64 rejects MapType) — exclude them from the tiebreak; rows
    // differing ONLY in a map column tie arbitrarily, which is the
    // pre-tiebreak behavior for all columns and still deterministic
    // per the multiset argument above for every hashable field.
    val hashable = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[MapType]).map(f => df.col(f.name))
    val tiebreak = xxhash64(struct(hashable: _*))
    val sorted = df.sort(df.col(orderCol), tiebreak)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** shp2gj (shape.py:54-92): GeoJSON Feature strings per polygon row.
    * The name is JSON-escaped (a quote/backslash/control char in an
    * attribute must not produce an unparseable feature) and a
    * non-finite measure emits as null — bare NaN/Infinity is not legal
    * JSON. */
  def toGeoJson(polys: Dataset[PolyRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    def esc(v: String): String = v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    polys.map { p =>
      val coords = p.rings.map(ring =>
        (ring :+ ring.head).map(q => s"[${q.x},${q.y}]").mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      val m = if (java.lang.Double.isFinite(p.measure)) p.measure.toString else "null"
      (p.poly_id, s"""{"type":"Feature","geometry":{"type":"Polygon","coordinates":$coords},""" +
        s""""properties":{"poly_id":${p.poly_id},"class":${p.cls},"name":"${esc(p.name)}","measure":$m}}""")
    }.toDF("poly_id", "geojson")
  }

  /**
   * clip_poly (shape.py:2772-2808, ogr.Layer.Clip) for rectangular clip
   * geometries (the tile-grid case, raster.py:1833-1883): Sutherland-
   * Hodgman clip of every polygon against every rectangle it overlaps.
   * Rect relation: (rect_id, x0, y0, x1, y1) — broadcast (tile grids are
   * small); polygons stream.
   */
  def clipToRects(polys: Dataset[PolyRow], rects: Seq[(Long, Geom.BBox)])
                 (implicit spark: SparkSession): Dataset[PolyRow] = {
    import spark.implicits._
    val rB = spark.sparkContext.broadcast(rects)
    polys.flatMap { p =>
      val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
      val bb = Geom.bbox(rings)
      rB.value.flatMap { case (rid, rect) =>
        if (!rect.intersects(bb)) None
        else {
          val clipped = rings.map(r => clipRingToRect(r, rect)).filter(_.length >= 3)
          // rings clip independently, so a rect entirely inside a HOLE
          // collapses BOTH the exterior and the hole to the rect itself
          // — a phantom zero-area feature ogr.Layer.Clip would not emit;
          // net area <= 0 means nothing of the polygon survives here
          if (clipped.isEmpty ||
              Geom.area(clipped) <= 0.0) None
          else Some(PolyRow(p.poly_id * 100000 + rid, p.part,
            clipped.map(_.map { case (x, y) => Pt(x, y) }),
            p.cls, p.name, p.measure))
        }
      }
    }
  }

  // ------------------------------------------------------- general clip

  import org.locationtech.jts.geom.{Coordinate, GeometryFactory, Geometry, Polygon => JPolygon}

  private val gf = new GeometryFactory()

  private[graft] def toJts(rings: Geom.Rings): JPolygon = {
    def ring(r: Array[(Double, Double)]) = {
      val closed = if (r.head == r.last) r else r :+ r.head
      gf.createLinearRing(closed.map { case (x, y) => new Coordinate(x, y) })
    }
    gf.createPolygon(ring(rings(0)), rings.drop(1).map(ring))
  }

  private[graft] def fromJts(g: Geometry): Seq[Geom.Rings] = {
    def polyRings(p: JPolygon): Geom.Rings = {
      val shell = p.getExteriorRing.getCoordinates.dropRight(1)
        .map(c => (c.x, c.y))
      val holes = (0 until p.getNumInteriorRing).map(i =>
        p.getInteriorRingN(i).getCoordinates.dropRight(1).map(c => (c.x, c.y)))
      (Array(shell) ++ holes).filter(_.length >= 3)
    }
    (0 until g.getNumGeometries).flatMap { i =>
      g.getGeometryN(i) match {
        case p: JPolygon if !p.isEmpty => Some(polyRings(p))
        case _ => None
      }
    }
  }

  /**
   * General polygon ∩ polygon layer clip (shape.py:2772-2808,
   * ogr.Layer.Clip) — concave clip geometries, holes, multipolygon
   * results all handled via JTS overlay (jts-core ships with Spark).
   * The clip layer BROADCASTS (clip layers — tile grids, AOI masks — are
   * small by contract; for large×large, pre-join both sides on grid-cell
   * keys first); subject polygons stream with a bbox prefilter before the
   * exact overlay, mirroring the reference's bbox-then-exact two-phase
   * pattern. Result ids: subject_id * 100000 + clip_id (the clipToRects
   * convention); one output row per polygon part.
   */
  /** One broadcast clip feature; the JTS geometry is @transient lazy,
    * so it is built ONCE per executor on first use instead of once per
    * (subject x clip) pair — the subject side already caches via its
    * own lazy val, and rebuilding the clip ring validation per pair is
    * O(subjects x clips) wasted work against a broadcast layer. */
  private final class ClipEntry(val id: Long, val bbox: Geom.BBox,
                                val rings: Geom.Rings) extends Serializable {
    @transient lazy val jts: JPolygon = toJts(rings)
  }

  def clipToPolygons(polys: Dataset[PolyRow], clipLayer: Seq[PolyRow])
                    (implicit spark: SparkSession): Dataset[PolyRow] = {
    import spark.implicits._
    val clipB = spark.sparkContext.broadcast(clipLayer.map { c =>
      val rings: Geom.Rings = c.rings.map(_.map(q => (q.x, q.y)))
      new ClipEntry(c.poly_id, Geom.bbox(rings), rings)
    })
    polys.flatMap { p =>
      val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
      val bb = Geom.bbox(rings)
      lazy val subj = toJts(rings)
      clipB.value.flatMap { c =>
        if (!c.bbox.intersects(bb)) Seq.empty
        else {
          val inter = subj.intersection(c.jts)
          fromJts(inter).zipWithIndex.map { case (rr, part) =>
            PolyRow(p.poly_id * 100000 + c.id, part,
              rr.map(_.map { case (x, y) => Pt(x, y) }), p.cls, p.name, p.measure)
          }
        }
      }
    }
  }

  /** ST_Buffer (shape.py:2830-2867): JTS buffer per feature — positive
    * distances dilate, negative erode; multipolygon results fan out one
    * row per part. */
  def buffer(polys: Dataset[PolyRow], distance: Double)
            (implicit spark: SparkSession): Dataset[PolyRow] = {
    import spark.implicits._
    polys.flatMap { p =>
      val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
      val buf = toJts(rings).buffer(distance)
      fromJts(buf).zipWithIndex.map { case (rr, part) =>
        PolyRow(p.poly_id, part, rr.map(_.map { case (x, y) => Pt(x, y) }),
          p.cls, p.name, p.measure)
      }
    }
  }

  /** Sutherland-Hodgman against an axis-aligned rect. */
  private[operators] def clipRingToRect(ring: Array[(Double, Double)],
                                        r: Geom.BBox): Array[(Double, Double)] = {
    type P = (Double, Double)
    def clipEdge(pts: Array[P], inside: P => Boolean, intersect: (P, P) => P): Array[P] = {
      if (pts.isEmpty) return pts
      val out = scala.collection.mutable.ArrayBuffer.empty[P]
      val n = pts.length
      var i = 0
      while (i < n) {
        val cur = pts(i); val prev = pts((i + n - 1) % n)
        val cIn = inside(cur); val pIn = inside(prev)
        if (cIn) {
          if (!pIn) out += intersect(prev, cur)
          out += cur
        } else if (pIn) out += intersect(prev, cur)
        i += 1
      }
      out.toArray
    }
    def ix(a: P, b: P, x: Double): P = {
      val t = (x - a._1) / (b._1 - a._1); (x, a._2 + t * (b._2 - a._2))
    }
    def iy(a: P, b: P, y: Double): P = {
      val t = (y - a._2) / (b._2 - a._2); (a._1 + t * (b._1 - a._1), y)
    }
    var p = ring
    p = clipEdge(p, _._1 >= r.x0, (a, b) => ix(a, b, r.x0))
    p = clipEdge(p, _._1 <= r.x1, (a, b) => ix(a, b, r.x1))
    p = clipEdge(p, _._2 >= r.y0, (a, b) => iy(a, b, r.y0))
    p = clipEdge(p, _._2 <= r.y1, (a, b) => iy(a, b, r.y1))
    p
  }
}
