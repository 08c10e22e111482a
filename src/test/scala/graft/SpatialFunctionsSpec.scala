package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Geom, GridIndex, S2, Hex}
import graft.functions.SpatialFunctions._
import graft.gen.Synth

/** Column/expression forms must agree bit-for-bit with the Scala core —
  * and run through the CODEGEN path (dataframe eval), not just eval(). */
class SpatialFunctionsSpec extends AnyFunSuite with SeededProps {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  lazy val pts: Seq[(Double, Double)] = {
    val rng = new Synth.Rng(31337L)
    (0 until 500).map(_ => (rng.nextDouble() * 8000 - 4000, rng.nextDouble() * 8000 - 4000))
  }

  test("gridCellId column math mirrors GridIndex.cellId bit-for-bit") {
    for (res <- Seq(5, 12, 17, 20)) {
      val got = pts.toDF("x", "y").select(gridCellId($"x", $"y", res)).as[Long].collect()
      val want = pts.map { case (x, y) => GridIndex.cellId(x, y, res) }
      assert(got.sameElements(want), s"res=$res")
    }
  }

  test("s2CellId / hexCellId expressions (codegen path) mirror core") {
    val df = pts.toDF("x", "y")
      .select($"x", $"y", s2CellId($"y" / 100.0, $"x" / 100.0, 14).as("s2"),
        hexCellId($"x", $"y", 9).as("hex"))
      .as[(Double, Double, Long, Long)].collect()
    df.foreach { case (x, y, s2, hex) =>
      assert(s2 == S2.cellId(y / 100.0, x / 100.0, 14))
      assert(hex == Hex.cellId(x, y, 9))
    }
  }

  test("gridKRing / hexKRing expressions mirror core") {
    val cells = pts.take(50).map { case (x, y) =>
      (GridIndex.cellId(x, y, 12), Hex.cellId(x, y, 8)) }
    val got = cells.toDF("g", "h")
      .select($"g", $"h", gridKRing($"g", 2).as("gr"), hexKRing($"h", 2).as("hr"))
      .as[(Long, Long, Array[Long], Array[Long])].collect()
    got.foreach { case (g, h, gr, hr) =>
      assert(gr.sameElements(GridIndex.kRing(g, 2)))
      assert(hr.sameElements(Hex.kRing(h, 2)))
    }
  }

  test("PointInPolygonExpr (codegen) == Geom.pointInPolygon incl. boundaries") {
    val polys = Synth.polygons(nExtra = 12)
    for (p <- polys.take(8)) {
      val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
      val bb = Geom.bbox(rings)
      val rng = new Synth.Rng(p.poly_id)
      val probes = (0 until 200).map { _ =>
        (bb.x0 - 5 + rng.nextDouble() * (bb.x1 - bb.x0 + 10),
         bb.y0 - 5 + rng.nextDouble() * (bb.y1 - bb.y0 + 10))
      } ++ p.rings(0).map(q => (q.x, q.y)) // exact vertices (boundary=inside)
      val ringsLit = typedLit(p.rings.map(_.map(q => (q.x, q.y))))
      val got = probes.toDF("x", "y")
        .select($"x", $"y", pointInPolygon($"x", $"y", ringsLit).as("in"))
        .as[(Double, Double, Boolean)].collect()
      got.foreach { case (x, y, in) =>
        assert(in == Geom.pointInPolygon(x, y, rings), s"poly ${p.poly_id} at ($x,$y)")
      }
    }
  }
}
