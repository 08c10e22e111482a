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

class GraftFunctionsSqlSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("SQL-registered functions match the Column API") {
    graft.functions.GraftFunctions.register(spark)
    Seq((12.3, 45.6), (-800.0, 900.0)).toDF("x", "y").createOrReplaceTempView("p")
    val sqlRows = spark.sql(
      """SELECT grid_cell_id(x, y, 12) AS g, hex_cell_id(x, y, 9) AS h,
        | s2_cell_id(y / 100.0, x / 100.0, 14) AS s,
        | size(grid_k_ring(grid_cell_id(x, y, 12), 1)) AS gr,
        | simhash64('the quick brown fox') AS sh,
        | rolling_fingerprint('abcdefghij', 4) AS fp,
        | st_point_in_polygon(x, y,
        |   array(array(struct(-1000.0 AS x, -1000.0 AS y),
        |               struct(1000.0 AS x, -1000.0 AS y),
        |               struct(1000.0 AS x, 1000.0 AS y),
        |               struct(-1000.0 AS x, 1000.0 AS y)))) AS pip
        |FROM p""".stripMargin).collect()
    val r0 = sqlRows(0)
    assert(r0.getAs[Long]("g") == GridIndex.cellId(12.3, 45.6, 12))
    assert(r0.getAs[Long]("h") == Hex.cellId(12.3, 45.6, 9))
    assert(r0.getAs[Long]("s") == S2.cellId(45.6 / 100.0, 12.3 / 100.0, 14))
    assert(r0.getAs[Int]("gr") == 9)
    assert(r0.getAs[Boolean]("pip"))
    assert(sqlRows(1).getAs[Boolean]("pip")) // (-800, 900) inside the big box
    assert(r0.getAs[Long]("sh") != 0L && r0.getAs[Long]("fp") != 0L)
    // round-4 registrations
    val r4 = spark.sql(
      """SELECT poly_fingerprint('abc') AS pf,
        | text_stats('the cat sat.') AS ts,
        | size(shingle_fps('a b c d', 3)) AS nsh,
        | px_sum(array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT))) AS ps""".stripMargin)
      .collect()(0)
    assert(r4.getAs[Long]("pf") ==
      graft.text.HashFamily.fp62("abc", 0, 3))
    assert(r4.getAs[scala.collection.Seq[Int]]("ts").toSeq == Seq(12, 3, 1, 1))
    assert(r4.getAs[Int]("nsh") == 2)
    assert(r4.getAs[Double]("ps") == 4.0)
    // n parameterizes the expression: non-INT-literal n must fail with
    // the contract spelled out, not a ClassCastException
    val bad = intercept[Exception] {
      spark.sql("SELECT shingle_fps('a b c', CAST(3 AS BIGINT))").collect()
    }
    assert(bad.getMessage.contains("INT literal"), bad.getMessage)
  }
}
