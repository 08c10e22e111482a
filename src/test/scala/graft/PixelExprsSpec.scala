package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge.{expression => exprOf, column => colOf}
import graft.functions._

/** Native pixel expressions must match the HOF lambda forms they
  * replaced BIT FOR BIT — including Spark's float semantics on NaN
  * (NaN == NaN, NaN greatest) and -0.0 (< 0.0), which differ from the
  * JVM's primitive comparisons. */
class PixelExprsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val pa = Seq(
    Array(1f, 42f, Float.NaN, -0.0f, 0f, 97f, -42f, 41.9999f),
    Array(Float.NaN, Float.NaN, 5f, 42.0001f, -5f, 42f, 0f, 1e-30f))
  private val pb = pa.map(_.reverse)
  private def df: DataFrame = pa.zip(pb).toDF("pa", "pb")

  private def bits(a: Array[Float]): Seq[Int] =
    a.map(java.lang.Float.floatToIntBits).toSeq

  private def check(native: DataFrame, hof: DataFrame): Unit = {
    val n = native.as[Array[Float]].collect().map(bits)
    val h = hof.as[Array[Float]].collect().map(bits)
    assert(n.length == h.length && n.nonEmpty)
    n.zip(h).foreach { case (x, y) => assert(x == y, s"\n native $x\n hof    $y") }
  }

  test("MaskEqualsExpr == transform/when HOF (incl. NaN and -0.0 mvals)") {
    for (mval <- Seq(42f, Float.NaN, 0f, -0.0f)) {
      check(
        df.select(colOf(MaskEqualsExpr(exprOf(col("pa")), mval, 7f))),
        df.select(transform(col("pa"), p => when(p === mval, p).otherwise(lit(7f)))))
    }
  }

  test("MaskRuleExpr ==/</> == HOF (incl. NaN thresholds)") {
    for {
      thr <- Seq(5f, Float.NaN, 0f, -0.0f)
      (rule, code) <- Seq("==" -> 0, "<" -> 1, ">" -> 2)
    } {
      def cond(p: org.apache.spark.sql.Column) = rule match {
        case "==" => p === thr
        case "<"  => p < thr
        case _    => p > thr
      }
      check(
        df.select(colOf(MaskRuleExpr(exprOf(col("pa")), code, thr, -1f))),
        df.select(transform(col("pa"), p => when(cond(p), lit(-1f)).otherwise(p))),
      )
    }
  }

  test("ApplyLutExpr == element_at(map) HOF (NaN key and value)") {
    val lut = Map(42f -> 1f, 0f -> 2f, Float.NaN -> 3f, -5f -> 4f)
    val entries = lut.toSeq.sortWith((p, q) => PxRuntime.cmp(p._1, q._1) < 0)
    val m = map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    check(
      df.select(colOf(ApplyLutExpr(exprOf(col("pa")),
        entries.map(_._1).toArray, entries.map(_._2).toArray))),
      df.select(transform(col("pa"), p => coalesce(element_at(m, p), p))))
  }

  test("ZipMulExpr / CombineSceneExpr / NdviExpr == zip_with HOFs") {
    check(
      df.select(colOf(ZipMulExpr(exprOf(col("pa")), exprOf(col("pb"))))),
      df.select(zip_with(col("pa"), col("pb"), (x, y) => x * y)))
    check(
      df.select(colOf(CombineSceneExpr(exprOf(col("pa")), exprOf(col("pb"))))),
      df.select(zip_with(col("pa"), col("pb"), (x, y) => when(x === 0f, y).otherwise(x))))
    val nodata = lit(Float.NaN)
    check(
      df.select(colOf(NdviExpr(exprOf(col("pa")), exprOf(col("pb")),
        exprOf(nodata.cast("float"))))),
      df.select(zip_with(col("pa"), col("pb"), (x, y) =>
        when(x + y === 0f, nodata).otherwise(((x - y) / (x + y)).cast("float")))))
  }
}
