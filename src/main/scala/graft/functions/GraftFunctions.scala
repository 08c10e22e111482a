package graft.functions

import org.apache.spark.sql.SparkSession

/**
 * SQL-name registration for the engine's custom expressions, so
 * `spark.sql` users get the same surface as the Column API (the
 * reference's users script everything — OGR SQL included — so the SQL
 * door matters for drop-in parity).
 */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("st_point_in_polygon",
      es => PointInPolygonExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("s2_cell_id",
      es => S2CellIdExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("hex_cell_id",
      es => HexCellIdExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("grid_k_ring",
      es => GridKRingExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hex_k_ring",
      es => HexKRingExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => graft.text.SimHashExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_fingerprint",
      es => graft.text.RollingFingerprintExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("grid_cell_id",
      es => GridCellIdExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      es => graft.text.DotExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_signature",
      es => graft.text.LshSigExpr(es(0), es(1)), "scala_udf")
    // round 4
    reg.createOrReplaceTempFunction("poly_fingerprint",
      es => graft.text.PolyHashExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("text_stats",
      es => graft.text.TextStatsExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_fps",
      es => {
        // n parameterizes the expression itself, so it must be a
        // foldable INT — fail with the contract, not a ClassCastException
        val n = es(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType => e.eval()
          case _ => null
        }
        require(n != null,
          "shingle_fps(text, n): n must be an INT literal, got " + es(1).sql)
        graft.text.ShingleFpsExpr(es(0), n.asInstanceOf[Int])
      }, "scala_udf")
    reg.createOrReplaceTempFunction("px_sum",
      es => PxSumExpr(es(0)), "scala_udf")
  }
}
