package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev tool (not part of the graded bench): dump `explain("formatted")`
 * for named SparkEntry queries — plus the bench pipeline / CNN chains —
 * into plans/<round>/<name>_<suffix>.txt for the optimization-round
 * evidence files.
 *
 * Usage: SPARK_GRAFT_PLANS_SUFFIX=before|after \
 *        sbt "runMain graft.PlanDump q_knn q_ann_lsh pipeline cnn"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "after")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r06")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def dfFor(name: String): org.apache.spark.sql.DataFrame = name match {
      case "pipeline" =>
        // the bench flagship chain (Bench.pipeline) over a small synthetic
        // image table — plan SHAPE is size-independent
        import org.apache.spark.sql.Encoders
        val p = "/tmp/graft_plandump_images"
        if (!new java.io.File(p, "_SUCCESS").exists()) {
          spark.range(64).repartition(4)
            .map(i => gen.Synth.imageAt(i, seed = 7L, bands = 3))(Encoders.product[ImageRow])
            .write.mode("overwrite").parquet(p)
        }
        val images = spark.read.parquet(p).as[ImageRow](Encoders.product[ImageRow])
        val polys = spark.createDataset(
          gen.Synth.polygons(nExtra = 64).toSeq)(Encoders.product[PolyRow])
        val cellRes = operators.Tiler.resForCellSize(64.0)
        val tiles = operators.Tiler.tiles(images, tileSize = 64, cellRes = cellRes)
        operators.ZonalStats.histogram(tiles, polys, cellRes)
      case "cnn" =>
        import org.apache.spark.sql.Encoders
        val p = "/tmp/graft_plandump_images"
        if (!new java.io.File(p, "_SUCCESS").exists()) {
          spark.range(64).repartition(4)
            .map(i => gen.Synth.imageAt(i, seed = 7L, bands = 3))(Encoders.product[ImageRow])
            .write.mode("overwrite").parquet(p)
        }
        val im = spark.read.parquet(p).as[ImageRow](Encoders.product[ImageRow])
        val net = operators.ConvNet.fixtureNet3
        val cellRes = operators.Tiler.resForCellSize(64.0)
        val tiles = operators.Tiler.multiTiles(im, 64, cellRes, halo = net.halo)
        operators.ConvNet.segPredictTiles(tiles, net, 64).toDF()
      case q => SparkEntry.queries(q)(spark, sfDir)
    }

    args.foreach { name =>
      val df = dfFor(name)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(f, txt)
      println(s"[plandump] wrote $f (${txt.length} chars)")
    }
    spark.stop()
  }
}
