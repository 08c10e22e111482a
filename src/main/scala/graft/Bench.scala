package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Benchmark entry (driver-run per round -> BENCH_r{N}.json).
 *
 * Headline queries run at SPARK_GRAFT_CPUS (default 32) over
 * SPARK_GRAFT_SF_DIR; additionally the flagship image pipeline runs at
 * two parallelism levels (local[N/4] vs local[N]) on identical input —
 * the sandbox stand-in for the north rule's N vs 4N executors — and the
 * scaling efficiency (T_small / T_big) / 4 is reported in the same JSON
 * line (also summarized in BENCH.md / BASELINE.md).
 *
 * A warmup pass runs first so JIT/classloading doesn't bias either
 * parallelism level.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Materialize the synthetic image table to parquet ONCE (the real
    * pipeline reads a table, not driver memory — also keeps task sizes
    * small). Returns (path, decoded-pixel count = sum w*h*bands). */
  private def materializeImages(spark: SparkSession, nImages: Int): (String, Long) = {
    import org.apache.spark.sql.Encoders
    val path = s"/tmp/graft_bench_images_$nImages"
    val rows = gen.Synth.images(nImages, seed = 7L, bands = 3)
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      spark.createDataset(rows.toSeq)(Encoders.product[ImageRow])
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
    }
    (path, rows.map(r => r.w.toLong * r.h * 3).sum)
  }

  /** The flagship pipeline at bench scale: parquet image table ->
    * decode+tile -> broadcast join -> PIP -> zonal agg. Throughput unit:
    * decoded pixels/sec. */
  private def pipeline(spark: SparkSession, imagesPath: String): Unit = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.Encoders
    val images = spark.read.parquet(imagesPath).as[ImageRow](Encoders.product[ImageRow])
    val polys = spark.createDataset(
      gen.Synth.polygons(nExtra = 24).toSeq)(Encoders.product[PolyRow])
    val cellRes = operators.Tiler.resForCellSize(64.0)
    val tiles = operators.Tiler.tiles(images, tileSize = 64, cellRes = cellRes)
    val hist = operators.ZonalStats.histogram(tiles, polys, cellRes)
    operators.ZonalStats.stats(hist).count()
    ()
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val small = math.max(1, cpus / 4)
    val nImages = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "192").toInt

    val headline = Seq(
      "q_zonal_box_stats", "q_zonal_frac", "q_knn", "q_hist_ecdf",
      "q_temporal_comp", "q_dedup_exact", "q_jaccard_pairs",
      "q_minhash_pairs", "q_simhash_pairs", "q_ann_topk", "q_tokens")

    // ---- headline queries at full parallelism
    var spark = session(cpus)
    val queryTimes = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val (t, _) = time { fn(spark, sfDir).count() }
      name -> t
    }

    // ---- two-parallelism scaling on the flagship pipeline
    val (warmPath, _) = materializeImages(spark, math.max(8, nImages / 8))
    val (path, pixels) = materializeImages(spark, nImages)
    pipeline(spark, warmPath) // warmup (JIT, codegen)
    val (tBig, _) = time(pipeline(spark, path))
    spark.stop()

    spark = session(small)
    val (tSmall, _) = time(pipeline(spark, path))
    spark.stop()

    val eff = (tSmall / tBig) / (cpus.toDouble / small)
    val thrBig = pixels / tBig
    val thrSmall = pixels / tSmall

    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum + tBig
    val scaling = f"""{"cores_small":$small,"cores_big":$cpus,""" +
      f""""t_small_sec":$tSmall%.3f,"t_big_sec":$tBig%.3f,""" +
      f""""pixels":$pixels,"rows_per_sec_small":$thrSmall%.0f,""" +
      f""""rows_per_sec_big":$thrBig%.0f,"efficiency":$eff%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"pipeline_sec":$tBig%.3f,"scaling":$scaling%s,"sf":"$sfDir%s"}""")
  }
}
