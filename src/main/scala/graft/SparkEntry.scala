package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full spatial pipeline — synthesize the north-rule
    * image+caption table, decode+tile in mapPartitions, broadcast
    * cell-prefilter join to the polygon layer, exact PIP, zonal stats per
    * (polygon, band). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    import operators.{Tiler, ZonalStats}
    val images = spark.createDataset(gen.Synth.images(48, seed = 42L, bands = 2).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val polys = spark.createDataset(gen.Synth.polygons(nExtra = 6).toSeq)(
      org.apache.spark.sql.Encoders.product[PolyRow])
    val cellRes = Tiler.resForCellSize(64.0)
    val tiles = Tiler.tiles(images, tileSize = 64, cellRes = cellRes)
    ZonalStats.stats(ZonalStats.histogram(tiles, polys, cellRes))
  }
  /** One per implemented operator from SURVEY.md §2 (+ the training-data
    * pipeline ops). Names map 1:1 to oracleSql keys where SQL-expressible;
    * the rest are deterministic rows-only checks with ScalaTest oracles. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val Q = graft.queries.Queries
    Map(
      "q_zonal_box_stats" -> (Q.qZonalBoxStats _),
      "q_zonal_frac"      -> (Q.qZonalFrac _),
      "q_zonal_point"     -> (Q.qZonalPoint _),
      "q_zonal_more_stats" -> (Q.qZonalMoreStats _),
      "q_knn"             -> (Q.qKnn _),
      "q_knn_hex"         -> (Q.qKnnHex _),
      "q_mask_rules"      -> (Q.qMaskRules _),
      "q_combine_scene"   -> (Q.qCombineScene _),
      "q_temporal_comp"   -> (Q.qTemporalComp _),
      "q_hist_ecdf"       -> (Q.qHistEcdf _),
      "q_hist_match"      -> (Q.qHistMatch _),
      "q_rgb_indices"     -> (Q.qRgbIndices _),
      "q_rmse"            -> (Q.qRmse _),
      "q_confusion"       -> (Q.qConfusion _),
      "q_entropy"         -> (Q.qEntropy _),
      "q_tokens"          -> (Q.qTokens _),
      "q_dedup_exact"     -> (Q.qDedupExact _),
      "q_jaccard_pairs"   -> (Q.qJaccardPairs _),
      "q_text_quality"    -> (Q.qTextQuality _),
      "q_lang_predict"    -> (Q.qLangPredict _),
      // engine-only (no SQL oracle -> driver rows-only check; exactness
      // covered by ScalaTest oracles):
      "q_minhash_pairs"   -> (Q.qMinhashPairs _),
      "q_simhash_pairs"   -> (Q.qSimhashPairs _),
      "q_fingerprint"     -> (Q.qFingerprint _),
      "q_ann_topk"        -> (Q.qAnnTopK _),
      "q_ann_lsh"         -> (Q.qAnnLsh _),
      "q_ann_ivf"         -> (Q.qAnnIvf _),
      "q_pipeline_zonal"  -> (Q.qPipelineZonal _),
      "q_raster_points"   -> (Q.qRasterPoints _),
      "q_zonal_rgb"       -> (Q.qZonalRgb _),
      "q_dem"             -> (Q.qDem _),
      "q_local_threshold" -> (Q.qLocalThreshold _),
      "q_convolve"        -> (Q.qConvolve _),
      "q_resize"          -> (Q.qResize _),
      "q_quegan"          -> (Q.qQuegan _),
      "q_morphology"      -> (Q.qMorphology _),
      "q_classify_object" -> (Q.qClassifyObject _),
      "q_assemble"        -> (Q.qAssemble _),
      "q_rasterize"       -> (Q.qRasterize _),
      "q_combine_grid"    -> (Q.qCombineGrid _),
      "q_ndvi"            -> (Q.qNdvi _),
      "q_polygonize"      -> (Q.qPolygonize _),
      "q_shape_props"     -> (Q.qShapeProps _),
      "q_glcm"            -> (Q.qGlcm _),
      "q_classify"        -> (Q.qClassify _),
      "q_mosaic"          -> (Q.qMosaic _),
      "q_image_features"  -> (Q.qImageFeatures _),
      "q_transcode"       -> (Q.qTranscode _),
      "q_clip_poly"       -> (Q.qClipPoly _),
      "q_geojson"         -> (Q.qGeoJson _),
      "q_cell_index"      -> (Q.qCellIndex _),
      "q_s2_index"        -> (Q.qS2Index _),
      "q_phash_pairs"     -> (Q.qPhashPairs _),
      "q_image_dedup"     -> (Q.qImageDedup _),
      // round 3: oracle rows for the previously spec-only ops
      "q_clip_raster"     -> (Q.qClipRaster _),
      "q_template_match"  -> (Q.qTemplateMatch _),
      "q_stat_comp"       -> (Q.qStatComp _),
      "q_mask_equals"     -> (Q.qMaskEquals _),
      "q_otsu"            -> (Q.qOtsu _),
      "q_buffer"          -> (Q.qBuffer _),
      "q_zonal_point_stack" -> (Q.qZonalPointStack _),
      "q_fid"             -> (Q.qFid _),
      "q_clip_concave"    -> (Q.qClipConcave _),
      "q_windowed"        -> (Q.qWindowed _),
      "q_sessions"        -> (Q.qSessions _),
      "q_frame_sample"    -> (Q.qFrameSample _),
      // round 4: the streamed-image ingest path (micro-batch delta fold)
      // and the geodesic (great-circle) kNN entry point
      "q_image_stream"    -> (Q.qImageStream _),
      "q_knn_geo"         -> (Q.qKnnGeo _),
      "q_pip_geo"         -> (Q.qPipGeo _),
      "q_dedup_clusters"  -> (Q.qDedupClusters _),
      // round 4b: the Hough/RANSAC/snakes segmentation family
      "q_canny"           -> (Q.qCanny _),
      "q_hough"           -> (Q.qHough _),
      "q_hough_seg"       -> (Q.qHoughSeg _),
      "q_ransac"          -> (Q.qRansac _),
      "q_snake"           -> (Q.qSnake _),
      "q_snake_gac"       -> (Q.qSnakeGac _),
      "q_snake_buf"       -> (Q.qSnakeBuf _),
      "q_kass"            -> (Q.qKass _),
      // round 4c: the CNN inference + chip-collection family
      "q_cnn_seg"         -> (Q.qCnnSeg _),
      "q_cnn_chip"        -> (Q.qCnnChip _),
      "q_chips"           -> (Q.qChips _),
      "q_maskblock"       -> (Q.qMaskBlock _),
      "q_seg_fit"         -> (Q.qSegFit _),
      "q_prob"            -> (Q.qProb _),
      "q_thresh_seg"      -> (Q.qThreshSeg _),
      "q_extent"          -> (Q.qExtent _),
      "q_pixel_bbox"      -> (Q.qPixelBbox _),
      "q_mesh_px"         -> (Q.qMeshPx _),
      "q_meshgrid"        -> (Q.qMeshGrid _),
      "q_rag"             -> (Q.qRag _),
      "q_toposnake"       -> (Q.qTopoSnake _),
      "q_toposeg"         -> (Q.qTopoSeg _)
    )
  }

  /** DuckDB SQL oracles, same column names/types as the Spark results. */
  def oracleSql: Map[String, String] = {
    val Q = graft.queries.Queries
    Map(
      "q_zonal_box_stats" -> Q.qZonalBoxStatsSql,
      "q_zonal_frac"      -> Q.qZonalFracSql,
      "q_zonal_point"     -> Q.qZonalPointSql,
      "q_zonal_more_stats" -> Q.qZonalMoreStatsSql,
      "q_knn"             -> Q.qKnnSql,
      "q_knn_hex"         -> Q.qKnnHexSql,
      "q_mask_rules"      -> Q.qMaskRulesSql,
      "q_combine_scene"   -> Q.qCombineSceneSql,
      "q_temporal_comp"   -> Q.qTemporalCompSql,
      "q_hist_ecdf"       -> Q.qHistEcdfSql,
      "q_hist_match"      -> Q.qHistMatchSql,
      "q_rgb_indices"     -> Q.qRgbIndicesSql,
      "q_rmse"            -> Q.qRmseSql,
      "q_confusion"       -> Q.qConfusionSql,
      "q_entropy"         -> Q.qEntropySql,
      "q_tokens"          -> Q.qTokensSql,
      "q_dedup_exact"     -> Q.qDedupExactSql,
      "q_jaccard_pairs"   -> Q.qJaccardPairsSql,
      "q_text_quality"    -> Q.qTextQualitySql,
      "q_lang_predict"    -> Q.qLangPredictSql,
      "q_pipeline_zonal"  -> Q.qPipelineZonalSql,
      "q_raster_points"   -> Q.qRasterPointsSql,
      "q_mosaic"          -> Q.qMosaicSql,
      "q_image_features"  -> Q.qImageFeaturesSql,
      "q_transcode"       -> Q.qTranscodeSql,
      "q_polygonize"      -> Q.qPolygonizeSql,
      "q_glcm"            -> Q.qGlcmSql,
      "q_classify"        -> Q.qClassifySql,
      "q_cell_index"      -> Q.qCellIndexSql,
      "q_shape_props"     -> Q.qShapePropsSql,
      "q_geojson"         -> Q.qGeoJsonSql,
      "q_clip_poly"       -> Q.qClipPolySql,
      "q_phash_pairs"     -> Q.qPhashPairsSql,
      "q_image_dedup"     -> Q.qImageDedupSql,
      "q_ann_topk"        -> Q.qAnnTopKSql,
      "q_ann_lsh"         -> Q.qAnnLshSql,
      "q_ann_ivf"         -> Q.qAnnIvfSql,
      "q_zonal_rgb"       -> Q.qZonalRgbSql,
      "q_s2_index"        -> Q.qS2IndexSql,
      "q_minhash_pairs"   -> Q.qMinhashPairsSql,
      "q_simhash_pairs"   -> Q.qSimhashPairsSql,
      "q_fingerprint"     -> Q.qFingerprintSql,
      "q_dem"             -> Q.qDemSql,
      "q_local_threshold" -> Q.qLocalThresholdSql,
      "q_convolve"        -> Q.qConvolveSql,
      "q_resize"          -> Q.qResizeSql,
      "q_quegan"          -> Q.qQueganSql,
      "q_morphology"      -> Q.qMorphologySql,
      "q_classify_object" -> Q.qClassifyObjectSql,
      "q_assemble"        -> Q.qAssembleSql,
      "q_rasterize"       -> Q.qRasterizeSql,
      "q_combine_grid"    -> Q.qCombineGridSql,
      "q_ndvi"            -> Q.qNdviSql,
      "q_clip_raster"     -> Q.qClipRasterSql,
      "q_template_match"  -> Q.qTemplateMatchSql,
      "q_stat_comp"       -> Q.qStatCompSql,
      "q_mask_equals"     -> Q.qMaskEqualsSql,
      "q_otsu"            -> Q.qOtsuSql,
      "q_buffer"          -> Q.qBufferSql,
      "q_zonal_point_stack" -> Q.qZonalPointStackSql,
      "q_fid"             -> Q.qFidSql,
      "q_clip_concave"    -> Q.qClipConcaveSql,
      "q_windowed"        -> Q.qWindowedSql,
      "q_sessions"        -> Q.qSessionsSql,
      "q_frame_sample"    -> Q.qFrameSampleSql,
      "q_image_stream"    -> Q.qImageStreamSql,
      "q_knn_geo"         -> Q.qKnnGeoSql,
      "q_pip_geo"         -> Q.qPipGeoSql,
      "q_dedup_clusters"  -> Q.qDedupClustersSql,
      "q_canny"           -> Q.qCannySql,
      "q_hough"           -> Q.qHoughSql,
      "q_hough_seg"       -> Q.qHoughSegSql,
      "q_ransac"          -> Q.qRansacSql,
      "q_snake"           -> Q.qSnakeSql,
      "q_snake_gac"       -> Q.qSnakeGacSql,
      "q_snake_buf"       -> Q.qSnakeBufSql,
      "q_kass"            -> Q.qKassSql,
      "q_cnn_seg"         -> Q.qCnnSegSql,
      "q_cnn_chip"        -> Q.qCnnChipSql,
      "q_chips"           -> Q.qChipsSql,
      "q_maskblock"       -> Q.qMaskBlockSql,
      "q_seg_fit"         -> Q.qSegFitSql,
      "q_prob"            -> Q.qProbSql,
      "q_thresh_seg"      -> Q.qThreshSegSql,
      "q_extent"          -> Q.qExtentSql,
      "q_pixel_bbox"      -> Q.qPixelBboxSql,
      "q_mesh_px"         -> Q.qMeshPxSql,
      "q_meshgrid"        -> Q.qMeshGridSql,
      "q_rag"             -> Q.qRagSql,
      "q_toposnake"       -> Q.qTopoSnakeSql,
      "q_toposeg"         -> Q.qTopoSegSql
    )
  }
}
