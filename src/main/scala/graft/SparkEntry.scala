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
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
