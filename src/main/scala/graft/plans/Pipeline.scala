package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ImageRow, PolyRow}
import graft.operators.{Tiler, ZonalStats}

/**
 * The checkpoint-resumable flagship pipeline (north rule: "all stages
 * checkpoint to snapshot-tagged state so a killed job resumes
 * per-partition with lineage and row-count/byte metrics").
 *
 * The image table is processed in shards (partition key = shard id
 * derived from image_id — at 10^12-image scale this is the ingest-shard
 * column). Each shard runs the full decode -> tile -> broadcast join ->
 * PIP -> histogram slice and commits its histogram rows to a
 * SnapshotTable keyed by shard. A killed run leaves a manifest covering
 * the finished shards only; `run` derives pending work by anti-joining
 * the shard list against the manifest and processes just that. Final
 * stats read the committed table.
 *
 * Idempotence: SnapshotTable.commit drops already-committed shard rows,
 * so overlapping re-runs cannot double-count.
 */
object Pipeline {

  def shardOf(imageId: String, nShards: Int): String =
    s"s${math.floorMod(imageId.hashCode, nShards)}"

  /** Process all pending shards in batches of `batchShards` — ONE Spark
    * job (and one manifest publish) per batch rather than per shard, so
    * a 10^5-shard backlog doesn't pay 10^5 job/commit round-trips. The
    * manifest stays per-shard (resume granularity unchanged); only the
    * in-flight batch is lost on a crash. Returns shards processed. */
  def run(images: Dataset[ImageRow], polys: Dataset[PolyRow],
          table: SnapshotTable, nShards: Int, tileSize: Int, cellRes: Int,
          failAfterShards: Int = Int.MaxValue, batchShards: Int = 16)
         (implicit spark: SparkSession): Set[String] = {
    import spark.implicits._
    val allShards = (0 until nShards).map(i => s"s$i")
    val pending = table.pending(allShards)
    var done = Set.empty[String]
    var started = 0
    for (batch <- pending.grouped(math.max(1, batchShards))) {
      if (started >= failAfterShards)
        throw new RuntimeException(s"injected failure before shard ${batch.head}")
      started += batch.size
      // per-shard sub-histograms union into one commit: with a
      // shard-partitioned image table each filter prunes to its own
      // files, so the union is one pass over the batch's data
      val hist = batch.map { shard =>
        val shardImages = images.filter(img => shardOf(img.image_id, nShards) == shard)
        ZonalStats.histogram(Tiler.tiles(shardImages, tileSize, cellRes), polys, cellRes)
          .withColumn("shard", lit(shard))
      }.reduce(_.unionByName(_))
      done ++= table.commit(hist, writer = s"pipeline-${batch.mkString("+")}",
        declaredKeys = batch.toSet) // empty shard results still complete
    }
    done
  }

  /** Zonal stats over everything committed so far. */
  def stats(table: SnapshotTable): DataFrame = {
    val hist = table.read()
      .groupBy("poly_id", "band", "value").agg(sum("cnt").as("cnt"))
    ZonalStats.stats(hist)
  }
}
