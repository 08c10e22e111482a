package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ImageRow

/**
 * Image near-duplicate detection over the 64-bit perceptual hash column
 * (the image-payload counterpart of the text dedup family): pigeonhole
 * chunk blocking sized to the requested radius (TextOps.hammingPairs)
 * guarantees full recall at that radius; candidates verify with
 * bit_count(xor). Exact duplicates (re-encodes, lossy round-trips) land
 * at distance 0 because phash is computed from DECODED pixels.
 *
 * Scale: never a cross join — candidate pairs only materialize inside a
 * (chunk, value) bucket, the same shuffle shape as the text LSH paths.
 */
object ImageDedup {

  def phashPairs(images: Dataset[ImageRow], maxHamming: Int = 3)
                (implicit spark: SparkSession): DataFrame =
    graft.text.TextOps.hammingPairs(
      images.toDF().select(col("image_id"), col("phash")),
      "image_id", "phash", maxHamming)
      .withColumnRenamed("d1", "i1").withColumnRenamed("d2", "i2")

  /** Exact image dedup: group by (w, h, phash) then confirm byte-equality
    * of DECODED pixels within the tiny groups (fmt-independent — a raw-le
    * and an rle encoding of the same pixels deduplicate). */
  def dedupExact(images: Dataset[ImageRow])
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    images.groupByKey(i => (i.w, i.h, i.phash))
      .flatMapGroups { (_: (Int, Int, Long), it: Iterator[ImageRow]) =>
        val group = it.toArray
        if (group.length == 1) Iterator((group(0).image_id, 1L))
        else {
          // confirm with decoded ALL-band equality (lossless fmts exact;
          // lossy grouped only with themselves via phash+dims) — phash
          // reads only band 0, so band 0 alone would falsely merge
          // multi-band images that differ in a later band
          val decoded = group.map { g =>
            (g, graft.core.PixelCodec.decode(g.bytes, g.fmt, g.w, g.h)
              .bands.map(_.toSeq).toSeq)
          }
          decoded.groupBy(_._2).valuesIterator.map { dup =>
            (dup.map(_._1.image_id).min, dup.length.toLong)
          }
        }
      }.toDF("keep_id", "n_dups")
  }
}
