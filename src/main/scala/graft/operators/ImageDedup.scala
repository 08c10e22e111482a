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

  /** Exact image dedup: group by (w, h, phash) then confirm equality of
    * the DECODED all-band pixels within each group (fmt-independent — a
    * raw-le and an rle encoding of the same pixels deduplicate; phash
    * reads only band 0, so band 0 alone would falsely merge multi-band
    * images that differ in a later band).
    *
    * Scale shape: each group member is decoded ONE at a time into a
    * 128-bit digest of its floatToIntBits stream (same equality class
    * as the boxed-Float compare it replaces: all NaNs collapse, +0/-0
    * stay distinct), so per-group memory is one decoded image plus 16
    * bytes per member — never the whole group's pixels at once. A
    * web-scale corpus puts millions of copies of a common placeholder
    * frame into ONE (w, h, phash) group; `maxGroup` fail-fasts that
    * single-task hot spot (like Rag's maxEdges and iterFit's
    * maxPointsPerImage) instead of letting one straggler decode a
    * million images. Dedup-by-digest is exact up to MD5 collision
    * WITHIN a same-(w,h,phash) group — not a realistic failure mode. */
  def dedupExact(images: Dataset[ImageRow], maxGroup: Int = 1 << 16)
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    images.groupByKey(i => (i.w, i.h, i.phash))
      .flatMapGroups { (k: (Int, Int, Long), it: Iterator[ImageRow]) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Byte])]
        while (it.hasNext) {
          val g = it.next()
          require(buf.length < maxGroup,
            s"dedup_exact group (w=${k._1}, h=${k._2}, phash=${k._3}) " +
              s"exceeds $maxGroup images — pre-shard or raise maxGroup")
          val dec = graft.core.PixelCodec.decode(g.bytes, g.fmt, g.w, g.h)
          val md = java.security.MessageDigest.getInstance("MD5")
          val bb = java.nio.ByteBuffer.allocate(4096)
          dec.bands.foreach { bnd =>
            var i = 0
            while (i < bnd.length) {
              if (bb.remaining() < 4) { md.update(bb.array(), 0, bb.position()); bb.clear() }
              bb.putInt(java.lang.Float.floatToIntBits(bnd(i)))
              i += 1
            }
          }
          md.update(bb.array(), 0, bb.position())
          buf += ((g.image_id, scala.collection.immutable.ArraySeq.unsafeWrapArray(md.digest())))
        }
        if (buf.length == 1) Iterator((buf(0)._1, 1L))
        else buf.groupBy(_._2).valuesIterator.map { dup =>
          (dup.map(_._1).min, dup.length.toLong)
        }
      }.toDF("keep_id", "n_dups")
  }
}
