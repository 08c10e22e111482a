package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.PixelCodec
import graft.gen.GridImages
import graft.operators.Gif

/** multiband2gif (raster.py:2665-2726): rescale_intensity parity,
  * lossless 8-bit roundtrip through the JDK GIF plugin, and the
  * duration/loop containers imageio.mimsave controls. */
class GifSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bytescale: skimage rescale_intensity semantics") {
    // ramp 0..96 -> floor(v/96*255); both ends exact
    val ramp = Array.tabulate(97)(_.toFloat)
    val out = Gif.bytescale(ramp)
    assert(out(0) == 0 && out(96) == 255)
    assert(out(48) == math.floor(48.0 / 96.0 * 255.0).toInt)
    // constant band: skimage's imin == imax guard clips RAW values
    assert(Gif.bytescale(Array.fill(4)(7.6f)).forall(_ == 7))
    assert(Gif.bytescale(Array.fill(4)(300f)).forall(_ == 255))
    assert(Gif.bytescale(Array.fill(4)(-3f)).forall(_ == 0))
  }

  test("encode/decode roundtrip is bit-exact; frame order = band order") {
    val w = 23; val h = 11
    val frames = Seq.tabulate(3)(b =>
      Array.tabulate(w * h)(p => (p * 31 + b * 97) % 256))
    val gif = Gif.encode(frames, w, h, delayCs = 100, loop = 0)
    // container signature + animation blocks present in the bytes
    val s = new String(gif.take(6), "US-ASCII")
    assert(s == "GIF89a" || s == "GIF87a")
    assert(new String(gif, "ISO-8859-1").contains("NETSCAPE2.0"))
    val (back, bw, bh) = Gif.decodeFrames(gif)
    assert((bw, bh) == ((w, h)) && back.length == 3)
    for (b <- 0 until 3) assert(back(b).sameElements(frames(b)), s"frame $b")
  }

  test("multibandGif: one row per image, decoded frames == bytescaled bands") {
    val imgs = spark.createDataset(GridImages.images(2, 2).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val rows = Gif.multibandGif(imgs).collect()
    assert(rows.length == 2)
    val src = GridImages.images(2, 2).map(i => i.image_id -> i).toMap
    for (r <- rows) {
      val im = src(r.getString(0))
      assert(r.getInt(2) == 2 && r.getInt(3) == im.w && r.getInt(4) == im.h)
      val dec = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h)
      val (frames, _, _) = Gif.decodeFrames(r.getAs[Array[Byte]](1))
      for (b <- 0 until 2)
        assert(frames(b).sameElements(Gif.bytescale(dec.bands(b))), s"band $b")
    }
  }
}
