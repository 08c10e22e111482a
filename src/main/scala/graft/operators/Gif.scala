package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.ImageRow
import graft.core.PixelCodec

/**
 * multiband2gif (raster.py:2665-2726): one animated-GIF frame per band,
 * each band rescaled to uint8 exactly as skimage's
 * `rescale_intensity(img, out_range='uint8')` does it, with imageio
 * `mimsave(duration, loop)` mapped onto the GIF containers they control:
 * `duration` (seconds/frame) -> the Graphic Control Extension delay
 * (centiseconds), `loop` -> the NETSCAPE2.0 application-extension loop
 * count (0 = forever in both).
 *
 * The reference also stamps the band number onto each frame with a
 * hard-coded system TTF path (raster.py:2714) — that overlay is a
 * visualization frill on the same footing as the matplotlib handyplots
 * (the documented delegated-visualization boundary); the
 * data-processing core reproduced here is rescale + animate.
 *
 * Execution shape: per-row map, ZERO shuffle at any scale — each image's
 * bands are decoded, rescaled and GIF-encoded inside its own row, the
 * opaque-binary multimodal column pattern. Encoding uses only the JDK's
 * javax.imageio GIF plugin with an EXPLICIT 256-gray palette
 * (TYPE_BYTE_INDEXED), so the 8-bit roundtrip is lossless by
 * construction — `decodeFrames` recovers every frame bit-exactly, which
 * is what the q_gif oracle checks end-to-end.
 */
object Gif {

  /** skimage `rescale_intensity(band, out_range='uint8')`, in_range from
    * the data (exposure.py): non-constant bands map (mn, mx) -> (0, 255)
    * with the numpy float->uint8 cast's truncation toward zero (values
    * are non-negative after scaling, so floor == trunc); a CONSTANT band
    * skips the rescale and is clipped to [0, 255] raw — skimage's
    * `imin != imax` guard, not a map-to-zero. Double math throughout in
    * the same operation order the oracle SQL replays. */
  def bytescale(band: Array[Float]): Array[Int] = {
    var mn = Double.MaxValue; var mx = Double.MinValue
    band.foreach { v => if (v < mn) mn = v; if (v > mx) mx = v }
    if (mn == mx)
      band.map(v => math.floor(math.min(math.max(v.toDouble, 0.0), 255.0)).toInt)
    else
      band.map(v => math.floor(((v - mn) / (mx - mn)) * 255.0).toInt)
  }

  private def grayPalette: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  private def childNode(root: IIOMetadataNode, name: String): IIOMetadataNode = {
    var i = 0
    while (i < root.getLength) {
      val n = root.item(i)
      if (n.getNodeName == name) return n.asInstanceOf[IIOMetadataNode]
      i += 1
    }
    val n = new IIOMetadataNode(name)
    root.appendChild(n)
    n
  }

  /** Animated GIF from row-major uint8 frames (values 0-255), all w*h.
    * delayCs = GCE delay in centiseconds (imageio duration*100);
    * loop = NETSCAPE2.0 loop count, 0 = forever. */
  def encode(frames: Seq[Array[Int]], w: Int, h: Int,
             delayCs: Int, loop: Int): Array[Byte] = {
    require(frames.nonEmpty, "encode: no frames")
    require(frames.forall(_.length == w * h),
      s"encode: every frame must be ${w}x$h row-major")
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.zipWithIndex.foreach { case (f, idx) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED,
        grayPalette)
      img.getRaster.setSamples(0, 0, w, h, 0, f)
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = childNode(root, "GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      if (idx == 0) {
        // NETSCAPE2.0 block: sub-block id 1 + little-endian loop count
        val app = new IIOMetadataNode("ApplicationExtension")
        app.setAttribute("applicationID", "NETSCAPE")
        app.setAttribute("authenticationCode", "2.0")
        app.setUserObject(Array[Byte](1, (loop & 0xFF).toByte,
          ((loop >> 8) & 0xFF).toByte))
        childNode(root, "ApplicationExtensions").appendChild(app)
      }
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** All frames of a GIF back as row-major uint8 arrays + (w, h).
    * The gray palette writes r == g == b == index, so the low byte of
    * any channel is the original sample. */
  def decodeFrames(bytes: Array[Byte]): (Seq[Array[Int]], Int, Int) = {
    val reader = ImageIO.getImageReadersBySuffix("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    reader.setInput(iis, false, false)
    val n = reader.getNumImages(true)
    require(n > 0, "decodeFrames: empty GIF")
    val first = reader.read(0)
    val w = first.getWidth; val h = first.getHeight
    val frames = (0 until n).map { i =>
      val img = if (i == 0) first else reader.read(i)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xFF; x += 1 }
        y += 1
      }
      out
    }
    reader.dispose()
    iis.close()
    (frames, w, h)
  }

  /** The operator: one GIF per image, one frame per band, frame order =
    * band order. duration/loop as in imageio.mimsave (reference call
    * raster.py:2694: duration=1, loop=0). Output one row per image:
    * (image_id, gif, n_frames, w, h). */
  def multibandGif(images: Dataset[ImageRow], durationSec: Double = 1.0,
                   loop: Int = 0)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val delayCs = math.round(durationSec * 100).toInt
    images.map { im =>
      val dec = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h)
      val gif = encode(dec.bands.toSeq.map(bytescale), im.w, im.h,
        delayCs, loop)
      (im.image_id, gif, dec.bands.length, im.w, im.h)
    }.toDF("image_id", "gif", "n_frames", "w", "h")
  }
}
