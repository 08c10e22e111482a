package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.gen.GridImages
import graft.operators.Rag

class RagSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark

  test("mergeHierarchical: count-weighted mean recomputation decides") {
    // A-B weak (w=1); A-C w=10 count 2; B-C w=40 count 6.
    // After A+B: (AB)-C = (10*2 + 40*6)/8 = 32.5
    val edges = Seq((1L, 2L, 2.0, 2L), (1L, 3L, 20.0, 2L), (2L, 3L, 240.0, 6L))
    // thresh 30: A+B merge (1 < 30); combined 32.5 >= 30 -> C survives
    val m1 = Rag.mergeHierarchical(edges, thresh = 30.0)
    assert(m1(1L) == 1L && m1(2L) == 1L && m1(3L) == 3L)
    // thresh 40: combined 32.5 < 40 -> all merge to 1
    val m2 = Rag.mergeHierarchical(edges, thresh = 40.0)
    assert(m2(1L) == 1L && m2(2L) == 1L && m2(3L) == 1L)
    // thresh 0.5: nothing merges
    val m3 = Rag.mergeHierarchical(edges, thresh = 0.5)
    assert(m3 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("mergeHierarchical: chain merges cascade in min-weight order") {
    val edges = Seq((1L, 2L, 5.0, 1L), (2L, 3L, 8.0, 1L), (3L, 4L, 100.0, 1L))
    val m = Rag.mergeHierarchical(edges, thresh = 50.0)
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L && m(4L) == 4L)
  }

  test("buildBoundary: straight-edge weights match the Sobel step closed form") {
    val segs = spark.createDataset(GridImages.ragSegImages(2).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val imgs = spark.createDataset(GridImages.ragImages(2).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val rag = Rag.buildBoundary(segs, imgs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3) / r.getLong(4)))
      .toMap
    // image 0 (even): A|B step = 2 -> interior pair endpoints are 8;
    // junction rows add bounded cross terms. Weight must sit in (8, 100)
    val wAB = rag(("g000", 1L, 2L))
    assert(wAB > 7.9 && wAB < 40, s"wAB=$wAB")
    val wAC = rag(("g000", 1L, 3L))
    assert(wAC > 10 && wAC < 100, s"wAC=$wAC") // step 5 -> ~20
    // image 1 (odd): C=150 -> both C edges far above thresh
    assert(rag(("g001", 1L, 3L)) > 100 && rag(("g001", 2L, 3L)) > 100)
  }

  test("ragMerge end-to-end: even images fully merge, odd keep the bottom") {
    val segs = spark.createDataset(GridImages.ragSegImages(4).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val imgs = spark.createDataset(GridImages.ragImages(4).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val out = Rag.ragMerge(segs, imgs, thresh = 100.0).collect()
      .groupBy(r => (r.getString(0), r.getLong(3)))
      .view.mapValues(_.length).toMap
    for (i <- 0 until 4) {
      val id = f"g$i%03d"
      if (i % 2 == 0) assert(out((id, 1L)) == 80 * 48 && !out.contains((id, 3L)))
      else {
        val sy = GridImages.ragSplitY(i.toLong)
        assert(out((id, 1L)) == 80 * sy)
        assert(out((id, 3L)) == 80 * (48 - sy))
      }
    }
  }
}
