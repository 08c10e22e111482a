package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Components
import graft.text.TextOps

/** Components.connected vs a naive driver-side union-find, across graph
  * shapes chosen to stress the alternating-star algorithm: chains (worst
  * case for plain label propagation), stars, rings, disjoint mixtures,
  * duplicate/reversed/self-loop edges, and seeded random graphs. */
class ComponentsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Naive union-find ground truth: component = min id, as strings. */
  private def naive(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress everything, then min id per root
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(String, String)]): Map[String, String] =
    Components.connected(edges.toDF("a", "b"), "a", "b")
      .as[(String, String)].collect().toMap

  test("chain, star, ring, disjoint mixture == union-find") {
    val chain = (0 until 40).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
    val star = (1 until 15).map(i => (f"s$i%03d", "s000"))
    val ring = (0 until 12).map(i => (f"r$i%02d", f"r${(i + 1) % 12}%02d"))
    val edges = chain ++ star ++ ring ++ Seq(("x1", "x2"))
    assert(run(edges) == naive(edges))
  }

  test("duplicate, reversed and self-loop edges are tolerated") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "b"),
                    ("c", "c"), ("c", "d"), ("d", "e"))
    val got = run(edges)
    assert(got == naive(edges))
    assert(got("e") == "c" && got("a") == "a" && got("b") == "a")
  }

  test("connectedRoots: non-root map only; coalesce over nodes == connected") {
    val chain = (0 until 25).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
    val edges = chain ++ Seq(("x1", "x2"), ("x2", "x3"), ("y1", "y2"))
    val want = naive(edges)
    val roots = Components.connectedRoots(edges.toDF("a", "b"), "a", "b")
      .as[(String, String)].collect().toMap
    // every non-root maps to its component min; roots carry NO row —
    // the dedupClusters coalesce contract
    assert(roots.keySet == want.keySet.filterNot(n => want(n) == n))
    roots.foreach { case (id, c) => assert(want(id) == c, id) }
  }

  test("seeded random graphs == union-find") {
    for (seed <- Seq(7, 41, 1234)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(260)(
        (f"n${rng.nextInt(180)}%03d", f"n${rng.nextInt(180)}%03d"))
        .filter(e => e._1 != e._2)
      assert(run(edges) == naive(edges), s"seed $seed")
    }
  }

  test("4096-node chain converges within the round bound (log, not diameter)") {
    // plain min-label propagation would need 4096 rounds; the
    // alternating-star fixpoint must land far under the 64-round guard.
    val chain = (0 until 4095).map(i => (f"v$i%04d", f"v${i + 1}%04d"))
    val got = run(chain)
    assert(got.size == 4096 && got.values.forall(_ == "v0000"))
  }

  test("empty edge list yields an empty result") {
    assert(run(Seq.empty).isEmpty)
  }

  test("image keep-one: dedupClusters composes with phashPairs (i1/i2 cols)") {
    // planted phash chain at radius 2: A~B (2 bits), B~C (2 bits) but
    // A-C is 4 bits apart so that pair is NOT emitted -> transitive
    // closure must still collapse {A,B,C} to one keeper.
    val imgs = graft.gen.GridImages.images(4, bands = 1)
    val hashes = Map(0 -> 0L, 1 -> 3L, 2 -> 15L, 3 -> 0xF0F0L) // D isolated
    val ds = spark.createDataset(imgs.zipWithIndex.map { case (im, i) =>
      im.copy(image_id = s"im$i", phash = hashes(i))
    }.toSeq)(org.apache.spark.sql.Encoders.product[graft.ImageRow])
    val pairs = graft.operators.ImageDedup.phashPairs(ds, maxHamming = 2)
    val p = pairs.select("i1", "i2").as[(String, String)].collect().toSet
    assert(p == Set(("im0", "im1"), ("im1", "im2"))) // no direct im0-im2
    val got = TextOps.dedupClusters(ds.select("image_id"), "image_id",
        pairs, aCol = "i1", bCol = "i2")
      .as[(String, String)].collect().toMap
    assert(got == Map("im0" -> "im0", "im1" -> "im0",
                      "im2" -> "im0", "im3" -> "im3"))
  }

  test("dedupClusters: transitive closure + singleton identity mapping") {
    // A~B, B~C (A,C never paired) must collapse to one survivor; D is
    // in no pair and maps to itself.
    val docs = Seq("dA", "dB", "dC", "dD").toDF("doc_id")
    val pairs = Seq(("dA", "dB"), ("dB", "dC")).toDF("d1", "d2")
    val got = TextOps.dedupClusters(docs, "doc_id", pairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("dA" -> "dA", "dB" -> "dA", "dC" -> "dA", "dD" -> "dD"))
  }
}
