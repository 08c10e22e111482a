package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an undirected edge list — the
 * final stage of every near-duplicate pipeline (a training-data-pipeline
 * op beyond the reference's own surface, like the rest of the dedup
 * family): MinHash/SimHash/pHash candidate PAIRS become transitive
 * CLUSTERS, and each document keeps one canonical representative (the
 * minimum id of its component).
 *
 * Algorithm: alternating large-star / small-star (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", ACM SoCC 2014 — a
 * published MapReduce algorithm, re-expressed relationally). Each half
 * round is a groupBy + an equi-join on the node id; the edge set only
 * ever shrinks toward stars, so the shuffle is bounded by the CURRENT
 * edge count — never quadratic in cluster size — and convergence takes
 * O(log^2 n) rounds (empirically ~log n). That is what makes this the
 * 100 TB path: naive min-label propagation needs O(diameter) rounds
 * (a pathological duplicate chain = thousands), while this pointer-
 * doubling variant collapses a 4096-node chain in a handful.
 *
 * Determinism: ids keep their NATIVE type and ordering (long ids
 * numerically; string ids via Spark UTF8String binary order == DuckDB
 * varchar memcmp), no nondeterministic expressions, so the result is
 * oracle-replayable by a recursive CTE.
 *
 * Iteration state is `localCheckpoint`ed each round to truncate the
 * growing lineage (same pattern a cluster job would use with a
 * checkpoint dir); the previous round's cache is released eagerly.
 */
object Components {

  /** Connected components of the undirected graph given by `edges`.
    * Returns one row per DISTINCT node appearing in any edge:
    * (id, component) where component = min node id of its component.
    * Self-loops and duplicate/reversed edges are tolerated. Isolated
    * nodes never appear in an edge list; callers map them to
    * themselves (see [[graft.text.TextOps.dedupClusters]]).
    *
    * @param maxRounds fail-fast bound on large+small star rounds; the
    *   O(log^2 n) guarantee makes 64 unreachable for any realistic
    *   graph (a 4096-node chain converges in < 10). */
  def connected(edges: DataFrame, srcCol: String, dstCol: String,
                maxRounds: Int = 64): DataFrame = {
    val eInit = initEdges(edges, srcCol, dstCol)
    // checkpoint the (small) distinct node list NOW, off the edge
    // checkpoint — the final join reads it, so the (large) initial edge
    // set is free to unpersist after round 1 instead of pinning peak
    // storage through all O(log n) rounds, and the un-checkpointed e0
    // plan never re-runs. (This eager job caches eInit's partitions but
    // does NOT finalize its checkpoint — doCheckpoint stops at the
    // first marked RDD, and checkpointAllMarkedAncestors is off by
    // default; the checksum(e) job below is what finalizes eInit, so it
    // must keep running before round 1.) explode, not a self-union: a
    // union of two
    // slim projections of one checkpointed relation trips Spark's
    // Union.rewriteConstraints ("key not found" on the dropped
    // attribute) because the checkpoint carries constraints over BOTH
    // columns — and the explode scans the edges once, not twice.
    val nodes =
      if (eInit.sparkSession.sparkContext.getCheckpointDir.isDefined)
        eInit.select(explode(array(col("u"), col("v"))).as("id"))
          .distinct().checkpoint()
      else
        eInit.select(explode(array(col("u"), col("v"))).as("id"))
          .distinct().localCheckpoint()
    nodes.join(starRoots(eInit, maxRounds), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** The star-fixpoint ROOT MAP alone: (id, component) for every
    * NON-ROOT node appearing in an edge; a component's root (= min id)
    * carries no row and maps to itself via the caller's coalesce.
    * Exactly [[connected]] minus the node-list expansion and the final
    * nodes-join — for callers that LEFT-join the result against their
    * own id universe anyway (the dedup keep-one stage), where the
    * expansion is a redundant extra pass over the edges plus a join. */
  def connectedRoots(edges: DataFrame, srcCol: String, dstCol: String,
                     maxRounds: Int = 64): DataFrame =
    starRoots(initEdges(edges, srcCol, dstCol), maxRounds)

  /** Canonical edge relation (u, v): null-free, self-loop-free,
    * distinct, lineage-truncated (see truncate note below). */
  private def initEdges(edges: DataFrame, srcCol: String,
                        dstCol: String): DataFrame = {
    val e0 = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()

    // LAZY checkpoint: the Dataset's plan is truncated to a LogicalRDD
    // either way; with eager=false the RDD materializes (and
    // checkpoints) under the FIRST action that reads it — here the
    // checksum aggregate that immediately follows — so a round skips
    // the separate checkpoint-count job (measured: a few jobs saved per
    // query, wall-neutral at bench scale; identical results).
    //
    // RELIABLE vs LOCAL: localCheckpoint stores blocks unreplicated on
    // executors — after truncation an executor loss is unrecoverable
    // and aborts the whole multi-round job. local[*] never loses an
    // executor; a cluster deployment MUST set a checkpoint dir
    // (sc.setCheckpointDir) and then every truncation here rides the
    // fault-tolerant path instead.
    truncate(e0)
  }

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(false)
    else df.localCheckpoint(false)

  /** Alternating large/small-star rounds to the fixpoint; returns the
    * root map (id, component) over the final star edges. */
  private def starRoots(eInit: DataFrame, maxRounds: Int): DataFrame = {
    var e = eInit
    var prevSig: (Long, Long) = checksum(e)
    var converged = prevSig._1 == 0L // empty graph: nothing to iterate
    var rounds = 0
    while (!converged) {
      require(rounds < maxRounds,
        s"Components.connected did not converge in $maxRounds rounds")
      val next = truncate(smallStar(largeStar(e)))
      val sig = checksum(next) // the materializing action for `next`
      // (count, order-free xxhash sum) equality is the cheap convergence
      // probe; on a hit, confirm exactly (runs once, at the fixpoint).
      converged = sig == prevSig && next.exceptAll(e).isEmpty
      e.unpersist()
      e = next
      prevSig = sig
      rounds += 1
    }

    // At the fixpoint the edge set is a union of stars: every non-root
    // node carries exactly (node -> root). min() is belt and braces.
    e.groupBy(col("u").as("id")).agg(min("v").as("component"))
  }

  /** Large-star: every node links its LARGER neighbors to the minimum
    * of its neighborhood (incl. itself). One groupBy + one join, both
    * keyed on the node id — AQE-splittable if a hub node skews it.
    * Undirection via explode (one scan, two rows/edge), not a
    * self-union — see the constraint-rewrite note in connected(). */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(explode(array(
        struct(col("u").as("s"), col("v").as("t")),
        struct(col("v").as("s"), col("u").as("t")))).as("e"))
      .select(col("e.s").as("u"), col("e.t").as("v"))
    val mins = und.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    und.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
    // NO distinct here (round 6): smallStar's output is invariant to
    // duplicate input edges — its min-aggregate ignores multiplicity and
    // its own trailing distinct canonicalizes — so deduping between the
    // stars only bought an extra full exchange per round. The round's
    // canonical (checksummed) edge set is still smallStar's distinct
    // output, identical with or without this dedup.
  }

  /** Small-star: orient edges large->small; every node links its
    * smaller neighbors (and itself) to the minimum smaller neighbor.
    * The (u, m) self-link rides the join rows via explode instead of a
    * second union branch (dedup by the existing distinct). */
  private def smallStar(e: DataFrame): DataFrame = {
    val ori = e.select(greatest(col("u"), col("v")).as("u"),
                       least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val mins = ori.groupBy("u").agg(min("v").as("m"))
    ori.join(mins, "u")
      .select(explode(array(col("v"), col("u"))).as("a"), col("m"))
      .where(col("a") =!= col("m"))
      .select(col("a").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Order-insensitive edge-set signature: (count, XOR of row hashes) —
    * XOR, not sum, so ANSI overflow checking never trips. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
