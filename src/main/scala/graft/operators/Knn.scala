package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.GridIndex
import graft.functions.SpatialFunctions._

/**
 * Exact k-nearest-neighbours join via cell k-ring expansion + distance-
 * sorted window pruning (north rule: "kNN via k-ring expansion with
 * distance-sorted window pruning"; the reference has no kNN — SURVEY
 * §2.3 maps the requirement).
 *
 * Two-phase exactness guarantee:
 *  - Phase 1 joins each query against all points in its Chebyshev
 *    k-ring of radius `r1` at `res` and window-prunes to top-k by
 *    (dist2, pt_id). If the query found >= k candidates AND its kth
 *    squared distance <= (r1 * cellSize)^2, the grid geometry guarantees
 *    no closer point exists outside the ring -> result is exact.
 *  - Queries failing the guarantee (sparse neighbourhoods) fall back to
 *    a brute-force pass — they are few by construction, so the fallback
 *    joins a BROADCAST of just those queries against the point table and
 *    window-prunes the same way. No correctness compromise, bounded cost.
 *
 * Distances are SQUARED and computed as (dx*dx + dy*dy) — IEEE-exact
 * multiplication/addition, so ordering and emitted values are bit-equal
 * across engines (no libm pow/sqrt variance against the DuckDB oracle).
 *
 * Scale: phase 1 is one shuffle-hash join keyed by cell (the k-ring
 * explode multiplies the QUERY side only, by (2*r1+1)^2); the point side
 * partitions by its own cell and never explodes. Skewed dense cells are
 * AQE-splittable since both sides are shuffle-partitioned by cell key.
 *
 * The guarantee check is FULLY RELATIONAL and single-job: the per-query
 * candidate count and kth distance are window aggregates over the SAME
 * q_id partitioning the top-k window already shuffled by, so they add
 * zero exchanges; the good rows and the bad-query set both hang off that
 * one shuffle and Spark's ReuseExchange computes the expensive
 * join+explode subtree ONCE (plan-gated in PlanShapeSpec). No driver
 * round-trip, no literal id lists (round 3's bounded collect ran the
 * whole phase-1 join twice — once for the guard collect, once in the
 * returned plan — and tripled q_knn_hex wall time), no internal persist.
 *
 * Fallback cost: the brute pass always scans the point table once more
 * against a broadcast of the bad queries — usually empty, and a single
 * extra scan is far cheaper than re-running the ring join. If the
 * r1/res choice is so wrong that MOST queries miss the guard, that
 * broadcast is the failure you want: raise r1 (documented user error —
 * the guard exists to keep the common case exact, not to rescue a
 * misconfigured index).
 */
object Knn {

  /** Shared tail: annotate candidates with the per-query guarantee
    * (count == k and kth distance strictly inside the ring), split into
    * guaranteed-exact rows and brute-forced stragglers. Queries with
    * ZERO candidates don't appear in `cand` at all, so the bad set must
    * be derived as NOT-satisfied (anti join), never as filter-of-found.
    * Null-id queries can never match the anti join and always take the
    * brute path (their cand rows are excluded from the good set). */
  private def finishExact(queries: DataFrame, points: DataFrame, k: Int,
                          cand: DataFrame, guard2: Double): DataFrame = {
    val wq = Window.partitionBy("q_id")
    // STRICT < on the kth distance: a point outside the ring at distance
    // exactly guard2 with a smaller pt_id would rank ahead under
    // (dist2, pt_id) — boundary ties must fall through to the brute pass
    val guarded = cand
      .withColumn("__n", count(lit(1)).over(wq))
      .withColumn("__kd2", max("dist2").over(wq))
      .withColumn("__ok",
        col("q_id").isNotNull && col("__n") === k && col("__kd2") < guard2)
    val good = guarded.where(col("__ok"))
      .select("q_id", "pt_id", "dist2", "rn")
    val satisfied = guarded.where(col("__ok")).select("q_id").distinct()
    val badQueries = queries.select(col("q_id"), col("x"), col("y"))
      .join(satisfied, Seq("q_id"), "left_anti")

    val dist2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("pt_id"))
    val brute = points
      .select(col("pt_id"), col("x").as("px"), col("y").as("py"))
      .crossJoin(broadcast(badQueries
        .select(col("q_id"), col("x").as("qx"), col("y").as("qy"))))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "pt_id", "dist2", "rn")

    good.unionByName(brute)
  }

  /** queries: (q_id, x, y); points: (pt_id, x, y). Returns
    * (q_id, pt_id, dist2, rn) with rn in 1..k ordered by (dist2, pt_id). */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, res: Int, r1: Int)
             (implicit spark: SparkSession): DataFrame = {
    val size = GridIndex.cellSize(res).toDouble
    val guard2 = (r1 * size) * (r1 * size)

    val q = queries
      .withColumn("__qcell", gridCellId(col("x"), col("y"), res))
      .withColumn("__cand", explode(gridKRing(col("__qcell"), r1)))
      .select(col("q_id"), col("x").as("qx"), col("y").as("qy"), col("__cand"))
    val p = points
      .withColumn("__pcell", gridCellId(col("x"), col("y"), res))
      .select(col("pt_id"), col("x").as("px"), col("y").as("py"), col("__pcell"))

    val dist2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("pt_id"))

    val cand = q.join(p, col("__cand") === col("__pcell"))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "pt_id", "dist2", "rn")

    finishExact(queries, points, k, cand, guard2)
  }

  /**
   * Hex-lattice variant — the north rule's literal "kNN via H3 k-ring
   * expansion": queries explode into their aperture-7 hex k-ring
   * (Hex.kRing via the hexKRing expression), join points on hex cell,
   * window-prune to top-k.
   *
   * Exactness guard: hex centers at grid distance g are >= 1.5*g*sz
   * apart (sz = circumradius; the minimum is attained on ring corners),
   * and any point lies within sz of its cell center — so nothing outside
   * the radius-r1 ring can be closer than ((r1+1)*1.5 - 2)*sz. Queries
   * whose kth distance is not STRICTLY below that bound (or that found
   * < k candidates) fall back to the broadcast brute-force pass, same as
   * the square-grid path.
   */
  def knnJoinHex(queries: DataFrame, points: DataFrame, k: Int, res: Int, r1: Int)
                (implicit spark: SparkSession): DataFrame = {
    val sz = graft.core.Hex.size(res)
    val guardDist = ((r1 + 1) * 1.5 - 2.0) * sz
    require(guardDist > 0, s"r1=$r1 gives no exactness margin at res $res")
    val guard2 = guardDist * guardDist

    val q = queries
      .withColumn("__qcell", hexCellId(col("x"), col("y"), res))
      .withColumn("__cand", explode(hexKRing(col("__qcell"), r1)))
      .select(col("q_id"), col("x").as("qx"), col("y").as("qy"), col("__cand"))
    val p = points
      .withColumn("__pcell", hexCellId(col("x"), col("y"), res))
      .select(col("pt_id"), col("x").as("px"), col("y").as("py"), col("__pcell"))

    val dist2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("pt_id"))

    val cand = q.join(p, col("__cand") === col("__pcell"))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "pt_id", "dist2", "rn")

    finishExact(queries, points, k, cand, guard2)
  }
}
