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
 * The unsatisfied-query set is COLLECTED once (it is small by
 * construction — the guard fails only for sparse neighbourhoods, and a
 * bounded collect caps the pathological case), so the result plan
 * filters by a literal id list: the zero-fallback common case returns
 * phase 1 untouched (one point-table scan total when consumed), the
 * fallback path scans it once more for just the broadcast bad queries,
 * and nothing re-derives the guarantee check per consumer. No internal
 * persist (a cache here would pin blocks in the session's CacheManager
 * with no unpersist point, leaking across long-lived sessions).
 */
object Knn {

  /** Above this many guard misses the r1/res choice is wrong for the
    * data — brute-force everything rather than build a huge isin. */
  private val MaxFallbackQueries = 4096

  /** Shared tail: guarantee check over the candidates, then
    * good ∪ (brute fallback only if any query actually needs it). */
  private def finishExact(queries: DataFrame, points: DataFrame, k: Int,
                          cand: DataFrame, guard2: Double): DataFrame = {
    // guarantee check per query. Queries with ZERO candidates don't appear
    // in `cand` at all, so "bad" must be derived as NOT-satisfied (anti
    // join against the satisfied set), never as filter-of-found.
    val satisfied = cand.groupBy("q_id")
      .agg(count(lit(1)).as("__n"), max("dist2").as("__kd2"))
      // STRICT <: a point outside the ring at distance exactly guard2 with
      // a smaller pt_id would rank ahead under (dist2, pt_id) — boundary
      // ties must fall through to the brute-force pass
      .filter(col("__n") === k && col("__kd2") < guard2)
      .select("q_id")
    // null query ids can never satisfy the guard and would poison the
    // NOT-IN literal list below (three-valued logic) — excluded here;
    // their cand rows (if any) drop under the same NULL semantics
    val badIds = queries.select("q_id")
      .join(broadcast(satisfied), Seq("q_id"), "left_anti")
      .limit(MaxFallbackQueries + 1).collect().map(_.get(0))
      .filterNot(_ == null).toSeq
    if (badIds.isEmpty) return cand

    val dist2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("pt_id"))
    def bruteFor(qs: DataFrame): DataFrame = points
      .select(col("pt_id"), col("x").as("px"), col("y").as("py"))
      .crossJoin(broadcast(qs.select(col("q_id"), col("x").as("qx"), col("y").as("qy"))))
      .withColumn("dist2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "pt_id", "dist2", "rn")

    if (badIds.length > MaxFallbackQueries) {
      // many guard misses: stay fully relational — no driver literal
      // list and, crucially, broadcast only the BAD queries (a fleet of
      // misses is still a small fraction of a large query table; the
      // whole table must never ride a broadcast)
      val badQ = queries.select("q_id")
        .join(broadcast(satisfied), Seq("q_id"), "left_anti")
      val good = cand.join(broadcast(badQ), Seq("q_id"), "left_anti")
      val badQueries = queries.join(broadcast(badQ), Seq("q_id"))
        .select(col("q_id"), col("x"), col("y"))
      return good.unionByName(bruteFor(badQueries))
    }
    cand.filter(!col("q_id").isin(badIds: _*))
      .unionByName(bruteFor(queries.filter(col("q_id").isin(badIds: _*))))
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
