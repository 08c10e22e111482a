package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{PolyRow, Pt}
import graft.operators.{SpatialJoin, Knn}
import graft.text.{TextOps, EmbedOps}

/**
 * The driver-checked operator surface: every entry has a Spark
 * implementation (through the engine's real operators) and, where
 * SQL-expressible, a DuckDB oracle over the same parquet tables
 * (SURVEY §5.2 item 2).
 *
 * Numeric determinism contract with the oracle: aggregate only values
 * that are exact in double (integral quantities, prices as cents),
 * compute derived doubles with the IDENTICAL expression tree on both
 * sides, and round floating outputs. Distances are squared (no libm).
 *
 * The geometry queries drive the exact same join/refine code paths as
 * the image pipeline: grid-cell prefilter join + ray-cast PIP + grouped
 * aggregation — pixels here are rows derived deterministically from
 * lineitem (the reference semantics don't care whether a "pixel" came
 * from a decoded tile or a table row).
 */
object Queries {

  private def li(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def orders(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/orders.parquet")
  private def customer(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/customer.parquet")
  private def part(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/part.parquet")
  private def events(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/events.parquet")
  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic point cloud derived from lineitem — the "pixel"
    * relation for the SQL-checkable spatial queries. Coordinates land on
    * half-integers so nothing ever sits on a polygon edge. */
  def pts(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("pt_id"),
      (col("l_partkey") % 200 + lit(0.5)).as("x"),
      (col("l_suppkey") % 100 + lit(0.5)).as("y"),
      col("l_quantity").as("v"))

  val ptsSql: String =
    """SELECT l_orderkey * 10 + l_linenumber AS pt_id,
      | (l_partkey % 200) + CAST(0.5 AS DOUBLE) AS x,
      | (l_suppkey % 100) + CAST(0.5 AS DOUBLE) AS y,
      | l_quantity AS v FROM lineitem""".stripMargin

  /** The zonal "vector layer": 8 axis-aligned boxes (integer bounds, so
    * the open-interval SQL predicate equals PIP with any boundary rule). */
  val boxes: Seq[(Long, Double, Double, Double, Double)] = Seq(
    (0L, 0, 0, 50, 50), (1L, 40, 20, 120, 80), (2L, 100, 0, 200, 100),
    (3L, 10, 60, 60, 95), (4L, 150, 10, 190, 40), (5L, 0, 0, 200, 100),
    (6L, 70, 30, 90, 90), (7L, 130, 50, 170, 100))

  def boxPolys: Seq[PolyRow] = boxes.map { case (id, x0, y0, x1, y1) =>
    PolyRow(id, 0, Array(Array(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1))),
      cls = 1, name = s"box$id", measure = 0.0)
  }

  val boxesSql: String = "(VALUES " + boxes.map { case (id, x0, y0, x1, y1) =>
    s"(CAST($id AS BIGINT), ${x0.toInt}, ${y0.toInt}, ${x1.toInt}, ${y1.toInt})"
  }.mkString(", ") + ") AS b(poly_id, x0, y0, x1, y1)"

  private def joinedPts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    SpatialJoin.pointsInPolygons(pts(spark, dir),
      spark.createDataset(boxPolys), res = 15)
  }

  // ------------------------------------------------------------ queries

  def qZonalBoxStats(spark: SparkSession, dir: String): DataFrame = {
    val n = count(lit(1))
    joinedPts(spark, dir).groupBy("poly_id").agg(
      n.as("pix_count"),
      round(sum(col("v")), 4).as("sum_v"),
      round(avg(col("v")), 4).as("mean_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"),
      round(sqrt(sum(col("v") * col("v")) / n - (sum(col("v")) / n) * (sum(col("v")) / n)), 4)
        .as("std_v"))
  }

  val qZonalBoxStatsSql: String =
    s"""WITH pts AS ($ptsSql)
       |SELECT poly_id, count(*) AS pix_count, round(sum(v),4) AS sum_v,
       | round(avg(v),4) AS mean_v, min(v) AS min_v, max(v) AS max_v,
       | round(sqrt(sum(v*v)/count(*) - (sum(v)/count(*))*(sum(v)/count(*))),4) AS std_v
       |FROM pts JOIN $boxesSql
       | ON x > x0 AND x < x1 AND y > y0 AND y < y1
       |GROUP BY poly_id""".stripMargin

  def qZonalFrac(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("poly_id")
    joinedPts(spark, dir)
      .withColumn("bucket", floor(col("v") / 10).cast("int"))
      .groupBy("poly_id", "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("frac", round(col("cnt") * lit(1.0) / sum("cnt").over(w), 6))
  }

  val qZonalFracSql: String =
    s"""WITH pts AS ($ptsSql),
       |j AS (SELECT poly_id, cast(floor(v/10) AS int) AS bucket
       |      FROM pts JOIN $boxesSql
       |      ON x > x0 AND x < x1 AND y > y0 AND y < y1)
       |SELECT poly_id, bucket, count(*) AS cnt,
       | round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY poly_id), 6) AS frac
       |FROM j GROUP BY poly_id, bucket""".stripMargin

  /** zonal_point: coord -> pixel-key gather (shape.py:2525-2613). */
  /** Deeper zonal stat parity: median (np convention), mode (smallest on
    * ties), skew/kurtosis from exact integer power sums — the rest of the
    * shape.py:1023-1068 dispatch, oracle-checked. */
  def qZonalMoreStats(spark: SparkSession, dir: String): DataFrame = {
    val j = joinedPts(spark, dir).select(col("poly_id"), col("v"))
    val med = j.groupBy("poly_id").agg(median(col("v")).as("median_v"))
    val h = j.groupBy("poly_id", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("poly_id").orderBy(col("c").desc, col("v"))
    val mode = h.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("poly_id"), col("v").as("mode_v"))
    val vv = col("v")
    val mom = j.groupBy("poly_id").agg(
      count(lit(1)).cast("double").as("n"), sum(vv).as("s1"),
      sum(vv * vv).as("s2"), sum(vv * vv * vv).as("s3"),
      sum(vv * vv * vv * vv).as("s4"))
    val mean = col("s1") / col("n")
    val m2 = col("s2") / col("n") - mean * mean
    val m3 = col("s3") / col("n") - lit(3.0) * mean * (col("s2") / col("n")) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4") / col("n") - lit(4.0) * mean * (col("s3") / col("n")) +
      lit(6.0) * mean * mean * (col("s2") / col("n")) -
      lit(3.0) * mean * mean * mean * mean
    val moments = mom.select(col("poly_id"),
      round(m3 / (m2 * sqrt(m2)), 4).as("skew_v"),
      round(m4 / (m2 * m2) - lit(3.0), 4).as("kurt_v"))
    med.join(mode, "poly_id").join(moments, "poly_id")
  }

  val qZonalMoreStatsSql: String =
    s"""WITH pts AS ($ptsSql),
       |j AS (SELECT poly_id, v FROM pts JOIN $boxesSql
       |      ON x > x0 AND x < x1 AND y > y0 AND y < y1),
       |med AS (SELECT poly_id, median(v) AS median_v FROM j GROUP BY 1),
       |h AS (SELECT poly_id, v, count(*) AS c FROM j GROUP BY 1, 2),
       |md AS (SELECT poly_id, v AS mode_v FROM (
       |  SELECT poly_id, v, row_number() OVER (PARTITION BY poly_id
       |    ORDER BY c DESC, v) AS rn FROM h) WHERE rn = 1),
       |mom AS (SELECT poly_id, CAST(count(*) AS DOUBLE) AS n, sum(v) AS s1,
       |        sum(v*v) AS s2, sum(v*v*v) AS s3, sum(v*v*v*v) AS s4
       |        FROM j GROUP BY 1),
       |mm AS (SELECT poly_id,
       |  round((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n)) /
       |        ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))), 4) AS skew_v,
       |  round((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n) -
       |         3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
       |        ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 4) AS kurt_v
       |  FROM mom)
       |SELECT med.poly_id, median_v, mode_v, skew_v, kurt_v
       |FROM med JOIN md ON med.poly_id = md.poly_id
       |JOIN mm ON med.poly_id = mm.poly_id""".stripMargin

  def qZonalPoint(spark: SparkSession, dir: String): DataFrame = {
    val grid = part(spark, dir).select(
      (col("p_partkey") % 50).as("ix"),
      (floor(col("p_partkey") / lit(50.0)).cast("long") % 40).as("iy"),
      round(col("p_retailprice") * 100).cast("long").as("cents"))
      .groupBy("ix", "iy").agg(min("cents").as("val"))
    customer(spark, dir).select(col("c_custkey"),
      (col("c_custkey") % 50).as("ix"), (col("c_custkey") % 40).as("iy"))
      .join(grid, Seq("ix", "iy"))
      .select("c_custkey", "val")
  }

  val qZonalPointSql: String =
    """WITH grid AS (
      |  SELECT p_partkey % 50 AS ix,
      |         cast(floor(p_partkey / 50.0) AS bigint) % 40 AS iy,
      |         min(cast(round(p_retailprice * 100) AS bigint)) AS val
      |  FROM part GROUP BY 1, 2)
      |SELECT c_custkey, val
      |FROM (SELECT c_custkey, c_custkey % 50 AS ix, c_custkey % 40 AS iy
      |      FROM customer) c
      |JOIN grid USING (ix, iy)""".stripMargin

  def qKnn(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val queries = customer(spark, dir).where(col("c_custkey") < 20).select(
      col("c_custkey").as("q_id"),
      ((col("c_custkey") * 37) % 200 + lit(0.3)).as("x"),
      ((col("c_custkey") * 53) % 100 + lit(0.7)).as("y"))
    Knn.knnJoin(queries, pts(spark, dir), k = 5, res = 17, r1 = 1)
  }

  val qKnnSql: String =
    s"""WITH pts AS ($ptsSql),
       |q AS (SELECT c_custkey AS q_id, (c_custkey * 37) % 200 + CAST(0.3 AS DOUBLE) AS x,
       |             (c_custkey * 53) % 100 + CAST(0.7 AS DOUBLE) AS y
       |      FROM customer WHERE c_custkey < 20)
       |SELECT q_id, pt_id, dist2, CAST(rn AS INTEGER) AS rn FROM (
       |  SELECT q.q_id, p.pt_id,
       |    (q.x - p.x)*(q.x - p.x) + (q.y - p.y)*(q.y - p.y) AS dist2,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY (q.x - p.x)*(q.x - p.x) + (q.y - p.y)*(q.y - p.y), p.pt_id) AS rn
       |  FROM q, pts p) WHERE rn <= 5""".stripMargin

  /** mask_raster_multi rules '<' / '>' with replacement (raster.py:1136-1265). */
  def qMaskRules(spark: SparkSession, dir: String): DataFrame = {
    val masked = when(col("l_quantity") < 10, lit(0.0))
      .when(col("l_quantity") > 45, lit(45.0))
      .otherwise(col("l_quantity"))
    li(spark, dir).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum(masked), 4).as("masked_sum"))
  }

  val qMaskRulesSql: String =
    """SELECT l_returnflag, count(*) AS n,
      | round(sum(CASE WHEN l_quantity < 10 THEN 0.0
      |                WHEN l_quantity > 45 THEN 45.0
      |                ELSE l_quantity END), 4) AS masked_sum
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** combine_scene per-pixel rule merge (raster.py:1466-1524). */
  def qCombineScene(spark: SparkSession, dir: String): DataFrame = {
    val c1 = col("l_partkey") % 5
    val c2 = col("l_suppkey") % 5
    val recode = when(c1 === c2, c1).when(c1 === 0, c2).otherwise(c1)
    li(spark, dir).select(recode.as("recode"))
      .groupBy("recode").agg(count(lit(1)).as("n"))
  }

  val qCombineSceneSql: String =
    """SELECT CASE WHEN l_partkey % 5 = l_suppkey % 5 THEN l_partkey % 5
      |            WHEN l_partkey % 5 = 0 THEN l_suppkey % 5
      |            ELSE l_partkey % 5 END AS recode, count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** temporal_comp per-pixel time-series reduce (raster.py:2287-2407):
    * pixel key = user_id, time axis = events. Cents keep sums exact. */
  def qTemporalComp(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    events(spark, dir).select(col("user_id"), cents.as("cents"))
      .groupBy("user_id").agg(
        count(lit(1)).as("n"),
        round(sum(col("cents")) / 100.0, 4).as("total"),
        // floor of an exact product/quotient — round() on a decimal tie
        // (x.xxxx5) differs between engines, floor of the same double never
        floor(sum(col("cents")) * lit(10000.0) / count(lit(1))).cast("long").as("mean_c4"),
        min("cents").as("min_c"),
        max("cents").as("max_c"),
        round(median(col("cents")), 1).as("median_c"))
  }

  val qTemporalCompSql: String =
    """SELECT user_id, count(*) AS n,
      | round(sum(cents)/100.0, 4) AS total,
      | CAST(floor(sum(cents) * CAST(10000.0 AS DOUBLE) / count(*)) AS BIGINT) AS mean_c4,
      | min(cents) AS min_c, max(cents) AS max_c,
      | round(median(cents), 1) AS median_c
      |FROM (SELECT user_id, cast(round(value*100) AS bigint) AS cents FROM events)
      |GROUP BY user_id""".stripMargin

  /** eCDF (raster.py:2129-2137): histogram + cumulative window. */
  def qHistEcdf(spark: SparkSession, dir: String): DataFrame = {
    val cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    li(spark, dir).select(col("l_quantity").cast("int").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("ecdf", round(sum("cnt").over(cum) * lit(1.0) / sum("cnt").over(all), 6))
  }

  val qHistEcdfSql: String =
    """SELECT v, cnt, round(cum * 1.0 / total, 6) AS ecdf FROM (
      |  SELECT v, count(*) AS cnt,
      |    sum(count(*)) OVER (ORDER BY v) AS cum,
      |    sum(count(*)) OVER () AS total
      |  FROM (SELECT cast(l_quantity AS int) AS v FROM lineitem) GROUP BY v)""".stripMargin

  /** hist_match quantile mapping (raster.py:2139-2217): source CDF ->
    * smallest template bucket with cdf >= source cdf. */
  def qHistMatch(spark: SparkSession, dir: String): DataFrame = {
    def cdf(df: DataFrame, vcol: String): DataFrame = {
      val cum = Window.orderBy(vcol).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy()
      df.groupBy(vcol).agg(count(lit(1)).as("c"))
        .withColumn("cdf", sum("c").over(cum) * lit(1.0) / sum("c").over(all))
        .drop("c")
    }
    val s = cdf(li(spark, dir).select(col("l_quantity").cast("int").as("v")), "v")
      .withColumnRenamed("cdf", "scdf")
    val t = cdf(orders(spark, dir).select(
      floor(col("o_totalprice") / 10000.0).cast("int").as("tb")), "tb")
      .withColumnRenamed("cdf", "tcdf")
    s.join(t, col("tcdf") >= col("scdf"))
      .groupBy("v").agg(min("tb").as("matched"))
  }

  val qHistMatchSql: String =
    """WITH s AS (
      |  SELECT v, sum(c) OVER (ORDER BY v) * 1.0 / sum(c) OVER () AS scdf
      |  FROM (SELECT cast(l_quantity AS int) AS v, count(*) AS c
      |        FROM lineitem GROUP BY 1)),
      |t AS (
      |  SELECT tb, sum(c) OVER (ORDER BY tb) * 1.0 / sum(c) OVER () AS tcdf
      |  FROM (SELECT cast(floor(o_totalprice / 10000.0) AS int) AS tb, count(*) AS c
      |        FROM orders GROUP BY 1))
      |SELECT v, min(tb) AS matched FROM s JOIN t ON tcdf >= scdf GROUP BY v""".stripMargin

  /** RGB band-algebra indices (shape.py:1354-1502): ExG + NDI means. */
  def qRgbIndices(spark: SparkSession, dir: String): DataFrame = {
    val r = col("l_quantity")
    val g = round(col("l_discount") * 100)
    val b = round(col("l_tax") * 100)
    li(spark, dir).groupBy("l_returnflag").agg(
      round(avg(g * 2 - r - b), 4).as("exg"),
      round(avg((g - r) / (g + r + lit(1.0))), 4).as("ndi"))
  }

  val qRgbIndicesSql: String =
    """SELECT l_returnflag,
      | round(avg(round(l_discount*100) * 2 - l_quantity - round(l_tax*100)), 4) AS exg,
      | round(avg((round(l_discount*100) - l_quantity) /
      |           (round(l_discount*100) + l_quantity + 1.0)), 4) AS ndi
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** rmse_vector_lyr (learning.py:1828-1864). */
  def qRmse(spark: SparkSession, dir: String): DataFrame = {
    val d = col("l_extendedprice") - col("l_quantity") * 1000
    li(spark, dir).groupBy("l_returnflag")
      .agg(round(sqrt(avg(d * d)), 2).as("rmse"))
  }

  val qRmseSql: String =
    """SELECT l_returnflag,
      | round(sqrt(avg((l_extendedprice - l_quantity * 1000) *
      |              (l_extendedprice - l_quantity * 1000))), 2) AS rmse
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** confusion matrix (handyplots.py:24-79). */
  def qConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = when(col("value") < 10, "low")
      .when(col("value") < 100, "mid").otherwise("high")
    events(spark, dir).select(col("event_type"), pred.as("pred"))
      .groupBy("event_type", "pred").agg(count(lit(1)).as("n"))
  }

  val qConfusionSql: String =
    """SELECT event_type,
      | CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid'
      |      ELSE 'high' END AS pred, count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** histogram entropy (shape.py:1697-1699), natural log. */
  def qEntropy(spark: SparkSession, dir: String): DataFrame = {
    val h = li(spark, dir).select(col("l_returnflag"), col("l_quantity").cast("int").as("v"))
      .groupBy("l_returnflag", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("l_returnflag")
    h.withColumn("n", sum("c").over(w))
      .groupBy("l_returnflag")
      .agg(round(-sum((col("c") * lit(1.0) / col("n")) * log(col("c") * lit(1.0) / col("n"))), 6)
        .as("entropy"))
  }

  val qEntropySql: String =
    """WITH h AS (SELECT l_returnflag, cast(l_quantity AS int) AS v, count(*) AS c
      |           FROM lineitem GROUP BY 1, 2),
      |t AS (SELECT l_returnflag, sum(c) AS n FROM h GROUP BY 1)
      |SELECT h.l_returnflag,
      | round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy
      |FROM h JOIN t USING (l_returnflag) GROUP BY h.l_returnflag""".stripMargin

  /** raster2points-shaped explode (raster.py:1607-1699): text -> token
    * rows with the empty-token "nodata" filter. */
  def qTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)

  val qTokensSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> '' GROUP BY token HAVING count(*) >= 5""".stripMargin

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    TextOps.dedupExact(docs(spark, dir), "doc_id", "text")

  val qDedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY lower(text)""".stripMargin

  def qJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    TextOps.ngramJaccardPairs(docs(spark, dir).where(col("doc_id") < 120),
      "doc_id", "text", threshold = 0.6)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))

  val qJaccardPairsSql: String =
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, token
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents WHERE doc_id < 120)
      |  WHERE token <> ''),
      |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT d1, d2, round(i * 1.0 / (s1.n + s2.n - i), 4) AS jaccard
      |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      |WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.6""".stripMargin

  /** text quality aggregates per language. */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"),
      round(avg(length(col("text"))), 4).as("avg_chars"))

  val qTextQualitySql: String =
    """SELECT lang, count(*) AS n_docs,
      | round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
      | round(avg(length(text)), 4) AS avg_chars
      |FROM documents GROUP BY lang""".stripMargin

  /** language-ID heuristic vs labeled lang (marker-word argmax). */
  def qLangPredict(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("lang"), TextOps.langPredict(col("text")).as("pred"))
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))

  val qLangPredictSql: String = {
    val scores = TextOps.langMarkers.map { case (l, ms) =>
      val occ = ms.map(m =>
        s"((length(text) - length(replace(text, '$m', ''))) / ${m.length})")
        .mkString(" + ")
      l -> s"cast($occ AS int)"
    }
    val maxExpr = scores.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val caseExpr = scores.map { case (l, s) => s"WHEN $s = __m THEN '$l'" }
      .mkString(" ")
    s"""SELECT lang, CASE $caseExpr ELSE 'en' END AS pred, count(*) AS n
       |FROM (SELECT lang, text, $maxExpr AS __m FROM documents)
       |GROUP BY 1, 2""".stripMargin
  }

  // ---------------------------------------------- engine-only (rows-only)

  def qMinhashPairs(spark: SparkSession, dir: String): DataFrame =
    TextOps.minHashLsh(docs(spark, dir), "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16)
      .where(col("jaccard_est") >= 0.25)
      .select(col("d1"), col("d2"), round(col("jaccard_est"), 4).as("jaccard_est"))

  def qSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    TextOps.simHashPairs(docs(spark, dir), "doc_id", "text", maxHamming = 7)

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      TextOps.fingerprint(col("text"), 16).as("fp"),
      TextOps.simHash(col("text")).as("simhash"),
      TextOps.bpeishTokenCount(col("text")).as("bpeish_tokens"))

  def qAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    EmbedOps.cosineTopK(
      e.where(col("vec_id") < 20).select(col("vec_id").as("q_id"), col("embedding")),
      e, k = 3)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rn"))
  }

  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    EmbedOps.lshCosinePairs(emb(spark, dir), planes = 16, bandBits = 4, minCos = 0.3)
      .select(col("v1"), col("v2"), round(col("cos"), 4).as("cos"))

  def qPipelineZonal(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.entry(spark)

  // --- image-pipeline operator surface (deterministic synthetic input;
  //     driver rows-only check, exactness covered in ScalaTest)

  import graft.{ImageRow, PolyRow}
  import graft.operators._
  import org.apache.spark.sql.Encoders

  private def synthImages(spark: SparkSession, n: Int, bands: Int = 2) =
    spark.createDataset(graft.gen.Synth.images(n, seed = 42L, bands = bands).toSeq)(
      Encoders.product[ImageRow])
  private def synthPolys(spark: SparkSession) =
    spark.createDataset(graft.gen.Synth.polygons(nExtra = 6).toSeq)(
      Encoders.product[PolyRow])

  def qRasterPoints(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cellRes = Tiler.resForCellSize(64.0)
    val tiles = Tiler.tiles(synthImages(spark, 8), 64, cellRes)
    RasterOps.rasterToPoints(tiles.toDF())
      .groupBy("image_id", "band")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
  }

  def qPolygonize(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Polygonize.polygonize(synthImages(spark, 8, bands = 1), band = 0, quant = 64f)
      .toDF().select(col("image_id"), col("value"), col("pixel_count"),
        size(col("ring")).as("ring_len"))
  }

  def qShapeProps(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    ShapeProps.props(synthPolys(spark)).toDF()
      .select(col("poly_id"), col("part"), round(col("area"), 4).as("area"),
        round(col("perimeter"), 4).as("perimeter"),
        round(col("major_axis"), 4).as("major_axis"),
        round(col("solidity"), 4).as("solidity"))
  }

  def qGlcm(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cellRes = Tiler.resForCellSize(64.0)
    val tiles = Tiler.tiles(synthImages(spark, 12), 64, cellRes)
    Glcm.textureStats(Glcm.pairHistogram(tiles, synthPolys(spark), cellRes))
  }

  def qClassify(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cellRes = Tiler.resForCellSize(64.0)
    val tiles = Tiler.multiTiles(synthImages(spark, 12), 64, cellRes)
    val samples = Training.extractSamples(tiles, synthPolys(spark), cellRes)
    val model = Training.fitCentroids(samples)
    Training.classify(tiles, model).toDF()
      .select(col("image_id"),
        aggregate(col("pixels"), lit(0.0), (a, x) => a + x).as("class_sum"))
      .groupBy("image_id").agg(round(sum("class_sum"), 2).as("class_mass"))
  }

  def qMosaic(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val cellRes = Tiler.resForCellSize(64.0)
    val imgs = synthImages(spark, 8)
    val tiles = Tiler.tiles(imgs, 64, cellRes)
    RasterOps.mosaic(tiles.toDF())
      .select(col("cell_id"), col("band"), col("tx"), col("ty"),
        aggregate(col("pixels"), lit(0.0), (a, x) => a + x).as("mass"))
      .groupBy("band").agg(count(lit(1)).as("n_tiles"), round(sum("mass"), 2).as("mass"))
  }

  def qImageFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    ImageOps.features(synthImages(spark, 24))
      .select(col("image_id"), col("band"), col("phash"),
        round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"))
  }

  def qTranscode(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // raw-le -> qnt8 transcode must keep phash stable (PSNR >= 40 regime)
    val src = synthImages(spark, 16)
    ImageOps.transcode(src, graft.core.PixelCodec.FmtQnt8).toDF()
      .select(col("image_id"), col("fmt"), col("phash"), length(col("bytes")).as("nbytes"))
  }

  def qClipPoly(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val rects = (0 until 4).flatMap(i => (0 until 4).map(j =>
      ((i * 4 + j).toLong, graft.core.Geom.BBox(-2000.0 + i * 1000, -2000.0 + j * 1000,
        -1000.0 + i * 1000, -1000.0 + j * 1000))))
    VectorOps.clipToRects(synthPolys(spark), rects).toDF()
      .select(col("poly_id"), col("cls"), size(col("rings")).as("n_rings"))
  }

  def qGeoJson(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    VectorOps.toGeoJson(synthPolys(spark))
  }

  /** Image near-dup + exact dedup over the phash/binary payload. The
    * input plants true duplicates: every image appears once more as a
    * lossless re-encode (same pixels, different fmt/id). */
  def qPhashPairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.Encoders
    val base = graft.gen.Synth.images(24, seed = 42L, bands = 1)
    val dupes = base.map { img =>
      val dec = graft.core.PixelCodec.decode(img.bytes, img.fmt, img.w, img.h)
      val fmt2 = if (img.fmt == "rle") "raw-le" else "rle"
      img.copy(image_id = img.image_id + "_dup",
        bytes = graft.core.PixelCodec.encode(fmt2, img.w, img.h, dec.bands), fmt = fmt2,
        phash = graft.core.PixelCodec.phash64(img.w, img.h, dec.bands(0)))
    }
    val all = spark.createDataset((base ++ dupes).toSeq)(Encoders.product[ImageRow])
    ImageDedup.phashPairs(all, maxHamming = 2)
  }

  def qImageDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.Encoders
    val base = graft.gen.Synth.images(24, seed = 42L, bands = 1)
    val dupes = base.take(10).map { img =>
      val dec = graft.core.PixelCodec.decode(img.bytes, img.fmt, img.w, img.h)
      val fmt2 = if (img.fmt == "rle") "raw-le" else "rle"
      img.copy(image_id = "z" + img.image_id,
        bytes = graft.core.PixelCodec.encode(fmt2, img.w, img.h, dec.bands), fmt = fmt2,
        phash = graft.core.PixelCodec.phash64(img.w, img.h, dec.bands(0)))
    }
    val all = spark.createDataset((base ++ dupes).toSeq)(Encoders.product[ImageRow])
    ImageDedup.dedupExact(all)
  }

  /** The north-rule index surface: every image keyed by planar grid,
    * S2 (spherical) and H3-style hex cells via the batched Catalyst
    * expressions, plus k-ring expansion sizes. */
  def qCellIndex(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SpatialFunctions._
    implicit val s: SparkSession = spark
    synthImages(spark, 48).toDF()
      .withColumn("grid", gridCellId(col("x_min"), col("y_max"), 12))
      .withColumn("hex", hexCellId(col("x_min"), col("y_max"), 9))
      .withColumn("s2", s2CellId(col("y_max") / lit(100.0), col("x_min") / lit(100.0), 12))
      .withColumn("grid_ring", size(gridKRing(col("grid"), 2)))
      .withColumn("hex_ring", size(hexKRing(col("hex"), 2)))
      .select("image_id", "phash", "grid", "hex", "s2", "grid_ring", "hex_ring")
  }
}
