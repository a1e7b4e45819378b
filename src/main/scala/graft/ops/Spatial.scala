package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Phase-2 spatial join — the reference's SpatialJoinNode /
  * SpatialJoinOperator + PagesRTreeIndex (SPI/plan/SpatialJoinNode.java:34,
  * MAIN/operator/SpatialJoinOperator.java:39) and the ExtractSpatialJoins
  * rewrite (MAIN/sql/planner/iterative/rule/ExtractSpatialJoins.java:155).
  *
  * Spark-first design: instead of a broadcast R-tree (driver-bound), both
  * predicates lower to a GRID-PARTITIONED equi-join — the same idea as the
  * reference's KdbTree spatial partitioning (geospatial/
  * SpatialPartitioningAggregateFunction.java) but expressed declaratively:
  *
  *   ST_Distance(a, b) <= r   →  cell(a) joined against the 3×3 neighbor
  *                               cells of b at cell size r, refine exact;
  *   ST_Contains(rect, p)     →  p maps to ONE cell, rect explodes to every
  *                               cell it overlaps, refine exact.
  *
  * Each side shuffles once on the cell id — a plain hash-partitioned
  * equi-join Catalyst/AQE handles like any other, so skew handling,
  * broadcast thresholds and partial pushdown all still apply at 100 TB.
  * Candidate pairs per point are bounded by local density, never |S|×|R|.
  * Points come from deterministic projections of TPC-H keys so DuckDB can
  * run the naive cross-join as the oracle at sf0.01.
  */
object Spatial {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Deterministic planar coordinates in [0,100) derived from a key. */
  private def coord(key: org.apache.spark.sql.Column, mult: Long) =
    (key * mult % 1000).cast("double") / 10.0

  /** Distance-within join: customer points × supplier points, pairs with
    * euclidean distance <= r. Grid cell size = r so true pairs always land
    * in adjacent cells; left side replicates to its 3×3 neighborhood (9
    * rows), right side keeps one row per point. */
  def distanceJoin(s: SparkSession, dir: String): DataFrame = {
    val r = 5.0
    val cust = t(s, dir, "customer").select(
      col("c_custkey").as("ck"),
      coord(col("c_custkey"), 7919L).as("cx"),
      coord(col("c_custkey"), 104729L).as("cy"))
    val supp = t(s, dir, "supplier").select(
      col("s_suppkey").as("sk"),
      coord(col("s_suppkey"), 7919L).as("sx"),
      coord(col("s_suppkey"), 104729L).as("sy"))
    // supplier (small side) replicates ×9 to the neighborhood; the join on
    // (ix, iy) is then a plain equi-join Catalyst broadcasts when small
    val suppCells = supp
      .withColumn("dxy", explode(expr(
        "flatten(transform(sequence(-1,1), dx -> transform(sequence(-1,1), dy -> struct(dx, dy))))")))
      .select(col("sk"), col("sx"), col("sy"),
        (floor(col("sx") / r) + col("dxy.dx")).as("ix"),
        (floor(col("sy") / r) + col("dxy.dy")).as("iy"))
    val custCells = cust.select(col("ck"), col("cx"), col("cy"),
      floor(col("cx") / r).as("ix"), floor(col("cy") / r).as("iy"))
    // plain multiplies, not pow(): IEEE mul/add are correctly rounded, so
    // the boundary predicate is bit-identical in Spark and the oracle
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    custCells.join(suppCells, Seq("ix", "iy"))
      .where(d2 <= r * r)
      .select(col("ck"), col("sk"), round(sqrt(d2), 4).as("dist"))
      .orderBy("ck", "sk")
  }

  /** Containment join: 25 nation-derived rectangles × customer points.
    * The rectangle side explodes to every grid cell it overlaps (bounded by
    * rect area / cell area); each point probes exactly one cell, so no
    * post-join dedup is needed. */
  def containsJoin(s: SparkSession, dir: String): DataFrame = {
    val g = 10.0 // grid cell size
    val rects = t(s, dir, "nation").select(
      col("n_nationkey").as("nk"),
      (col("n_nationkey") * 37 % 80).cast("double").as("xmin"),
      (col("n_nationkey") * 53 % 80).cast("double").as("ymin"),
      ((col("n_nationkey") * 37 % 80) + 5 + col("n_nationkey") % 11).cast("double").as("xmax"),
      ((col("n_nationkey") * 53 % 80) + 5 + col("n_nationkey") % 7).cast("double").as("ymax"))
    val rectCells = rects
      .withColumn("ix", explode(expr(s"sequence(floor(xmin / $g), floor(xmax / $g))")))
      .withColumn("iy", explode(expr(s"sequence(floor(ymin / $g), floor(ymax / $g))")))
    val pts = t(s, dir, "customer").select(
      col("c_custkey").as("ck"),
      coord(col("c_custkey"), 7919L).as("px"),
      coord(col("c_custkey"), 104729L).as("py"))
      .select(col("ck"), col("px"), col("py"),
        floor(col("px") / g).as("ix"), floor(col("py") / g).as("iy"))
    pts.join(rectCells, Seq("ix", "iy"))
      .where(col("px").between(col("xmin"), col("xmax")) &&
        col("py").between(col("ymin"), col("ymax")))
      .select(col("nk"), col("ck"))
      .orderBy("nk", "ck")
  }

  /** Polygon containment join (the full SpatialJoinNode shape — reference
    * SpatialJoinOperator.java:39 + PagesRTreeIndex:34, re-expressed as a
    * grid-partitioned equi-join): regular k-gon polygons from nation keys,
    * exploded to every grid cell their bbox overlaps; customer points probe
    * exactly one cell; the grid join is only a prefilter — the exact
    * predicate is even-odd ray casting (GeoFunctions.stContainsPoint), so
    * the result is independent of the grid size. At 100 TB the cell id is
    * the shuffle key and fan-out is bounded by polygon-area/cell-area,
    * exactly like the R-tree partitioning in the reference. */
  def polygonJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = 10.0
    val polys = t(s, dir, "nation").select(
      col("n_nationkey").as("nk"),
      (lit(3) + col("n_nationkey") % 5).cast("int").as("n"),
      (col("n_nationkey") * 37 % 80).cast("double").as("pcx"),
      (col("n_nationkey") * 53 % 80).cast("double").as("pcy"),
      (lit(3.0) + col("n_nationkey") % 4).as("r"))
    val ringed = polys.withColumn("ring",
      transform(sequence(lit(0), col("n") - 1), i => struct(
        (col("pcx") + col("r") * cos(lit(2 * scala.math.Pi) * i / col("n"))).as("x"),
        (col("pcy") + col("r") * sin(lit(2 * scala.math.Pi) * i / col("n"))).as("y"))))
    val polyCells = ringed
      .withColumn("ix", explode(expr("sequence(floor((pcx - r) / 10.0), floor((pcx + r) / 10.0))")))
      .withColumn("iy", explode(expr("sequence(floor((pcy - r) / 10.0), floor((pcy + r) / 10.0))")))
    val pts = t(s, dir, "customer").select(
      col("c_custkey").as("ck"),
      coord(col("c_custkey"), 7919L).as("px"),
      coord(col("c_custkey"), 104729L).as("py"))
      .select(col("ck"), col("px"), col("py"),
        floor(col("px") / g).as("ix"), floor(col("py") / g).as("iy"))
    pts.join(polyCells, Seq("ix", "iy"))
      .where(stContainsPoint(col("ring"), stPoint(col("px"), col("py"))))
      .select(col("nk"), col("ck"))
      .orderBy("nk", "ck")
  }

  /** ST_Intersects spatial join (reference ExtractSpatialJoins.java:155
    * lowers ST_Intersects to SpatialJoinNode the same way as ST_Contains):
    * customer line segments × nation diamond polygons on the grid
    * substrate. Diamonds have INTEGER vertices and lines 0.1-grid
    * endpoints, so every cross-product orientation test in the exact
    * refinement (GeoFunctions.stLinePolygonIntersects — crossings,
    * collinear touches, and ray-cast containment of a fully-interior
    * line) is engine-deterministic and the oracle can replay it
    * symbolically. Both sides explode to the grid cells their bbox
    * overlaps, so a pair can meet in several cells → distinct. */
  def intersectsJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = 10.0
    val diamonds = t(s, dir, "nation").select(
      col("n_nationkey").as("nk"),
      (col("n_nationkey") * 37 % 80).cast("double").as("ncx"),
      (col("n_nationkey") * 53 % 80).cast("double").as("ncy"),
      (lit(3.0) + col("n_nationkey") % 4).as("r"))
      .withColumn("ring", org.apache.spark.sql.functions.array(
        struct((col("ncx") + col("r")).as("x"), col("ncy").as("y")),
        struct(col("ncx").as("x"), (col("ncy") + col("r")).as("y")),
        struct((col("ncx") - col("r")).as("x"), col("ncy").as("y")),
        struct(col("ncx").as("x"), (col("ncy") - col("r")).as("y"))))
    val diamondCells = diamonds
      .withColumn("ix", explode(expr(s"sequence(floor((ncx - r) / $g), floor((ncx + r) / $g))")))
      .withColumn("iy", explode(expr(s"sequence(floor((ncy - r) / $g), floor((ncy + r) / $g))")))
    val lines = t(s, dir, "customer").select(
      col("c_custkey").as("ck"),
      coord(col("c_custkey"), 7919L).as("px"),
      coord(col("c_custkey"), 104729L).as("py"))
      .withColumn("line", org.apache.spark.sql.functions.array(
        struct(col("px").as("x"), col("py").as("y")),
        struct((col("px") + 4.0).as("x"), (col("py") + 2.0).as("y"))))
    val lineCells = lines
      .withColumn("ix", explode(expr(s"sequence(floor(px / $g), floor((px + 4.0) / $g))")))
      .withColumn("iy", explode(expr(s"sequence(floor(py / $g), floor((py + 2.0) / $g))")))
    lineCells.join(diamondCells, Seq("ix", "iy"))
      .where(stLinePolygonIntersects(col("line"), col("ring")))
      .select(col("nk"), col("ck")).distinct()
      .orderBy("nk", "ck")
  }

  /** KDB-tree-partitioned polygon join (reference spatial_partitioning /
    * spatial_partitions + PartitionedSpatialJoin —
    * SpatialPartitioningInternalAggregateFunction.java:43, KdbTree.java:55):
    * the same nation-polygon × customer-point join as `polygonJoin`, but
    * the shuffle key is a data-adaptive KDB leaf id instead of a fixed
    * grid cell. The tree comes from a mergeable bottom-k envelope sample
    * (one tiny driver row, like ANALYZE stats), polygons explode to every
    * leaf their bbox intersects, each point probes exactly ONE leaf
    * (right/top-exclusive leaves tile the plane), and the exact ray-cast
    * refines — so the output is partition-independent and the oracle is
    * the identical naive spatial predicate. At 100 TB this is the
    * skew-resistant spatial join: dense regions split into more leaves,
    * keeping per-task candidate counts balanced where a fixed grid piles
    * a city's worth of points into one cell. */
  def kdbJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    import graft.functions.{GraftFunctions => g, Kdb}
    val pts = t(s, dir, "customer").select(
      col("c_custkey").as("ck"),
      coord(col("c_custkey"), 7919L).as("px"),
      coord(col("c_custkey"), 104729L).as("py"))
    // build the tree from the point sample: one small row, deterministic
    val treeJson = pts
      .agg(g.spatialPartitioning(col("px"), col("py"), col("px"), col("py"),
        partitionCount = 16, sampleCap = 512).as("t"))
      .collect()(0).getString(0)
    val polys = t(s, dir, "nation").select(
      col("n_nationkey").as("nk"),
      (lit(3) + col("n_nationkey") % 5).cast("int").as("n"),
      (col("n_nationkey") * 37 % 80).cast("double").as("pcx"),
      (col("n_nationkey") * 53 % 80).cast("double").as("pcy"),
      (lit(3.0) + col("n_nationkey") % 4).as("r"))
      .withColumn("ring",
        transform(sequence(lit(0), col("n") - 1), i => struct(
          (col("pcx") + col("r") * cos(lit(2 * scala.math.Pi) * i / col("n"))).as("x"),
          (col("pcy") + col("r") * sin(lit(2 * scala.math.Pi) * i / col("n"))).as("y"))))
    val polyParts = polys.withColumn("pid",
      explode(g.spatialPartitions(lit(treeJson),
        col("pcx") - col("r"), col("pcy") - col("r"),
        col("pcx") + col("r"), col("pcy") + col("r"))))
    val ptParts = pts.withColumn("pid",
      explode(g.spatialPartitions(lit(treeJson),
        col("px"), col("py"), col("px"), col("py"))))
    ptParts.join(polyParts, Seq("pid"))
      .where(stContainsPoint(col("ring"), stPoint(col("px"), col("py"))))
      .select(col("nk"), col("ck"))
      .orderBy("nk", "ck")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_spatial_distance" -> distanceJoin,
    "join_spatial_contains" -> containsJoin,
    "join_spatial_polygon" -> polygonJoin,
    "join_spatial_intersects" -> intersectsJoin,
    "join_spatial_kdb" -> kdbJoin)

  lazy val oracle: Map[String, String] = tailOracle ++ Map(
    "join_spatial_intersects" ->
      """WITH n AS (SELECT n_nationkey nk,
        |            CAST(n_nationkey * 37 % 80 AS DOUBLE) ncx,
        |            CAST(n_nationkey * 53 % 80 AS DOUBLE) ncy,
        |            3.0 + n_nationkey % 4 r FROM nation),
        |v AS (SELECT nk, ncx, ncy, r, unnest(range(4)) i FROM n),
        |pt AS (SELECT nk, i,
        |        CASE i WHEN 0 THEN ncx + r WHEN 1 THEN ncx
        |               WHEN 2 THEN ncx - r ELSE ncx END vx,
        |        CASE i WHEN 0 THEN ncy WHEN 1 THEN ncy + r
        |               WHEN 2 THEN ncy ELSE ncy - r END vy FROM v),
        |e AS (SELECT a.nk, a.vx ax, a.vy ay, b.vx bx, b.vy by_
        |      FROM pt a JOIN pt b ON b.nk = a.nk AND b.i = (a.i + 1) % 4),
        |c AS (SELECT c_custkey ck,
        |       CAST(c_custkey * 7919 % 1000 AS DOUBLE) / 10.0 px,
        |       CAST(c_custkey * 104729 % 1000 AS DOUBLE) / 10.0 py
        |      FROM customer),
        |d AS (SELECT e.nk, c.ck, ax, ay, bx, by_, px, py,
        |       px + 4.0 qx, py + 2.0 qy,
        |       (bx - ax) * (py - ay) - (by_ - ay) * (px - ax) d1,
        |       (bx - ax) * (py + 2.0 - ay) - (by_ - ay) * (px + 4.0 - ax) d2,
        |       (px + 4.0 - px) * (ay - py) - (py + 2.0 - py) * (ax - px) d3,
        |       (px + 4.0 - px) * (by_ - py) - (py + 2.0 - py) * (bx - px) d4
        |      FROM e CROSS JOIN c),
        |agg AS (SELECT nk, ck,
        |  MAX(CASE WHEN
        |    (((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) AND
        |     ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)))
        |    OR (d1 = 0 AND px BETWEEN least(ax, bx) AND greatest(ax, bx)
        |                AND py BETWEEN least(ay, by_) AND greatest(ay, by_))
        |    OR (d2 = 0 AND qx BETWEEN least(ax, bx) AND greatest(ax, bx)
        |                AND qy BETWEEN least(ay, by_) AND greatest(ay, by_))
        |    OR (d3 = 0 AND ax BETWEEN least(px, qx) AND greatest(px, qx)
        |                AND ay BETWEEN least(py, qy) AND greatest(py, qy))
        |    OR (d4 = 0 AND bx BETWEEN least(px, qx) AND greatest(px, qx)
        |                AND by_ BETWEEN least(py, qy) AND greatest(py, qy))
        |   THEN 1 ELSE 0 END) hit,
        |  SUM(CASE WHEN (ay > py) <> (by_ > py)
        |            AND px < (bx - ax) * (py - ay) / (by_ - ay) + ax
        |           THEN 1 ELSE 0 END) cr
        |  FROM d GROUP BY nk, ck)
        |SELECT nk, ck FROM agg WHERE hit = 1 OR cr % 2 = 1
        |ORDER BY nk, ck""".stripMargin,
    // identical predicate — the KDB partitioning is internal, so the naive
    // spatial join is the oracle for both the grid and the KDB variants
    "join_spatial_kdb" -> polygonOracleSql,
    "join_spatial_polygon" -> polygonOracleSql)

  private lazy val polygonOracleSql: String =
      """WITH n AS (SELECT n_nationkey nk, CAST(3 + n_nationkey % 5 AS INT) nn,
        |            CAST(n_nationkey * 37 % 80 AS DOUBLE) pcx,
        |            CAST(n_nationkey * 53 % 80 AS DOUBLE) pcy,
        |            3.0 + n_nationkey % 4 r
        |           FROM nation),
        |v AS (SELECT nk, nn, pcx, pcy, r, unnest(range(nn)) i FROM n),
        |pt AS (SELECT nk, nn, i,
        |        pcx + r * cos(2 * pi() * i / nn) vx,
        |        pcy + r * sin(2 * pi() * i / nn) vy FROM v),
        |e AS (SELECT a.nk, a.vx ax, a.vy ay, b.vx bx, b.vy by_
        |      FROM pt a JOIN pt b ON b.nk = a.nk AND b.i = (a.i + 1) % a.nn),
        |p AS (SELECT c_custkey ck,
        |       CAST(c_custkey * 7919 % 1000 AS DOUBLE) / 10.0 px,
        |       CAST(c_custkey * 104729 % 1000 AS DOUBLE) / 10.0 py
        |      FROM customer),
        |cr AS (SELECT e.nk, p.ck,
        |        SUM(CASE WHEN (ay > py) <> (by_ > py)
        |                  AND px < (bx - ax) * (py - ay) / (by_ - ay) + ax
        |                 THEN 1 ELSE 0 END) c
        |       FROM e CROSS JOIN p GROUP BY 1, 2)
        |SELECT nk, ck FROM cr WHERE c % 2 = 1 ORDER BY nk, ck""".stripMargin

  private lazy val tailOracle: Map[String, String] = Map(
    "join_spatial_distance" ->
      """WITH c AS (SELECT c_custkey AS ck,
        |        CAST(c_custkey * 7919 % 1000 AS DOUBLE) / 10.0 AS cx,
        |        CAST(c_custkey * 104729 % 1000 AS DOUBLE) / 10.0 AS cy
        |       FROM customer),
        |s AS (SELECT s_suppkey AS sk,
        |        CAST(s_suppkey * 7919 % 1000 AS DOUBLE) / 10.0 AS sx,
        |        CAST(s_suppkey * 104729 % 1000 AS DOUBLE) / 10.0 AS sy
        |       FROM supplier)
        |SELECT ck, sk,
        | ROUND(sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)), 4) AS dist
        |FROM c CROSS JOIN s
        |WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 25.0
        |ORDER BY ck, sk""".stripMargin,
    "join_spatial_contains" ->
      """WITH r AS (SELECT n_nationkey AS nk,
        |        CAST(n_nationkey * 37 % 80 AS DOUBLE) AS xmin,
        |        CAST(n_nationkey * 53 % 80 AS DOUBLE) AS ymin,
        |        CAST(n_nationkey * 37 % 80 + 5 + n_nationkey % 11 AS DOUBLE) AS xmax,
        |        CAST(n_nationkey * 53 % 80 + 5 + n_nationkey % 7 AS DOUBLE) AS ymax
        |       FROM nation),
        |p AS (SELECT c_custkey AS ck,
        |        CAST(c_custkey * 7919 % 1000 AS DOUBLE) / 10.0 AS px,
        |        CAST(c_custkey * 104729 % 1000 AS DOUBLE) / 10.0 AS py
        |       FROM customer)
        |SELECT nk, ck
        |FROM r CROSS JOIN p
        |WHERE px BETWEEN xmin AND xmax AND py BETWEEN ymin AND ymax
        |ORDER BY nk, ck""".stripMargin)
}
