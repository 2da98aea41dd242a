package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph computation beyond the dedup tier's connected
  * components: PageRank (Page et al. 1999) over the co-presence graph
  * j12 derives from session overlaps — "who is central to the
  * concurrency structure", the influence/bot-hub ranking a trust-and-
  * safety pipeline reads next to p9's volume-based skew profile (a hub
  * by CO-PRESENCE need not be a hub by event count).
  *
  * 100 TB design notes:
  * - Each iteration is the canonical two-join dataflow: ranks ⋈ edges
  *   (contribution scatter, the one edge-sized shuffle an iteration
  *   fundamentally needs) + a map-side-combined gather by destination.
  *   Degree and rank frames stay node-sized.
  * - `localCheckpoint` after every iteration TRUNCATES LINEAGE — without
  *   it the plan doubles per iteration and the job dies re-planning, the
  *   classic iterative-Spark failure. Checkpoint cost is one node-sized
  *   frame per iteration.
  * - Fixed iteration count (deterministic output), damping 0.85. The
  *   undirected edge list means every node has out-degree ≥ 1, so no
  *   dangling-mass correction is needed — asserted in the spec rather
  *   than assumed silently.
  */
object Graph {

  /** Fixed-iteration PageRank over an undirected edge list
    * (src, dst) — both directions are materialized internally; self
    * loops dropped. Returns (node, rank) for every node, rank
    * rounded(6) for cross-run determinism of the float fold. */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // filter AFTER the direction union: a self loop reversed is still a
    // self loop, and filtering only the forward leg would re-admit it
    // through the reversed one (caught by GraphSpec's noisy-graph pin)
    val bi = edges
      .select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val outDeg = bi.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nodes = bi.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = math.max(1L, nodes.count())
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // rank/degree divides NODE-side first, so the iteration's only
      // edge-sized join is the scatter itself — joining outDeg onto the
      // edge frame would double the per-iteration edge-cardinality work
      val perEdge = ranks.withColumnRenamed("node", "src")
        .join(outDeg, Seq("src"))
        .select(col("src"), (col("rank") / col("deg")).as("rpd"))
      val contribs = bi.join(perEdge, Seq("src"))
        .select(col("dst").as("node"), col("rpd").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_rank"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("in_rank"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** G1 — registered: PageRank over the j12 co-presence edges (users
    * whose sessions overlapped in time), top-20 most-central users.
    * Rows-only for the driver (an iterated float fixpoint has no
    * tractable SQL form); the recurrence itself is pinned on
    * hand-computed planted graphs in GraphSpec. */
  def g1PageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = Joins.allOverlapPairs(WindowFns.sessionSpans(spark, dir))
      .select(col("user_a").as("src"), col("user_b").as("dst"))
    pageRank(edges)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** G2 — triangle census + global clustering coefficient over the same
    * co-presence graph: how CLIQUISH is the concurrency structure
    * (3·triangles / wedges — near 0 means hub-and-spoke co-presence,
    * near 1 means tight cohorts; the one-number community signal read
    * before any clustering run, and the feature fraud models key on).
    *
    * The a<b-ordered edge list makes each triangle countable EXACTLY
    * once through its middle vertex: wedges (a<b<c) come from ONE
    * self-join of the edge list on the shared endpoint, closed by a
    * left-semi probe against the same edges — two equi-joins, no
    * nested loop, both AQE-splittable on a hub vertex. Wedge totals
    * are exact integer arithmetic (d·(d−1) div 2) off the degree
    * frame; the coefficient is the only float and divides two exact
    * longs (identical on both engines), guarded NULL on a wedge-free
    * graph. Unlike g1's iterated fixpoint this is fully SQL-expressible
    * — the graph tier's VALUE-oracled leg. */
  def g2TriangleCount(spark: SparkSession, dir: String): DataFrame =
    triangleStats(Joins.allOverlapPairs(WindowFns.sessionSpans(spark, dir))
      .select(col("user_a").as("a"), col("user_b").as("b")))

  /** The census kernel over any undirected edge list — canonicalized to
    * a<b internally (reversed duplicates collapse, self loops drop), so
    * the kernel is total rather than precondition-bound: a caller
    * passing (2,1) or both orientations still gets the right census. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val wedgeTotal = e.select(col("a").as("n"))
      .unionByName(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    val tri = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    tri.crossJoin(broadcast(wedgeTotal))
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_triangles") * 3.0 / col("n_wedges"), 6))
          .as("clustering_coeff"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> g1PageRank,
    "g2_triangle_count" -> g2TriangleCount
  )

  val oracle: Map[String, String] = Map(
    "g2_triangle_count" ->
      (s"WITH ${WindowFns.SessionSpansCte},\n" +
      """pr AS (
        |  SELECT DISTINCT a.user_id AS a, b.user_id AS b
        |  FROM spans a JOIN spans b
        |    ON a.user_id < b.user_id
        |   AND a.start_s <= b.end_s AND b.start_s <= a.end_s),
        |deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM pr UNION ALL SELECT b AS n FROM pr)
        |  GROUP BY n),
        |w AS (
        |  SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT)
        |    AS n_wedges FROM deg),
        |t AS (
        |  SELECT count(*) AS n_triangles
        |  FROM pr e1 JOIN pr e2 ON e1.b = e2.a
        |    JOIN pr e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT CAST(t.n_triangles AS BIGINT) AS n_triangles, w.n_wedges,
        |  CASE WHEN w.n_wedges = 0 THEN NULL
        |       ELSE round(3.0 * t.n_triangles / w.n_wedges, 6)
        |  END AS clustering_coeff
        |FROM t CROSS JOIN w""".stripMargin)
  )
}
