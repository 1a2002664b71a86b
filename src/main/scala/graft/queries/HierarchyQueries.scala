package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

import graft.operators.Checkpoints.CutOps

/** SURVEY §2.3 J12 — recursive/iterative hierarchy traversal. The
  * reference walks site parent chains with a recursive CTE
  * (`etl-notes.md:663-692`) and place-name history depth-first
  * (`etl-notes.md:770`). Spark has no recursive CTE; the idiomatic
  * equivalent is the iterate-union loop: join the frontier to the edge
  * table until it empties, `localCheckpoint` every round to cut lineage
  * (without it the plan doubles per level and the optimizer re-walks the
  * whole history each iteration — the 100 TB failure mode).
  *
  * The edge table is a synthesized binary forest over `customer`
  * (parent(k) = k div 2), giving log₂(N) levels — the driver-side loop
  * count is bounded by tree DEPTH, never by row count.
  */
object HierarchyQueries extends QueryCatalog {

  private def traverse(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(s, dir)
      .select(col("c_custkey").as("node"),
        expr("c_custkey div 2").as("parent"))
    val children = nodes.filter(col("node") > 1)
    var acc = nodes.filter(col("node") <= 1)
      .select(col("node"), lit(0).as("level"),
        concat(lit("/"), col("node").cast("string")).as("path"))
    var frontier = acc.cutLineage(eager = false)
    var levelCount = frontier.count()
    while (levelCount > 0) {
      // examined r15: gating the frontier broadcast here (the CC-round
      // discipline) measured SLOWER (3.0→3.4 s / 3.3→4.8 s warm) — at
      // log₂(N) levels the per-level broadcast-build job costs more
      // than the small join shuffles it replaces. The loop keeps the
      // plain join; AQE still localizes small frontiers at runtime.
      val next = frontier.as("f")
        .join(children.as("c"), col("c.parent") === col("f.node"))
        .select(col("c.node").as("node"),
          (col("f.level") + 1).as("level"),
          concat(col("f.path"), lit("/"), col("c.node").cast("string"))
            .as("path"))
        // ONE action per round (r14 opt, the BFS discipline): the lazy
        // cut's blocks materialize inside the count() that is already
        // the emptiness probe — eager-cut + count was two scheduled
        // jobs per level, ~2× the loop's job count at depth log₂(N)
        .cutLineage(eager = false)
      levelCount = next.count()
      if (levelCount > 0) acc = acc.unionByName(next)
      frontier = next
    }
    acc
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full traversal: every node with its depth and root path — the
    // "site parent chain" shape (level + path, etl-notes.md:663-692).
    "q_recursive_hierarchy" -> ((s, dir) =>
      traverse(s, dir).orderBy(col("node"))),

    // Aggregate twin: nodes per level (the validation-count view of the
    // same traversal).
    "q_recursive_levels" -> ((s, dir) =>
      traverse(s, dir)
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n"),
          min(col("node")).as("min_node"),
          max(col("node")).as("max_node"))
        .orderBy(col("level")))
      ,

    // PageRank (damping 0.85, 2 fixed iterations) over the bipartite
    // customer↔supplier trade graph (each distinct (cust, supp) pair from
    // orders⋈lineitem becomes two directed edges). The other iterative-
    // graph shape next to the frontier loop above and ConnectedComponents:
    // per iteration, ranks equi-join edges on src (shuffle key) and the
    // contributions groupBy-SUM on dst with map-side partials — the
    // textbook distributed PageRank step, no driver state beyond the loop
    // counter. Parity: each iteration's rank is rounded to 9 dp on BOTH
    // sides (same trick as Clustering.lloyd's centroid rounding), so
    // engine-order float summation cannot drift across iterations; only
    // the single-row node count is broadcast. Fixed iteration count keeps
    // the oracle replayable; every node here has out-degree ≥ 1 (edges go
    // both ways), so there is no dangling-mass term.
    "q_graph_pagerank" -> ((s, dir) => {
      val pairs = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
      // one materialization of the edge relation: edges feed deg, nodes
      // and BOTH iterations — without the cut the orders⋈lineitem
      // distinct recomputes per consumer (measured 5.5 s → 3.4 s at
      // sf0.1 together with the broadcasts below; same lineage
      // discipline as the traverse loop above). Node ids are NUMERIC
      // (2·custkey / 2·suppkey+1): long-keyed shuffles and checkpoints
      // move fixed-width rows, not concatenated strings — the id space
      // is disjoint by parity, and the oracle replays the arithmetic.
      // r15 opt (guide §2.3): cut the HALF-SIZE pair relation, not the
      // symmetrized edge relation — the union above the materialized
      // blocks is projection-only, so every consumer reads |pairs|
      // blocks twice instead of materializing (and then reading) a 2×
      // copy. Lazy: nodes.count() below is the loop's first action
      // anyway — it materializes the pair blocks AND the node blocks
      // and reads the cardinality in ONE job, where the r13 eager cut
      // paid a separate scheduled materialization pass first.
      val pairsM = pairs.cutLineage(eager = false)
      val edges = pairsM.select((col("c") * 2).as("src"),
          (col("sp") * 2 + 1).as("dst"))
        .unionByName(pairsM.select((col("sp") * 2 + 1).as("src"),
          (col("c") * 2).as("dst")))
      // rank and degree vectors are node-cardinality (≪ edges) — below
      // the cap they BROADCAST onto the edge scan, so one iteration =
      // one pass over the edges with a map-side-partial contribution
      // sum; each iteration's rank vector is cut so the next join
      // builds from materialized rows, not the replayed plan. The
      // vectors grow LINEARLY with the data, so the hint is SIZE-GATED
      // (Broadcasts.sizeGated): past ~5M nodes the node id stays the
      // shuffle key and the joins degrade to hash exchanges instead of
      // OOMing the driver — nn stays a 1-row broadcast at any scale.
      // lazy cut (r14 opt): count() materializes the blocks AND reads
      // the exact cardinality in one job (eager cut + count was two)
      val nodes = edges.select(col("src").as("node")).distinct()
        .cutLineage(eager = false)
      val nNodes = nodes.count() // exact: the count materialized nodes
      def gated(df: DataFrame): DataFrame =
        graft.operators.Broadcasts.sizeGated(df, nNodes)
      val nn = nodes.agg(count(lit(1)).as("nn"))
      // lazy (r15 opt): the first iteration's contribution build below
      // is deg's first consumer — it materializes the blocks in place
      // of the separate eager-cut job
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .cutLineage(eager = false)
      var ranks = nodes.crossJoin(broadcast(nn))
        .select(col("node"), (lit(1.0) / col("nn")).as("rank"))
      val Iters = 2
      for (i <- 1 to Iters) {
        // r15 opt (guide §2.4/§3.1): fold the static out-degree into the
        // rank vector BEFORE it rides onto the edges — contrib is a
        // node-cardinality ⋈ node-cardinality join (deg gated-broadcast
        // under the cap), so each iteration ships ONE score vector onto
        // the edge scan instead of two (r14 shape: broadcast(ranks) AND
        // broadcast(deg) both built per iteration). Arithmetic is
        // unchanged: q = rank/outdeg is the identical double the old
        // per-edge-row division produced (same operands, computed once
        // per src instead of once per edge row), and the contribution
        // sum aggregates the same multiset.
        val contrib = ranks.join(gated(deg), col("node") === col("src"))
          .select(col("node"), (col("rank") / col("outdeg")).as("q"))
        ranks = edges.join(gated(contrib), col("src") === col("node"))
          .crossJoin(broadcast(nn))
          .groupBy(col("dst"), col("nn"))
          .agg((lit(0.15) / col("nn") +
            lit(0.85) * sum(col("q"))).as("raw"))
          .select(col("dst").as("node"), round(col("raw"), 9).as("rank"))
        // cut BETWEEN iterations only: the next broadcast then builds from
        // materialized rows; the final vector flows straight to the top-k
        // (lazy: the next iteration's broadcast build materializes it —
        // no separate scheduled job)
        if (i < Iters) ranks = ranks.cutLineage(eager = false)
      }
      ranks.orderBy(col("rank").desc, col("node")).limit(20)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("node_type"),
          expr("node DIV 2").as("entity_key"),
          col("rank"))
    })
  )

  private val recursiveCte =
    """WITH RECURSIVE r AS (
      |  SELECT c_custkey AS node, 0 AS level,
      |    '/' || CAST(c_custkey AS VARCHAR) AS path
      |  FROM customer WHERE c_custkey <= 1
      |  UNION ALL
      |  SELECT c.c_custkey, r.level + 1,
      |    r.path || '/' || CAST(c.c_custkey AS VARCHAR)
      |  FROM customer c JOIN r ON (c.c_custkey // 2) = r.node
      |  WHERE c.c_custkey > 1)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_recursive_hierarchy" ->
      s"""$recursiveCte
         |SELECT node, level, path FROM r ORDER BY node""".stripMargin,
    "q_recursive_levels" ->
      s"""$recursiveCte
         |SELECT level, COUNT(*) AS n, MIN(node) AS min_node,
         |  MAX(node) AS max_node
         |FROM r GROUP BY level ORDER BY level""".stripMargin,
    "q_graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS (
        |  SELECT c * 2 AS src, sp * 2 + 1 AS dst FROM pairs
        |  UNION ALL SELECT sp * 2 + 1, c * 2 FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |n AS (SELECT COUNT(*) AS nn FROM nodes),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT node, 1.0 / nn AS rank FROM nodes, n),
        |i1 AS (
        |  SELECT e.dst AS node,
        |    round(0.15 / nn + 0.85 * SUM(r.rank / d.outdeg), 9) AS rank
        |  FROM edges e JOIN r0 r ON e.src = r.node
        |    JOIN deg d ON e.src = d.src, n
        |  GROUP BY e.dst, nn),
        |i2 AS (
        |  SELECT e.dst AS node,
        |    round(0.15 / nn + 0.85 * SUM(r.rank / d.outdeg), 9) AS rank
        |  FROM edges e JOIN i1 r ON e.src = r.node
        |    JOIN deg d ON e.src = d.src, n
        |  GROUP BY e.dst, nn)
        |SELECT node,
        |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  node // 2 AS entity_key, rank
        |FROM i2 ORDER BY rank DESC, node LIMIT 20""".stripMargin
  )
}
