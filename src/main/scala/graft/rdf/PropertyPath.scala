package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints.CutOps

/** SPARQL property paths (`pred+`) over the quad relation — the third
  * serving verb next to DESCRIBE and BGP SELECT. The reference serves its
  * emitted graph through a SPARQL store (`cam/graphdb.py`), where
  * one-or-more paths power the hierarchy walks its notes express as
  * recursive CTEs (`etl-notes.md:663-692`).
  *
  * Spark-first shape: breadth-first semi-naive closure — each round joins
  * the FRONTIER (pairs discovered last round, not the whole closure) to
  * the edge relation on the hop key, anti-joins the accumulated closure so
  * already-known pairs never re-expand, and cuts lineage so the plan stays
  * one-join-deep per round. Rounds = graph diameter; the anti-join makes
  * the loop terminate on CYCLIC graphs too (a pair can only be discovered
  * once). At 100 TB every round is one shuffle keyed on the join node —
  * the same discipline as ConnectedComponents/PageRank; no driver-side
  * graph state beyond the loop counter.
  */
object PropertyPath {

  /** Transitive closure of an edge relation `(src, dst)` →
    * `(src, dst, dist)` where `dist` is the minimum hop count (≥ 1).
    * Set semantics on pairs; safe on cycles (see object doc).
    *
    * @param maxDepth hard bound on rounds — a closure that genuinely
    *                 needs more is a modelling smell (SPARQL engines
    *                 bound recursion the same way)
    */
  def closure(edges: DataFrame, maxDepth: Int = 32): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cutLineage()
    var acc = e.select(col("src"), col("dst"), lit(1).as("dist"))
    var frontier = acc
    var depth = 1
    var more = frontier.limit(1).count() > 0
    while (more && depth < maxDepth) {
      val next = frontier.as("f")
        .join(e.as("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"),
          (col("f.dist") + 1).as("dist"))
        // several length-(d+1) paths can reach the same pair this round
        .groupBy(col("src"), col("dst"))
        .agg(min(col("dist")).as("dist"))
        // known pairs (shorter or equal paths) never re-expand — this is
        // both the min-dist guarantee and the cycle-termination proof
        .join(acc.select(col("src"), col("dst")), Seq("src", "dst"),
          "left_anti")
        .cutLineage()
      depth += 1
      more = next.limit(1).count() > 0
      if (more) {
        acc = acc.unionByName(next)
        frontier = next
      }
    }
    acc
  }

  /** SPARQL `<predicate>+`: subject→object pairs connected by one or more
    * `predicate` edges, with the minimum hop distance. */
  def transitive(quads: DataFrame, predicate: String,
      maxDepth: Int = 32): DataFrame =
    closure(
      quads.filter(col("predicate") === predicate)
        .select(col("subject").as("src"), col("objectValue").as("dst")),
      maxDepth)
      .select(col("src").as("subject"), col("dst").as("ancestor"),
        col("dist"))
}
