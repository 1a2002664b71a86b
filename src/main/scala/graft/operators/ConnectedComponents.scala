package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints.CutOps

/** Connected components over a pair relation — the clustering step a
  * large-scale dedup pipeline runs AFTER near-dup pair detection: pairs
  * only say "a duplicates b"; keeping one canonical document per GROUP
  * needs the transitive closure (a~b, b~c ⇒ {a,b,c} is one cluster).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled with
  * itself; each round, a node's label becomes the min of its own and its
  * neighbors' labels; at fixpoint every node in a component carries the
  * component's minimum id — which is simultaneously the canonical
  * "keep" choice (min doc_id), so no second pass.
  *
  * Scale shape: each round is ONE equi-join of the (symmetrized) edge
  * relation against the label relation keyed on node id — the node id is
  * the shuffle key — followed by a map-side-combinable min-aggregate.
  * Rounds = component diameter, and near-dup clusters are shallow (dup
  * groups are cliques or near-cliques from banding, diameter 1-3), so
  * 3-4 rounds is typical. Lineage is cut per round through
  * [[Checkpoints.cut]] (reliable mode available session-wide). For
  * adversarial long-chain graphs (diameter ≫ 10) prefer the
  * star-contraction variants (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — same join shape, fewer rounds; the
  * propagation loop here keeps every round a plain shuffle join with no
  * driver-side graph state, which is the right trade for dedup-shaped
  * inputs.
  *
  * Convergence is detected by an anti-join probe (`changed.isEmpty`) —
  * one cheap action per round, no `collect()` of labels.
  */
object ConnectedComponents {

  /** Label every node of the undirected graph `edges` with its
    * component's minimum node id.
    *
    * @param edges one row per undirected edge
    * @param a,b   edge endpoint columns (any orderable, id-like type)
    * @param maxRounds hard stop; with convergence unreached after it, an
    *                  IllegalStateException names the round count (a
    *                  silently-partial clustering would merge dup groups
    *                  wrongly downstream — fail loud instead)
    * @return (node, comp) — every node that appears in `edges`
    */
  def label(edges: DataFrame, a: Column, b: Column,
      maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val e = edges.select(a.as("src"), b.as("dst"))
    val sym = e.unionByName(e.select(col("dst").as("src"),
      col("src").as("dst"))).cutLineage(eager = false)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .cutLineage()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // neighbor labels flow across edges; min with the node's own label
      val fromNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("comp"))
      val next = labels.select(col("node"), col("comp"))
        .unionByName(fromNeighbors)
        .groupBy(col("node"))
        .agg(min(col("comp")).as("comp"))
        .cutLineage()
      converged = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .isEmpty
      labels = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    labels
  }

  /** Incremental maintenance: fold `newEdges` into an existing
    * `(node, comp)` labeling WITHOUT re-reading the old edge relation.
    * Old components are connectivity-equivalent to their STAR (every
    * member → its hub label), so `label(star ∪ newEdges)` yields the
    * exact labels a full recompute over (oldEdges ∪ newEdges) would —
    * including transitive merges where one new edge bridges two old
    * components and every member of both must relabel. The star keeps
    * old-component diameter at 2, so rounds stay bounded by the NEW
    * edges' merge depth, not the accumulated graph's — the property
    * that makes per-batch maintenance affordable at 100 TB (the
    * persisted label relation is the state; the edge history is never
    * replayed). */
  def incrementalLabel(labels: DataFrame, newEdges: DataFrame,
      a: Column, b: Column, maxRounds: Int = 20): DataFrame = {
    val star = labels.select(col("node").as("src"), col("comp").as("dst"))
    val e = newEdges.select(a.as("src"), b.as("dst"))
    label(star.unionByName(e), col("src"), col("dst"), maxRounds)
  }
}
