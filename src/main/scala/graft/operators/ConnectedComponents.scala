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
  * the shuffle key — followed by a map-side-combinable min-aggregate and
  * a POINTER JUMP (follow the label's own label — the path-halving
  * shortcut of Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): each round the effective propagation distance
  * DOUBLES, so rounds ≈ log₂(diameter), not diameter. Dedup clusters
  * (cliques from banding, diameter 1-3) converge in 2-3 rounds as
  * before; grid/chain graphs — the r12 cell-DBSCAN gate's 20×20 dense
  * grid has Chebyshev diameter 19, which plain propagation walked in 19
  * rounds, brushing the maxRounds cliff — converge in ~6 (PERF.md #33).
  * Lineage is cut per round through [[Checkpoints.cut]] (reliable mode
  * available session-wide); every round stays a plain shuffle join with
  * no driver-side graph state.
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
    val sym0 = e.unionByName(e.select(col("dst").as("src"),
      col("src").as("dst")))
    // self-loops make each node its own neighbor, so one equi-join
    // delivers min(self, neighbors) — no per-round Union of the label
    // relation with itself (which also trips Union constraint
    // inference on shared attribute ids)
    val sym = sym0.unionByName(
      sym0.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
      .cutLineage(eager = false)
    // lazy (r14 opt): the initial signature action below materializes
    // the label blocks AND reads the hash in one job — the eager cut
    // paid a separate materialization job first
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .cutLineage(eager = false)
    var round = 0
    var converged = false
    // cheap per-round change detector: the unordered hash signature of
    // the label relation. The relation is a deterministic function of
    // the round, so SIGNATURES DIFFER ⇒ definitely changed (skip the
    // expensive probe); signatures EQUAL ⇒ run the EXACT anti-join
    // probe, which remains the sole convergence authority — a hash
    // collision costs one extra probe, never a wrong answer.
    // bit_xor: commutative, duplicate-free by construction (one row
    // per node), and cannot overflow under ANSI arithmetic.
    // The SAME single job also reads the exact node count (r15 opt):
    // it sizes the next round's gated broadcast for free.
    def sigAndCount(df: DataFrame): (Long, Long) = {
      val r = df.agg(bit_xor(xxhash64(col("node"), col("comp"))),
        count(lit(1))).first()
      (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
    }
    var (prevSig, nNodes) = sigAndCount(labels)
    while (!converged && round < maxRounds) {
      // neighbor labels flow across edges (self-loops included, so the
      // min covers the node's own label); ONE equi-join + one
      // map-side-combinable min per round. The label vector is
      // node-cardinality — SIZE-GATED broadcast (r15 opt, guide §3.1,
      // the pagerank/HITS discipline): below the 5M cap the vector
      // rides map-side onto the materialized edge blocks and the round
      // costs ONE exchange (the dst min-aggregate) instead of
      // shuffling the edge relation per round; above the cap the node
      // id stays the shuffle key exactly as before. The exact count
      // comes from the previous round's signature job — no extra pass.
      val lb = Broadcasts.sizeGated(labels, nNodes)
      val prop0 = sym
        .join(lb, sym("src") === lb("node"))
        .select(col("dst").as("node"), col("comp"))
        .groupBy(col("node"))
        .agg(min(col("comp")).as("comp"))
      // pointer jump (path halving) from round 3 on: a label is itself
      // a node id, so follow it one hop — comp[n] := comp[comp[n]].
      // Labels only decrease monotonically, so the jump is always ≤
      // and the round count drops from O(diameter) to O(log diameter).
      // The first two rounds skip it: dedup-shaped graphs (banded
      // near-dup cliques, diameter 1-3) converge in 2-3 plain rounds,
      // and the jump's label-wide lookup would be pure overhead there;
      // deep graphs pay 2 plain rounds then go logarithmic. The jump
      // stays a plain self-join: its two legs share ONE computation of
      // prop through ReuseExchange, where a broadcast lookup side would
      // need an extra per-round materialization job (measured slower on
      // the many-round grid graphs the jump exists for).
      val next = if (round < 2) prop0.cutLineage(eager = false)
        else prop0.as("l")
          .join(prop0.select(col("node").as("cnode"),
            col("comp").as("pcomp")).as("p"),
            col("l.comp") === col("p.cnode"), "left")
          .select(col("l.node").as("node"),
            least(col("l.comp"), coalesce(col("pcomp"), col("l.comp")))
              .as("comp"))
          .cutLineage(eager = false)
      val (sig, n2) = sigAndCount(next)
      converged = sig == prevSig && next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .isEmpty
      prevSig = sig
      nNodes = n2
      labels = next
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        // scalastyle:off println
        println(s"[cc] round $round converged=$converged " +
          s"t=${System.nanoTime() / 1000000}")
        // scalastyle:on println
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
