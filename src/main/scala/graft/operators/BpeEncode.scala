package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Checkpoints.CutOps

/** Distributed BPE merge application — the tokenizer-side twin of the
  * pair-frequency MINING in `q_text_bpe_pairs`. A byte-pair-encoding
  * tokenizer is (vocab, ordered merge-rule list); applying it to a corpus
  * is "for each rule r in order: fuse every non-overlapping (a_r, b_r)
  * adjacency left-to-right". That per-token sequential loop becomes, in
  * relational form, ONE window pass over the token relation per rule:
  *
  *  - tokens are rows `(doc_id, pos, tok)`; rule matching is a `lead`
  *    comparison; greedy left-to-right non-overlap inside runs of
  *    consecutive matches (the "a a a a" case) falls out of run
  *    bookkeeping — a match fuses iff its offset inside its run is even,
  *    computed from two running sums;
  *  - every window partitions on `doc_id` alone, so a rule costs one
  *    exchange at most (Spark reuses the doc partitioning across the
  *    chained windows) and corpus work is O(tokens × rules), the same
  *    bound as the sequential algorithm — no self-joins, no driver loop
  *    over documents;
  *  - fused tokens are new symbols (`"a b"`), so a rule can never
  *    re-match its own output within a round, exactly the BPE contract.
  *
  * Lineage is cut between rules: each round's plan is seven window
  * columns deep, and without the cut the optimizer re-walks all prior
  * rounds per round (the iterate-union failure mode, PERF.md #13).
  */
object BpeEncode {

  /** Apply `rules` in order to `tokens` (`doc_id`, dense 1-based `pos`,
    * `tok`); returns the re-numbered fused token relation. */
  def applyMerges(tokens: DataFrame,
      rules: Seq[(String, String)]): DataFrame =
    rules.foldLeft(tokens.select(col("doc_id"), col("pos"), col("tok"))) {
      case (t, (a, b)) => applyRule(t, a, b).cutLineage(eager = false)
    }

  /** One rule pass (package-visible so PlanAuditSpec can audit the
    * pre-checkpoint plan — the public fold cuts lineage per rule). */
  private[graft] def applyRule(t: DataFrame, a: String,
      b: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("nxt", lead(col("tok"), 1).over(w))
      // coalesce: the doc-final token has nxt NULL — not a match
      .withColumn("m",
        coalesce(col("tok") === lit(a) && col("nxt") === lit(b),
          lit(false)))
      .withColumn("runStart",
        col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
      // k-th match of its run = rnm − base: fuse iff even (greedy
      // left-to-right non-overlap); base is the run-start's match count,
      // recovered with a running max so every window stays on doc_id
      .withColumn("rnm", sum(when(col("m"), 1).otherwise(0)).over(wc))
      .withColumn("base",
        max(when(col("runStart"), col("rnm"))).over(wc))
      .withColumn("merged",
        col("m") && (col("rnm") - col("base")) % 2 === 0)
      // the token AFTER a fuse was consumed by it
      .withColumn("del", coalesce(lag(col("merged"), 1).over(w), lit(false)))
      .filter(!col("del"))
      .select(col("doc_id"), row_number().over(w).as("pos"),
        when(col("merged"), concat(col("tok"), lit(" "), col("nxt")))
          .otherwise(col("tok")).as("tok"))
  }
}
