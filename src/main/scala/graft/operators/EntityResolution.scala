package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter shape): candidate pairs
  * from blocking, per-field agreement evidence summed as match weights,
  * a threshold splitting matches from non-matches. The reference's
  * pipelines link records with exact keys; this is the fuzzy twin every
  * large-scale MDM/dedup system runs when keys are missing or dirty.
  *
  * Scale shape: the ONLY join is the block-keyed self equi-join — the
  * classic blocking bargain (quadratic only within a block, so block
  * keys must bound block size; [[graft.queries.PairJoins]]' skew
  * diagnostics apply). Field comparisons and the weighted sum are pure
  * per-pair projections: no further shuffle, full codegen. Weights stay
  * DECIMAL so the evidence sum is exact and engine-replayable.
  */
object EntityResolution {

  /** One linkage field: `agree` is evaluated over the paired relation
    * (columns `a_*` / `b_*`); agreement adds `wAgree`, disagreement adds
    * `wDisagree` (typically negative) — log-likelihood-ratio style. */
  final case class FieldWeight(agree: Column, wAgree: BigDecimal,
      wDisagree: BigDecimal)

  /** Self-join candidate pairs within blocks: every column of `df`
    * appears twice, prefixed `a_` / `b_`; pairs are deduplicated by
    * requiring `a_<idCol> < b_<idCol>`. `blockCols` should already be
    * coarse keys (bucketed/truncated), not raw values. */
  def blockPairs(df: DataFrame, blockCols: Seq[String],
      idCol: String): DataFrame = {
    val a = df.toDF(df.columns.map("a_" + _): _*)
    val b = df.toDF(df.columns.map("b_" + _): _*)
    val cond = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduce(_ && _) && (col(s"a_$idCol") < col(s"b_$idCol"))
    a.join(b, cond)
  }

  /** The summed match weight for a pair row. DECIMAL(6,1) arithmetic:
    * a handful of one-decimal weights can never hit a rounding edge. */
  def matchWeight(fields: Seq[FieldWeight]): Column =
    fields.map { f =>
      when(f.agree, lit(f.wAgree.underlying).cast("decimal(6,1)"))
        .otherwise(lit(f.wDisagree.underlying).cast("decimal(6,1)"))
    }.reduce(_ + _)
}
