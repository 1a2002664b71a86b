package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 history builder: compress an ordered
  * change stream into attribute VERSIONS with validity intervals — the
  * warehouse twin of [[Merge]]'s point-in-time upsert (Merge answers
  * "what is current", SCD2 answers "what was true when").
  *
  * Two steps, both window functions over the SAME (key, ts, tie)
  * partition-order: (1) run-compression — keep a row only where the
  * tracked attribute differs from its `lag`; (2) interval assembly —
  * `row_number` versions and `lead(ts)` as the exclusive end, NULL end =
  * current version. Catalyst plans both windows over one exchange+sort
  * (asserted in PlanAuditSpec), so the whole operator costs a single
  * key-shuffle — at 100 TB that is the floor for any per-key ordered
  * computation. No driver state, no iteration: history depth per key is
  * unbounded but never materialized wider than the change stream itself.
  */
object Scd2 {

  /** @param changes change stream; must contain `key`, `ts`, `tie`, `attr`
    * @param ts      event ordering column (use epoch millis for
    *                cross-engine-stable output)
    * @param tie     unique tiebreaker for same-ts changes
    * @param attr    the tracked attribute
    * @return key, version (1-based), attr_value, valid_from, valid_to
    *         (exclusive, NULL while current), is_current */
  def buildHistory(changes: DataFrame, key: Column, ts: Column, tie: Column,
      attr: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    changes
      .withColumn("__prev", lag(attr, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attr)
      .select(key.as("key"),
        row_number().over(w).as("version"),
        attr.as("attr_value"),
        ts.as("valid_from"),
        lead(ts, 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
