package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine: a rule SPEC compiled to a
  * violations DataFrame, the relational twin of the SHACL shape layer in
  * [[graft.rdf]] (reference analogue: the pre-validation SQL checks and
  * count-parity assertions the reference runs before each load,
  * `etl-notes.md` "validation" — generalized from hand-written queries to
  * a compiled spec, the same declarative-over-imperative move as EmitSpec).
  *
  * Scale shape, by rule kind:
  *  - ROW checks (domain, range, nullability, format): ALL compiled into
  *    ONE aggregate pass — `sum(when(!holds, 1))` per rule in a single
  *    `agg` — so adding a rule never adds a scan. The aggregate is
  *    map-side-combinable; the result is one row, unpivoted driver-free
  *    with `stack`.
  *  - UNIQUE checks: one hash aggregation on the key (the inherent cost of
  *    uniqueness), counting rows in over-populated groups.
  *  - FK checks: left-anti join against the (deduplicated) dimension key —
  *    broadcast when the dim is small, shuffle-hash otherwise; Catalyst
  *    picks per its stats.
  * The per-kind results are tiny (one row each) and union cheaply.
  */
object DataQuality {

  /** A row-level expectation: a row violates when `holds` is false OR
    * null (SQL three-valued logic would otherwise let a null slip both
    * the rule and its negation). */
  final case class Check(id: String, holds: Column)

  /** All row-level checks in one aggregate pass over `df`. */
  def checkViolations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "checkViolations needs at least one rule")
    val aggs = checks.map { c =>
      sum(when(coalesce(c.holds, lit(false)), 0L).otherwise(1L)).as(c.id)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(c => s"'${c.id}', coalesce(${c.id}, 0L)")
      .mkString(", ")
    one.selectExpr(
      s"stack(${checks.size}, $stackArgs) AS (rule_id, violations)")
  }

  /** Rows participating in a duplicated `keys` group (0 when unique). */
  def uniqueViolations(id: String, df: DataFrame, keys: Seq[Column])
      : DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
      .select(lit(id).as("rule_id"), col("violations"))

  /** Fact rows whose key has no match in the dimension key set. */
  def fkViolations(id: String, fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column): DataFrame =
    fact.select(factKey.as("fk_key"))
      .join(dim.select(dimKey.as("fk_key")).distinct(), Seq("fk_key"),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(id).as("rule_id"), col("violations"))

  /** Stitch per-kind reports into one ordered violations relation. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _).orderBy(col("rule_id"))
}
