package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE (upsert) — the engine twin of the reference's JDBC
  * write-back (SURVEY §2.1 S12, `etl_lalf_road_qrt_spatial_match.py:115-138`:
  * per-row `UPDATE lf_road SET qrt_road_id … WHERE road_id = …`), generalized
  * to the full MERGE INTO verb: matched rows take the source's values
  * (update), unmatched source rows are inserted, unmatched target rows are
  * kept, and matched rows carrying the source's delete flag are dropped.
  *
  * Shape at scale: ONE full-outer equi-join on the key — both sides shuffle
  * once on the merge key (or the source side broadcasts when it is a small
  * delta batch, which Catalyst/AQE decides from its size). No driver state,
  * no per-row round trips — the reference's row-at-a-time UPDATE loop becomes
  * a single co-partitioned pass, which is the only merge shape that survives
  * 100 TB targets. Output is the complete next version of the target (the
  * Parquet-era idiom: rewrite-on-merge rather than in-place mutation).
  */
object Merge {

  /** Merge `source` into `target` by equality on `key` (both sides must
    * carry the column; remaining columns must be name-compatible).
    *
    * @param deleteFlag optional boolean source column: matched && flag →
    *                   row dropped from the output (MERGE's DELETE branch).
    * @return the merged relation with the target's columns plus an `action`
    *         column (`insert` / `update` / `keep`) for auditability —
    *         drop it when materializing the new target.
    */
  def upsert(target: DataFrame, source: DataFrame, key: String,
             deleteFlag: Option[String] = None): DataFrame = {
    val dataCols = target.columns.filterNot(_ == key).toSeq
    require(dataCols.forall(source.columns.contains),
      s"source must carry the target's columns; missing " +
        dataCols.filterNot(source.columns.contains).mkString(","))
    val t = target.select(col(key) +: dataCols.map(col): _*)
    val srcCols = col(key) +: dataCols.map(col) ++:
      deleteFlag.map(col).toSeq
    val sr = source.select(srcCols: _*)
    val joined = t.as("t").join(sr.as("s"),
      col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matchedDelete = deleteFlag match {
      case Some(f) => col(s"t.$key").isNotNull && col(s"s.$key").isNotNull &&
        coalesce(col(s"s.$f"), lit(false))
      case None => lit(false)
    }
    // A present source row wins WHOLESALE (even where its columns are
    // NULL) — per-value coalesce would silently resurrect target values
    // under legitimate source NULLs, the classic merge-by-coalesce bug.
    val srcPresent = col(s"s.$key").isNotNull
    joined
      .filter(!matchedDelete)
      .select(
        coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +:
          dataCols.map(c =>
            when(srcPresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)) :+
          when(col(s"t.$key").isNull, "insert")
            .when(!srcPresent, "keep")
            .otherwise("update").as("action"): _*)
  }
}
