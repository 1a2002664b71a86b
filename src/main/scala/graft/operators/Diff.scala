package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — derive a change feed from two table VERSIONS (the
  * inverse of [[Merge]], which applies one): full-outer join on the key,
  * classify each row as insert / delete / update / same by comparing the
  * tracked columns null-safely. This is the CDC primitive for sources
  * that only hand you periodic full dumps — at 100 TB the diff is one
  * co-partitioned shuffle join on the key (both sides hash the same key;
  * AQE handles size asymmetry), and downstream consumers get the delta
  * instead of re-processing the dump.
  */
object Diff {

  /** @param compareCols columns whose change makes an `update`; rows
    *   equal on all of them (null-safely) classify as `same`.
    * @return key, action, one `old_`/`new_` pair per compared column */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need columns to compare")
    val o = oldDf.select((key +: compareCols).map(col): _*).as("o")
    val n = newDf.select((key +: compareCols).map(col): _*).as("n")
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    val outCols =
      Seq(coalesce(col(s"o.$key"), col(s"n.$key")).as("key"),
        when(col(s"o.$key").isNull, "insert")
          .when(col(s"n.$key").isNull, "delete")
          .when(changed, "update")
          .otherwise("same").as("action")) ++
        compareCols.flatMap(c => Seq(
          col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(outCols: _*)
  }
}
