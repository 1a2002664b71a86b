package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join) — for every left row, the single
  * LATEST right row of the same key whose timestamp is ≤ the left
  * timestamp; unmatched left rows keep null payload (left-join
  * semantics). The canonical temporal primitive Spark's join menu
  * lacks (builder brief §custom operators): clickstream attribution
  * (click → last preceding view), price-as-of-trade, slowly-changing
  * dimension lookup.
  *
  * Spark-first shape (option (a): compose existing ops): a naive
  * formulation is an inequality θ-join — quadratic per key — followed
  * by an argmax. This is instead the MERGE formulation: union both
  * sides tagged, ONE shuffle on the key, per-key time-sorted window
  * carrying the last non-null right payload forward
  * (`last(ignoreNulls) over rows unbounded preceding..current row`),
  * keep the left rows. One shuffle + one sort — a sort-merge join's
  * cost, linear per key, AQE-skew-safe, no join explosion at any key
  * cardinality.
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (≤, the DuckDB/pandas ASOF convention) — right sorts before left at
  * equal timestamps via the side tag. Among right rows with the SAME
  * (key, timestamp) the payload struct itself is the final sort key,
  * so results stay deterministic, but which of two genuinely identical
  * instants "wins" is as arbitrary as it is in any ASOF engine — keep
  * (key, ts) unique on the right, as DuckDB's ASOF JOIN also asks.
  *
  * @param left  probe side; ALL its columns survive
  * @param right build side: `key`, `ts`, plus payload columns (pre-
  *              rename them; names must not collide with left's)
  * @param key   equi-key column name, same on both sides
  * @param ts    timestamp/ordering column name, same on both sides
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
      ts: String): DataFrame = {
    val payload = right.columns.filter(c => c != key && c != ts)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val collide = payload.intersect(left.columns)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val r = right.select(col(key), col(ts).as("__asof_ts"),
      lit(0).as("__side"), struct(payload.map(col): _*).as("__payload"))
    val l = left.select(col(key), col(ts).as("__asof_ts"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(left.columns.map(col): _*).as("__left"))
    val r2 = r.withColumn("__left",
      lit(null).cast(l.schema("__left").dataType))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r2.unionByName(l)
      .withColumn("__match",
        last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__left.*") +: payload.map(c =>
        col("__match").getField(c).as(c)): _*)
  }

  /** FORWARD as-of: for every left row, the single EARLIEST right row
    * of the same key with timestamp ≥ the left's ("next scheduled event
    * after this failure"). Same merge shape as [[asOf]] mirrored: left
    * rows sort BEFORE right rows at equal instants (≥ matches), and the
    * carried value is the first non-null payload in the
    * current-row..unbounded-following frame. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      ts: String): DataFrame = {
    val payload = right.columns.filter(c => c != key && c != ts)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val collide = payload.intersect(left.columns)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val r = right.select(col(key), col(ts).as("__asof_ts"),
      lit(1).as("__side"), struct(payload.map(col): _*).as("__payload"))
    val l = left.select(col(key), col(ts).as("__asof_ts"),
      lit(0).as("__side"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(left.columns.map(col): _*).as("__left"))
    val r2 = r.withColumn("__left",
      lit(null).cast(l.schema("__left").dataType))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    r2.unionByName(l)
      .withColumn("__match",
        first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__left.*") +: payload.map(c =>
        col("__match").getField(c).as(c)): _*)
  }
}
