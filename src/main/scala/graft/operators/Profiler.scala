package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiler (the deequ/Glue-crawler verb): row count,
  * null count, exact distinct count, min/max per column, emitted as one
  * long-form stats relation — the pre-ingest data-quality gate a 100 TB
  * pipeline runs before trusting a new drop.
  *
  * Scale shape: ONE aggregation over the input — every metric is
  * partial-aggregable, and the multiple exact `countDistinct`s plan as
  * Spark's Expand strategy (rows × profiled-columns, combined map-side)
  * so the input is still read once. At 100 TB swap the exact distincts
  * for `approx_count_distinct` (one pass, mergeable HLL sketches — the
  * same trade as q_agg_approx_distinct); exact is the oracle-replayable
  * default here. The wide→long stack is a single-row explode on the
  * driver-sized agg result — free.
  *
  * Numeric min/max surface as DOUBLE (`min_num`/`max_num`), string
  * min/max as VARCHAR (`min_str`/`max_str`) — never numbers-as-strings,
  * whose engine-specific double formatting would break cross-engine
  * comparison.
  */
object Profiler {

  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "nothing to profile")
    val metricAggs = (numericCols ++ stringCols).flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__nd"))
    } ++ numericCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    } ++ stringCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val row = df.agg(count(lit(1)).as("__total"), metricAggs: _*)

    def base(c: String): Seq[(String, Column)] = Seq(
      "col_name" -> lit(c),
      "n_rows" -> col("__total"),
      "n_null" -> (col("__total") - col(s"${c}__cnt")),
      "n_distinct" -> col(s"${c}__nd"))
    val entries =
      numericCols.map { c =>
        struct((base(c) ++ Seq(
          "min_num" -> col(s"${c}__min"), "max_num" -> col(s"${c}__max"),
          "min_str" -> lit(null).cast("string"),
          "max_str" -> lit(null).cast("string")))
          .map { case (n, e) => e.as(n) }: _*)
      } ++ stringCols.map { c =>
        struct((base(c) ++ Seq(
          "min_num" -> lit(null).cast("double"),
          "max_num" -> lit(null).cast("double"),
          "min_str" -> col(s"${c}__min"), "max_str" -> col(s"${c}__max")))
          .map { case (n, e) => e.as(n) }: _*)
      }
    row.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
