package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication — the ExactSubstr operator of Lee et
  * al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL'22): any character span of length ≥ W that occurs in MORE THAN
  * ONE document is removed from every document carrying it. Unlike the
  * MinHash/SimHash family (which drops whole near-duplicate documents),
  * this cuts the duplicated SPANS and keeps the unique remainder — the
  * right tool for boilerplate headers, license blocks and templated
  * text that contaminate otherwise-unique pages.
  *
  * The paper builds a corpus-wide suffix array; the relational
  * formulation here reaches the same fixed point for spans ≥ W without
  * any global structure:
  *
  *  1. every W-char window of every document, exploded to
  *     `(window, doc, start)` — windows of a span duplicated across
  *     docs are themselves duplicated across docs, so marking every
  *     window that occurs in >1 document marks exactly the maximal
  *     duplicated spans (overlapping windows re-assemble them);
  *  2. duplicated windows found by ONE partial-aggregable groupBy on
  *     the window text (count distinct docs > 1);
  *  3. per-document interval merge of the marked windows
  *     (gaps-and-islands: running max of span ends, island = jump);
  *  4. span subtraction per document (an `aggregate` HOF walking the
  *     sorted span array, concatenating the kept segments).
  *
  * Scale: the window explosion is the dominant shuffle — W bytes per
  * character position (stride 1). For a 100 TB corpus, hash each
  * window to 8 bytes first and verify survivors with a second join
  * (two-phase hash-verify), or winnow with stride S < W−minSpan; both
  * cut the shuffle by ~W× without changing the result. Everything
  * downstream is keyed by doc id — ordinary hash aggregation at any
  * scale. Matching is byte-exact (the window TEXT is the key), so a
  * hash collision can never remove a non-duplicated span.
  */
object ExactSubstrDedup {

  /** Returns `(id, clean, n_spans, chars_removed)` — one row per input
    * document, `clean` with every cross-document duplicated span ≥ `w`
    * chars removed. Adjacent/overlapping marked windows merge before
    * cutting, so each maximal duplicated region is cut exactly once. */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 4, "window must be at least 4 chars")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))

    // feeds BOTH the repeat set and the probe join — cut the lineage so
    // the explosion computes once (the q_text_winnowing discipline)
    import Checkpoints.CutOps
    val windows = base
      .select(col("id"), col("text"),
        explode(expr(
          s"sequence(1, greatest(length(text) - ${w - 1}, 0))")).as("g"))
      .select(col("id"), col("g").as("start"),
        (col("g") + (w - 1)).as("end"),
        expr(s"substring(text, g, $w)").as("win"))
      .cutLineage(eager = false)

    val dupWins = windows.groupBy(col("win"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("win"))

    val marked = windows.join(dupWins, "win")
      .select(col("id"), col("start"), col("end"))

    val before = Window.partitionBy(col("id")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy(col("id")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = marked
      .withColumn("pm", max(col("end")).over(before))
      .withColumn("isNew",
        when(col("pm").isNull || col("start") > col("pm") + 1, 1)
          .otherwise(0))
      .withColumn("island", sum(col("isNew")).over(running))
      .groupBy(col("id"), col("island"))
      .agg(min(col("start")).as("s"), max(col("end")).as("e"))

    val spanArr = spans.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("spans"))

    base.join(spanArr, Seq("id"), "left")
      .withColumn("clean",
        when(col("spans").isNull, col("text"))
          .otherwise(expr(
            """concat(
              |  aggregate(spans, named_struct('pos', 1, 'acc', ''),
              |    (st, sp) -> named_struct('pos', sp.e + 1,
              |      'acc', concat(st.acc,
              |        substring(text, st.pos, sp.s - st.pos)))).acc,
              |  substring(text, element_at(spans, -1).e + 1,
              |    length(text)))""".stripMargin)))
      .select(col("id"),
        col("clean"),
        coalesce(size(col("spans")), lit(0)).cast("long").as("n_spans"),
        coalesce(expr(
          "aggregate(spans, 0L, (a, sp) -> a + sp.e - sp.s + 1)"),
          lit(0L)).as("chars_removed"))
  }
}
