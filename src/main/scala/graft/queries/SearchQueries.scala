package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** SURVEY §2.10 — the text/search serving surface:
  *
  *  - T1 prefix autocomplete (GraphDB autocomplete REST,
  *    `cam/graphdb.py:5-35`, `cam/web/app.py:37-44`): tokenize into an
  *    inverted-index relation, prefix-filter, rank by document frequency.
  *  - T2 scored full-text query (Jena text index,
  *    `etl-notes-data-loading.md:100`): tf·idf scoring over query terms,
  *    ORDER BY score DESC LIMIT 10 (O5).
  *  - T3 faceted filter + sort + paginate (Redis FT query builder,
  *    `meili/main.py:50-105`): facet predicates + deterministic sort +
  *    offset/limit page, plus the facet-value counts (A7,
  *    `meili/main.py:36-47`).
  *
  * Scale notes: the inverted index is a groupBy shuffle keyed by token —
  * materialize it once and bucket by token for repeated queries; the
  * prefix filter pushes down as a range scan on a token-sorted layout.
  * Deep offset pagination requires a global sort; at 100 TB serve pages
  * keyset-style (WHERE sortkey > last_seen LIMIT n) instead — O4 is the
  * capability demo.
  */
object SearchQueries extends QueryCatalog {

  private val Terms = Seq("spark", "join", "fast")

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(lower(normalizeWs(col("text"))), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1: prefix autocomplete over the inverted index: tokens starting
    // 's', ranked by document frequency (df desc, token), top 10.
    "q_search_prefix" -> ((s, dir) => {
      tokens(s, dir)
        .filter(col("tok").startsWith("s"))
        .groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("tf_total"))
        .orderBy(col("df").desc, col("tok"))
        .limit(10)
    }),

    // T2: tf·idf scored search for a 3-term query. idf = ln(N/df); the
    // score is rounded in the OUTPUT only (ranking uses the raw double;
    // equal tf-vectors tie-break on doc_id).
    "q_search_scored" -> ((s, dir) => {
      val toks = tokens(s, dir)
      val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val tf = toks
        .filter(col("tok").isin(Terms: _*))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"))
      tf.join(broadcast(df), Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("w",
          col("tf") * log(col("n_docs").cast("double") / col("df")))
        .groupBy(col("doc_id"))
        .agg(sum(col("w")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
    }),

    // T3: faceted filter + sort + paginate (page 2 of 10).
    "q_search_facet_page" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("lang").isin("en", "de") &&
          col("n_chars").between(100, 400))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .offset(5).limit(10)
    }),

    // A7/T3: distinct facet values with counts (FT.TAGVALS twin).
    "q_search_facet_counts" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("n_chars").between(100, 400))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_search_prefix" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents)
        |SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf_total
        |FROM toks WHERE tok LIKE 's%' AND length(tok) > 0
        |GROUP BY tok ORDER BY df DESC, tok LIMIT 10""".stripMargin,
    "q_search_scored" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'join', 'fast') AND length(tok) > 0
        |  GROUP BY doc_id, tok),
        |idf AS (
        |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, SUM(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df)) AS score
        |  FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN n
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, round(score, 6) AS score FROM (
        |  SELECT doc_id, score FROM scored
        |  ORDER BY score DESC, doc_id LIMIT 10) top
        |ORDER BY score DESC, doc_id""".stripMargin,
    "q_search_facet_page" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 400
        |ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 5""".stripMargin,
    "q_search_facet_counts" ->
      """SELECT lang, COUNT(*) AS n FROM documents
        |WHERE n_chars BETWEEN 100 AND 400
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
