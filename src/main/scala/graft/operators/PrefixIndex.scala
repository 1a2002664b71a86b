package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized token-prefix autocomplete index — T1's 100 TB form
  * (SURVEY §2.10: "the inverted index is a groupBy shuffle keyed by
  * token — materialize it once … the prefix filter pushes down as a
  * range scan"). The reference builds GraphDB's autocomplete index the
  * same way: one offline pass over the corpus (README: "takes around 10
  * minutes"), then every keystroke serves from the index, never from
  * the documents.
  *
  * Build: ONE token-keyed aggregation (df, tf_total — partial
  * aggregation combines map-side), then a parquet layout PARTITIONED BY
  * the token's first character. Serve: a prefix query reads exactly one
  * partition directory (Catalyst partition pruning on the constant
  * bucket), filters `startsWith` inside it, and top-ks by document
  * frequency — at 100 TB the per-keystroke scan is
  * corpus-size-independent: it touches ~1/40th of an already
  * thousandfold-smaller aggregate. PlanAuditSpec pins the
  * PartitionFilters line.
  */
object PrefixIndex {

  /** Build the index from a `(doc_id, tok)` token relation. */
  def build(tokens: DataFrame, path: String): Unit =
    tokens
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"))
      .withColumn("bucket", substring(col("tok"), 1, 1))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Serve one autocomplete query from the materialized index:
    * partition-pruned to the prefix's first-character bucket. */
  def serve(s: SparkSession, path: String, prefix: String,
      k: Int = 10): DataFrame = {
    require(prefix.nonEmpty, "autocomplete needs a non-empty prefix")
    s.read.parquet(path)
      .filter(col("bucket") === prefix.substring(0, 1) &&
        col("tok").startsWith(prefix))
      .select(col("tok"), col("df"), col("tf_total"))
      .orderBy(col("df").desc, col("tok"))
      .limit(k)
  }
}
