package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.queries._
import graft.rdf.{Emit, QuadEmitter}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` aggregate the per-family catalogs under
  * [[graft.queries]]; every SURVEY §2 operator claimed as done has an entry
  * here (and a DuckDB oracle unless genuinely not SQL-expressible).
  */
object SparkEntry {

  /** Flagship: the address-assembly spine (SURVEY §7.2) re-shaped onto the
    * testdata — dimension joins (broadcast), deterministic uuid5 IRI
    * minting, templated label render, and the row→quads explosion, ending
    * in the quad relation (SURVEY §2.9). Driver smoke-checks rows>0 on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val joined = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(
        uuid5(GraftNamespace, col("c_custkey").cast("string")).as("iri"),
        col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        col("n_name"), col("r_name"))
    QuadEmitter.explodeQuads(
      joined,
      concat(lit("https://example.org/customer/"), col("iri")),
      graft.model.Graphs.Addresses,
      Seq(
        Emit.literal("https://schema.org/name", col("c_name")),
        Emit.literal("https://example.org/def/marketSegment", col("c_mktsegment")),
        Emit.literal("https://example.org/def/accountBalance",
          col("c_acctbal").cast("string"),
          datatype = "http://www.w3.org/2001/XMLSchema#decimal"),
        Emit.iri("https://example.org/def/nation",
          concat(lit("https://example.org/nation/"), slugify(col("n_name")))),
        Emit.iri("https://example.org/def/region",
          concat(lit("https://example.org/region/"), slugify(col("r_name")))),
        Emit.literal("http://www.w3.org/2000/01/rdf-schema#label",
          renderLabel(col("c_name"), col("n_name"), col("r_name")))))
  }

  private val catalogs: Seq[QueryCatalog] = Seq(
    AggregationQueries,
    FilterQueries,
    JoinQueries,
    WindowQueries,
    SetOpQueries,
    ScalarQueries,
    QuadQueries,
    SpatialQueries,
    DedupQueries,
    AnnQueries,
    TextAnalysisQueries,
    HierarchyQueries,
    SearchQueries,
    StreamingQueries,
    SourceSinkQueries,
    MultimodalQueries,
    SampleQueries,
    MergeQueries,
    MiningQueries,
    GraphQueries,
    PrepQueries,
    StatsQueries)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    catalogs.flatMap(_.oracleSql).toMap
}
