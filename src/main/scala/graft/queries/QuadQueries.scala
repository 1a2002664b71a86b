package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.rdf.{Emit, QuadEmitter}

/** SURVEY §2.9 — the row→quads explosion, oracle-checked end to end.
  *
  * The reference's core move is one row → 20-60 quads via imperative
  * `ds.add(...)` (`etl_lalf_address.py:273-686`), validated by count-parity
  * golden queries (`etl-notes.md:263-285`, `etl-queries.md:76-101`). Here
  * the same pipeline (dimension joins → deterministic IRI → gated emits →
  * explode) runs as pure Catalyst, and DuckDB replays the explosion as a
  * UNION ALL of per-predicate SELECTs — rows, schema and values all hashed.
  */
object QuadQueries extends QueryCatalog {

  private val NationP = "https://example.org/def/nation"
  private val RegionP = "https://example.org/def/region"
  private val BalanceP = "https://example.org/def/accountBalance"
  private val SegmentP = "https://example.org/def/marketSegment"
  private val NameP = "https://schema.org/name"
  private val LabelP = "http://www.w3.org/2000/01/rdf-schema#label"
  private val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"

  /** The flagship input relation: customer ⋈ nation ⋈ region (dims
    * broadcast — J9), money normalized to DECIMAL(18,2) so its string
    * rendering agrees across engines. */
  private def joined(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        dec2(col("c_acctbal")).cast("string").as("bal_str"),
        col("n_name"), col("r_name"))
  }

  /** The six emits of the entry() pipeline (name, segment, typed balance,
    * two object properties, rendered label). */
  private def emits: Seq[Emit] = Seq(
    Emit.literal(NameP, col("c_name")),
    Emit.literal(SegmentP, col("c_mktsegment")),
    Emit.literal(BalanceP, col("bal_str"), datatype = XsdDecimal),
    Emit.iri(NationP,
      concat(lit("https://example.org/nation/"), slugify(col("n_name")))),
    Emit.iri(RegionP,
      concat(lit("https://example.org/region/"), slugify(col("r_name")))),
    Emit.literal(LabelP,
      renderLabel(col("c_name"), col("n_name"), col("r_name"))))

  private def quads(s: SparkSession, dir: String, subject: Column): DataFrame =
    QuadEmitter.explodeQuads(joined(s, dir), subject,
      graft.model.Graphs.Addresses, emits)

  /** DuckDB-side twin of one emit: the gated per-predicate SELECT. */
  private def oracleEmit(predicate: String, objSql: String): String =
    s"""SELECT 'https://example.org/customer/' || CAST(c_custkey AS VARCHAR) AS subject,
       |  '$predicate' AS predicate, $objSql AS objectValue, c_custkey
       |FROM customer c
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE $objSql IS NOT NULL AND length(trim($objSql)) > 0""".stripMargin

  private val oracleObjSql: Seq[(String, String)] = Seq(
    NameP -> "c_name",
    SegmentP -> "c_mktsegment",
    BalanceP -> "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)",
    NationP ->
      ("'https://example.org/nation/' || " +
        "regexp_replace(lower(trim(n_name)), '\\s+', '-', 'g')"),
    RegionP ->
      ("'https://example.org/region/' || " +
        "regexp_replace(lower(trim(r_name)), '\\s+', '-', 'g')"),
    LabelP ->
      ("regexp_replace(trim(concat_ws(' ', NULLIF(trim(c_name), ''), " +
        "NULLIF(trim(n_name), ''), NULLIF(trim(r_name), ''))), '\\s+', ' ', 'g')"))

  private def oracleQuadsCte: String =
    "WITH quads AS (\n" +
      oracleObjSql.map { case (p, o) => oracleEmit(p, o) }
        .mkString("\nUNION ALL\n") + "\n)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9: explode → per-predicate profile (count, distinct subjects,
    // min/max object) — the shape of the reference's per-predicate
    // validation counts (etl-queries.md:156-184).
    "q_quads_explode" -> ((s, dir) => {
      quads(s, dir,
          concat(lit("https://example.org/customer/"),
            col("c_custkey").cast("string")))
        .groupBy(col("predicate"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("subject")).as("n_subj"),
          min(col("objectValue")).as("min_obj"),
          max(col("objectValue")).as("max_obj"))
        .orderBy(col("predicate"))
    }),

    // §5.3 count parity: input rows == distinct subjects; total quads ==
    // Σ gated emits (etl-notes.md:263-285 — "non-historical addresses must
    // equal the output address count").
    "q_quads_parity" -> ((s, dir) => {
      val in = joined(s, dir)
      val q = quads(s, dir,
        concat(lit("https://example.org/customer/"),
          col("c_custkey").cast("string")))
      in.agg(count(lit(1)).as("n_input"))
        .crossJoin(q.agg(
          countDistinct(col("subject")).as("n_subjects"),
          count(lit(1)).as("n_quads")))
    }),

    // S8: the N-Quads renderer, every serialized line hash-compared —
    // subject/predicate/object-term/graph syntax, datatype suffixes, IRI
    // vs literal forms all verified byte-for-byte against the oracle.
    "q_quads_render" -> ((s, dir) => {
      QuadEmitter.renderNQuads(
          quads(s, dir,
            concat(lit("https://example.org/customer/"),
              col("c_custkey").cast("string"))))
        .orderBy(col("value"))
    }),

    // S9: the N-Triples renderer — same term syntax minus the graph.
    "q_triples_render" -> ((s, dir) => {
      QuadEmitter.renderNTriples(
          quads(s, dir,
            concat(lit("https://example.org/customer/"),
              col("c_custkey").cast("string"))))
        .orderBy(col("value"))
    }),

    // S8 end-to-end: the REAL file sink on the bench path — quads
    // serialized to N-Quads text on disk, read back, and hash-compared
    // line-for-line. This is the scan→join→explode→serialize pipeline
    // BASELINE.md measures (lf_address ≈ 360 rows/s in the reference).
    "q_quads_write_roundtrip" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_io/quads_nq"
      QuadEmitter.writeNQuads(
        quads(s, dir,
          concat(lit("https://example.org/customer/"),
            col("c_custkey").cast("string"))), out)
      s.read.text(out).orderBy(col("value"))
    }),

    // §2.9 declarative path — the same explosion driven by the pure-data
    // EmitSpec config model (cam/config.py + cam/transform.py twin): the
    // spec references columns by NAME; compilation emits the identical
    // array(struct)+explode plan the hand-written pipelines use.
    "q_quads_declarative" -> ((s, dir) => {
      import graft.rdf._
      val spec = EntitySpec(
        graph = graft.model.Graphs.GeoNames,
        subjectTemplate = "https://example.org/supplier/{s_suppkey}",
        types = Seq("https://schema.org/Organization"),
        properties = Seq(
          PropertySpec("https://schema.org/name", LiteralCol("s_name")),
          PropertySpec("https://example.org/def/nation",
            IriTemplate("https://example.org/nation/{s_nationkey}")),
          PropertySpec("https://example.org/def/accountBalance",
            LiteralCol("bal", datatype = Some(XsdDecimal)))))
      val in = Tables.supplier(s, dir).select(
        col("s_suppkey"), col("s_name"), col("s_nationkey"),
        dec2(col("s_acctbal")).cast("string").as("bal"))
      EmitCompiler.compile(in, spec)
        .groupBy(col("predicate"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("subject")).as("n_subj"),
          min(col("objectValue")).as("min_obj"),
          max(col("objectValue")).as("max_obj"))
        .orderBy(col("predicate"))
    }),

    // §5.1 pre-validation — referential completeness BEFORE the main job
    // (etl_pndb_pre_validate.py:18-61): every customer nation key must
    // resolve against the nation vocab; the anti-join of codes minus
    // vocab MUST be empty, and the gate hash-checks exactly that.
    "q_prevalidate_codes" -> ((s, dir) => {
      val codes = Tables.customer(s, dir)
        .select(col("c_nationkey").as("code")).distinct()
      val vocab = Tables.nation(s, dir)
        .select(col("n_nationkey").as("code"))
      codes.join(vocab, Seq("code"), "left_anti")
        .orderBy(col("code"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_quads_explode" ->
      s"""$oracleQuadsCte
         |SELECT predicate, COUNT(*) AS n, COUNT(DISTINCT subject) AS n_subj,
         |  MIN(objectValue) AS min_obj, MAX(objectValue) AS max_obj
         |FROM quads GROUP BY predicate ORDER BY predicate""".stripMargin,
    "q_quads_parity" ->
      s"""$oracleQuadsCte
         |SELECT
         |  (SELECT COUNT(*) FROM customer c
         |     JOIN nation n ON c.c_nationkey = n.n_nationkey
         |     JOIN region r ON n.n_regionkey = r.r_regionkey) AS n_input,
         |  COUNT(DISTINCT subject) AS n_subjects,
         |  COUNT(*) AS n_quads
         |FROM quads""".stripMargin,
    "q_quads_render" ->
      s"""$oracleQuadsCte
         |SELECT '<' || subject || '> <' || predicate || '> '
         |  || CASE
         |       WHEN predicate IN ('$NationP', '$RegionP')
         |         THEN '<' || objectValue || '>'
         |       WHEN predicate = '$BalanceP'
         |         THEN '"' || objectValue || '"^^<$XsdDecimal>'
         |       ELSE '"' || objectValue || '"'
         |     END
         |  || ' <urn:qali:graph:addresses> .' AS value
         |FROM quads ORDER BY value""".stripMargin,
    "q_quads_write_roundtrip" ->
      s"""$oracleQuadsCte
         |SELECT '<' || subject || '> <' || predicate || '> '
         |  || CASE
         |       WHEN predicate IN ('$NationP', '$RegionP')
         |         THEN '<' || objectValue || '>'
         |       WHEN predicate = '$BalanceP'
         |         THEN '"' || objectValue || '"^^<$XsdDecimal>'
         |       ELSE '"' || objectValue || '"'
         |     END
         |  || ' <urn:qali:graph:addresses> .' AS value
         |FROM quads ORDER BY value""".stripMargin,
    "q_quads_declarative" ->
      """WITH quads AS (
        |  SELECT 'https://example.org/supplier/' || CAST(s_suppkey AS VARCHAR) AS subject,
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS predicate,
        |    'https://schema.org/Organization' AS objectValue
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'https://example.org/supplier/' || CAST(s_suppkey AS VARCHAR),
        |    'https://schema.org/name', s_name
        |  FROM supplier WHERE s_name IS NOT NULL AND length(trim(s_name)) > 0
        |  UNION ALL
        |  SELECT 'https://example.org/supplier/' || CAST(s_suppkey AS VARCHAR),
        |    'https://example.org/def/nation',
        |    'https://example.org/nation/' || CAST(s_nationkey AS VARCHAR)
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'https://example.org/supplier/' || CAST(s_suppkey AS VARCHAR),
        |    'https://example.org/def/accountBalance',
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR)
        |  FROM supplier
        |    WHERE s_acctbal IS NOT NULL)
        |SELECT predicate, COUNT(*) AS n, COUNT(DISTINCT subject) AS n_subj,
        |  MIN(objectValue) AS min_obj, MAX(objectValue) AS max_obj
        |FROM quads GROUP BY predicate ORDER BY predicate""".stripMargin,
    "q_prevalidate_codes" ->
      """SELECT DISTINCT c_nationkey AS code FROM customer
        |WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |ORDER BY code""".stripMargin,
    "q_triples_render" ->
      s"""$oracleQuadsCte
         |SELECT '<' || subject || '> <' || predicate || '> '
         |  || CASE
         |       WHEN predicate IN ('$NationP', '$RegionP')
         |         THEN '<' || objectValue || '>'
         |       WHEN predicate = '$BalanceP'
         |         THEN '"' || objectValue || '"^^<$XsdDecimal>'
         |       ELSE '"' || objectValue || '"'
         |     END
         |  || ' .' AS value
         |FROM quads ORDER BY value""".stripMargin
  )
}
