package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.TermKind

/** Declarative row→quads explosion (SURVEY §2.9).
  *
  * The heart of the reference: one input row becomes 20-60 quads via
  * imperative `ds.add((s,p,o,g))` calls (`etl_lalf_address.py:273-686`,
  * `etl_pndb.py:85-343`, `etl_qrt.py:48-181`). The Spark-native shape is an
  * `array(struct(...))` with `when`-gated optional elements followed by a
  * single `explode` — pure Catalyst, whole-stage-codegen'd, no UDTF.
  *
  * An [[Emit]] mirrors one `ds.add(...)` call site; the YAML-driven
  * declarative variant of the reference (`cam/transform.py:58-114`,
  * `cam/config.py:5-46`) maps 1:1 onto a `Seq[Emit]`.
  */
final case class Emit(
    predicate: Column,
    obj: Column,
    kind: String = TermKind.Literal,
    datatype: Option[Column] = None,
    lang: Option[Column] = None)

object Emit {
  /** Object-property quad: predicate → IRI object. */
  def iri(predicate: String, obj: Column): Emit =
    Emit(lit(predicate), obj, TermKind.Iri)

  /** Plain/typed/lang literal. */
  def literal(predicate: String, obj: Column,
      datatype: String = null, lang: String = null): Emit =
    Emit(lit(predicate), obj, TermKind.Literal,
      Option(datatype).map(lit(_)), Option(lang).map(lit(_)))

  /** Deterministically-labelled blank node
    * (`BNode(f"{addr_id_uuid}-country")`, etl_lalf_address.py:400). */
  def bnode(predicate: String, label: Column): Emit =
    Emit(lit(predicate), label, TermKind.BNode)
}

/** Full-fidelity emit: per-emit subject (IRI or blank node) AND per-emit
  * graph, so one input row can fan out into multiple subjects across
  * multiple named graphs — the reference's bnode 3-quad groups
  * (`addr_iri →hasPart→ _:x; _:x →additionalType→ t; _:x →value→ v`,
  * etl_lalf_address.py:398-410) and the pndb given-name groups written
  * into a different graph (etl_pndb.py:236-245) both need this shape. */
final case class EmitQ(
    subject: Column,
    subjectKind: String,
    predicate: String,
    obj: Column,
    kind: String = TermKind.Literal,
    datatype: Option[String] = None,
    lang: Option[String] = None,
    graph: String)

object EmitQ {
  def iri(subject: Column, predicate: String, obj: Column,
      graph: String): EmitQ =
    EmitQ(subject, TermKind.Iri, predicate, obj, TermKind.Iri, graph = graph)

  def literal(subject: Column, predicate: String, obj: Column, graph: String,
      datatype: String = null, lang: String = null): EmitQ =
    EmitQ(subject, TermKind.Iri, predicate, obj, TermKind.Literal,
      Option(datatype), Option(lang), graph)

  /** subject →predicate→ _:label (blank node as OBJECT). */
  def bnodeObj(subject: Column, predicate: String, label: Column,
      graph: String): EmitQ =
    EmitQ(subject, TermKind.Iri, predicate, label, TermKind.BNode,
      graph = graph)

  /** _:label →predicate→ IRI (blank node as SUBJECT). */
  def fromBnodeIri(label: Column, predicate: String, obj: Column,
      graph: String): EmitQ =
    EmitQ(label, TermKind.BNode, predicate, obj, TermKind.Iri, graph = graph)

  /** _:label →predicate→ literal (blank node as SUBJECT). */
  def fromBnodeLiteral(label: Column, predicate: String, obj: Column,
      graph: String, datatype: String = null, lang: String = null): EmitQ =
    EmitQ(label, TermKind.BNode, predicate, obj, TermKind.Literal,
      Option(datatype), Option(lang), graph)
}

object QuadEmitter {

  /** Compile a subject + emit list into the quad relation.
    *
    * Null or blank objects vanish (the reference's truthiness guards,
    * `cam/tables/lf_address.py:41`, `etl_lalf_address.py:452,477,523`):
    * each element is `when(gate, struct).otherwise(null)`, nulls dropped
    * after the explode. The output column set matches
    * [[graft.model.Quad.schema]].
    */
  def explodeQuads(df: DataFrame, subject: Column, graph: String,
      emits: Seq[Emit]): DataFrame = {
    val elems = emits.map { e =>
      val gated = when(
        e.obj.isNotNull && length(trim(e.obj.cast("string"))) > 0,
        struct(
          e.predicate.as("predicate"),
          e.obj.cast("string").as("objectValue"),
          lit(e.kind).as("objectKind"),
          e.datatype.getOrElse(lit(null).cast("string")).as("datatype"),
          e.lang.getOrElse(lit(null).cast("string")).as("lang")))
      gated // null when gate fails
    }
    df.select(subject.as("subject"), explode(array(elems: _*)).as("q"))
      .where(col("q").isNotNull)
      .select(
        col("subject"),
        col("q.predicate").as("predicate"),
        col("q.objectValue").as("objectValue"),
        col("q.objectKind").as("objectKind"),
        col("q.datatype").as("datatype"),
        col("q.lang").as("lang"),
        lit(graph).as("graph"))
  }

  /** Full-fidelity explosion: one array(struct)+explode over per-emit
    * (subject, subjectKind, graph) — same pure-Catalyst shape as
    * [[explodeQuads]], widened so a single input row emits its IRI-subject
    * quads, its blank-node 3-quad groups, and its quads in OTHER named
    * graphs in one pass (etl_lalf_address.py:273-686: 20-60 `ds.add`
    * calls per row). */
  def explodeQuadsFull(df: DataFrame, emits: Seq[EmitQ]): DataFrame = {
    val elems = emits.map { e =>
      when(
        e.obj.isNotNull && length(trim(e.obj.cast("string"))) > 0,
        struct(
          e.subject.cast("string").as("subject"),
          lit(e.subjectKind).as("subjectKind"),
          lit(e.predicate).as("predicate"),
          e.obj.cast("string").as("objectValue"),
          lit(e.kind).as("objectKind"),
          e.datatype.map(lit(_)).getOrElse(lit(null).cast("string"))
            .as("datatype"),
          e.lang.map(lit(_)).getOrElse(lit(null).cast("string")).as("lang"),
          lit(e.graph).as("graph")))
    }
    df.select(explode(array(elems: _*)).as("q"))
      .where(col("q").isNotNull)
      .select(col("q.*"))
  }

  /** The rendered N-Quads line as a Column over a quad relation. Subjects
    * render as `_:label` when a `subjectKind` column marks them blank
    * (full-fidelity path); relations without the column are all-IRI. */
  private def lineExpr(quads: DataFrame): Column = {
    val v = col("objectValue")
    val escaped =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(v, "\\\\", "\\\\\\\\"),
        "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    val objectTerm = when(col("objectKind") === graft.model.TermKind.Iri,
        concat(lit("<"), v, lit(">")))
      .when(col("objectKind") === graft.model.TermKind.BNode,
        concat(lit("_:"), v))
      .otherwise(
        concat(lit("\""), escaped, lit("\""),
          when(col("lang").isNotNull, concat(lit("@"), col("lang")))
            .when(col("datatype").isNotNull,
              concat(lit("^^<"), col("datatype"), lit(">")))
            .otherwise(lit(""))))
    val subjectTerm =
      if (quads.columns.contains("subjectKind"))
        when(col("subjectKind") === graft.model.TermKind.BNode,
          concat(lit("_:"), col("subject")))
          .otherwise(concat(lit("<"), col("subject"), lit(">")))
      else concat(lit("<"), col("subject"), lit(">"))
    concat_ws(" ",
      subjectTerm,
      concat(lit("<"), col("predicate"), lit(">")),
      objectTerm,
      concat(lit("<"), col("graph"), lit(">")),
      lit("."))
  }

  /** N-Quads line renderer (S8): one text line per quad, with the string
    * escaping N-Triples requires (backslash first, then quote, LF, CR,
    * tab). Order-independent by design — the reference's per-job file
    * split (`etl_lalf_address.py:688-690`) already implies set semantics.
    */
  def renderNQuads(quads: DataFrame): DataFrame =
    quads.select(lineExpr(quads).as("value"))

  /** N-Quads file sink: `partitionBy("graph")` keeps one directory per
    * named graph — the columnar twin of the reference's per-graph .nq
    * outputs (`Taskfile.yml:108-114`). */
  def writeNQuads(quads: DataFrame, path: String): Unit =
    renderNQuads(quads).write.mode("overwrite").text(path)

  /** Per-graph N-Quads sink: one directory per named graph
    * (`Taskfile.yml:108-114` — the reference ships one .nq per graph).
    * A re-read filtered on `graph` prunes to a single directory before
    * touching a row — partition pruning is the point at 100 TB. */
  def writeNQuadsByGraph(quads: DataFrame, path: String): Unit =
    quads.select(lineExpr(quads).as("value"), col("graph"))
      .write.mode("overwrite").partitionBy("graph").text(path)

  /** N-Triples line renderer (S9) — the CAM1 sink
    * (`cam/tables/__init__.py:32-41`): identical term syntax minus the
    * graph term. A null graph vanishes inside renderNQuads' concat_ws,
    * leaving exactly the `<s> <p> o .` triple line. */
  def renderNTriples(quads: DataFrame): DataFrame =
    renderNQuads(quads.withColumn("graph", lit(null).cast("string")))
}
