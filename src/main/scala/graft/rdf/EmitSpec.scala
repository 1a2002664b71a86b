package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Declarative table→graph mapping (SURVEY §7.1 `core.rdf`): the engine
  * twin of the reference's YAML config model — `cam/config.py:5-46`
  * (tables → types/columns) compiled by `cam/transform.py:58-114` into
  * per-row triple emission. Here the model is a case-class tree (a YAML
  * loader would map onto it 1:1) and "compilation" produces the same
  * `array(struct)+explode` Catalyst plan the hand-written pipelines use —
  * declarative input, identical physical shape.
  *
  * Columns are referenced BY NAME (strings), not `Column` objects: the
  * spec is pure data, storable/diffable config, like the reference's YAML.
  */
sealed trait ObjectSpec

/** Literal object from a column, optionally typed or language-tagged. */
final case class LiteralCol(column: String,
    datatype: Option[String] = None, lang: Option[String] = None)
  extends ObjectSpec

/** IRI object built from a `{column}` template (F11 interpolation,
  * `cam/transform.py:17-46`). */
final case class IriTemplate(template: String) extends ObjectSpec

/** Deterministically-labelled blank node from a template
  * (`BNode(f"{id}-country")`, `etl_lalf_address.py:400`). */
final case class BNodeTemplate(template: String) extends ObjectSpec

final case class PropertySpec(predicate: String, obj: ObjectSpec)

/** One entity class: where its rows go, how its IRI is minted, its
  * rdf:types, and its properties. */
final case class EntitySpec(
    graph: String,
    subjectTemplate: String,
    types: Seq[String],
    properties: Seq[PropertySpec])

object EmitCompiler {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private def interpolate(template: String): Column = {
    val keys = "\\{([a-zA-Z0-9_]+)\\}".r.findAllMatchIn(template)
      .map(_.group(1)).toSeq
    GraftFunctions.iriTemplate(template,
      keys.map(k => k -> col(k).cast("string")).toMap)
  }

  private def toEmit(p: PropertySpec): Emit = p.obj match {
    case LiteralCol(c, dt, lang) =>
      Emit(lit(p.predicate), col(c).cast("string"), graft.model.TermKind.Literal,
        dt.map(lit(_)), lang.map(lit(_)))
    case IriTemplate(t) =>
      Emit(lit(p.predicate), interpolate(t), graft.model.TermKind.Iri)
    case BNodeTemplate(t) =>
      Emit(lit(p.predicate), interpolate(t), graft.model.TermKind.BNode)
  }

  /** Compile the spec against a DataFrame → the quad relation. */
  def compile(df: DataFrame, spec: EntitySpec): DataFrame = {
    val typeEmits = spec.types.map(t => Emit(lit(RdfType), lit(t),
      graft.model.TermKind.Iri))
    QuadEmitter.explodeQuads(df, interpolate(spec.subjectTemplate),
      spec.graph, typeEmits ++ spec.properties.map(toEmit))
  }
}
