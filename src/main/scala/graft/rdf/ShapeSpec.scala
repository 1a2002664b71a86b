package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative shape validation over the quad relation — the engine twin
  * of the reference's SHACL layer (`/root/reference/shacl.ttl`: a
  * `sh:NodeShape` with `sh:targetClass` and property constraints
  * `sh:path`/`sh:minCount`/`sh:maxCount`/`sh:datatype`; README "Loading
  * SHACL shapes" — GraphDB rejects non-conforming imports outright).
  *
  * A [[PropertyShape]] constrains the values of one predicate on each
  * focus node; a [[NodeShape]] targets every subject typed
  * `rdf:type targetClass` (SHACL's `sh:targetClass` semantics) and
  * carries its property shapes. [[ShapeValidator.violations]] compiles a
  * shape set into a violations DataFrame — the declarative complement of
  * the imperative pre-validation anti-joins and fail-fast invariants
  * (SURVEY §5.1-5.2); [[ShapeValidator.validateOrAbort]] is the
  * reference's reject-the-import mode.
  */
final case class PropertyShape(
    path: String,
    minCount: Int = 0,
    maxCount: Option[Int] = None,
    /** Required datatype IRI — also implies the object must be a typed
      * literal (SHACL `sh:datatype`). */
    datatype: Option[String] = None,
    /** Required term kind: one of [[graft.model.TermKind]]
      * (SHACL `sh:nodeKind`). */
    nodeKind: Option[String] = None,
    /** Allowed language tags (SHACL `sh:languageIn`); empty = no
      * constraint. */
    languageIn: Seq[String] = Nil)

final case class NodeShape(
    id: String,
    targetClass: String,
    properties: Seq[PropertyShape])

object ShapeValidator {
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Compile `shapes` against `quads` → one row per violated constraint:
    * `(shape, focus, path, constraint, expected, actual)` with
    * `constraint ∈ {minCount, maxCount, datatype, nodeKind, language}`,
    * `expected` the declared bound and `actual` the observed count.
    *
    * Scale shape: the shape tables are tiny by construction and
    * broadcast; the quad relation is touched twice (focus typing, value
    * stats), each time filtered by a broadcast semi-join on the shape's
    * predicates before the per-(focus, path) aggregation — the only
    * shuffles are keyed by subject, and partial aggregation combines
    * map-side. SHACL validates the union graph, so callers pass whatever
    * graph subset the shapes govern. */
  def violations(quads: DataFrame, shapes: Seq[NodeShape]): DataFrame = {
    require(shapes.nonEmpty, "at least one NodeShape required")
    val s = quads.sparkSession
    import s.implicits._
    val targets = shapes.map(ns => (ns.id, ns.targetClass))
      .toDF("shape", "target_class")
    val props = shapes
      .flatMap(ns => ns.properties.map(p =>
        (ns.id, p.path, p.minCount,
          p.maxCount.map(_.toLong).getOrElse(Long.MaxValue),
          p.datatype.orNull, p.nodeKind.orNull,
          if (p.languageIn.isEmpty) null else p.languageIn)))
      .toDF("shape", "path", "min_count", "max_count", "dt_req",
        "kind_req", "langs_req")

    val focus = quads.alias("t")
      .filter(col("t.predicate") === RdfType &&
        col("t.objectKind") === graft.model.TermKind.Iri)
      .join(broadcast(targets), col("t.objectValue") === col("target_class"))
      .select(col("shape"), col("t.subject").as("focus"))
      .distinct()

    // Observed values per (shape, focus, path): total count + how many
    // values break each value-level constraint.
    val q = quads.alias("q")
    val p = broadcast(props).alias("p")
    val f = focus.alias("f")
    val lit1 = graft.model.TermKind.Literal
    val stats = q
      .join(p, col("q.predicate") === col("p.path"))
      .join(f, col("q.subject") === col("f.focus") &&
        col("p.shape") === col("f.shape"))
      .groupBy(col("p.shape").as("shape"), col("f.focus").as("focus"),
        col("p.path").as("path"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p.dt_req").isNotNull &&
            (col("q.objectKind") =!= lit1 || col("q.datatype").isNull ||
              col("q.datatype") =!= col("p.dt_req")), 1L).otherwise(0L))
          .as("bad_dt"),
        sum(when(col("p.kind_req").isNotNull &&
            col("q.objectKind") =!= col("p.kind_req"), 1L).otherwise(0L))
          .as("bad_kind"),
        sum(when(col("p.langs_req").isNotNull &&
            (col("q.lang").isNull ||
              !array_contains(col("p.langs_req"), col("q.lang"))), 1L)
          .otherwise(0L)).as("bad_lang"))

    // Every (focus, property shape) pair — including paths with ZERO
    // quads, which a join through the quad relation would silently drop
    // and which are exactly the minCount violations.
    val expected = focus.join(broadcast(props), Seq("shape"))
    val checked = expected
      .join(stats, Seq("shape", "focus", "path"), "left")
      .select(col("shape"), col("focus"), col("path"),
        col("min_count"), col("max_count"),
        col("dt_req"), col("kind_req"), col("langs_req"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("bad_dt"), lit(0L)).as("bad_dt"),
        coalesce(col("bad_kind"), lit(0L)).as("bad_kind"),
        coalesce(col("bad_lang"), lit(0L)).as("bad_lang"))

    def v(cond: org.apache.spark.sql.Column, name: String,
        exp: org.apache.spark.sql.Column,
        act: org.apache.spark.sql.Column) =
      when(cond, struct(lit(name).as("constraint"),
        exp.cast("string").as("expected"), act.cast("string").as("actual")))
    checked
      .select(col("shape"), col("focus"), col("path"), explode(array(
        v(col("n") < col("min_count"), "minCount",
          col("min_count"), col("n")),
        v(col("n") > col("max_count"), "maxCount",
          col("max_count"), col("n")),
        v(col("bad_dt") > 0, "datatype", col("dt_req"), col("bad_dt")),
        v(col("bad_kind") > 0, "nodeKind", col("kind_req"), col("bad_kind")),
        v(col("bad_lang") > 0, "language",
          concat_ws(",", col("langs_req")), col("bad_lang"))))
        .as("v"))
      .filter(col("v").isNotNull)
      .select(col("shape"), col("focus"), col("path"),
        col("v.constraint").as("constraint"),
        col("v.expected").as("expected"), col("v.actual").as("actual"))
  }

  /** Fail-fast mode (the reference's GraphDB behavior: a SHACL violation
    * aborts the import with `Failed SHACL validation`): throws with a
    * bounded violation sample; a clean shape set is a no-op. One action,
    * never a full collect. */
  def validateOrAbort(quads: DataFrame, shapes: Seq[NodeShape],
      sample: Int = 5): Unit = {
    val bad = violations(quads, shapes).limit(sample).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      "Failed shape validation: " + bad.map(r =>
        s"${r.getAs[String]("focus")} ${r.getAs[String]("path")} " +
          s"${r.getAs[String]("constraint")} expected=" +
          s"${r.getAs[String]("expected")} actual=${r.getAs[String]("actual")}")
        .mkString("; "))
  }
}
