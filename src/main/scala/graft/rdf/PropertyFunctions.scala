package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational implementations of the SPARQL property functions the
  * reference's serving stack registers on its store — the Jena
  * compound-naming function (`fuseki/config.ttl:33` loads
  * `ai.kurrawong.jena.compoundnaming.getParts`; driven verbatim in
  * `etl-notes-data-loading.md:128-149` and `cam/compound_naming.py:
  * 14-22`) and the full-text `text:query` function
  * (`etl-notes-data-loading.md:100`). Each is a table-generating
  * function over the QUAD RELATION — a filtered-scan join pipeline
  * Catalyst plans like any star query, not a per-row callback — and is
  * resolved by IRI from the registry passed to
  * [[SparqlParser.execute]].
  *
  * The compound-naming model here is the engine's part-group profile
  * (`addr hasPart ?b . ?b additionalType ?t . ?b value ?v` — the
  * 25-emit explosion's blank-node groups), the single-level twin of the
  * reference's nested component walk.
  */
object PropertyFunctions {

  private def one(terms: Seq[Bgp.Term], what: String): Bgp.Term = {
    require(terms.length == 1, s"$what takes exactly one subject term")
    terms.head
  }

  /** `cnf:getParts`: `?addr cnf:getParts (?partId ?partType
    * ?partValuePredicate ?partValue)` — one row per part of the
    * subject's part group, the documented four-column calling
    * convention (`etl-notes-data-loading.md:141-148`). */
  def getParts(hasPartP: String, addTypeP: String,
      valueP: String): SparqlParser.PropertyFunction =
    (quads, subjects, objects) => {
      require(objects.length == 4,
        "getParts binds (partId partType partValuePredicate partValue)")
      partsSolution(quads, one(subjects, "getParts"), objects,
        hasPartP, addTypeP, valueP,
        internal = Seq(col("_part"), col("_ptype"), lit(valueP),
          col("_pvalue")))
    }

  /** `func:getLiteralComponents`: `?obj func:getLiteralComponents
    * (?componentType ?componentValue)` — the two-column variant the
    * reference's address templating consumes
    * (`cam/compound_naming.py:20`). */
  def getLiteralComponents(hasPartP: String, addTypeP: String,
      valueP: String): SparqlParser.PropertyFunction =
    (quads, subjects, objects) => {
      require(objects.length == 2,
        "getLiteralComponents binds (componentType componentValue)")
      partsSolution(quads, one(subjects, "getLiteralComponents"), objects,
        hasPartP, addTypeP, valueP,
        internal = Seq(col("_ptype"), col("_pvalue")))
    }

  private def partsSolution(quads: org.apache.spark.sql.DataFrame,
      subject: Bgp.Term, objects: Seq[Bgp.Term], hasPartP: String,
      addTypeP: String, valueP: String,
      internal: Seq[Column]): org.apache.spark.sql.DataFrame = {
    val hp = quads.filter(col("predicate") === hasPartP)
      .select(col("subject").as("_addr"), col("objectValue").as("_part"))
    val ty = quads.filter(col("predicate") === addTypeP)
      .select(col("subject").as("_part"), col("objectValue").as("_ptype"))
    val vl = quads.filter(col("predicate") === valueP)
      .select(col("subject").as("_part"), col("objectValue").as("_pvalue"))
    var sol = hp.join(ty, "_part").join(vl, "_part")
    val outCols = Seq.newBuilder[Column]
    subject match {
      // a constant subject (the BIND serving shape) filters BEFORE the
      // joins — predicate + subject both reach the scan
      case Bgp.Const(v) => sol = sol.filter(col("_addr") === v)
      case Bgp.Var(n) => outCols += col("_addr").as(n)
    }
    objects.zip(internal).foreach {
      case (Bgp.Var(n), c) => outCols += c.as(n)
      case (Bgp.Const(v), c) => sol = sol.filter(c === v)
    }
    sol.select(outCols.result(): _*).distinct()
  }

  /** `text:query`: `(?iri ?score ?value) text:query (<pred> "pat*" N)` —
    * the Jena full-text calling convention
    * (`etl-notes-data-loading.md:100`). Prefix-wildcard match over the
    * given predicate's literal values; the score is DETERMINISTIC
    * (prefix coverage of the matched value, 6 dp) so results gate
    * cross-engine, and the result cap orders by (score desc, iri,
    * value) before limiting — a Lucene engine's internal ranking made
    * reproducible. */
  def textQuery: SparqlParser.PropertyFunction =
    (quads, subjects, objects) => {
      require(subjects.length == 3,
        "text:query binds (?iri ?score ?value)")
      require(objects.length == 2 || objects.length == 3,
        "text:query takes (<predicate> \"pattern\" [limit])")
      def const(t: Bgp.Term, what: String): String = t match {
        case Bgp.Const(v) => v
        case _ => throw new IllegalArgumentException(
          s"text:query $what must be a constant")
      }
      val predIri = const(objects(0), "predicate")
      val pattern = const(objects(1), "pattern")
      val cap = objects.drop(2).headOption
        .map(t => const(t, "limit").toInt)
      require(pattern.endsWith("*"),
        "text:query supports prefix-wildcard patterns (\"abc*\")")
      val prefix = pattern.dropRight(1)
      var sol = quads
        .filter(col("predicate") === predIri &&
          col("objectValue").startsWith(prefix))
        .select(col("subject").as("_iri"),
          round(lit(prefix.length).cast("double") /
            length(col("objectValue")), 6).as("_score"),
          col("objectValue").as("_value"))
        .distinct()
      cap.foreach { n =>
        sol = sol.orderBy(col("_score").desc, col("_iri"), col("_value"))
          .limit(n)
      }
      val outCols = Seq.newBuilder[Column]
      subjects.zip(Seq(col("_iri"), col("_score"), col("_value")))
        .foreach {
          case (Bgp.Var(n), c) => outCols += c.as(n)
          case (Bgp.Const(v), c) => sol = sol.filter(c === v)
        }
      sol.select(outCols.result(): _*)
    }
}
