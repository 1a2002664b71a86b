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

  /** `text:query`: `(?iri ?score ?value) text:query (<pred> "pat" N)` —
    * the Jena full-text calling convention
    * (`etl-notes-data-loading.md:100`). Two pattern forms, dispatched
    * like Lucene's query parser: a trailing `*` is a prefix-wildcard
    * match scored by DETERMINISTIC prefix coverage (6 dp); otherwise
    * the pattern is a whitespace-split TERM query scored by BM25 over
    * the predicate's literal corpus (k1=1.2, b=0.75 — Lucene's default
    * similarity, made reproducible by exact relational df/dl/avgdl).
    * Either way the result cap orders by (score desc, iri, value)
    * before limiting — an engine-internal ranking made gateable. */
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
      var sol =
        if (pattern.endsWith("*")) {
          // prefix-wildcard: deterministic prefix-coverage score
          val prefix = pattern.dropRight(1)
          quads
            .filter(col("predicate") === predIri &&
              col("objectValue").startsWith(prefix))
            .select(col("subject").as("_iri"),
              round(lit(prefix.length).cast("double") /
                length(col("objectValue")), 6).as("_score"),
              col("objectValue").as("_value"))
            .distinct()
        } else {
          // term query: BM25 over the predicate's literal corpus — the
          // scoring Jena's Lucene text index applies
          // (etl-notes-data-loading.md:100 scores by TF-IDF; BM25 is
          // Lucene's default similarity since 6.0), computed
          // relationally so results gate cross-engine. Each distinct
          // (subject, value) literal is a document; whitespace
          // tokenization, k1=1.2, b=0.75, Robertson-idf (+1 inside the
          // log, Lucene's sloppy-df variant). Only the tiny (n, avgdl)
          // row and the per-term df relation broadcast; tf/dl are
          // token-/doc-keyed partial-aggregable groupBys — the same
          // inverted-index shape as the relational q_search_bm25.
          val terms = pattern.toLowerCase.split("\\s+")
            .filter(_.nonEmpty).toSeq
          require(terms.nonEmpty, "text:query needs at least one term")
          val docs = quads.filter(col("predicate") === predIri)
            .select(col("subject").as("_iri"),
              col("objectValue").as("_value"))
            .distinct()
          val toks = docs.select(col("_iri"), col("_value"),
              explode(split(lower(col("_value")), "\\s+")).as("tok"))
            .filter(length(col("tok")) > 0)
          val dl = toks.groupBy(col("_iri"), col("_value"))
            .agg(count(lit(1)).as("dlen"))
          val stats = dl.agg(
            (sum(col("dlen")).cast("double") / count(lit(1))).as("ad"),
            count(lit(1)).as("n"))
          val tf = toks.filter(col("tok").isin(terms: _*))
            .groupBy(col("_iri"), col("_value"), col("tok"))
            .agg(count(lit(1)).as("tf"))
          val idf = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          tf.join(broadcast(idf), Seq("tok"))
            .join(dl, Seq("_iri", "_value"))
            .crossJoin(broadcast(stats))
            .withColumn("w",
              log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
                col("tf") * lit(2.2) / // literal 2.2, not k1+1 —
                  // cross-engine float parity (q_search_bm25)
                (col("tf") + lit(1.2) *
                  (lit(1) - lit(0.75) +
                    lit(0.75) * col("dlen") / col("ad"))))
            .groupBy(col("_iri"), col("_value"))
            .agg(round(sum(col("w")), 6).as("_score"))
            .select(col("_iri"), col("_score"), col("_value"))
        }
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
