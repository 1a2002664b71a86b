package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basic-graph-pattern matching over the quad relation — the SPARQL
  * serving verb next to DESCRIBE (`cam/graphdb.py` serves the emitted
  * graph through a SPARQL store; `SELECT ?x WHERE { t1 . t2 . … }` is
  * its query core). A BGP compiles to exactly what a 100 TB engine
  * wants: one filtered scan of the quad relation per triple pattern,
  * equi-joined on the shared VARIABLES — the join keys are the variable
  * bindings, so Catalyst plans the same shuffle/broadcast hash joins it
  * plans for any star/chain query, and predicate-constant filters push
  * into the scan.
  *
  * Patterns bind `subject` and `objectValue`; predicates are constants
  * (the common SPARQL case — a variable predicate would union the
  * per-predicate partitions). Join order follows pattern order; put the
  * most selective pattern first the way a SPARQL engine's optimizer
  * would.
  */
object Bgp {

  /** Pattern relations whose stats-estimated row count is at or below
    * this hint broadcast (RDF pattern rows are 2-4 short strings —
    * 50 k rows ≈ a few MB, far under any executor's broadcast budget). */
  private val BroadcastEstRows = 50000L

  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Const(value: String) extends Term

  /** Triple pattern: subject term, predicate term, object term.
    * Predicates are usually constant IRIs (the selective case — the
    * filter pushes into the scan); a `Var` predicate BINDS the predicate
    * column like any other variable (`SELECT ?p WHERE { <s> ?p ?o }`,
    * the shape DESCRIBE internally needs and generic SPARQL users
    * write). `g` scopes the pattern to a named graph (SPARQL
    * `GRAPH g {…}` — the reference emits one graph per job, so
    * graph-scoped queries are the common serving case): `Const` pins
    * the graph (a partition-prunable filter when the quad relation is
    * laid out by graph), `Var` BINDS the graph name like any other
    * variable — shared graph variables join across patterns, giving
    * the same-graph constraint relationally. `None` matches quads in
    * any graph, ignoring it.
    * `scanFilter` carries an extra quad-column predicate into the
    * pattern's scan — the compilation target for SPARQL term-accessor
    * FILTERs (LANG/DATATYPE/isIRI/isLiteral/isBlank): the lang /
    * datatype / kind columns exist on the QUAD relation, not on the
    * solution relation, so the test must land where those columns are
    * — and a scan-level predicate is also exactly where a 100 TB store
    * wants it (pushed into the source next to the predicate-constant
    * filter, never a post-join residual). */
  final case class Pattern(s: Term, p: Term, o: Term,
      g: Option[Term] = None, scanFilter: Option[Column] = None)

  object Pattern {
    /** String-predicate conveniences — the constant-IRI common case. */
    def apply(s: Term, p: String, o: Term): Pattern =
      Pattern(s, Const(p), o, None)
    def apply(s: Term, p: String, o: Term, g: Option[Term]): Pattern =
      Pattern(s, Const(p), o, g)
  }

  private def bindings(q: DataFrame, pat: Pattern, idx: Int,
      provablyDistinct: Boolean = false): DataFrame = {
    var df = q
    pat.scanFilter.foreach(f => df = df.filter(f))
    val cols = Seq.newBuilder[Column]
    pat.p match {
      case Const(v) => df = df.filter(col("predicate") === v)
      case Var(n) => cols += col("predicate").as(n)
    }
    pat.g match {
      case Some(Const(v)) => df = df.filter(col("graph") === v)
      case Some(Var(n)) =>
        // SPARQL `GRAPH ?g` ranges over NAMED graphs only — default-graph
        // quads (graph = null, the N-Triples case) must not bind a null
        // ?g (ADVICE r7; multi-pattern queries masked this because null
        // join keys never match, but a single-pattern GRAPH ?g diverged).
        df = df.filter(col("graph").isNotNull)
        cols += col("graph").as(n)
      case None => ()
    }
    pat.s match {
      case Const(v) => df = df.filter(col("subject") === v)
      case Var(n) => cols += col("subject").as(n)
    }
    pat.o match {
      case Const(v) => df = df.filter(col("objectValue") === v)
      case Var(n) => cols += col("objectValue").as(n)
    }
    val out = cols.result()
    // a pattern with no variables still constrains the match: keep a
    // 0-or-more-row marker relation joined by cross (1-row semantics).
    // The set-semantics distinct is SKIPPED when the store statistics
    // prove it a no-op (r15, guide §2.4 — see [[QuadStats]]: the
    // predicate's (subject, objectValue) pairs are duplicate-free, so
    // any projection of the constant-filtered rows is too); at 100 TB
    // that elides one full exchange per triple pattern.
    if (out.isEmpty) df.limit(1).select(lit(idx).as(s"_bgp_m$idx"))
    else if (provablyDistinct) df.select(out: _*)
    else df.select(out: _*).distinct()
  }

  /** SPARQL OPTIONAL: solutions of `required` left-joined with the
    * solutions of each optional group on their shared variables —
    * unmatched rows keep NULL bindings for the group's variables, the
    * OPTIONAL semantics exactly. Each group is itself a BGP. */
  def selectOptional(quads: DataFrame, required: Seq[Pattern],
      optionalGroups: Seq[Seq[Pattern]],
      dedup: Boolean = true): DataFrame =
    optionalGroups.foldLeft(select(quads, required, dedup)) {
      (acc, group) =>
      val opt = select(quads, group, dedup)
      val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq
      require(shared.nonEmpty,
        "an OPTIONAL group must share at least one variable with the " +
          "required patterns (a disconnected OPTIONAL is a cross join)")
      acc.join(opt, shared, "left")
    }

  /** SPARQL MINUS: solutions of `required` with every solution removed
    * that is compatible with some solution of a MINUS group on their
    * shared variables — negation as one anti equi-join per group (the
    * join keys are the shared variable bindings, so Catalyst plans the
    * same hash anti-join as any NOT EXISTS). Per SPARQL §8.3, a MINUS
    * group sharing NO variable with the required patterns removes
    * nothing (disjoint domains are never "compatible") — evaluated as
    * the spec no-op with a stderr warning, since it is almost always an
    * authoring bug (r14: was a loud reject; the W3C sample suite pins
    * the spec behavior). */
  def selectMinus(quads: DataFrame, required: Seq[Pattern],
      minusGroups: Seq[Seq[Pattern]], dedup: Boolean = true): DataFrame =
    minusGroups.foldLeft(select(quads, required, dedup)) { (acc, group) =>
      val neg = select(quads, group)
      val shared = acc.columns.toSet.intersect(neg.columns.toSet).toSeq
      if (shared.isEmpty) {
        // §8.3: disjoint domains are never compatible, so the MINUS
        // removes NOTHING — honor the spec (r14; was a loud reject)
        // but warn, because a silent no-op is usually an authoring bug
        System.err.println(
          "[graft] warning: MINUS group shares no variable with the " +
            "required patterns — per SPARQL §8.3 it removes nothing " +
            "(evaluated as a no-op)")
        acc
      } else
        acc.join(neg.select(shared.map(col): _*).distinct(), shared,
          "left_anti")
    }

  /** SPARQL UNION: the solution sets of alternative groups, each padded
    * with NULL (SPARQL "unbound") for variables only other branches
    * bind, then unioned. Each branch is an independent BGP — the
    * relational cost is the branches' own plans; padding is
    * projection-only. `dedup = true` (the hand-built default) adds a
    * final distinct; the textual layer passes `false` — SPARQL UNION is
    * bag-additive per spec, a solution in both branches appears twice
    * unless the query says DISTINCT. (SPARQL FILTER needs no dedicated
    * verb: solutions are relations, a FILTER is `.filter` on the
    * binding columns.) */
  def selectUnion(quads: DataFrame,
      groups: Seq[Seq[Pattern]], dedup: Boolean = true): DataFrame = {
    require(groups.nonEmpty, "at least one UNION branch required")
    val sols = groups.map(select(quads, _, dedup))
    val allVars = sols.flatMap(_.columns).distinct
    val padded = sols.map { s0 =>
      s0.select(allVars.map { v =>
        if (s0.columns.contains(v)) col(v)
        else lit(null).cast("string").as(v)
      }: _*)
    }.reduce(_ unionByName _)
    if (dedup) padded.distinct() else padded
  }

  /** CONSTRUCT template triple: subject/object terms are a solution
    * variable or a constant; the predicate is constant (as in the WHERE
    * patterns). `oKind` tags the built object term for downstream
    * rendering; a constant literal object may carry a language tag or a
    * datatype IRI (`"x"@en` / `"1"^^<xsd:integer>` in the textual
    * layer — the reference's corpora use both: lang-tagged names and 7
    * custom datatypes). */
  final case class Template(s: Term, p: String, o: Term,
      oKind: String = graft.model.TermKind.Iri,
      lang: Option[String] = None, datatype: Option[String] = None)

  /** SPARQL CONSTRUCT: instantiate `template` once per solution of
    * `where`, producing a new triple relation
    * `(subject, predicate, objectValue, objectKind, datatype, lang)`
    * — full term fidelity, so the output round-trips through the
    * N-Quads sink — with set semantics
    * (CONSTRUCT emits a GRAPH, and graphs are sets). The solution
    * relation is lineage-cut before the template fan-out — DataFrames
    * are lazy, so without the cut each of T template triples would
    * re-execute the K-pattern WHERE join (T×K corpus scans, the r8
    * plan-shape defect); cut, the union really is projection-only over
    * one materialized solution set, and the final `distinct` is the
    * single extra shuffle set semantics costs. A single-triple template
    * consumes the solutions once and skips the cut, keeping scan
    * pushdown for the simple reshaping case. */
  def construct(quads: DataFrame, where: Seq[Pattern],
      template: Seq[Template]): DataFrame =
    // dedup=false: constructFromSolutions' final distinct already
    // enforces the graph-is-a-set contract; deduping solutions first
    // would only add a shuffle
    constructFromSolutions(select(quads, where, dedup = false), template)

  /** Template instantiation over an ALREADY-SOLVED solution relation —
    * the textual layer lands here after its full pipeline (filters,
    * OPTIONAL, BINDs, solution modifiers), [[construct]] after a plain
    * BGP. Cut/instantiate/union semantics as documented on
    * [[construct]]. */
  def constructFromSolutions(sol0: DataFrame,
      template: Seq[Template]): DataFrame = {
    require(template.nonEmpty, "at least one template triple required")
    val sol =
      if (template.sizeIs > 1)
        graft.operators.Checkpoints.cut(sol0, eager = false)
      else sol0
    def term(t: Term): Column = t match {
      case Var(n) => col(n)
      case Const(v) => lit(v)
    }
    template.map { t =>
      sol.select(term(t.s).as("subject"), lit(t.p).as("predicate"),
          term(t.o).as("objectValue"), lit(t.oKind).as("objectKind"),
          lit(t.datatype.orNull).cast("string").as("datatype"),
          lit(t.lang.orNull).cast("string").as("lang"))
        .filter(col("subject").isNotNull && col("objectValue").isNotNull)
    }.reduce(_ unionByName _).distinct()
  }

  /** Selectivity rank of one pattern — the classic SPARQL BGP heuristic
    * (Stocker et al., "SPARQL Basic Graph Pattern Optimization Using
    * Selectivity Estimation", WWW'08): a bound subject narrows hardest,
    * then a bound object, then predicate/graph. Patterns with more (and
    * stronger) constants produce the smallest binding relations, so
    * they should seed and steer the join order. */
  private def selectivity(p: Pattern): Int = {
    def bound(t: Term): Boolean = t match {
      case Const(_) => true
      case _ => false
    }
    (if (bound(p.s)) 4 else 0) + (if (bound(p.o)) 2 else 0) +
      (if (bound(p.p)) 1 else 0) +
      (if (p.g.exists(bound)) 1 else 0)
  }

  private def patternVars(p: Pattern): Set[String] =
    (Seq(p.s, p.p, p.o) ++ p.g.toSeq).collect {
      case Var(n) => n
    }.toSet

  /** Solution mappings for the conjunction of `patterns`: one column per
    * distinct variable name, one row per binding. Pattern MATCHING is
    * set-of-triples semantics either way (each pattern relation is
    * distinct — RDF graphs are sets, and the SPARQL default graph is a
    * set union); since equi-joins of distinct relations are distinct,
    * the full-width solution set carries no duplicates, so `dedup`
    * only controls whether a final (semantically almost-always no-op)
    * `distinct` shuffle runs. The TEXTUAL layer passes `dedup = false`
    * — SPARQL SELECT is bag semantics, duplicates arise from
    * PROJECTION, and the parser applies `DISTINCT` after projecting
    * only when the query says so. The default stays `true` for
    * hand-built callers authored against set semantics.
    * Shared variables join; disjoint patterns
    * cross-join their bindings (the SPARQL cartesian semantics — avoid
    * disconnected patterns at scale just as you would in SPARQL).
    *
    * Join ORDER is optimized, not taken as written: patterns are ranked
    * by [[selectivity]], the most selective seeds the join, and each
    * step greedily joins the most selective remaining pattern that
    * SHARES a variable with the accumulated bindings — so a query
    * written star-last never pays an intermediate cartesian the way a
    * literal left-to-right fold would, and the smallest relations drive
    * every hash join's build side. Variable-free patterns (1-row
    * existence markers) apply last — each is one broadcast-able row.
    * Results are order-independent (joins commute; the final `distinct`
    * fixes set semantics), so this is purely a plan-shape choice. */
  def select(quads: DataFrame, patterns: Seq[Pattern],
      dedup: Boolean = true): DataFrame = {
    require(patterns.nonEmpty, "at least one triple pattern required")
    val stats = QuadStats.lookup(quads)
    // distinct elision (r15): a pattern over a predicate whose
    // (subject, objectValue) pairs the store statistics certify
    // duplicate-free cannot produce duplicate bindings — constants only
    // subset the rows, and the projected tuple separates whatever
    // survives. A variable predicate needs the certificate for EVERY
    // predicate in the store (the tuple then carries the predicate
    // column, so global pair-uniqueness separates rows).
    val uniq = QuadStats.lookupUniq(quads)
    def provablyDistinct(p: Pattern): Boolean = uniq.exists { u =>
      p.p match {
        case Const(v) => u.contains(v)
        case Var(_) => stats.exists(m => m.keySet.forall(u.contains))
      }
    }
    val items = patterns.zipWithIndex.map { case (p, i) =>
      val df0 = bindings(quads, p, i, provablyDistinct(p))
      // a pattern whose predicate the store stats bound to a small
      // partition is a genuine dimension: hint broadcast so its joins
      // skip the shuffle entirely (the store relation is a lineage-cut
      // RDD whose size Catalyst can't estimate, so AQE alone would
      // shuffle first and only localize post-hoc). The subject-bound
      // CAP stays a join-ORDER estimate only: a const-subject pattern
      // over a very-high-cardinality predicate (a hub subject's
      // description) gets NO explicit hint — an explicit broadcast
      // cannot be unwound by AQE, so the hub case must stay shuffleable
      // and let AQE localize if the scan turns out small (ADVICE r10).
      val uncapped = stats.map(m => p.p match {
        case Const(v) => m.getOrElse(v, 0L)
        case Var(_) => m.values.sum
      }).getOrElse(0L)
      val df = if (stats.isDefined &&
          rankKey(p, stats)._2 <= BroadcastEstRows &&
          uncapped <= BroadcastHubRows) broadcast(df0) else df0
      (df, patternVars(p), rankKey(p, stats))
    }
    val (varful, markers) = items.partition(_._2.nonEmpty)
    val joined: DataFrame =
      if (varful.isEmpty) markers.map(_._1).reduce(_ crossJoin _)
      else {
        val ordered = varful.sortBy(_._3)
        var acc = ordered.head._1
        var accVars = ordered.head._2
        var rest = ordered.tail
        while (rest.nonEmpty) {
          // among patterns sharing a variable with the accumulated
          // bindings, the best-ranked one joins next (rest is sorted,
          // so the first connected hit IS the best-ranked connected)
          val i = rest.indexWhere(_._2.intersect(accVars).nonEmpty)
          val pick = if (i >= 0) i else 0 // disconnected: SPARQL cartesian
          val (df, vs, _) = rest(pick)
          val shared = accVars.intersect(vs).toSeq
          acc = if (shared.nonEmpty) acc.join(df, shared)
            else acc.crossJoin(df)
          accVars ++= vs
          rest = rest.patch(pick, Nil, 1)
        }
        markers.map(_._1).foldLeft(acc)(_ crossJoin _)
      }
    val projected = joined
      .drop(patterns.indices.map(i => s"_bgp_m$i"): _*)
    if (dedup) projected.distinct() else projected
  }

  /** Pattern join-order rank (ascending = joins earlier): primary key
    * is the NEGATED structural [[selectivity]] (bound terms narrow
    * hardest — the Stocker WWW'08 heuristic); the tie-break is the
    * store's actual predicate cardinality from [[QuadStats]] when the
    * relation has registered statistics, so equal-shape patterns order
    * rarest-predicate-first (an absent predicate estimates 0 rows — the
    * best possible seed: the join short-circuits empty). Without stats
    * every tie-break is equal and the sort's stability preserves the
    * pure-heuristic order. */
  /** A bound SUBJECT bounds the pattern by the store's per-subject
    * description size (the emit profile is a few dozen quads per
    * entity), regardless of the predicate's total cardinality — without
    * this fold a point query on a high-cardinality predicate missed the
    * broadcast hint and paid a shuffle AQE only unwound post-hoc
    * (VERDICT r9 Wrong #3). */
  private val SubjectBoundCapRows = 1024L
  /** Above this UNCAPPED predicate cardinality a const-subject pattern
    * keeps its good join rank but loses the explicit broadcast hint:
    * per-subject degree is usually tiny, but a hub subject over a huge
    * predicate partition would OOM the broadcast, and an explicit hint
    * is beyond AQE's reach (ADVICE r10). */
  private val BroadcastHubRows = 5000000L
  /** A bound OBJECT filters hard but unboundedly (a popular type IRI
    * can match millions) — shrink, never cap. */
  private val ObjectBoundShrink = 16L

  private[graft] def rankKey(p: Pattern,
      stats: Option[Map[String, Long]]): (Int, Long) = {
    val est = stats match {
      case Some(m) => p.p match {
        case Const(v) => m.getOrElse(v, 0L)
        case Var(_) => m.values.sum // unbound predicate scans the store
      }
      case None => 0L
    }
    val adj = p.s match {
      case Const(_) => math.min(est, SubjectBoundCapRows)
      case _ => p.o match {
        case Const(_) => est / ObjectBoundShrink
        case _ => est
      }
    }
    (-selectivity(p), adj)
  }
}
