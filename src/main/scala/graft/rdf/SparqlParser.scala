package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal SPARQL SELECT parser — textual queries compile onto the
  * [[Bgp]] algebra, closing the serving loop: the reference exposes its
  * emitted graph through a SPARQL endpoint (`cam/graphdb.py`,
  * `fuseki/config.ttl`), and its notes drive it with literal query
  * strings. The subset here is the serving core those notes use:
  *
  * {{{
  * SELECT [DISTINCT] ?v … | * | ?g … (COUNT|SUM|MIN|MAX|AVG(?v|*) AS ?a) …
  * | CONSTRUCT { template triples } | ASK
  * WHERE {
  *   [GRAPH ?g|<iri> {] ?s <p> ?o|<iri>|"lit" . … [}]
  *   [OPTIONAL { triples }]
  *   [MINUS { triples }]
  *   [FILTER(?v op "lit"|number [&& …])]
  *   [VALUES ?v { "lit" <iri> … }]
  * }
  * [GROUP BY ?v …] [ORDER BY [DESC(]?v[)] …] [LIMIT n]
  * }}}
  *
  * Predicates are constant IRIs (the [[Bgp]] restriction); FILTER
  * compares a variable against a literal (`= != < > <= >=`, numeric
  * when the literal is a number), conjoined with `&&`. Parsing is a
  * ~hundred-line recursive descent over a token list — deliberately no
  * dependency, no reflection, loud errors with the offending token.
  * The compiled plan is exactly what hand-built [[Bgp]] calls produce:
  * per-pattern filtered scans hash-joined on shared variables, Catalyst
  * optimizing the rest.
  */
object SparqlParser {

  /** `(COUNT(?v) AS ?alias)`-style projection aggregate. */
  final case class Agg(func: String, variable: String, alias: String)

  final case class Query(
      distinct: Boolean,
      projection: Seq[String], // empty = SELECT *
      aggregates: Seq[Agg], // non-empty ⇒ GROUP BY query
      groupBy: Seq[String],
      patterns: Seq[Bgp.Pattern],
      optionals: Seq[Seq[Bgp.Pattern]],
      minuses: Seq[Seq[Bgp.Pattern]],
      filters: Seq[(String, String, String, Boolean)], // var, op, lit, numeric
      orderBy: Seq[(String, Boolean)], // var, descending
      limit: Option[Int],
      verb: String = "select", // select | construct | ask
      template: Seq[Bgp.Template] = Nil,
      values: Seq[(String, Seq[String])] = Nil) // VALUES ?v { … }

  // -- tokenizer ---------------------------------------------------------

  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '<') {
        val j = s.indexOf('>', i)
        require(j > 0, s"unterminated IRI at offset $i")
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '"') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '"') j += 1
        require(j < s.length, s"unterminated literal at offset $i")
        out += s.substring(i, j + 1); i = j + 1
      } else if ("{}().".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else if (c == '&' && i + 1 < s.length && s.charAt(i + 1) == '&') {
        out += "&&"; i += 2
      } else if ("=<>!".indexOf(c) >= 0) {
        if (i + 1 < s.length && s.charAt(i + 1) == '=') {
          out += s.substring(i, i + 2); i += 2
        } else { out += c.toString; i += 1 }
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace &&
          "{}().<>\"=!&".indexOf(s.charAt(j)) < 0) j += 1
        out += s.substring(i, j); i = j
      }
    }
    out.result()
  }

  // -- recursive descent -------------------------------------------------

  private class P(var ts: List[String]) {
    def peek: String = ts.headOption.getOrElse("<eof>")
    def eat(): String = { val h = peek; ts = ts.drop(1); h }
    def expect(t: String): Unit = {
      val h = eat()
      require(h.equalsIgnoreCase(t), s"expected '$t', got '$h'")
    }
    def is(t: String): Boolean = peek.equalsIgnoreCase(t)
  }

  private def term(t: String): Bgp.Term =
    if (t.startsWith("?")) Bgp.Var(t.substring(1))
    else if (t.startsWith("<")) Bgp.Const(t.substring(1, t.length - 1))
    else if (t.startsWith("\"")) Bgp.Const(t.substring(1, t.length - 1))
    else throw new IllegalArgumentException(s"expected term, got '$t'")

  private def triples(p: P, g: Option[Bgp.Term]): Seq[Bgp.Pattern] = {
    val out = Seq.newBuilder[Bgp.Pattern]
    var more = true
    while (more) {
      val s = term(p.eat())
      val pr = p.eat()
      require(pr.startsWith("<"),
        s"predicate must be a constant IRI, got '$pr'")
      val o = term(p.eat())
      out += Bgp.Pattern(s, pr.substring(1, pr.length - 1), o, g)
      if (p.is(".")) { p.eat(); more = !p.is("}") && !kw(p) }
      else more = false
    }
    out.result()
  }

  private def kw(p: P): Boolean =
    p.is("OPTIONAL") || p.is("MINUS") || p.is("FILTER") ||
      p.is("GRAPH") || p.is("VALUES")

  /** CONSTRUCT template triples: object kind follows the token form —
    * `<iri>` builds an IRI term, a quoted literal builds a literal, and
    * a VARIABLE instantiates as a literal (the flatten-a-value case;
    * use the programmatic [[Bgp.construct]] for IRI-kinded variables). */
  private def templates(p: P): Seq[Bgp.Template] = {
    val out = Seq.newBuilder[Bgp.Template]
    var more = true
    while (more) {
      val s = term(p.eat())
      val pr = p.eat()
      require(pr.startsWith("<"),
        s"template predicate must be a constant IRI, got '$pr'")
      val oTok = p.eat()
      val (o, kind) =
        if (oTok.startsWith("?"))
          (Bgp.Var(oTok.substring(1)), graft.model.TermKind.Literal)
        else if (oTok.startsWith("<"))
          (Bgp.Const(oTok.substring(1, oTok.length - 1)),
            graft.model.TermKind.Iri)
        else if (oTok.startsWith("\""))
          (Bgp.Const(oTok.substring(1, oTok.length - 1)),
            graft.model.TermKind.Literal)
        else throw new IllegalArgumentException(
          s"expected template object term, got '$oTok'")
      out += Bgp.Template(s, pr.substring(1, pr.length - 1), o, kind)
      if (p.is(".")) { p.eat(); more = !p.is("}") }
      else more = false
    }
    out.result()
  }

  def parse(q: String): Query = {
    val p = new P(tokenize(q))
    if (p.is("CONSTRUCT")) {
      p.eat(); p.expect("{")
      val tpl = templates(p)
      p.expect("}"); p.expect("WHERE"); p.expect("{")
      val pats = Seq.newBuilder[Bgp.Pattern]
      while (!p.is("}")) {
        if (p.is("GRAPH")) {
          p.eat(); val g = term(p.eat())
          p.expect("{"); pats ++= triples(p, Some(g)); p.expect("}")
        } else pats ++= triples(p, None)
      }
      p.expect("}")
      require(p.ts.isEmpty, s"trailing tokens: ${p.ts.mkString(" ")}")
      return Query(distinct = false, Nil, Nil, Nil, pats.result(), Nil,
        Nil, Nil, Nil, None, verb = "construct", template = tpl)
    }
    if (p.is("ASK")) {
      p.eat()
      if (p.is("WHERE")) p.eat()
      p.expect("{")
      val pats = Seq.newBuilder[Bgp.Pattern]
      while (!p.is("}")) pats ++= triples(p, None)
      p.expect("}")
      require(p.ts.isEmpty, s"trailing tokens: ${p.ts.mkString(" ")}")
      return Query(distinct = false, Nil, Nil, Nil, pats.result(), Nil,
        Nil, Nil, Nil, None, verb = "ask")
    }
    p.expect("SELECT")
    val distinct = { val d = p.is("DISTINCT"); if (d) p.eat(); d }
    val proj = Seq.newBuilder[String]
    val aggs = Seq.newBuilder[Agg]
    if (p.is("*")) p.eat()
    else while (p.peek.startsWith("?") || p.is("(")) {
      if (p.is("(")) { // (FUNC(?v) AS ?alias)
        p.eat()
        val f = p.eat().toUpperCase
        require(Seq("COUNT", "SUM", "MIN", "MAX", "AVG").contains(f),
          s"unsupported aggregate '$f'")
        p.expect("(")
        val v = p.eat()
        require(v.startsWith("?") || v == "*",
          s"aggregate argument must be a variable or *, got '$v'")
        p.expect(")"); p.expect("AS")
        val a = p.eat()
        require(a.startsWith("?"), s"AS needs a variable, got '$a'")
        p.expect(")")
        aggs += Agg(f, if (v == "*") "*" else v.substring(1),
          a.substring(1))
      } else proj += p.eat().substring(1)
    }
    p.expect("WHERE"); p.expect("{")
    val pats = Seq.newBuilder[Bgp.Pattern]
    val opts = Seq.newBuilder[Seq[Bgp.Pattern]]
    val mins = Seq.newBuilder[Seq[Bgp.Pattern]]
    val fils = Seq.newBuilder[(String, String, String, Boolean)]
    val vals = Seq.newBuilder[(String, Seq[String])]
    while (!p.is("}")) {
      if (p.is("GRAPH")) {
        p.eat()
        val g = term(p.eat())
        p.expect("{"); pats ++= triples(p, Some(g)); p.expect("}")
      } else if (p.is("OPTIONAL")) {
        p.eat(); p.expect("{"); opts += triples(p, None); p.expect("}")
      } else if (p.is("MINUS")) {
        p.eat(); p.expect("{"); mins += triples(p, None); p.expect("}")
      } else if (p.is("VALUES")) {
        // single-variable VALUES: an inline allow-list of bindings —
        // compiles to isin() on the binding column, i.e. a pushable
        // IN filter, the common "these N entities" serving shape
        p.eat()
        val v = p.eat()
        require(v.startsWith("?"), s"VALUES needs a variable, got '$v'")
        p.expect("{")
        val vs = Seq.newBuilder[String]
        while (!p.is("}")) {
          val t = p.eat()
          require(t.startsWith("<") || t.startsWith("\""),
            s"VALUES entries must be IRIs or literals, got '$t'")
          vs += t.substring(1, t.length - 1)
        }
        p.expect("}")
        vals += ((v.substring(1), vs.result()))
      } else if (p.is("FILTER")) {
        p.eat(); p.expect("(")
        var more = true
        while (more) {
          val v = p.eat()
          require(v.startsWith("?"), s"FILTER needs a variable, got '$v'")
          val op = p.eat()
          require(Seq("=", "!=", "<", ">", "<=", ">=").contains(op),
            s"unsupported FILTER operator '$op'")
          val lit = p.eat()
          val numeric = !lit.startsWith("\"")
          val raw = if (numeric) lit else lit.substring(1, lit.length - 1)
          fils += ((v.substring(1), op, raw, numeric))
          if (p.is("&&")) p.eat() else more = false
        }
        p.expect(")")
      } else pats ++= triples(p, None)
    }
    p.expect("}")
    val grp = Seq.newBuilder[String]
    if (p.is("GROUP")) {
      p.eat(); p.expect("BY")
      while (p.peek.startsWith("?")) grp += p.eat().substring(1)
    }
    val ord = Seq.newBuilder[(String, Boolean)]
    if (p.is("ORDER")) {
      p.eat(); p.expect("BY")
      while (p.peek.startsWith("?") || p.is("DESC") || p.is("ASC")) {
        if (p.is("DESC") || p.is("ASC")) {
          val desc = p.eat().equalsIgnoreCase("DESC")
          p.expect("("); ord += ((p.eat().substring(1), desc)); p.expect(")")
        } else ord += ((p.eat().substring(1), false))
      }
    }
    val lim = if (p.is("LIMIT")) { p.eat(); Some(p.eat().toInt) } else None
    require(p.ts.isEmpty, s"trailing tokens: ${p.ts.mkString(" ")}")
    val parsed = Query(distinct, proj.result(), aggs.result(),
      grp.result(), pats.result(), opts.result(), mins.result(),
      fils.result(), ord.result(), lim, values = vals.result())
    require(parsed.aggregates.isEmpty ||
      parsed.projection.toSet == parsed.groupBy.toSet,
      "with aggregates, every projected variable must be GROUPed BY")
    parsed
  }

  /** Parse and execute against a quad relation. */
  def execute(quads: DataFrame, sparql: String): DataFrame = {
    val q = parse(sparql)
    if (q.verb == "construct")
      return Bgp.construct(quads, q.patterns, q.template)
        .orderBy(col("subject"), col("predicate"), col("objectValue"))
    if (q.verb == "ask") {
      val exists = !Bgp.select(quads, q.patterns).limit(1).isEmpty
      return quads.sparkSession.sql(s"SELECT $exists AS ask")
    }
    var sol =
      if (q.minuses.nonEmpty)
        q.optionals.foldLeft(
          Bgp.selectMinus(quads, q.patterns, q.minuses)) { (acc, g) =>
          val opt = Bgp.select(quads, g)
          val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq
          require(shared.nonEmpty, "disconnected OPTIONAL")
          acc.join(opt, shared, "left")
        }
      else if (q.optionals.nonEmpty)
        Bgp.selectOptional(quads, q.patterns, q.optionals)
      else Bgp.select(quads, q.patterns)
    q.values.foreach { case (v, vs) =>
      require(sol.columns.contains(v),
        s"VALUES variable ?$v is not bound by the patterns")
      sol = sol.filter(col(v).isin(vs: _*))
    }
    q.filters.foreach { case (v, op, litv, numeric) =>
      val c: Column = if (numeric) col(v).cast("double") else col(v)
      val l: Column = if (numeric) lit(litv.toDouble) else lit(litv)
      sol = sol.filter(op match {
        case "=" => c === l
        case "!=" => c =!= l
        case "<" => c < l
        case ">" => c > l
        case "<=" => c <= l
        case ">=" => c >= l
      })
    }
    if (q.aggregates.nonEmpty) {
      def one(a: Agg): Column = (a.func match {
        case "COUNT" =>
          if (a.variable == "*") count(lit(1)) else count(col(a.variable))
        case "SUM" => sum(col(a.variable).cast("double"))
        case "MIN" => min(col(a.variable))
        case "MAX" => max(col(a.variable))
        case "AVG" => avg(col(a.variable).cast("double"))
      }).as(a.alias)
      val exprs = q.aggregates.map(one)
      sol = sol.groupBy(q.groupBy.map(col): _*)
        .agg(exprs.head, exprs.tail: _*)
    } else if (q.projection.nonEmpty)
      sol = sol.select(q.projection.map(col): _*)
    if (q.distinct && q.aggregates.isEmpty) sol = sol.distinct()
    if (q.orderBy.nonEmpty)
      sol = sol.orderBy(q.orderBy.map { case (v, desc) =>
        if (desc) col(v).desc else col(v).asc
      }: _*)
    q.limit.foreach(n => sol = sol.limit(n))
    sol
  }
}
