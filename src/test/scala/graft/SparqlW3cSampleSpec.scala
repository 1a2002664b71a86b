package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.{SparqlParser, TurtleParser}

/** A sample of the public W3C SPARQL 1.1 test suite, re-authored as an
  * in-repo conformance spec (r14 — VERDICT r13 next-#6): each case is
  * modeled on an entry of the `rdf-tests` sparql11 evaluation suite
  * (aggregates, bind, functions, negation, property paths, VALUES,
  * GRAPH, subquery, solution modifiers) with its data inlined as
  * Turtle, parsed by the engine's own [[TurtleParser]], executed by
  * [[SparqlParser.execute]], and compared as a bag of solutions. The
  * point is semantics drift the DuckDB oracles can't see: the oracles
  * gate RELATIONAL replays of each query, while these cases pin the
  * SPARQL-spec answer itself (unbound handling, bag semantics, path
  * closure membership, EXISTS scoping).
  *
  * The suite runs as one test that executes every case and reports
  * `pass/total`; a failure lists every diverging case with its
  * expected-vs-got bags, so triage is in the assertion message.
  */
class SparqlW3cSampleSpec extends AnyFunSuite with SparkTestBase {

  private val Prologue =
    "PREFIX ex: <http://example/> " +
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "

  private def quads(ttl: String): DataFrame = {
    import spark.implicits._
    TurtleParser.parseDocument(
      "@prefix ex: <http://example/> .\n" + ttl, saltKey = "w3c")
      .toSeq.toDF()
  }

  /** Canonical solution render: sorted `col=value` pairs, numbers
    * normalized (`4.0` → `4`), unbound → `UNDEF`; the row list sorts,
    * so comparison is bag-of-solutions (SPARQL's multiset). */
  private def bag(df: DataFrame): List[String] = {
    val cols = df.columns.sorted
    df.collect().toList.map { r =>
      cols.map { c =>
        val v = r.getAs[Any](c)
        val s = if (v == null) "UNDEF" else v.toString
        val n =
          if (s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?") && s.contains("."))
            new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
          else s
        s"$c=$n"
      }.mkString("|")
    }.sorted
  }

  private case class C(name: String, data: String, query: String,
      expected: List[String])

  private val E = "http://example/"

  // -- shared data sets (modeled on the suite's .ttl fixtures) ---------
  private val D1 = // aggregates / modifiers
    "ex:s1 ex:p 1 . ex:s1 ex:p 3 . ex:s1 ex:q 5 . " +
      "ex:s2 ex:p 2 . ex:s2 ex:q 4 ."
  private val D2 = // string/number functions
    "ex:s1 ex:str \"foobar\" . ex:s3 ex:num 2 . ex:s6 ex:num 7 . " +
      "ex:s4 ex:neg -1.5 . ex:s5 ex:pos 2.6 . " +
      "ex:s5 ex:city \"Los Angeles\" . " +
      "ex:s7 ex:label \"hello\"@en . ex:s7 ex:label \"hallo\"@de ."
  private val D3 = // negation / optional / union / subquery
    "ex:a ex:type ex:T . ex:a ex:p 1 . ex:b ex:type ex:T . ex:c ex:p 2 ."
  private val D4 = // property paths
    "ex:a ex:edge ex:b . ex:b ex:edge ex:c . ex:c ex:edge ex:d . " +
      "ex:a ex:knows ex:x . ex:x ex:name \"X\" ."

  private val cases: Seq[C] = Seq(
    // ---- aggregates (sparql11/aggregates: agg01/agg04/avg/min/max/
    //      groupconcat/sample/having shapes) ----
    C("agg-count-group", D1,
      "SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s ex:p ?v } GROUP BY ?s",
      List(s"n=1|s=${E}s2", s"n=2|s=${E}s1")),
    C("agg-count-star", D1,
      "SELECT (COUNT(*) AS ?n) WHERE { ?s ex:p ?v }",
      List("n=3")),
    C("agg-sum", D1,
      "SELECT ?s (SUM(?v) AS ?t) WHERE { ?s ex:p ?v } GROUP BY ?s",
      List(s"s=${E}s1|t=4", s"s=${E}s2|t=2")),
    C("agg-avg", D1,
      "SELECT ?s (AVG(?v) AS ?a) WHERE { ?s ex:p ?v } GROUP BY ?s",
      List(s"a=2|s=${E}s1", s"a=2|s=${E}s2")),
    C("agg-min-max", D1,
      "SELECT ?s (MIN(?v) AS ?mn) (MAX(?v) AS ?mx) " +
        "WHERE { ?s ex:p ?v } GROUP BY ?s",
      List(s"mn=1|mx=3|s=${E}s1", s"mn=2|mx=2|s=${E}s2")),
    C("agg-groupconcat-sep", D1,
      "SELECT ?s (GROUP_CONCAT(?v ; SEPARATOR=\",\") AS ?g) " +
        "WHERE { ?s ex:q ?v } GROUP BY ?s",
      List(s"g=4|s=${E}s2", s"g=5|s=${E}s1")),
    C("agg-sample", D1,
      "SELECT ?s (SAMPLE(?v) AS ?w) WHERE { ?s ex:q ?v } GROUP BY ?s",
      List(s"s=${E}s1|w=5", s"s=${E}s2|w=4")),
    C("agg-having", D1,
      "SELECT ?s (SUM(?v) AS ?t) WHERE { ?s ex:p ?v } GROUP BY ?s " +
        "HAVING (SUM(?v) > 3)",
      List(s"s=${E}s1|t=4")),
    C("agg-count-distinct", D1,
      "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ex:p ?v }",
      List("n=2")),
    // ---- BIND + expression functions (sparql11/bind, functions) ----
    C("fn-strbefore-after", D2,
      "SELECT ?b ?a WHERE { ex:s1 ex:str ?x " +
        "BIND(STRBEFORE(?x, \"bar\") AS ?b) " +
        "BIND(STRAFTER(?x, \"foo\") AS ?a) }",
      List("a=bar|b=foo")),
    C("fn-substr", D2,
      "SELECT ?a ?b WHERE { ex:s1 ex:str ?x " +
        "BIND(SUBSTR(?x, 4) AS ?a) BIND(SUBSTR(?x, 1, 3) AS ?b) }",
      List("a=bar|b=foo")),
    C("fn-case-len-concat", D2,
      "SELECT ?u ?l ?n ?c WHERE { ex:s1 ex:str ?x " +
        "BIND(UCASE(?x) AS ?u) BIND(LCASE(?u) AS ?l) " +
        "BIND(STRLEN(?x) AS ?n) BIND(CONCAT(?x, \"!\") AS ?c) }",
      List("c=foobar!|l=foobar|n=6|u=FOOBAR")),
    C("fn-replace", D2,
      "SELECT ?r WHERE { ex:s1 ex:str ?x " +
        "BIND(REPLACE(?x, \"o\", \"0\") AS ?r) }",
      List("r=f00bar")),
    C("fn-encode-for-uri", D2,
      "SELECT ?e WHERE { ex:s5 ex:city ?c " +
        "BIND(ENCODE_FOR_URI(?c) AS ?e) }",
      List("e=Los%20Angeles")),
    C("fn-abs", D2,
      "SELECT ?a WHERE { ex:s4 ex:neg ?d BIND(ABS(?d) AS ?a) }",
      List("a=1.5")),
    C("fn-ceil-floor-round", D2,
      "SELECT ?c ?f ?r WHERE { ex:s5 ex:pos ?d " +
        "BIND(CEIL(?d) AS ?c) BIND(FLOOR(?d) AS ?f) " +
        "BIND(ROUND(?d) AS ?r) }",
      List("c=3|f=2|r=3")),
    C("fn-if", D2,
      "SELECT ?r WHERE { ex:s3 ex:num ?v " +
        "BIND(IF(?v > 1, \"big\", \"small\") AS ?r) }",
      List("r=big")),
    C("fn-coalesce-optional", D3,
      "SELECT ?s ?w WHERE { ?s ex:type ex:T " +
        "OPTIONAL { ?s ex:p ?v } " +
        "BIND(COALESCE(?v, \"none\") AS ?w) }",
      List(s"s=${E}a|w=1", s"s=${E}b|w=none")),
    C("fn-in", D2,
      "SELECT ?s WHERE { ?s ex:num ?v FILTER(?v IN (2, 3)) }",
      List(s"s=${E}s3")),
    C("fn-not-in", D2,
      "SELECT ?s WHERE { ?s ex:num ?v FILTER(?v NOT IN (2, 3)) }",
      List(s"s=${E}s6")),
    C("fn-regex", D2,
      "SELECT ?s WHERE { ?s ex:str ?x FILTER(REGEX(?x, \"^foo\")) }",
      List(s"s=${E}s1")),
    // ---- term accessors (sparql11/functions: lang/datatype/isIRI) ----
    C("term-lang", D2,
      "SELECT ?l WHERE { ex:s7 ex:label ?l FILTER(LANG(?l) = \"en\") }",
      List("l=hello")),
    C("term-datatype", D1,
      "SELECT ?v WHERE { ex:s2 ex:p ?v " +
        "FILTER(DATATYPE(?v) = xsd:integer) }",
      List("v=2")),
    C("term-isiri", D3,
      "SELECT ?o WHERE { ex:a ?p ?o FILTER(isIRI(?o)) }",
      List(s"o=${E}T")),
    C("term-bound-negative", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T OPTIONAL { ?s ex:p ?v } " +
        "FILTER(!BOUND(?v)) }",
      List(s"s=${E}b")),
    // ---- negation (sparql11/negation: exists/subsetByExcl/minus) ----
    C("neg-not-exists", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T " +
        "FILTER NOT EXISTS { ?s ex:p ?v } }",
      List(s"s=${E}b")),
    C("neg-exists", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T " +
        "FILTER EXISTS { ?s ex:p ?v } }",
      List(s"s=${E}a")),
    C("neg-minus", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T MINUS { ?s ex:p ?v } }",
      List(s"s=${E}b")),
    // ---- property paths (sparql11/property-path: pp01-style) ----
    C("path-plus", D4,
      "SELECT ?o WHERE { ex:a ex:edge+ ?o }",
      List(s"o=${E}b", s"o=${E}c", s"o=${E}d")),
    C("path-star-includes-self", D4,
      "SELECT ?o WHERE { ex:a ex:edge* ?o }",
      List(s"o=${E}a", s"o=${E}b", s"o=${E}c", s"o=${E}d")),
    C("path-zero-or-one", D4,
      "SELECT ?o WHERE { ex:a ex:edge? ?o }",
      List(s"o=${E}a", s"o=${E}b")),
    C("path-inverse", D4,
      "SELECT ?s WHERE { ex:b ^ex:edge ?s }",
      List(s"s=${E}a")),
    C("path-sequence", D4,
      "SELECT ?n WHERE { ex:a ex:knows/ex:name ?n }",
      List("n=X")),
    C("path-alternative", D4,
      "SELECT ?o WHERE { ex:a ex:edge|ex:knows ?o }",
      List(s"o=${E}b", s"o=${E}x")),
    C("path-negated-set", D4,
      "SELECT ?o WHERE { ex:a !(ex:knows) ?o }",
      List(s"o=${E}b")),
    // ---- VALUES (sparql11/bindings: values01/values08 shapes) ----
    C("values-single-var", D1,
      "SELECT ?s ?v WHERE { ?s ex:p ?v VALUES ?s { ex:s1 } }",
      List(s"s=${E}s1|v=1", s"s=${E}s1|v=3")),
    C("values-multi-undef", D1,
      "SELECT ?s ?v WHERE { ?s ex:p ?v " +
        "VALUES (?s ?v) { (ex:s1 1) (ex:s2 UNDEF) } }",
      List(s"s=${E}s1|v=1", s"s=${E}s2|v=2")),
    // ---- subquery (sparql11/subquery) ----
    C("subquery-join", D3,
      "SELECT ?s WHERE { { SELECT ?s WHERE { ?s ex:type ex:T } } " +
        "?s ex:p ?v }",
      List(s"s=${E}a")),
    // ---- optional / union (dawg optional/union shapes) ----
    C("optional-unbound", D3,
      "SELECT ?s ?v WHERE { ?s ex:type ex:T OPTIONAL { ?s ex:p ?v } }",
      List(s"s=${E}a|v=1", s"s=${E}b|v=UNDEF")),
    C("union-bag", D3,
      "SELECT ?o WHERE { { ex:a ex:p ?o } UNION { ex:c ex:p ?o } }",
      List("o=1", "o=2")),
    // ---- solution modifiers (sparql11/solution-seq) ----
    C("distinct", D1,
      "SELECT DISTINCT ?s WHERE { ?s ex:p ?v }",
      List(s"s=${E}s1", s"s=${E}s2")),
    C("order-limit", D1,
      "SELECT ?v WHERE { ?s ex:p ?v } ORDER BY ?v LIMIT 2",
      List("v=1", "v=2")),
    C("order-offset", D1,
      "SELECT ?v WHERE { ?s ex:p ?v } ORDER BY ?v OFFSET 1 LIMIT 2",
      List("v=2", "v=3")),
    C("select-expression", D1,
      "SELECT (?v * 2 AS ?d) WHERE { ex:s2 ex:p ?v }",
      List("d=4")),
    C("order-desc-limit", D1,
      "SELECT ?v WHERE { ?s ex:p ?v } ORDER BY DESC(?v) LIMIT 1",
      List("v=3")),
    // ---- ASK (dawg ask shapes) ----
    C("ask-true", D1, "ASK { ex:s1 ex:p ?v }", List("ask=true")),
    C("ask-false", D1, "ASK { ex:s1 ex:missing ?v }", List("ask=false")),
    // ---- more functions / operators ----
    C("fn-regex-flag-i", D2,
      "SELECT ?s WHERE { ?s ex:str ?x FILTER(REGEX(?x, \"FOO\", \"i\")) }",
      List(s"s=${E}s1")),
    C("fn-strstarts-ends-contains", D2,
      "SELECT ?s WHERE { ?s ex:str ?x FILTER(STRSTARTS(?x, \"foo\") && " +
        "STRENDS(?x, \"bar\") && CONTAINS(?x, \"oob\")) }",
      List(s"s=${E}s1")),
    C("fn-arith-precedence", D2,
      // XPath precedence: * binds tighter than + → 2 + 2*3 = 8, not 12
      "SELECT (?v + 2 * 3 AS ?x) WHERE { ex:s3 ex:num ?v }",
      List("x=8")),
    C("fn-str-of-iri", D3,
      "SELECT ?u WHERE { ?s ex:type ex:T ?s ex:p ?v " +
        "BIND(STR(?s) AS ?u) }",
      List(s"u=${E}a")),
    C("fn-md5", D2,
      "SELECT ?h WHERE { ex:s3 ex:num ?v BIND(MD5(\"abc\") AS ?h) }",
      List("h=900150983cd24fb0d6963f7d28e17f72")),
    C("term-langmatches", D2,
      "SELECT ?l WHERE { ex:s7 ex:label ?l " +
        "FILTER(LANGMATCHES(LANG(?l), \"en\")) }",
      List("l=hello")),
    C("term-isliteral", D3,
      "SELECT ?o WHERE { ex:a ?p ?o FILTER(isLiteral(?o)) }",
      List("o=1")),
    // ---- nested OPTIONAL (§18.2.2.6 inner-first left join) ----
    C("optional-nested", D3 + " ex:a ex:q 9 .",
      "SELECT ?s ?v ?w WHERE { ?s ex:type ex:T " +
        "OPTIONAL { ?s ex:p ?v OPTIONAL { ?s ex:q ?w } } }",
      List(s"s=${E}a|v=1|w=9", s"s=${E}b|v=UNDEF|w=UNDEF")),
    // ---- UNION branches with disjoint variables pad with UNDEF ----
    C("union-var-padding", D3,
      "SELECT ?o ?t WHERE { { ex:a ex:p ?o } UNION " +
        "{ ex:b ex:type ?t } }",
      List(s"o=1|t=UNDEF", s"o=UNDEF|t=${E}T")))

  test("W3C SPARQL 1.1 sample: evaluation cases match the spec answers") {
    val failures = cases.flatMap { c =>
      val got =
        try bag(SparqlParser.execute(quads(c.data), Prologue + c.query))
        catch { case e: Throwable => List(s"<threw: ${e.getMessage}>") }
      if (got == c.expected) None
      else Some(s"${c.name}:\n  expected ${c.expected}\n  got      $got")
    }
    info(s"W3C sample: ${cases.size - failures.size}/${cases.size} pass")
    assert(failures.isEmpty,
      s"\n${failures.size}/${cases.size} diverge:\n" +
        failures.mkString("\n"))
  }

  test("W3C SPARQL 1.1 sample: CONSTRUCT instantiates the template " +
      "once per solution") {
    val got = SparqlParser.execute(quads(D1),
      Prologue + "CONSTRUCT { ?s ex:copied ?v } WHERE { ?s ex:p ?v }")
    val triples = got.select(
      org.apache.spark.sql.functions.col("subject"),
      org.apache.spark.sql.functions.col("predicate"),
      org.apache.spark.sql.functions.col("objectValue"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toList.sorted
    assert(triples == List(
      (s"${E}s1", s"${E}copied", "1"),
      (s"${E}s1", s"${E}copied", "3"),
      (s"${E}s2", s"${E}copied", "2")))
  }

  test("W3C SPARQL 1.1 sample: GRAPH keyword binds the graph variable") {
    import spark.implicits._
    val q = Seq(
      (s"${E}a", "iri", s"${E}p", "1", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, s"${E}g1"),
      (s"${E}a", "iri", s"${E}p", "2", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, s"${E}g2"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val got = bag(SparqlParser.execute(q,
      Prologue + "SELECT ?g ?v WHERE { GRAPH ?g { ex:a ex:p ?v } }"))
    assert(got == List(s"g=${E}g1|v=1", s"g=${E}g2|v=2"))
  }

  test("W3C SPARQL 1.1 sample: syntax-negative cases reject loudly") {
    val bad = Seq(
      "unterminated group" ->
        "SELECT ?x WHERE { ?x ex:p ?v",
      "ungrouped projected var with aggregate" ->
        "SELECT ?s (SUM(?v) AS ?t) WHERE { ?s ex:p ?v }",
      "incomplete triple" ->
        "ASK { ?s ex:p",
      "malformed FILTER" ->
        "SELECT * WHERE { ?s ex:p ?o . FILTER( }",
      "malformed PREFIX" ->
        "PREFIX broken <http://example/> SELECT ?s WHERE { ?s ?p ?o }")
    val store = quads(D1)
    val survivors = bad.collect {
      case (name, q) if scala.util.Try(
        SparqlParser.execute(store, Prologue + q).collect()).isSuccess =>
        name
    }
    info(s"W3C sample: ${bad.size - survivors.size}/${bad.size} " +
      "syntax-negative cases reject")
    assert(survivors.isEmpty,
      s"accepted malformed queries: ${survivors.mkString(", ")}")
  }
}
