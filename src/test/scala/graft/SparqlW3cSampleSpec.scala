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
      "@prefix ex: <http://example/> .\n" +
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n" + ttl,
      saltKey = "w3c")
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

  // ---- round-14 battery #2: spec-semantics drift probes --------------
  private val D5 = // dateTime accessors
    "ex:d ex:date \"2010-06-21T11:28:01Z\"^^xsd:dateTime ."

  private val cases2: Seq[C] = Seq(
    // ---- operator semantics (§17.3 operand type promotion) ----
    C("op-integer-divide-is-decimal", D2,
      // op:numeric-divide on two xsd:integer operands yields xsd:decimal
      "SELECT (?v / 2 AS ?x) WHERE { ex:s6 ex:num ?v }",
      List("x=3.5")),
    C("op-unary-minus", D2,
      "SELECT (-?v AS ?x) WHERE { ex:s6 ex:num ?v }",
      List("x=-7")),
    C("op-promote-int-plus-decimal", D2,
      "SELECT (?v + 1.5 AS ?x) WHERE { ex:s6 ex:num ?v }",
      List("x=8.5")),
    C("op-compare-across-numeric-types", D2,
      "SELECT ?s WHERE { ?s ex:num ?v FILTER(?v = 7.0) }",
      List(s"s=${E}s6")),
    C("op-string-less-than", D2,
      "SELECT ?x WHERE { ex:s1 ex:str ?x FILTER(\"a\" < ?x) }",
      List("x=foobar")),
    // ---- XPath rounding rules (fn:round half goes UP, even when
    //      negative: round(-2.5) = -2; fn:ceil/floor on negatives) ----
    C("fn-round-negative-half-up", D2,
      "SELECT (ROUND(-2.5) AS ?a) (ROUND(2.5) AS ?b) " +
        "WHERE { ex:s3 ex:num ?v }",
      List("a=-2|b=3")),
    C("fn-ceil-floor-negative", D2,
      "SELECT (CEIL(-2.6) AS ?c) (FLOOR(-2.6) AS ?f) " +
        "WHERE { ex:s3 ex:num ?v }",
      List("c=-2|f=-3")),
    // ---- string functions, edge shapes ----
    C("fn-replace-group-ref", D2,
      "SELECT (REPLACE(\"abc\", \"(b)\", \"[$1]\") AS ?r) " +
        "WHERE { ex:s3 ex:num ?v }",
      List("r=a[b]c")),
    C("fn-substr-past-end", D2,
      "SELECT (SUBSTR(\"foo\", 2, 99) AS ?r) WHERE { ex:s3 ex:num ?v }",
      List("r=oo")),
    C("fn-strdt-datatype", D2,
      "SELECT ?d WHERE { ex:s3 ex:num ?v " +
        "BIND(STRDT(\"123\", xsd:integer) AS ?x) " +
        "BIND(DATATYPE(?x) AS ?d) }",
      List("d=http://www.w3.org/2001/XMLSchema#integer")),
    C("fn-strlang-lang", D2,
      "SELECT ?l WHERE { ex:s3 ex:num ?v " +
        "BIND(STRLANG(\"chat\", \"fr\") AS ?x) BIND(LANG(?x) AS ?l) }",
      List("l=fr")),
    C("fn-iri-constructor-is-iri", D2,
      "SELECT ?ok WHERE { ex:s3 ex:num ?v " +
        "BIND(IRI(\"http://example/z\") AS ?i) " +
        "BIND(isIRI(?i) AS ?ok) }",
      List("ok=true")),
    C("fn-bnode-is-blank", D2,
      "SELECT ?ok WHERE { ex:s3 ex:num ?v " +
        "BIND(BNODE() AS ?b) BIND(isBlank(?b) AS ?ok) }",
      List("ok=true")),
    C("fn-sameterm", D2,
      "SELECT ?s WHERE { ?s ex:num ?v FILTER(sameTerm(?v, 2)) }",
      List(s"s=${E}s3")),
    C("fn-sha384-sha512-len", D2,
      "SELECT (STRLEN(SHA384(\"abc\")) AS ?a) " +
        "(STRLEN(SHA512(\"abc\")) AS ?b) WHERE { ex:s3 ex:num ?v }",
      List("a=96|b=128")),
    // ---- dateTime accessors (§17.4.5) ----
    C("fn-datetime-accessors", D5,
      "SELECT (YEAR(?d) AS ?y) (MONTH(?d) AS ?m) (DAY(?d) AS ?dd) " +
        "(HOURS(?d) AS ?h) (MINUTES(?d) AS ?mi) (SECONDS(?d) AS ?se) " +
        "WHERE { ex:d ex:date ?d }",
      List("dd=21|h=11|m=6|mi=28|se=1|y=2010")),
    C("fn-tz", D5,
      "SELECT (TZ(?d) AS ?z) WHERE { ex:d ex:date ?d }",
      List("z=Z")),
    C("fn-now-is-current", D5,
      "SELECT (IF(YEAR(NOW()) >= 2026, \"ok\", \"stale\") AS ?r) " +
        "WHERE { ex:d ex:date ?d }",
      List("r=ok")),
    // ---- aggregates: empty-input + unbound rules (§18.5) ----
    C("agg-empty-no-groupby-one-row", D1,
      // no GROUP BY over zero solutions: ONE row; COUNT=0, SUM=0
      "SELECT (COUNT(?v) AS ?n) (SUM(?v) AS ?t) " +
        "WHERE { ex:nope ex:p ?v }",
      List("n=0|t=0")),
    C("agg-empty-with-groupby-no-rows", D1,
      "SELECT ?s (SUM(?v) AS ?t) WHERE { ?s ex:missing ?v } GROUP BY ?s",
      Nil),
    C("agg-count-var-skips-unbound", D3,
      // COUNT(?v) counts only bound; COUNT(*) counts solutions
      "SELECT (COUNT(?v) AS ?a) (COUNT(*) AS ?b) WHERE { " +
        "?s ex:type ex:T OPTIONAL { ?s ex:p ?v } }",
      List("a=1|b=2")),
    C("agg-sum-distinct", D1,
      "SELECT (SUM(DISTINCT ?v) AS ?t) WHERE { ?s ex:p ?v . " +
        "VALUES ?v { 1 2 } }",
      List("t=3")),
    C("agg-max-strings", D2,
      "SELECT (MAX(?x) AS ?m) WHERE { ?s ex:str ?x }",
      List("m=foobar")),
    // ---- negation scope (§8): MINUS with disjoint domains removes
    //      NOTHING; NOT EXISTS with a free variable removes EVERYTHING
    //      when the pattern matches anywhere ----
    C("neg-minus-disjoint-domains", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T MINUS { ?x ex:p ?v } }",
      List(s"s=${E}a", s"s=${E}b")),
    C("neg-not-exists-free-var", D3,
      "SELECT ?s WHERE { ?s ex:type ex:T " +
        "FILTER NOT EXISTS { ?x ex:p ?v } }",
      Nil),
    C("neg-exists-in-optional", D3,
      "SELECT ?s ?v WHERE { ?s ex:type ex:T " +
        "OPTIONAL { ?s ex:p ?v FILTER EXISTS { ?s ex:type ex:T } } }",
      List(s"s=${E}a|v=1", s"s=${E}b|v=UNDEF")),
    // ---- property path algebra compositions ----
    C("path-alt-with-inverse", D4,
      "SELECT ?o WHERE { ex:b (ex:edge|^ex:edge) ?o }",
      List(s"o=${E}a", s"o=${E}c")),
    C("path-seq-fwd-then-inverse", D4,
      "SELECT ?o WHERE { ex:a ex:knows/^ex:knows ?o }",
      List(s"o=${E}a")),
    // §18.2.2.3: an NPS with ONLY inverse members matches only reverse
    // edges (with predicate outside the set) — b's sole incoming edge
    // is ex:edge, which is excluded
    C("path-nps-inverse-only", D4,
      "SELECT ?o WHERE { ex:b !(^ex:edge) ?o }",
      Nil),
    // mixed NPS: forward edges with pred ∉ {knows} (a→b via edge)
    // union reverse edges with pred ∉ {knows} (none into a)
    C("path-nps-mixed", D4,
      "SELECT ?o WHERE { ex:a !(ex:knows|^ex:knows) ?o }",
      List(s"o=${E}b")),
    C("path-grouped-seq-plus", D4,
      "SELECT ?o WHERE { ex:a (ex:edge/ex:edge)+ ?o }",
      List(s"o=${E}c")),
    // ^(p1/p2): `x ^path y` ⇔ `y path x`, so ex:c ^(edge/edge) ?o asks
    // who reaches c in exactly two forward edge hops (inv(p1/p2) =
    // inv(p2)/inv(p1))
    C("path-inverse-of-seq", D4,
      "SELECT ?o WHERE { ex:c ^(ex:edge/ex:edge) ?o }",
      List(s"o=${E}a")),
    // ---- VALUES / BIND placement & scope ----
    C("values-trailing-clause", D1,
      "SELECT ?s ?v WHERE { ?s ex:p ?v } VALUES ?s { ex:s2 }",
      List(s"s=${E}s2|v=2")),
    C("bind-then-pattern-joins", D1,
      "SELECT ?v WHERE { BIND(ex:s1 AS ?s) ?s ex:p ?v }",
      List("v=1", "v=3")),
    C("coalesce-all-unbound", D3,
      "SELECT ?w WHERE { ?s ex:type ex:T FILTER(?s = ex:b) " +
        "OPTIONAL { ?s ex:p ?v } BIND(COALESCE(?v) AS ?w) }",
      List("w=UNDEF")),
    // ---- solution modifiers ----
    C("order-by-expression", D1,
      "SELECT ?v WHERE { ?s ex:p ?v } ORDER BY DESC(?v * -1) LIMIT 2",
      List("v=1", "v=2")),
    C("offset-past-end", D1,
      "SELECT ?v WHERE { ?s ex:p ?v } ORDER BY ?v OFFSET 9 LIMIT 2",
      Nil),
    C("select-reduced", D1,
      "SELECT REDUCED ?s WHERE { ?s ex:q ?v }",
      List(s"s=${E}s1", s"s=${E}s2")),
    // ---- subquery composition ----
    C("subquery-aggregate-join", D1,
      "SELECT ?s WHERE { " +
        "{ SELECT (MAX(?v) AS ?mx) WHERE { ?x ex:p ?v } } " +
        "?s ex:p ?mx }",
      List(s"s=${E}s1")),
    C("subquery-limit-scoped", D1,
      "SELECT ?s ?v WHERE { " +
        "{ SELECT ?s WHERE { ?s ex:q ?w } ORDER BY ?w LIMIT 1 } " +
        "?s ex:p ?v }",
      List(s"s=${E}s2|v=2")))

  // ---- round-14 battery #3: syntax-surface conformance (§19 grammar
  //      forms that all mean the same thing) ----
  private val cases3: Seq[C] = Seq(
    C("syntax-comment-lines", D1,
      "SELECT ?v # trailing comment\n" +
        "WHERE { # another\n ?s ex:q ?v } ORDER BY ?v",
      List("v=4", "v=5")),
    C("syntax-single-quoted-string", D2,
      "SELECT ?s WHERE { ?s ex:str ?x FILTER(?x = 'foobar') }",
      List(s"s=${E}s1")),
    C("syntax-long-string-with-quote", D2,
      "SELECT (STRLEN(\"\"\"say \"hi\" twice\"\"\") AS ?n) " +
        "WHERE { ex:s3 ex:num ?v }",
      List("n=14")),
    C("syntax-long-single-quoted", D2,
      "SELECT ?s WHERE { ?s ex:str ?x FILTER(?x = '''foobar''') }",
      List(s"s=${E}s1")),
    C("syntax-escapes-tab-unicode", D2,
      "SELECT (STRLEN(\"a\\tb\") AS ?n) (\"\\u0041\" AS ?u) " +
        "WHERE { ex:s3 ex:num ?v }",
      List("n=3|u=A")),
    C("syntax-comma-object-list", D1,
      // `?s ex:p 1 , 3` ⇔ two patterns sharing subject AND predicate
      "SELECT ?s WHERE { ?s ex:p 1 , 3 }",
      List(s"s=${E}s1")),
    C("syntax-semicolon-pred-obj-list", D1,
      "SELECT ?s ?v ?w WHERE { ?s ex:p ?v ; ex:q ?w FILTER(?v = 1) }",
      List(s"s=${E}s1|v=1|w=5")),
    C("syntax-a-rdf-type", "ex:a a ex:T . ex:a ex:p 1 .",
      "SELECT ?s WHERE { ?s a ex:T }",
      List(s"s=${E}a")),
    C("syntax-lowercase-keywords", D1,
      "select ?v where { ?s ex:p ?v } order by desc(?v) limit 1",
      List("v=3")),
    C("syntax-anon-bnode-object", D4,
      "SELECT ?s WHERE { ?s ex:knows [ ex:name \"X\" ] }",
      List(s"s=${E}a")))

  test("W3C SPARQL 1.1 sample #3: syntax-surface forms normalize to " +
      "the same answers") {
    val failures = cases3.flatMap { c =>
      val got =
        try bag(SparqlParser.execute(quads(c.data), Prologue + c.query))
        catch { case e: Throwable => List(s"<threw: ${e.getMessage}>") }
      if (got == c.expected) None
      else Some(s"${c.name}:\n  expected ${c.expected}\n  got      $got")
    }
    info(s"W3C sample #3: ${cases3.size - failures.size}/${cases3.size} pass")
    assert(failures.isEmpty,
      s"\n${failures.size}/${cases3.size} diverge:\n" +
        failures.mkString("\n"))
  }

  test("W3C SPARQL 1.1 sample #2: semantics-drift probes match the " +
      "spec answers") {
    val failures = cases2.flatMap { c =>
      val got =
        try bag(SparqlParser.execute(quads(c.data), Prologue + c.query))
        catch { case e: Throwable => List(s"<threw: ${e.getMessage}>") }
      if (got == c.expected) None
      else Some(s"${c.name}:\n  expected ${c.expected}\n  got      $got")
    }
    info(s"W3C sample #2: ${cases2.size - failures.size}/${cases2.size} pass")
    assert(failures.isEmpty,
      s"\n${failures.size}/${cases2.size} diverge:\n" +
        failures.mkString("\n"))
  }

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
