package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Graphs, TermKind}
import graft.rdf.{Emit, QuadEmitter}

class QuadEmitterSpec extends AnyFunSuite with SparkTestBase {

  test("explodeQuads emits gated quads and drops blanks") {
    import spark.implicits._
    val df = Seq(
      ("a1", "Main St", "BRISBANE", ""),
      ("a2", "High St", null, "4000")).toDF("id", "road", "locality", "postcode")
    val quads = QuadEmitter.explodeQuads(
      df, concat(lit("urn:addr:"), col("id")), Graphs.Addresses,
      Seq(
        Emit.literal("urn:p:road", col("road")),
        Emit.literal("urn:p:locality", col("locality")),
        Emit.literal("urn:p:postcode", col("postcode"))))
    val rows = quads.collect()
    // a1: road+locality (postcode blank); a2: road+postcode (locality null)
    assert(rows.length === 4)
    assert(rows.forall(_.getString(6) === Graphs.Addresses))
    val a1 = rows.filter(_.getString(0) == "urn:addr:a1").map(_.getString(1)).toSet
    assert(a1 === Set("urn:p:road", "urn:p:locality"))
  }

  test("renderNQuads escapes and renders term kinds") {
    import spark.implicits._
    val quads = Seq(
      ("urn:s", "urn:p", "say \"hi\"\n", TermKind.Literal, null, "en", "urn:g"),
      ("urn:s", "urn:p2", "urn:o", TermKind.Iri, null, null, "urn:g"),
      ("urn:s", "urn:p3", "b0-country", TermKind.BNode, null, null, "urn:g"),
      ("urn:s", "urn:p4", "42", TermKind.Literal,
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g"))
      .toDF("subject", "predicate", "objectValue", "objectKind",
        "datatype", "lang", "graph")
    val lines = QuadEmitter.renderNQuads(quads).as[String].collect().toSet
    assert(lines.contains("""<urn:s> <urn:p> "say \"hi\"\n"@en <urn:g> ."""))
    assert(lines.contains("""<urn:s> <urn:p2> <urn:o> <urn:g> ."""))
    assert(lines.contains("""<urn:s> <urn:p3> _:b0-country <urn:g> ."""))
    assert(lines.contains(
      """<urn:s> <urn:p4> "42"^^<http://www.w3.org/2001/XMLSchema#integer> <urn:g> ."""))
  }

  test("Turtle render → parse round-trips the quad set") {
    import spark.implicits._
    val quads = Seq(
      ("https://example.org/thing/1", "iri",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "https://schema.org/Place", "iri", null, null, "urn:g"),
      ("https://example.org/thing/1", "iri", "https://schema.org/name",
        "say \"hi\"\tok\n", "literal", null, "en", "urn:g"),
      ("https://example.org/thing/1", "iri", "https://schema.org/value",
        "42.50", "literal",
        "http://www.w3.org/2001/XMLSchema#decimal", null, "urn:g"),
      ("https://example.org/thing/1", "iri", "https://schema.org/hasPart",
        "1-part", "bnode", null, null, "urn:g"),
      ("1-part", "bnode", "https://schema.org/value",
        "deep value", "literal", null, "aus", "urn:g"),
      ("1-part", "bnode", "https://schema.org/additionalType",
        "https://example.org/def/part/kind", "iri", null, null, "urn:g"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_io/" +
      s"${spark.sparkContext.applicationId}/ttl_roundtrip"
    graft.rdf.QuadEmitter.writeTurtle(quads, out)
    // the ENGINE Turtle source (rdf.TurtleParser): wholetext scan +
    // per-document parse; graph is null by contract — drop for compare
    val parsed = graft.rdf.TurtleParser.readTurtle(spark, out)
      .collect().map { r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5), r.getString(6))
      }.toSet
    val want = quads.collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6))
    }.toSet
    assert(parsed == want)
    // the doc is genuinely pretty-printed: grouped blocks, compacted names
    val lines = spark.read.text(out).as[String].collect().toSeq
    assert(lines.exists(_.contains("a sdo:Place ;")) ||
      lines.exists(_.contains("a sdo:Place .")))
    assert(lines.exists(_.contains("^^xsd:decimal")))
    // malformed documents fail loud, with the offending line in the error
    val bad = intercept[Exception] {
      graft.rdf.TurtleParser.parseLines(
        Iterator("<urn:s> unknownpfx:name \"v\" .")).toList
    }
    assert(bad.getMessage.contains("unknownpfx"))
  }

  test("describe returns the entity closure including bnode part groups") {
    import spark.implicits._
    val quads = Seq(
      ("urn:e:1", "iri", "urn:p:name", "one", "literal", null, null, "urn:g"),
      ("urn:e:1", "iri", "urn:p:part", "b1", "bnode", null, null, "urn:g"),
      ("b1", "bnode", "urn:p:value", "v1", "literal", null, null, "urn:g"),
      ("urn:e:2", "iri", "urn:p:name", "two", "literal", null, null, "urn:g"),
      ("urn:e:2", "iri", "urn:p:part", "b2", "bnode", null, null, "urn:g"),
      ("b2", "bnode", "urn:p:value", "v2", "literal", null, null, "urn:g"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val got = graft.rdf.QuadEmitter.describe(quads, "urn:e:1")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("urn:e:1", "urn:p:name", "one"),
      ("urn:e:1", "urn:p:part", "b1"),
      ("b1", "urn:p:value", "v1")))
  }

  test("QuadParser: parse ∘ render = identity on escape-hostile quads") {
    import spark.implicits._
    // Every path through the escaper/unescaper: a literal backslash
    // FOLLOWED BY an n (the case a regexp_replace chain gets wrong), real
    // newline/tab/CR, quotes, astral unicode, lang tags, datatypes, bnode
    // subject AND object, both term kinds in the graph position.
    val quads = Seq(
      ("urn:s1", "iri", "urn:p", "back\\nslash", "literal", null, null, "urn:g"),
      ("urn:s1", "iri", "urn:p2", "line\nbreak\ttab\rcr", "literal", null,
        "en-AU", "urn:g"),
      ("urn:s1", "iri", "urn:p3", "say \"hi\" \\\" tricky", "literal", null,
        null, "urn:g"),
      ("urn:s1", "iri", "urn:p4", "astral 😀 char", "literal",
        "http://www.w3.org/2001/XMLSchema#string", null, "urn:g2"),
      ("urn:s1", "iri", "urn:p5", "urn:o", "iri", null, null, "urn:g"),
      ("urn:s1", "iri", "urn:p6", "b7-part", "bnode", null, null, "urn:g"),
      ("b7-part", "bnode", "urn:p7", "", "literal", null, null, "urn:g"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val lines = graft.rdf.QuadEmitter.renderNQuads(quads)
    val back = graft.rdf.QuadParser.parse(lines)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
        .collect().map(_.toString).sorted.toSeq
    assert(key(back) == key(quads))
    assert(graft.rdf.QuadParser.rejects(lines).count() == 0)
  }

  test("QuadParser: triples get a null graph; comments and blanks skip; rejects surface") {
    import spark.implicits._
    val lines = Seq(
      "# a comment line",
      "",
      "   ",
      "<urn:s> <urn:p> \"v\"@en .",                  // triple: no graph term
      "<urn:s> <urn:p> <urn:o> <urn:g> . # trailing comment",
      "_:b1 <urn:p> _:b2 .",
      "<urn:s> <urn:p> unquoted-garbage .",          // malformed object
      "not a statement at all").toDF("value")
    val got = graft.rdf.QuadParser.parse(lines).collect()
    assert(got.length == 3)
    val byPred = got.map(r => (r.getString(0), r.getString(3),
      r.getString(6), r.getString(7)))
    assert(byPred.contains(("urn:s", "v", "en", null)))         // null graph
    assert(byPred.contains(("urn:s", "urn:o", null, "urn:g")))  // comment eaten
    assert(byPred.contains(("b1", "b2", null, null)))           // bnodes
    val bad = graft.rdf.QuadParser.rejects(lines).as[String].collect().toSet
    assert(bad == Set("<urn:s> <urn:p> unquoted-garbage .",
      "not a statement at all"))
  }

  test("QuadParser property: parse ∘ render = identity on random literal content") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // adversarial alphabet: escapables, astral plane, spaces, quad syntax
    val alphabet = Gen.oneOf('\\', '"', '\n', '\r', '\t', ' ', '<', '>',
      '.', '@', '^', '_', ':', '#', 'a', 'Z', '0', 'é', '\uD83D')
    // NB: lone surrogates are not valid UTF-8 — pair \uD83D with a low
    // surrogate so the string survives the UTF8String round trip
    val litGen = Gen.listOfN(12, alphabet).map(cs =>
      new String(cs.toArray).replace("\uD83D", "😀"))
    val params = Gen.Parameters.default
    val lits = (1 to 200).flatMap(i =>
      litGen(params, Seed(i.toLong))) // deterministic: reproducible failures
    val quads = lits.zipWithIndex.map { case (v, i) =>
      (s"urn:s$i", "iri", "urn:p", v, "literal",
        if (i % 3 == 0) "http://www.w3.org/2001/XMLSchema#string" else null,
        if (i % 3 == 1) "en" else null, "urn:g")
    }.toDF("subject", "subjectKind", "predicate", "objectValue",
      "objectKind", "datatype", "lang", "graph")
    val lines = graft.rdf.QuadEmitter.renderNQuads(quads)
    assert(graft.rdf.QuadParser.rejects(lines).count() == 0,
      "renderer emitted a line the parser grammar rejects")
    val back = graft.rdf.QuadParser.parse(lines)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("subject", "objectValue", "datatype", "lang")
        .collect().map(_.toString).sorted.toSeq
    assert(key(back) == key(quads))
  }

  test("NtUnescape: single-pass semantics a replace chain cannot have") {
    import graft.plans.NtUnescape
    import org.apache.spark.unsafe.types.UTF8String
    def un(s: String) = NtUnescape.compute(UTF8String.fromString(s)).toString
    // NB: built by concatenation — the Scala lexer itself interprets
    // backslash-u sequences inside string literals, even triple-quoted.
    val bs = "\\"
    assert(un(s"a${bs}${bs}nb") == s"a${bs}nb") // escaped backslash THEN n
    assert(un(s"a${bs}nb") == "a\nb")           // real escape
    assert(un(s"a${bs}u0041b") == "aAb")        // UCHAR 4-hex
    assert(un(s"${bs}U0001F600") == "😀")       // UCHAR 8-hex, astral
    assert(un(s"bad${bs}uZZZZesc") == s"bad${bs}uZZZZesc") // non-hex: verbatim
    assert(un(s"trail$bs") == s"trail$bs")      // trailing backslash: verbatim
    assert(un("plain") == "plain")              // no-op fast path
  }

  test("PropertyPath.closure: min dist on a diamond, terminates on a cycle") {
    import spark.implicits._
    import graft.rdf.PropertyPath
    // diamond a→b→d, a→c→d, plus shortcut a→d: dist(a,d) must be 1
    val diamond = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("a", "d")).toDF("src", "dst")
    val cl = PropertyPath.closure(diamond).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(cl(("a", "d")) == 1)
    assert(cl(("b", "d")) == 1 && cl(("a", "b")) == 1)
    assert(cl.size == 5) // exactly the connected pairs, no dup rows
    // 3-cycle: closure is all 9 ordered pairs (incl. self at dist 3)
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val ccl = PropertyPath.closure(cyc).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(ccl.size == 9)
    assert(ccl(("x", "x")) == 3 && ccl(("x", "z")) == 2)
  }

  test("Inference.entail applies rdfs7 then rdfs9 through the closure") {
    import spark.implicits._
    import graft.rdf.Inference
    val triples = Seq(
      ("doc1", "urn:p:kind", "urn:c:Report"),
      ("doc2", Inference.RdfType, "urn:c:Memo")).toDF(
      "subject", "predicate", "objectValue")
    val subProp = Inference.hierarchyClosure(
      Seq(("urn:p:kind", Inference.RdfType)).toDF("sub", "sup"))
    val subClass = Inference.hierarchyClosure(Seq(
      ("urn:c:Report", "urn:c:Document"),
      ("urn:c:Memo", "urn:c:Document"),
      ("urn:c:Document", "urn:c:Thing")).toDF("sub", "sup"))
    val got = Inference.entail(triples, subProp, subClass).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // doc1: kind edge lifted to rdf:type, then up the 2-level chain
    assert(got.contains(("doc1", Inference.RdfType, "urn:c:Report")))
    assert(got.contains(("doc1", Inference.RdfType, "urn:c:Document")))
    assert(got.contains(("doc1", Inference.RdfType, "urn:c:Thing")))
    assert(got.contains(("doc2", Inference.RdfType, "urn:c:Thing")))
    // original assertion kept, set semantics (no duplicate rows)
    assert(got.contains(("doc1", "urn:p:kind", "urn:c:Report")))
    assert(got.size == 7)
  }

  test("Bgp.construct instantiates templates with set semantics") {
    import spark.implicits._
    import graft.rdf.Bgp
    import graft.rdf.Bgp.{Const, Pattern, Template, Var}
    val quads = Seq(
      ("a1", "urn:p:has", "b1"), ("b1", "urn:p:val", "north"),
      ("a2", "urn:p:has", "b2"), ("b2", "urn:p:val", "north"))
      .toDF("subject", "predicate", "objectValue")
    val out = Bgp.construct(quads,
      Seq(Pattern(Var("a"), "urn:p:has", Var("b")),
        Pattern(Var("b"), "urn:p:val", Var("v"))),
      Seq(Template(Var("a"), "urn:p:flat", Var("v"),
          graft.model.TermKind.Literal),
        Template(Const("urn:meta"), "urn:p:seen", Var("v"))))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    // the shared-object template dedups: ONE (urn:meta, seen, north)
    assert(rows == Set(
      ("a1", "urn:p:flat", "north"), ("a2", "urn:p:flat", "north"),
      ("urn:meta", "urn:p:seen", "north")))
    assert(out.count() == 3)
  }

  test("Bgp.selectMinus removes compatible solutions, no-ops disjoint") {
    import spark.implicits._
    import graft.rdf.Bgp
    import graft.rdf.Bgp.{Const, Pattern, Var}
    val quads = Seq(
      ("a1", "urn:p:name", "n1"), ("a2", "urn:p:name", "n2"),
      ("a3", "urn:p:name", "n3"),
      ("a1", "urn:p:flag", "x"), ("a3", "urn:p:flag", "y"),
      ("a3", "urn:p:keep", "z"))
      .toDF("subject", "predicate", "objectValue")
    // remove solutions whose ?a also has a flag — unless it ALSO has the
    // keep marker pattern in the same group narrowing the negation
    val out = Bgp.selectMinus(quads,
      Seq(Pattern(Var("a"), "urn:p:name", Var("n"))),
      Seq(Seq(Pattern(Var("a"), "urn:p:flag", Var("f")))))
    assert(out.select("a").as[String].collect().toSet == Set("a2"))
    val narrowed = Bgp.selectMinus(quads,
      Seq(Pattern(Var("a"), "urn:p:name", Var("n"))),
      Seq(Seq(Pattern(Var("a"), "urn:p:flag", Var("f")),
        Pattern(Var("a"), "urn:p:keep", Var("k")))))
    assert(narrowed.select("a").as[String].collect().toSet ==
      Set("a1", "a2"))
    // disjoint-domain MINUS removes NOTHING per SPARQL §8.3 (r14: was a
    // loud reject; the W3C sample suite pins the spec no-op, a stderr
    // warning flags the likely authoring bug)
    val disjoint = Bgp.selectMinus(quads,
      Seq(Pattern(Var("a"), "urn:p:name", Var("n"))),
      Seq(Seq(Pattern(Var("other"), "urn:p:flag", Var("f")))))
    assert(disjoint.select("a").as[String].collect().toSet ==
      Set("a1", "a2", "a3"))
  }

  test("Bgp.select join order: star-last query plans no cartesian") {
    import spark.implicits._
    import graft.rdf.Bgp
    import graft.rdf.Bgp.{Pattern, Var, Const}
    val quads = Seq(
      ("a", "urn:name", "Al"), ("b", "urn:name", "Bo"),
      ("a", "urn:knows", "b"), ("b", "urn:knows", "a"),
      ("a", "urn:type", "T"))
      .toDF("subject", "predicate", "objectValue")
    // written order is pathological: patterns 1 and 2 share nothing —
    // a literal left-to-right fold would cross-join them before the
    // connecting third pattern arrives; the selectivity-greedy order
    // must avoid any cartesian/nested-loop join
    val pats = Seq(
      Pattern(Var("x"), "urn:name", Var("nx")),
      Pattern(Var("y"), "urn:type", Const("T")),
      Pattern(Var("x"), "urn:knows", Var("y")))
    val sol = Bgp.select(quads, pats)
    val plan = sol.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"unexpected cartesian in:\n$plan")
    assert(sol.select("x", "nx", "y").collect().map(_.toSeq).toSeq ==
      Seq(Seq("b", "Bo", "a")))
    // disconnected patterns still cross-join (SPARQL semantics)
    assert(Bgp.select(quads, Seq(
      Pattern(Var("x"), "urn:type", Const("T")),
      Pattern(Var("y"), "urn:knows", Const("a")))).count() == 1)
    // var-free marker patterns still gate (empty marker → empty result)
    assert(Bgp.select(quads, Seq(
      Pattern(Var("x"), "urn:name", Var("nx")),
      Pattern(Const("zzz"), "urn:type", Const("T")))).count() == 0)
  }

  test("writeTrig emits a structured named-graph document") {
    import spark.implicits._
    val quads = Seq(
      ("urn:s1", "iri", "https://schema.org/name", "Al", "literal",
        null, null, "urn:g1"),
      ("urn:s1", "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "https://schema.org/Place", "iri", null, null, "urn:g1"),
      ("urn:s2", "iri", "https://schema.org/name", "Bo", "literal",
        null, "en", "urn:g2"),
      ("urn:top", "iri", "https://schema.org/name", "Def", "literal",
        null, null, null))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val dir = java.nio.file.Files
      .createTempDirectory("trig").toString + "/doc"
    graft.rdf.QuadEmitter.writeTrig(quads, dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).toList
    val text = lines.mkString("\n")
    // default-graph block at top level, then graph sections in order
    val gi1 = text.indexOf("<urn:g1> {")
    val gi2 = text.indexOf("<urn:g2> {")
    assert(text.indexOf("<urn:top> sdo:name \"Def\" .") < gi1)
    assert(gi1 >= 0 && gi2 > gi1)
    // block inside braces is indented, `a` keyword and `;` grouping used
    assert(text.contains("  <urn:s1> a sdo:Place ;\n    sdo:name \"Al\" ."))
    assert(text.contains("  <urn:s2> sdo:name \"Bo\"@en ."))
    // braces balance
    assert(lines.count(_ == "}") == 2)
    // headers first
    assert(lines.head.startsWith("@prefix"))
  }

  test("JsonLd renders sorted expanded nodes and a flat document") {
    import spark.implicits._
    val quads = Seq(
      ("urn:s1", "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "urn:T", "iri", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:p", "v\"x", "literal", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:p", "b2", "bnode", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:q", "5", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g1"),
      ("b2", "bnode", "urn:p", "w", "literal", null, "en", "urn:g1"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val nodes = graft.rdf.JsonLd.renderNodes(quads)
      .orderBy(col("value")).collect().map(_.getString(1))
    assert(nodes.length == 2)
    // @type sorts first; literal escaping is JSON-safe; bnode ids _:
    assert(nodes(0) ==
      """{"@id":"_:b2","urn:p":[{"@value":"w","@language":"en"}]}""")
    assert(nodes(1) ==
      """{"@id":"urn:s1","@type":["urn:T"],""" +
        """"urn:p":[{"@id":"_:b2"},{"@value":"v\"x"}],""" +
        """"urn:q":[{"@value":"5",""" +
        """"@type":"http://www.w3.org/2001/XMLSchema#integer"}]}""")
    val doc = graft.rdf.JsonLd.renderDocument(quads)
      .collect()(0).getString(0)
    assert(doc.startsWith("""[{"@id":"urn:g1","@graph":[{"@id":"_:b2""""))
    assert(doc.endsWith("]}]"))
  }

  test("JsonLd.parseNodes inverts renderNodes with full term fidelity") {
    import spark.implicits._
    // the render fixture above plus nothing — every term class at once:
    // @type keyword, bnode subject AND object, escaped quote in a
    // literal, typed literal, language-tagged literal
    val quads = Seq(
      ("urn:s1", "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "urn:T", "iri", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:p", "v\"x", "literal", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:p", "b2", "bnode", null, null, "urn:g1"),
      ("urn:s1", "iri", "urn:q", "5", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g1"),
      ("b2", "bnode", "urn:p", "w", "literal", null, "en", "urn:g1"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val dir = java.nio.file.Files.createTempDirectory("jsonld_rt").toString
    graft.rdf.JsonLd.renderNodes(quads).select(col("value"))
      .write.mode("overwrite").text(dir)
    val back = graft.rdf.JsonLd
      .parseNodes(spark.read.json(dir), lit("urn:g1"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6),
        r.getString(7))).toSet
    val expected = quads.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6),
        r.getString(7))).toSet
    assert(back == expected, s"parsed $back")
  }

  test("SparqlResults: RFC4180 quoting, TSV terms, JSON unbound omitted") {
    import spark.implicits._
    import graft.rdf.SparqlResults
    val sol = Seq(
      ("urn:a", "plain"),
      ("urn:b", "has,comma"),
      ("urn:c", "has\"quote"),
      ("urn:d", null))
      .toDF("s", "v")
    val csv = SparqlResults.csv(sol).orderBy(col("ord"), col("value"))
      .collect().map(_.getString(1)).toList
    assert(csv == List("s,v", "urn:a,plain", "urn:b,\"has,comma\"",
      "urn:c,\"has\"\"quote\"", "urn:d,"))
    val tsv = SparqlResults.tsv(sol, Map("s" -> "uri"))
      .orderBy(col("ord"), col("value"))
      .collect().map(_.getString(1)).toList
    assert(tsv.head == "?s\t?v")
    assert(tsv.contains("<urn:a>\t\"plain\""))
    assert(tsv.contains("<urn:c>\t\"has\\\"quote\""))
    assert(tsv.contains("<urn:d>\t")) // unbound: empty field
    val json = SparqlResults.json(sol, Map("s" -> "uri"))
      .collect()(0).getString(0)
    assert(json.startsWith("{\"head\":{\"vars\":[\"s\",\"v\"]}," +
      "\"results\":{\"bindings\":["))
    // unbound binding omitted entirely from the solution object
    assert(json.contains("{\"s\":{\"type\":\"uri\",\"value\":\"urn:d\"}}"))
    assert(json.contains("\"v\":{\"type\":\"literal\"," +
      "\"value\":\"has\\\"quote\"}"))
  }

  test("flagship entry() produces quads on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("subject", "predicate", "objectValue",
      "objectKind", "datatype", "lang", "graph"))
  }

  test("all declared queries run and all oracle keys exist in queries") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"query $name failed")
    }
  }
}
