package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.TurtleParser

/** Full-grammar Turtle parser coverage (VERDICT r9 next-#1): SPARQL-style
  * PREFIX/BASE, bnode property lists, long literals, collections,
  * numeric/boolean shorthand, object lists — the forms the reference's
  * real vocab corpus uses — plus a parse of that actual corpus when the
  * reference checkout is present. Pure-JVM tests (the parser is a plain
  * function; the Spark integration is covered by QuadEmitterSpec and the
  * q_turtle_* gates). */
class TurtleFullGrammarSpec extends AnyFunSuite {

  private def parse(doc: String,
      seed: Map[String, String] = Map.empty) =
    TurtleParser.parseDocument(doc, seed).toList

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  test("SPARQL-style PREFIX/BASE directives (no @, no trailing dot)") {
    val q = parse(
      """PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        |BASE <https://example.org/vocab/>
        |<road-types> a skos:ConceptScheme .""".stripMargin)
    assert(q == List(graft.rdf.TurtleQuad(
      "https://example.org/vocab/road-types", "iri", Rdf + "type",
      "http://www.w3.org/2004/02/skos/core#ConceptScheme", "iri",
      null, null, null)))
  }

  test("empty prefix and empty local name (`:qld`, `cs:`)") {
    val q = parse(
      """PREFIX : <https://linked.data.gov.au/def/road-types/>
        |PREFIX cs: <https://linked.data.gov.au/def/road-types>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |:qld rdfs:isDefinedBy cs: .""".stripMargin)
    assert(q.head.subject == "https://linked.data.gov.au/def/road-types/qld")
    assert(q.head.objectValue == "https://linked.data.gov.au/def/road-types")
  }

  test("anonymous bnode property list in object position") {
    val q = parse(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |<urn:shape:A> a sh:NodeShape ;
        |    sh:property [
        |        sh:path rdfs:label ;
        |        sh:minCount 1 ;
        |    ] .""".stripMargin)
    val propQuad = q.find(_.predicate == "http://www.w3.org/ns/shacl#property")
      .get
    assert(propQuad.objectKind == "bnode")
    val b = propQuad.objectValue
    assert(q.exists(x => x.subject == b && x.subjectKind == "bnode" &&
      x.predicate == "http://www.w3.org/ns/shacl#minCount" &&
      x.objectValue == "1" && x.datatype == Xsd + "integer"))
  }

  test("bnode property list as subject; nested lists") {
    val q = parse(
      """PREFIX ex: <urn:ex:>
        |[ ex:p ex:o ; ex:q [ ex:r "deep" ] ] ex:top 1 .""".stripMargin)
    assert(q.count(_.predicate == "urn:ex:p") == 1)
    assert(q.exists(x => x.predicate == "urn:ex:r" &&
      x.objectValue == "deep"))
    assert(q.exists(x => x.predicate == "urn:ex:top" &&
      x.subjectKind == "bnode"))
  }

  test("long literals: newlines, embedded quotes, both quote styles") {
    val q = parse(
      "PREFIX ex: <urn:ex:>\n" +
        "ex:a ex:def \"\"\"line one\nline \"two\" ok\"\"\"@en .\n" +
        "ex:b ex:def '''single 'q' style''' .")
    assert(q.head.objectValue == "line one\nline \"two\" ok")
    assert(q.head.lang == "en")
    assert(q(1).objectValue == "single 'q' style")
  }

  test("long literal ending in a quote, and adjacent quote runs") {
    val q = parse("PREFIX ex: <urn:ex:>\nex:a ex:v \"\"\"ends with \"x\"\"\"\" .")
    assert(q.head.objectValue == "ends with \"x\"")
  }

  test("collections compile to rdf:first/rdf:rest chains; empty = rdf:nil") {
    val q = parse("PREFIX ex: <urn:ex:>\nex:a ex:list ( \"A\" \"B\" ) ; ex:none () .")
    val first = q.filter(_.predicate == Rdf + "first")
    assert(first.map(_.objectValue) == List("A", "B"))
    val rests = q.filter(_.predicate == Rdf + "rest")
    assert(rests.map(_.objectValue).last == Rdf + "nil")
    assert(q.exists(x => x.predicate == "urn:ex:none" &&
      x.objectValue == Rdf + "nil" && x.objectKind == "iri"))
    // chain links: list head is a bnode whose rest points at the B cell
    val head = q.find(_.predicate == "urn:ex:list").get
    assert(head.objectKind == "bnode")
    assert(q.exists(x => x.subject == head.objectValue &&
      x.predicate == Rdf + "rest" && x.objectKind == "bnode"))
  }

  test("numeric and boolean shorthand preserve lexical forms") {
    val q = parse(
      "PREFIX ex: <urn:ex:>\nex:a ex:i 42 ; ex:d 1.50 ; ex:e -2.5e3 ; ex:t true ; ex:f false .")
    def one(p: String) = q.find(_.predicate == s"urn:ex:$p").get
    assert(one("i").objectValue == "42" &&
      one("i").datatype == Xsd + "integer")
    assert(one("d").objectValue == "1.50" &&
      one("d").datatype == Xsd + "decimal")
    assert(one("e").objectValue == "-2.5e3" &&
      one("e").datatype == Xsd + "double")
    assert(one("t").objectValue == "true" &&
      one("t").datatype == Xsd + "boolean")
    assert(one("f").objectValue == "false")
  }

  test("object lists with `,` across lines; dangling semicolon") {
    val q = parse(
      """PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        |PREFIX : <urn:rt:>
        |:qld skos:member
        |    :alley ,
        |    :avenue ,
        |    :court ;
        |.""".stripMargin)
    assert(q.map(_.objectValue) ==
      List("urn:rt:alley", "urn:rt:avenue", "urn:rt:court"))
  }

  test("seeded well-known prefixes cover undeclared xsd (shacl.ttl form)") {
    val doc =
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |<urn:shape:X> sh:datatype xsd:string .""".stripMargin
    val err = intercept[IllegalArgumentException](parse(doc))
    assert(err.getMessage.contains("xsd:string"))
    val q = parse(doc, Map("xsd" -> Xsd))
    assert(q.head.objectValue == Xsd + "string")
  }

  test("malformed input fails loud with the offending line") {
    val e1 = intercept[IllegalArgumentException](
      parse("<urn:s> unknownpfx:name \"v\" ."))
    assert(e1.getMessage.contains("unknownpfx"))
    val e2 = intercept[IllegalArgumentException](
      parse("PREFIX ex: <urn:ex:>\nex:a ex:b \"unterminated ."))
    assert(e2.getMessage.contains("unterminated"))
    val e3 = intercept[IllegalArgumentException](
      parse("<road-types> <urn:p> <urn:o> ."))
    assert(e3.getMessage.contains("no BASE"))
  }

  test("TriG graph sections still parse (writeTrig layout + GRAPH kw)") {
    val q = parse(
      """@prefix ex: <urn:ex:> .
        |<urn:g:1> {
        |  ex:a ex:p "in-g1" .
        |}
        |GRAPH <urn:g:2> { ex:b ex:p "in-g2" . }
        |ex:c ex:p "default" .""".stripMargin)
    assert(q.find(_.objectValue == "in-g1").get.graph == "urn:g:1")
    assert(q.find(_.objectValue == "in-g2").get.graph == "urn:g:2")
    assert(q.find(_.objectValue == "default").get.graph == null)
  }

  test("@base directive and mid-document BASE re-binding") {
    val q = parse(
      """@base <https://one.example/dir/> .
        |<x> <urn:p> <y> .
        |BASE <https://two.example/other/>
        |<x> <urn:p> </abs> .""".stripMargin)
    assert(q(0).subject == "https://one.example/dir/x")
    assert(q(0).objectValue == "https://one.example/dir/y")
    assert(q(1).subject == "https://two.example/other/x")
    assert(q(1).objectValue == "https://two.example/abs")
  }

  test("mid-document PREFIX re-binding wins for later statements") {
    val q = parse(
      """PREFIX ex: <urn:one:>
        |ex:a ex:p ex:b .
        |PREFIX ex: <urn:two:>
        |ex:a ex:p ex:b .""".stripMargin)
    assert(q(0).subject == "urn:one:a" && q(1).subject == "urn:two:a")
  }

  test("default-graph TriG block `{ … }` keeps a null graph") {
    val q = parse(
      """@prefix ex: <urn:ex:> .
        |{ ex:a ex:p "v" . }""".stripMargin)
    assert(q.head.graph == null && q.head.objectValue == "v")
  }

  test("property fuzz: render→parse round-trips random unicode literals") {
    // the renderer emits the escaped short-literal subset; the
    // full-grammar parser must invert it for arbitrary content —
    // quotes, backslashes, control chars, CJK/emoji, RTL text
    val rnd = new scala.util.Random(42)
    // CODE POINTS, not chars — naive char sampling would split the
    // emoji's surrogate pair into invalid UTF-16
    val alphabet: Seq[String] =
      ("abc\"\\\n\t\r '«»中文😀" +
        "\u202eمرحباé́")
        .codePoints().toArray.toSeq.map(Character.toString)
    def randomLit(): String =
      (0 until 1 + rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    import org.apache.spark.unsafe.types.UTF8String
    def esc(s: String): String =
      graft.plans.NtEscape.compute(UTF8String.fromString(s)).toString
    (1 to 50).foreach { i =>
      val v = randomLit()
      val doc =
        s"""PREFIX ex: <urn:ex:>
           |ex:s$i ex:p "${esc(v)}" .""".stripMargin
      val got = parse(doc)
      assert(got.length == 1 && got.head.objectValue == v,
        s"round-trip failed for ${v.map(_.toInt)}")
    }
  }

  test("generated bnode labels are document-scoped (ADVICE r10)") {
    // two documents with identical anonymous bnodes must NOT conflate
    // when merged: labels carry a per-document salt
    val doc = """PREFIX sdo: <https://schema.org/>
                |<urn:a> sdo:contactPoint [ sdo:name "x" ] .""".stripMargin
    def labelsOf(d: String, key: String): Set[String] =
      TurtleParser.parseDocument(d, saltKey = key)
        .filter(_.objectKind == "bnode").map(_.objectValue).toSet
    val a = labelsOf(doc, "file:///vocab/a.ttl")
    val b = labelsOf(doc, "file:///vocab/b.ttl")
    assert(a.size == 1 && b.size == 1 && a != b,
      s"labels conflated across documents: $a vs $b")
    // deterministic: a retried task regenerates the same labels
    assert(labelsOf(doc, "file:///vocab/a.ttl") == a)
    // generated labels never collide with an explicit label in the
    // same document (disjoint genid-<salt> space)
    val mixed = parse(
      """PREFIX sdo: <https://schema.org/>
        |_:anon-1 sdo:name "explicit" .
        |<urn:a> sdo:contactPoint [ sdo:name "gen" ] .""".stripMargin)
    val explicitL = mixed.filter(_.subjectKind == "bnode").map(_.subject)
    val genL = mixed.filter(_.objectKind == "bnode").map(_.objectValue)
    assert(explicitL.contains("anon-1"))
    assert(genL.forall(l => l.startsWith("genid-") && l != "anon-1"))
  }

  test("parses the reference's real vocab corpus when present") {
    val dir = new File("/root/reference/vocabs-import")
    assume(dir.isDirectory, "reference corpus not present")
    val seeds = Map("xsd" -> Xsd) // GraphDB-registry namespaces
    val files = dir.listFiles().filter(_.getName.endsWith(".ttl")).sorted
    assert(files.length >= 20)
    var total = 0L
    files.foreach { f =>
      val doc = new String(
        Files.readAllBytes(Paths.get(f.getPath)), "UTF-8")
      val quads = TurtleParser.parseDocument(doc, seeds).toList
      assert(quads.nonEmpty, f.getName)
      // every vocab declares at least one SKOS label or definition
      total += quads.size
    }
    assert(total > 1000)
    // the shapes document and the place-name types vocab too
    Seq("/root/reference/shacl.ttl", "/root/reference/pntypes.ttl")
      .map(new File(_)).filter(_.isFile).foreach { f =>
        val doc = new String(
          Files.readAllBytes(Paths.get(f.getPath)), "UTF-8")
        assert(TurtleParser.parseDocument(doc, seeds).nonEmpty, f.getName)
      }
  }
}
