package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.{NodeShape, PropertyShape, ShaclLoader}

/** Shapes-as-data loader (VERDICT r9 next-#2): Turtle shapes document →
  * the NodeShape model ShapeValidator runs. */
class ShaclLoaderSpec extends AnyFunSuite {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  test("compiles the reference's own shacl.ttl when present") {
    val f = new File("/root/reference/shacl.ttl")
    assume(f.isFile, "reference checkout not present")
    val doc = new String(Files.readAllBytes(Paths.get(f.getPath)), "UTF-8")
    // shacl.ttl uses xsd: without declaring it — seed the well-known ns
    val shapes = ShaclLoader.fromTurtle(doc, Map("xsd" -> Xsd))
    assert(shapes == Seq(NodeShape(
      "urn:shape:Address",
      "https://w3id.org/profile/anz-address/Address",
      Seq(PropertyShape(
        path = "http://www.w3.org/2000/01/rdf-schema#label",
        minCount = 1,
        maxCount = Some(1),
        datatype = Some(Xsd + "string"))))))
  }

  test("languageIn collections and nodeKind compile") {
    val shapes = ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX ex: <urn:ex:>
        |<urn:shape:X> a sh:NodeShape ;
        |  sh:targetClass ex:T ;
        |  sh:property [ sh:path ex:p ; sh:languageIn ( "en" "fr" ) ;
        |                sh:nodeKind sh:Literal ] .""".stripMargin)
    val p = shapes.head.properties.head
    assert(p.languageIn == Seq("en", "fr"))
    assert(p.nodeKind.contains("literal"))
    assert(p.minCount == 0 && p.maxCount.isEmpty)
  }

  test("unsupported constraint fails loud, naming the predicate") {
    val e = intercept[IllegalArgumentException](ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX ex: <urn:ex:>
        |<urn:shape:X> a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:property [ sh:path ex:p ; sh:pattern "^Q" ] .""".stripMargin))
    assert(e.getMessage.contains("sh") &&
      e.getMessage.contains("pattern"))
  }

  test("multiple node shapes compile independently") {
    val shapes = ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX ex: <urn:ex:>
        |<urn:shape:A> a sh:NodeShape ; sh:targetClass ex:A ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ] ;
        |  sh:property [ sh:path ex:q ; sh:maxCount 2 ] .
        |<urn:shape:B> a sh:NodeShape ; sh:targetClass ex:B .""".stripMargin)
    assert(shapes.map(_.id).sorted ==
      Seq("urn:shape:A", "urn:shape:B"))
    val a = shapes.find(_.id == "urn:shape:A").get
    assert(a.properties.map(_.path).sorted == Seq("urn:ex:p", "urn:ex:q"))
    assert(a.properties.find(_.path == "urn:ex:q").get.maxCount ==
      Some(2))
    assert(shapes.find(_.id == "urn:shape:B").get.properties.isEmpty)
  }

  test("duplicate single-valued constraint fails loud") {
    val e = intercept[IllegalArgumentException](ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX ex: <urn:ex:>
        |<urn:shape:X> a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ; sh:minCount 2 ]
        |.""".stripMargin))
    assert(e.getMessage.contains("expected at most one"))
  }

  test("missing targetClass / no NodeShape / bad counts fail loud") {
    val e1 = intercept[IllegalArgumentException](ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |<urn:shape:X> a sh:NodeShape .""".stripMargin))
    assert(e1.getMessage.contains("targetClass"))
    val e2 = intercept[IllegalArgumentException](
      ShaclLoader.fromTurtle("PREFIX ex: <urn:ex:>\nex:a ex:p ex:o ."))
    assert(e2.getMessage.contains("no sh:NodeShape"))
    val e3 = intercept[IllegalArgumentException](ShaclLoader.fromTurtle(
      """PREFIX sh: <http://www.w3.org/ns/shacl#>
        |PREFIX ex: <urn:ex:>
        |<urn:shape:X> a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:property [ sh:path ex:p ; sh:minCount "one" ] .""".stripMargin))
    assert(e3.getMessage.contains("integer"))
  }
}
