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
