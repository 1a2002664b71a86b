package graft.model

import org.apache.spark.sql.types._

/** The output record of the RDF side of the engine (SURVEY §1.2):
  * one quad `(subject, predicate, object, graph)` with enough term
  * metadata to render N-Quads losslessly.
  *
  * The reference emits these imperatively into per-worker Oxigraph stores
  * (`etl_lalf_address.py:263`, `cam/etl/__init__.py:12-16`); here the quad
  * set is a columnar `Dataset[Quad]` partitioned by `graph` — Parquet
  * internally, N-Quads text only at the edge.
  *
  * @param objectKind one of [[TermKind]] — IRI, literal, or blank node
  * @param datatype   datatype IRI for typed literals (null otherwise);
  *                   custom datatypes per `cam/etl/namespaces.py:5-17`
  * @param lang       language tag ("en"/"aus" in the reference,
  *                   `etl_pndb.py:240,:314`), null if none
  */
final case class Quad(
    subject: String,
    predicate: String,
    objectValue: String,
    objectKind: String,
    datatype: String,
    lang: String,
    graph: String)

object TermKind {
  val Iri = "iri"
  val Literal = "literal"
  val BNode = "bnode"
}

/** Named graphs of the reference output (SURVEY §1.2). */
object Graphs {
  val Addresses = "urn:qali:graph:addresses"        // etl_lalf_address.py:54
  val Roads = "urn:qali:graph:roads"                // etl_qrt.py:30
  val GeoNames = "urn:qali:graph:geographical-names" // etl_pndb.py:36
  val Vocabs = "urn:qali:graph:vocabs"              // Taskfile.yml:50
}

object Quad {
  val schema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("predicate", StringType, nullable = false),
    StructField("objectValue", StringType, nullable = false),
    StructField("objectKind", StringType, nullable = false),
    StructField("datatype", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("graph", StringType, nullable = false)))
}
