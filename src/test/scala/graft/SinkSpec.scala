package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.IndexSink

/** S11 search-index sink + S8 N-Quads file sink on sf0.001. */
class SinkSpec extends AnyFunSuite with SparkTestBase {

  test("IndexSink streams every row in bounded batches") {
    IndexSink.CollectingClient.reset()
    val docs = Tables.documents(spark, sf)
      .select(concat_ws("|", col("doc_id"), col("lang")).as("doc"))
    IndexSink.write(docs, IndexSink.CollectingClient, chunkSize = 7)
    val got = IndexSink.CollectingClient.all
    val want = docs.collect().map(_.getString(0)).toSeq
    assert(got.sorted == want.sorted)
    val it = IndexSink.CollectingClient.batches.iterator()
    while (it.hasNext) assert(it.next().size <= 7)
  }

  test("writeNQuads produces loadable N-Quads text files") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_io/nq_test"
    val quads = SparkEntry.entry(spark)
    graft.rdf.QuadEmitter.writeNQuads(quads, out)
    val back = spark.read.text(out)
    assert(back.count() == quads.count())
    assert(back.filter(!col("value").endsWith(" .")).count() == 0)
  }
}
