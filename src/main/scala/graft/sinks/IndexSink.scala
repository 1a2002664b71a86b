package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}

/** S11 — search-index sink: chunked `add_documents` into an external
  * index (`meili/index_addr.py:137-149`, chunk size 10 000;
  * `meili/main.py:100-106`).
  *
  * The Spark shape is `foreachPartition`: one client per partition, rows
  * pushed in bounded batches so a 100 TB indexing run streams without
  * materializing a partition in memory. The transport here is an
  * in-process collector (no search service in this container); swapping
  * `IndexClient` for a real HTTP client changes nothing upstream.
  */
object IndexSink {

  /** Stand-in for the index's bulk-ingest client. */
  trait IndexClient extends Serializable {
    def addDocuments(batch: Seq[String]): Unit
  }

  /** Test collector client: records every batch it receives. */
  object CollectingClient extends IndexClient {
    val batches = new ConcurrentLinkedQueue[Seq[String]]()
    def addDocuments(batch: Seq[String]): Unit = batches.add(batch)
    def reset(): Unit = batches.clear()
    def all: Seq[String] = {
      val it = batches.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b ++= it.next()
      b.result()
    }
  }

  /** Stream `df`'s single string column into the index in chunks. */
  def write(df: DataFrame, client: IndexClient, chunkSize: Int): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      rows.map(_.getString(0)).grouped(chunkSize)
        .foreach(g => client.addDocuments(g))
    }
}
