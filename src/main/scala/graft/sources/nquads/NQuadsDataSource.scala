package graft.sources.nquads

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapred.{FileSplit, LineRecordReader}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.TermKind
import graft.plans.NtUnescape
import graft.rdf.QuadParser

/** DataSource V2 N-Quads/N-Triples reader — `spark.read.format("nquads")
  * .load(dir)` — the connector-tier twin of [[graft.rdf.QuadParser]]
  * (which parses a text scan with column expressions). The reference
  * loads RDF files into graphs at startup (`cam/etl/__init__.py:55-62`);
  * this makes that load a first-class Spark source with the three
  * connector behaviors a 100 TB scan needs and the expression tier
  * cannot provide:
  *
  *  - '''split planning''': files split at `spark.sql.files
  *    .maxPartitionBytes` boundaries (compressed files stay whole);
  *    N-Quads is line-delimited, so the Hadoop line reader's
  *    skip-first-partial-line / read-past-split-end contract makes every
  *    split boundary a record boundary — 1000 executors share one big
  *    file with zero coordination.
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): equality
  *    predicates on `graph` / `predicate` / `subject` reach the reader,
  *    which drops non-candidate lines with a cheap substring probe
  *    BEFORE the statement regex and re-checks exactly after the parse.
  *    A one-graph query over a multi-graph dump then never pays the
  *    full parse for foreign-graph lines. (The filters are also kept as
  *    Spark-side residuals — double evaluation is free, missed rows are
  *    not.)
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): a
  *    projection of two term columns materializes two, not eight.
  *
  * Parse semantics are IDENTICAL to [[QuadParser.parse]] — same line
  * grammar ([[QuadParser.LineRegex]]), same term classification, same
  * escape decoding ([[NtUnescape.compute]]), same drop-malformed
  * tolerance — asserted equal on real dumps by NQuadsSourceSpec.
  */
class NQuadsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nquads"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NQuadsTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new NQuadsTable(properties.get("path"))
}

object NQuadsTable {
  /** Full-fidelity quad shape, = [[QuadParser.parse]] output. */
  val Schema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("subjectKind", StringType, nullable = false),
    StructField("predicate", StringType, nullable = false),
    StructField("objectValue", StringType, nullable = false),
    StructField("objectKind", StringType, nullable = false),
    StructField("datatype", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("graph", StringType, nullable = true)))
}

class NQuadsTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "nquads source requires a path")
  override def name(): String = s"nquads:$path"
  override def schema(): StructType = NQuadsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NQuadsScanBuilder(path)
}

class NQuadsScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = NQuadsTable.Schema

  /** Accept equality on the three prefilterable term columns; everything
    * stays a Spark-side residual (return the full array) so the scan can
    * prefilter aggressively without owning final predicate semantics. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ EqualTo(a, v: String)
          if Seq("graph", "predicate", "subject").contains(a) => f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new NQuadsScan(path, required,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })
}

class NQuadsScan(path: String, required: StructType,
    eqFilters: Array[(String, String)]) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"nquads $path, pushed=${eqFilters.mkString(",")}"

  private val CompressedSuffixes =
    Seq(".gz", ".bz2", ".zst", ".snappy", ".lz4", ".deflate")

  private def listFiles(): Seq[FileStatus] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }.filter(st => st.isFile && st.getLen > 0 &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val maxBytes = SQLConf.get.filesMaxPartitionBytes
    val parts = ArrayBuffer.empty[InputPartition]
    listFiles().foreach { st =>
      val name = st.getPath.toString
      if (CompressedSuffixes.exists(name.endsWith)) {
        parts += NQuadsPartition(name, 0L, st.getLen)
      } else {
        var off = 0L
        while (off < st.getLen) {
          val len = math.min(maxBytes, st.getLen - off)
          parts += NQuadsPartition(name, off, len)
          off += len
        }
      }
    }
    parts.toArray
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = listFiles().map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NQuadsReaderFactory(required.fieldNames, eqFilters)
}

case class NQuadsPartition(file: String, start: Long, length: Long)
    extends InputPartition

class NQuadsReaderFactory(columns: Array[String],
    eqFilters: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NQuadsPartitionReader(p.asInstanceOf[NQuadsPartition], columns,
      eqFilters)
}

/** Per-split reader: Hadoop line reader (split-boundary safe) → substring
  * prefilter from the pushed equalities → one compiled-regex statement
  * parse → exact filter re-check → pruned `InternalRow`. */
class NQuadsPartitionReader(part: NQuadsPartition, columns: Array[String],
    eqFilters: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val reader = new LineRecordReader(new Configuration(),
    new FileSplit(new Path(part.file), part.start, part.length,
      Array.empty[String]))
  private val key = new LongWritable()
  private val value = new Text()
  private val line = Pattern.compile(QuadParser.LineRegex)

  /** A line whose parsed field can equal `v` must contain the rendered
    * term — `<v>` (IRI) or `_:v` (bnode; predicates are always IRIs).
    * Pure candidate test: false ⇒ the line cannot match, true ⇒ parse
    * and re-check exactly. */
  private val prefilters: Array[String => Boolean] = eqFilters.map {
    case ("predicate", v) =>
      val iri = s"<$v>"
      (s: String) => s.contains(iri)
    case (_, v) =>
      val iri = s"<$v>"
      val bn = s"_:$v"
      (s: String) => s.contains(iri) || s.contains(bn)
  }

  // field index in the full 8-column quad shape → output position
  private val fieldIdx: Array[Int] =
    columns.map(c => NQuadsTable.Schema.fieldNames.indexOf(c))

  private var current: InternalRow = _

  private def term(t: String): (String, String) =
    if (t.startsWith("_:")) (t.substring(2), TermKind.BNode)
    else (t.substring(1, t.length - 1), TermKind.Iri)

  private val LitBody = Pattern.compile("^\"((?:[^\"\\\\]|\\\\.)*)\"")
  private val LitDt = Pattern.compile("\"\\^\\^<([^>]*)>$")
  private val LitLang =
    Pattern.compile("\"@([A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)$")

  /** Parse one candidate line to the full 8-field quad, null if the line
    * is not a statement. Mirrors [[QuadParser.parse]] exactly. */
  private def parseLine(s: String): Array[String] = {
    val m = line.matcher(s)
    if (!m.matches()) return null
    val (subj, subjKind) = term(m.group(1))
    val pred = m.group(2)
    val oTerm = m.group(3)
    val (obj, objKind, dt, lang) =
      if (oTerm.startsWith("<") || oTerm.startsWith("_:")) {
        val (v, k) = term(oTerm)
        (v, k, null, null)
      } else {
        val bm = LitBody.matcher(oTerm)
        bm.find()
        val body = NtUnescape.compute(
          UTF8String.fromString(bm.group(1))).toString
        val dm = LitDt.matcher(oTerm)
        val lm = LitLang.matcher(oTerm)
        (body, TermKind.Literal,
          if (dm.find()) dm.group(1) else null,
          if (lm.find()) lm.group(1) else null)
      }
    val graph =
      if (m.group(4) == null) null
      else term(m.group(4))._1
    Array(subj, subjKind, pred, obj, objKind, dt, lang, graph)
  }

  private val exactFilters: Array[(Int, String)] = eqFilters.map {
    case (a, v) => (NQuadsTable.Schema.fieldNames.indexOf(a), v)
  }

  private def passesExact(q: Array[String]): Boolean =
    exactFilters.forall { case (idx, v) => q(idx) != null && q(idx) == v }

  override def next(): Boolean = {
    while (reader.next(key, value)) {
      val s = value.toString
      if (prefilters.forall(_(s))) {
        val q = parseLine(s)
        if (q != null && passesExact(q)) {
          val out = new Array[Any](fieldIdx.length)
          var i = 0
          while (i < fieldIdx.length) {
            val v = q(fieldIdx(i))
            out(i) = if (v == null) null else UTF8String.fromString(v)
            i += 1
          }
          current = new GenericInternalRow(out)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
