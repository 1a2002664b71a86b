package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.{HttpVocab, SparqlParser, SparqlServer}

/** The serving loop with CLIENT AND SERVER both this engine (VERDICT
  * r13 next-#3): [[SparqlServer]] wraps `SparqlParser.execute` over a
  * quad relation behind the SPARQL 1.1 Protocol; the existing protocol
  * client ([[HttpVocab.selectRemote]], `SparqlParser.executeRemote`,
  * and the live `SERVICE <http://…>` branch) round-trips against it —
  * the reference's web-UI / autocomplete serving shape
  * (`cam/web/app.py:37-44`, `cam/graphdb.py:5-35`) with no mock on
  * either side of the wire. */
class SparqlServerSpec extends AnyFunSuite with SparkTestBase {

  private def quadDf = {
    import spark.implicits._
    Seq(
      ("urn:a", "iri", "https://schema.org/name", "Alpha", "literal",
        null, "en", "urn:g:1"),
      ("urn:b", "iri", "https://schema.org/name", "Beta", "literal",
        null, null, "urn:g:1"),
      ("urn:a", "iri", "urn:p:score", "3", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g:1"),
      ("urn:c", "iri", "https://schema.org/name", "a \"quoted\" name",
        "literal", null, null, "urn:g:2"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
  }

  test("SparqlServer r14: SELECT over GET, form POST, and direct POST " +
      "all answer the W3C JSON document the engine's own client parses") {
    val h = SparqlServer.serve(quadDf)
    try {
      val q = "SELECT ?s ?n WHERE { ?s <https://schema.org/name> ?n } " +
        "ORDER BY ?s"
      // client = this engine's protocol client (form POST)
      val viaClient = HttpVocab.selectRemote(spark, h.endpoint, q, timeoutMs = 120000)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(viaClient ==
        Seq(("urn:a", "Alpha"), ("urn:b", "Beta"),
          ("urn:c", "a \"quoted\" name")))
      // GET form: same document
      val enc = java.net.URLEncoder.encode(q, "UTF-8")
      val (getBody, getCt) =
        HttpVocab.get(s"${h.endpoint}?query=$enc", timeoutMs = 120000)
      assert(getCt.startsWith("application/sparql-results+json"))
      val viaGet = HttpVocab.parseSparqlJson(spark, getBody)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(viaGet == viaClient)
      // direct application/sparql-query POST
      val conn = new java.net.URL(h.endpoint).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/sparql-query")
      conn.setReadTimeout(120000)
      val os = conn.getOutputStream
      os.write(q.getBytes("UTF-8")); os.close()
      assert(conn.getResponseCode == 200)
      val direct = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      conn.disconnect()
      val viaDirect = HttpVocab.parseSparqlJson(spark, direct)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(viaDirect == viaClient)
    } finally h.stop()
  }

  test("SparqlServer r14: ASK, CONSTRUCT-as-nquads, 400 on missing " +
      "query, 500 on malformed query") {
    val h = SparqlServer.serve(quadDf)
    try {
      // ASK → boolean document → the client's one-row boolean relation
      val ask = HttpVocab.selectRemote(spark, h.endpoint,
        "ASK { ?s <urn:p:score> ?v }", timeoutMs = 120000)
      assert(ask.columns.toSeq == Seq("ask") &&
        ask.collect().head.getBoolean(0))
      // CONSTRUCT: N-Quads text with the right content type
      val q = java.net.URLEncoder.encode(
        "CONSTRUCT { ?s <urn:p:named> ?n } WHERE " +
          "{ ?s <https://schema.org/name> ?n }", "UTF-8")
      val (nq, ct) = {
        val conn = new java.net.URL(s"${h.endpoint}?query=$q")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(120000)
        try {
          if (conn.getResponseCode != 200)
            fail(s"HTTP ${conn.getResponseCode}: " + new String(
              conn.getErrorStream.readAllBytes(), "UTF-8"))
          (new String(conn.getInputStream.readAllBytes(), "UTF-8"),
            conn.getContentType)
        } finally conn.disconnect()
      }
      assert(ct.startsWith("application/n-quads"))
      assert(nq.linesIterator.size == 3 &&
        nq.contains("<urn:a> <urn:p:named> \"Alpha\""))
      // missing query → 400; malformed → 500 (the client raises the
      // reference's non-200 RuntimeError on both)
      def codeOf(url: String): Int = {
        val c = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try c.getResponseCode finally c.disconnect()
      }
      assert(codeOf(h.endpoint) == 400)
      assert(codeOf(s"${h.endpoint}?query=NOT%20SPARQL") == 500)
      intercept[RuntimeException] {
        HttpVocab.selectRemote(spark, h.endpoint, "NOT SPARQL")
      }
    } finally h.stop()
    // over-cap result sets fail LOUDLY with 413 (no silent truncation)
    val capped = SparqlServer.serve(quadDf, maxResultRows = 2L)
    try {
      val e = intercept[RuntimeException] {
        HttpVocab.selectRemote(spark, capped.endpoint,
          "SELECT ?s ?n WHERE { ?s <https://schema.org/name> ?n }",
          timeoutMs = 120000)
      }
      assert(e.getMessage.contains("413"), e.getMessage)
      // a LIMIT-paged query under the cap still answers
      val page = HttpVocab.selectRemote(spark, capped.endpoint,
        "SELECT ?s ?n WHERE { ?s <https://schema.org/name> ?n } " +
          "ORDER BY ?s LIMIT 2", timeoutMs = 120000)
      assert(page.count() == 2)
    } finally capped.stop()
  }

  test("SparqlServer r14: Accept-header negotiation serves the CSV, " +
      "TSV and XML results documents; ASK negotiates XML") {
    // unit surface first: author-order media ranges, aliases, fallback
    assert(SparqlServer.negotiate("") ==
      "application/sparql-results+json")
    assert(SparqlServer.negotiate("text/html, */*") ==
      "application/sparql-results+json")
    assert(SparqlServer.negotiate(
      "text/html, application/xml;q=0.9, text/csv") ==
      "application/sparql-results+xml")
    assert(SparqlServer.negotiate("text/csv;q=0.1") == "text/csv")
    assert(SparqlServer.negotiate("Application/JSON") ==
      "application/sparql-results+json")
    val h = SparqlServer.serve(quadDf)
    try {
      val q = java.net.URLEncoder.encode(
        "SELECT ?s ?n WHERE { ?s <https://schema.org/name> ?n } " +
          "ORDER BY ?s", "UTF-8")
      def fetch(accept: String, query: String = q): (String, String) = {
        val conn = new java.net.URL(s"${h.endpoint}?query=$query")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(120000)
        conn.setRequestProperty("Accept", accept)
        try {
          if (conn.getResponseCode != 200)
            fail(s"HTTP ${conn.getResponseCode}: " + new String(
              conn.getErrorStream.readAllBytes(), "UTF-8"))
          (new String(conn.getInputStream.readAllBytes(), "UTF-8"),
            conn.getContentType)
        } finally conn.disconnect()
      }
      // CSV: untyped lexical values, RFC 4180 quoting, CRLF rows
      val (csv, csvCt) = fetch("text/csv")
      assert(csvCt.startsWith("text/csv"))
      val csvLines = csv.split("\r\n").toSeq
      assert(csvLines.head == "s,n")
      // field-internal quotes doubled, field quoted (RFC 4180)
      assert(csvLines.tail.sorted == Seq(
        "urn:a,Alpha", "urn:b,Beta",
        "urn:c,\"a \"\"quoted\"\" name\"").sorted, csv)
      // TSV: term syntax (quoted literals), LF rows
      val (tsv, tsvCt) = fetch("text/tab-separated-values")
      assert(tsvCt.startsWith("text/tab-separated-values"))
      val tsvLines = tsv.split("\n").toSeq
      assert(tsvLines.head == "?s\t?n")
      assert(tsvLines.contains("\"urn:a\"\t\"Alpha\""), tsv)
      // XML: the W3C results document
      val (xml, xmlCt) = fetch("application/sparql-results+xml")
      assert(xmlCt.startsWith("application/sparql-results+xml"))
      assert(xml.contains("<variable name=\"s\"/>") &&
        xml.contains("<binding name=\"n\"><literal>Alpha</literal>"), xml)
      // ASK with an XML accept → the boolean XML document
      val askQ = java.net.URLEncoder.encode(
        "ASK { ?s <urn:p:score> ?v }", "UTF-8")
      val (askXml, askCt) = fetch("application/xml", askQ)
      assert(askCt.startsWith("application/sparql-results+xml"))
      assert(askXml.contains("<boolean>true</boolean>"), askXml)
    } finally h.stop()
  }

  test("SparqlServer r14: POST /update runs SPARQL UPDATE and swaps " +
      "the served relation — the Protocol §2.2 write half") {
    val h = SparqlServer.serve(quadDf)
    try {
      def post(body: String, ct: String): Int = {
        val conn = new java.net.URL(h.updateEndpoint).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", ct)
        conn.setReadTimeout(120000)
        val os = conn.getOutputStream
        os.write(body.getBytes("UTF-8")); os.close()
        try conn.getResponseCode finally conn.disconnect()
      }
      // direct application/sparql-update body: insert + delete in one
      // request — 204, then the QUERY endpoint sees the new state
      assert(post(
        "INSERT DATA { GRAPH <urn:g:1> { <urn:d> " +
          "<https://schema.org/name> \"Delta\" } } ; " +
          "DELETE DATA { GRAPH <urn:g:1> { <urn:b> " +
          "<https://schema.org/name> \"Beta\" } }",
        "application/sparql-update") == 204)
      val names = HttpVocab.selectRemote(spark, h.endpoint,
        "SELECT ?n WHERE { ?s <https://schema.org/name> ?n } ORDER BY ?n",
        timeoutMs = 120000).collect().map(_.getString(0)).toSeq
      assert(names == Seq("Alpha", "Delta", "a \"quoted\" name"), names)
      // form-encoded update param works too
      val upd = java.net.URLEncoder.encode(
        "DELETE DATA { GRAPH <urn:g:1> { <urn:d> " +
          "<https://schema.org/name> \"Delta\" } }", "UTF-8")
      assert(post(s"update=$upd",
        "application/x-www-form-urlencoded") == 204)
      assert(h.relation.filter(col("objectValue") === "Delta").count()
        == 0)
      // missing update → 400; malformed → 500; GET → 400
      assert(post("nope=1", "application/x-www-form-urlencoded") == 400)
      assert(post("NOT AN UPDATE", "application/sparql-update") == 500)
      val getConn = new java.net.URL(h.updateEndpoint).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try assert(getConn.getResponseCode == 400)
      finally getConn.disconnect()
    } finally h.stop()
  }

  test("SparqlServer r14: a SERVICE clause traverses the real local " +
      "HTTP loop — engine federates to engine over the wire") {
    import spark.implicits._
    // the local store: scores; the REMOTE endpoint: names
    val local = Seq(
      ("urn:a", "iri", "urn:p:score", "3", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g:1"),
      ("urn:b", "iri", "urn:p:score", "7", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g:1"),
      ("urn:z", "iri", "urn:p:score", "9", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g:1"))
      .toDF("subject", "subjectKind", "predicate", "objectValue",
        "objectKind", "datatype", "lang", "graph")
    val h = SparqlServer.serve(quadDf)
    try {
      // without the opt-in the unregistered http endpoint fails loudly
      intercept[IllegalArgumentException] {
        SparqlParser.execute(local,
          s"""SELECT ?s ?v ?n WHERE {
             |  ?s <urn:p:score> ?v .
             |  SERVICE <${h.endpoint}> {
             |    ?s <https://schema.org/name> ?n . }
             |} ORDER BY ?s""".stripMargin)
      }
      spark.conf.set(SparqlParser.RemoteEnabledKey, "true")
      try {
        val got = SparqlParser.execute(local,
          s"""SELECT ?s ?v ?n WHERE {
             |  ?s <urn:p:score> ?v .
             |  SERVICE <${h.endpoint}> {
             |    ?s <https://schema.org/name> ?n . }
             |} ORDER BY ?s""".stripMargin)
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getString(2))).toSeq
        // urn:z has no remote name → inner join drops it
        assert(got == Seq(("urn:a", "3", "Alpha"), ("urn:b", "7", "Beta")))
        // SILENT + a dead endpoint is still the spec'd no-op
        val silent = SparqlParser.execute(local,
          """SELECT ?s ?v WHERE {
            |  ?s <urn:p:score> ?v .
            |  SERVICE SILENT <http://127.0.0.1:9/sparql> {
            |    ?s <https://schema.org/name> ?n . }
            |} ORDER BY ?s""".stripMargin)
        assert(silent.count() == 3)
        // body re-rendering fidelity: the POSTed text is a space-join
        // of the captured tokens, so FILTERs and literals with spaces
        // and escaped quotes must survive the wire verbatim — the
        // remote filters on "a \"quoted\" name"'s inner word and only
        // urn:c comes back
        val localC = local.unionByName(
          Seq(("urn:c", "iri", "urn:p:score", "5", "literal",
            "http://www.w3.org/2001/XMLSchema#integer", null, "urn:g:1"))
            .toDF("subject", "subjectKind", "predicate", "objectValue",
              "objectKind", "datatype", "lang", "graph"))
        val filtered = SparqlParser.execute(localC,
          s"""SELECT ?s ?n WHERE {
             |  ?s <urn:p:score> ?v .
             |  SERVICE <${h.endpoint}> {
             |    ?s <https://schema.org/name> ?n .
             |    FILTER(CONTAINS(?n, "\\"quoted\\" name")) }
             |} ORDER BY ?s""".stripMargin)
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        assert(filtered == Seq(("urn:c", "a \"quoted\" name")))
      } finally spark.conf.unset(SparqlParser.RemoteEnabledKey)
    } finally h.stop()
  }
}
