package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: serving-layer scale ladder for the geocode-chain queries —
  * `sbt "runMain graft.ScaleLadder /root/testdata/sf0.1 10 3"` replicates
  * the customer relation ×N with offset keys (the same methodology the
  * round-9 full-corpus ladder used, PERF.md #20), preloads the geocode
  * chain once (cut + stats, the store-bulk-load twin), and times each
  * serving query as the min over the warm iterations. The contract being
  * measured: point/radius latency bounded by pushed scans of the
  * materialized store, not by corpus size — the 100 TB serving shape.
  */
object ScaleLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cust = Tables.customer(spark, sfDir)
    val big = (0 until factor)
      .map(i => cust.withColumn("c_custkey",
        col("c_custkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val t0 = System.nanoTime()
    val quads = graft.operators.Checkpoints.cut(
      graft.queries.QuadQueries.geocodeChain(big))
    val n = quads.count()
    println(f"[ladder] preload x$factor%d: $n%d quads, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    val wkt = "http://www.opengis.net/ont/geosparql#"
    val geof = graft.rdf.GeoFunctions.Ns
    val uom = graft.rdf.GeoFunctions.UomNs
    val queries = Seq(
      "point_lookup" ->
        s"""PREFIX addr: <https://w3id.org/profile/anz-address/>
           |SELECT * WHERE {
           |  BIND(<https://example.org/customer/1> AS ?iri)
           |  ?iri addr:hasGeocode ?geocode .
           |  ?geocode <${wkt}hasGeometry> ?geo .
           |  ?geo <${wkt}asWKT> ?w .
           |}""".stripMargin,
      "geof_radius" ->
        s"""PREFIX addr: <https://w3id.org/profile/anz-address/>
           |SELECT ?iri WHERE {
           |  ?iri addr:hasGeocode ?g . ?g <${wkt}hasGeometry> ?geo .
           |  ?geo <${wkt}asWKT> ?w .
           |  BIND(<${geof}distance>(?w, "POINT(143 -12)", <${uom}metre>)
           |    AS ?d)
           |  FILTER(?d < 400000)
           |}""".stripMargin,
      "geof_within" ->
        s"""PREFIX addr: <https://w3id.org/profile/anz-address/>
           |SELECT ?iri WHERE {
           |  ?iri addr:hasGeocode ?g . ?g <${wkt}hasGeometry> ?geo .
           |  ?geo <${wkt}asWKT> ?w .
           |  FILTER(<${geof}sfWithin>(?w, "POLYGON((141.3 -12.3, 144.5 -9.7, 147.7 -12.3, 144.5 -14.9, 141.3 -12.3))"))
           |}""".stripMargin,
      "geof_intersects" ->
        s"""PREFIX addr: <https://w3id.org/profile/anz-address/>
           |SELECT ?iri WHERE {
           |  ?iri addr:hasGeocode ?g . ?g <${wkt}hasGeometry> ?geo .
           |  ?geo <${wkt}asWKT> ?w .
           |  FILTER(<${geof}sfIntersects>(?w, "POLYGON((141.5 -13.5, 146 -13.5, 146 -10.5, 141.5 -10.5, 141.5 -13.5))"))
           |}""".stripMargin)

    queries.foreach { case (name, q) =>
      val times = (1 to iters).map { _ =>
        val t = System.nanoTime()
        val rows = graft.rdf.SparqlParser.execute(quads, q).count()
        ((System.nanoTime() - t) / 1e9, rows)
      }
      val best = times.map(_._1).min
      println(f"[ladder] $name%-14s min $best%.2f s over $iters%d " +
        f"(rows ${times.head._2}%d)")
    }
    spark.stop()
  }
}
