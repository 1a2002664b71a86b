package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Shapefile
import graft.sources.Shapefile.{PointShape, PolygonShape, PolylineShape}

/** sources/Shapefile — the shp2pgsql twin (SURVEY §2.1 S7). */
class ShapefileSpec extends AnyFunSuite with SparkTestBase {

  private def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_shp_test/$name"

  test("point layer round-trips with attrs paired by record order") {
    val d = dir("points")
    Shapefile.writeShp(s"$d/p.shp",
      Seq(PointShape(1.5, -2.0), PointShape(3.0, 4.25)))
    Shapefile.writeDbf(s"$d/p.dbf", Seq(("NAME", 8)),
      Seq(Seq("alpha"), Seq("beta")))
    val got = Shapefile.readShapefile(spark, s"$d/p.shp", s"$d/p.dbf")
      .select(col("record_no"), col("wkt"),
        element_at(col("attrs"), "NAME").as("name"))
      .orderBy(col("record_no")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1, "POINT (1.5 -2.0)", "alpha"),
      (2, "POINT (3.0 4.25)", "beta")))
  }

  test("multi-part polyline and holed polygon slice rings correctly") {
    val d = dir("geoms")
    Shapefile.writeShp(s"$d/l.shp", Seq(
      PolylineShape(Seq(
        Seq((0.0, 0.0), (1.0, 1.0)),
        Seq((5.0, 5.0), (6.0, 5.0), (7.0, 5.0))))))
    val line = Shapefile.readShp(spark, s"$d/l.shp")
      .select(col("wkt")).collect()(0).getString(0)
    assert(line ==
      "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (5.0 5.0, 6.0 5.0, 7.0 5.0))")
    Shapefile.writeShp(s"$d/g.shp", Seq(
      PolygonShape(Seq(
        Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)),
        Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))))))
    val poly = Shapefile.readShp(spark, s"$d/g.shp")
      .select(col("wkt")).collect()(0).getString(0)
    assert(poly == "POLYGON ((0.0 0.0, 0.0 4.0, 4.0 4.0, 4.0 0.0, 0.0 0.0), " +
      "(1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))")
  }

  test("dbf '*'-flagged records are skipped; empty fields read as null") {
    val d = dir("dbf")
    Shapefile.writeDbf(s"$d/a.dbf", Seq(("NAME", 6), ("CODE", 3)),
      Seq(Seq("one", "1"), Seq("two", null), Seq("three", "3")))
    // flip record 2's deletion flag byte to '*'
    val p = java.nio.file.Paths.get(s"$d/a.dbf")
    val bytes = java.nio.file.Files.readAllBytes(p)
    val headerSize =
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getShort(8) & 0xffff
    bytes(headerSize + (1 + 6 + 3)) = '*'
    java.nio.file.Files.write(p, bytes)
    val got = Shapefile.readDbf(spark, s"$d/a.dbf")
      .select(col("record_no"),
        element_at(col("attrs"), "NAME").as("n"),
        element_at(col("attrs"), "CODE").as("c"))
      .orderBy(col("record_no")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1, "one", "1"), (3, "three", "3")))
    assert(Shapefile.readDbf(spark, s"$d/a.dbf")
      .filter(col("record_no") === 1)
      .select(element_at(col("attrs"), "CODE")).collect()(0).getString(0) == "1")
  }

  test("random polygons round-trip write→parse (deterministic fuzz)") {
    val rnd = new scala.util.Random(42)
    def ring(): Seq[(Double, Double)] = {
      val cx = rnd.nextInt(1000) / 10.0
      val cy = rnd.nextInt(1000) / 10.0
      val n = 3 + rnd.nextInt(5)
      val pts = (0 until n).map { i =>
        // strictly convex-ish star points; values kept to 2dp so the
        // WKT text round-trips through Double.toString unambiguously
        val a = 2 * math.Pi * i / n
        val r = (5 + rnd.nextInt(20)) / 4.0
        (math.rint((cx + r * math.cos(a)) * 100) / 100,
          math.rint((cy + r * math.sin(a)) * 100) / 100)
      }
      pts :+ pts.head
    }
    val shapes = (1 to 25).map { _ =>
      PolygonShape((1 to (1 + rnd.nextInt(3))).map(_ => ring()))
    }
    val d = dir("fuzz")
    Shapefile.writeShp(s"$d/fz.shp", shapes)
    val got = Shapefile.readShp(spark, s"$d/fz.shp")
      .orderBy(col("record_no")).collect()
    assert(got.length == shapes.length)
    got.zip(shapes).foreach { case (row, PolygonShape(rings)) =>
      val expected = rings
        .map(r => r.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")"))
        .mkString("POLYGON (", ", ", ")")
      assert(row.getString(3) == expected,
        s"record ${row.getInt(1)} diverged")
    }
  }

  test("a non-shapefile fails loud on the file-code magic") {
    val d = dir("bad")
    val p = java.nio.file.Paths.get(s"$d/bad.shp")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, Array.fill[Byte](120)(7))
    val e = intercept[org.apache.spark.SparkException] {
      Shapefile.readShp(spark, s"$d/bad.shp").collect()
    }
    assert(e.getMessage.contains("not a shapefile") ||
      Option(e.getCause).exists(_.getMessage.contains("not a shapefile")))
  }

  test("shapefile-sourced HOLED polygon flows into the spatial " +
      "predicates end-to-end (r11 — the Shapefile→geof seam)") {
    val d = dir("holed_e2e")
    // the real qld_postcode_polygon shape: outer ring + hole
    Shapefile.writeShp(s"$d/donut.shp", Seq(
      PolygonShape(Seq(
        Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)),
        Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))))))
    val wkt = Shapefile.readShp(spark, s"$d/donut.shp")
      .select(col("wkt")).collect()(0).getString(0)
    // constant path: the loaded WKT is the FILTER constant
    import spark.implicits._
    val pts = Seq("POINT(3 3)", "POINT(1.5 1.5)", "POINT(5 5)").toDF("p")
    assert(pts.select(graft.rdf.GeoFunctions.withinConst(col("p"), wkt))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true, false, false))
    assert(pts.select(graft.rdf.GeoFunctions
        .intersectsConst(col("p"), wkt))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true, false, false))
    // column path: the loaded WKT is a geometry COLUMN (the J6 join
    // shape), annulus point in, hole point out
    assert(Seq(("POINT(3 3)", wkt), ("POINT(1.5 1.5)", wkt))
      .toDF("p", "poly")
      .select(graft.rdf.GeoFunctions.within(col("p"), col("poly")))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
    // and through the TEXTUAL SPARQL layer, loaded-WKT as the literal
    val quads = Seq(("a", "urn:g", "POINT(3 3)"),
      ("h", "urn:g", "POINT(1.5 1.5)"), ("o", "urn:g", "POINT(9 9)"))
      .toDF("subject", "predicate", "objectValue")
    val got = graft.rdf.SparqlParser.execute(quads,
      s"""SELECT ?s WHERE { ?s <urn:g> ?w .
         |FILTER(<${graft.rdf.GeoFunctions.SfWithinFn}>(?w, "$wkt")) }
         |ORDER BY ?s""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a"))
  }

  test("parsed WKT feeds the existing spatial operators") {
    val d = dir("consume")
    Shapefile.writeShp(s"$d/pts.shp",
      Seq(PointShape(153.02, -27.47), PointShape(144.96, -37.81)))
    val parsed = Shapefile.readShp(spark, s"$d/pts.shp")
      .select(col("record_no"),
        graft.functions.GraftFunctions.wktPointParse(col("wkt")).as("p"))
      .select(col("record_no"), col("p.lon"), col("p.lat"))
      .orderBy(col("record_no")).collect()
    assert(parsed(0).getDouble(1) == 153.02 && parsed(0).getDouble(2) == -27.47)
    assert(parsed(1).getDouble(1) == 144.96 && parsed(1).getDouble(2) == -37.81)
  }
}
