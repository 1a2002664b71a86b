package graft.plans

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GeoSPARQL 1.0 §8.7 NON-TOPOLOGICAL (constructive) query functions —
  * the `geof:` half the relation pack ([[SfRelate]]) does not cover:
  * `geof:envelope`, `geof:boundary`, `geof:convexHull`, `geof:getSRID`,
  * and the set-constructive `geof:intersection` / `geof:union` /
  * `geof:difference` / `geof:symDifference`. The reference serves these
  * from PostGIS (`ST_Envelope`/`ST_Boundary`/`ST_ConvexHull`/
  * `ST_Intersection`, the engine family behind
  * `cam/tables/lf_address.py:80`) and GraphDB's GeoSPARQL plugin.
  *
  * Same execution shape as [[SfRelate]] (PERF.md #31): ONE native
  * Expression per call — a single WKT tokenizer pass plus primitive
  * loops, inside whole-stage codegen; constant operands fold at
  * optimization time. No UDFs, no driver state: the construct rides the
  * scan at any scale.
  *
  * == The even-odd ring algebra ==
  *
  * Every graft geometry predicate interprets a polygon's ring list by
  * the EVEN-ODD rule (crossing parity over ALL rings — holes need no
  * grouping or orientation). That representation makes the Boolean set
  * ops exact by ALGEBRA, not by arrangement construction:
  *
  *  - a ring-set region is the symmetric difference (XOR) of its rings'
  *    interiors, so `symDifference(A, B)` is literally the CONCATENATION
  *    of the two ring lists — exact for arbitrary operands;
  *  - intersection distributes over XOR in both arguments
  *    (`x∈A∧(b₁⊕b₂) = (x∈A∧b₁)⊕(x∈A∧b₂)`), so
  *    `A∩B = ⊕ᵢⱼ (ringAᵢ ∩ ringBⱼ)`; when every ring of ONE operand is
  *    convex, each pairwise term is an exact Sutherland–Hodgman clip,
  *    and the result is again a ring list — exact for any even-odd
  *    SUBJECT (concave, holed, multi-part) against a convex-ringed
  *    operand;
  *  - `A∖B = A ⊕ (A∩B)` and `A∪B = A ⊕ B ⊕ (A∩B)` reduce to the two
  *    cases above.
  *
  * When no operand is convex-ringed (concave×concave — the cadastral
  * parcel ∩ zone case, r13, VERDICT r12 Missing #1), or when a fast
  * path's output rings mutually CROSS (which would silently break
  * [[ringAlgebra]]'s non-crossing measure contract — ADVICE r12), the
  * overlay falls back to BAND DECOMPOSITION of the two ring sets'
  * segment arrangement: split the plane at every vertex and
  * segment-intersection ordinate, classify each band's cells by
  * even-odd parity against A and B at the cell midpoint, and emit the
  * kept cells as disjoint-interior trapezoid rings. Disjoint interiors
  * make the ring-set XOR equal the union of the cells, so the result
  * is EXACT for arbitrary (concave, holed, multi-part, self-crossing)
  * even-odd operands — no convexity bound remains. The same
  * y-ordinate arrangement already powers the relation predicates'
  * overlay-face sampler ([[SfRelate]] `overlayExists`); here the cells
  * are EMITTED instead of only tested.
  *
  * == Canonical serialization ==
  *
  * Constructive outputs must hash identically across engines and runs,
  * so every produced ring is canonicalized: consecutive duplicates and
  * collinear vertices removed (region-preserving under even-odd),
  * zero-area rings dropped, counter-clockwise orientation, rotated to
  * start at the lexicographically smallest vertex, rings sorted, and
  * exact duplicate rings cancelled in pairs (XOR: two equal rings are
  * the empty region). Ring sets serialize as ONE `POLYGON` whose ring
  * list is the region's even-odd ring set (`POLYGON EMPTY` for the
  * empty region) — the same lexical shape holed polygons already use,
  * parsed even-odd by every graft predicate, so constructive outputs
  * compose exactly with [[SfRelate]], [[WktBbox]] and each other.
  * Integral coordinates print without a decimal point (`141`, not
  * `141.0`) so DuckDB oracles can replay the strings with integer
  * arithmetic.
  */
case class GeomConstruct(first: Expression, second: Expression)
  extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geom_construct"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType || second.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (op, wkt) strings")
    else if (!first.foldable || first.eval(null) == null ||
      !GeomConstruct.UnaryOpSet.contains(first.eval(null).toString))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName op must be a literal in ${GeomConstruct.UnaryOpSet}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val op: String = first.eval(null).toString

  /** Row-level entry shared by eval and codegen. */
  def construct(w: UTF8String): UTF8String =
    GeomConstruct.compute(op, w.toString)

  override protected def nullSafeEval(o: Any, w: Any): Any =
    construct(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomConstruct", this)
    nullSafeCodeGen(ctx, ev, (_, w) => {
      val tmp = ctx.freshName("geomC")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp = $ref.construct($w);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

/** Binary (two-geometry) constructive ops over the even-odd ring
  * algebra — see [[GeomConstruct]] for semantics, bounds, and the
  * canonical serialization contract. */
case class GeomOverlay(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geom_overlay"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (op, wktA, wktB) strings")
    else if (!first.foldable || first.eval(null) == null ||
      !GeomConstruct.BinaryOpSet.contains(first.eval(null).toString))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName op must be a literal in ${GeomConstruct.BinaryOpSet}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val op: String = first.eval(null).toString

  /** Row-level entry shared by eval and codegen. */
  def overlay(a: UTF8String, b: UTF8String): UTF8String =
    GeomConstruct.computeOverlay(op, a.toString, b.toString)

  override protected def nullSafeEval(o: Any, a: Any, b: Any): Any =
    overlay(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomOverlay", this)
    nullSafeCodeGen(ctx, ev, (_, a, b) => {
      val tmp = ctx.freshName("geomO")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp = $ref.overlay($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `geof:buffer(geom, radius)` — dilation by the inscribed Pythagorean
  * 20-gon disk; see [[GeomConstruct.computeBuffer]] for the identity,
  * the approximation bound, and why the fan directions are rational.
  * Same execution shape as its siblings: one native expression inside
  * whole-stage codegen, constant operands fold. */
case class GeomBuffer(first: Expression, second: Expression)
  extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_st_buffer"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType ||
      second.dataType != org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (wkt string, radius double)")
    else TypeCheckResult.TypeCheckSuccess

  /** Row-level entry shared by eval and codegen. */
  def buffer(w: UTF8String, r: Double): UTF8String =
    GeomConstruct.computeBuffer(w.toString, r)

  override protected def nullSafeEval(w: Any, r: Any): Any =
    buffer(w.asInstanceOf[UTF8String], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomBuffer", this)
    nullSafeCodeGen(ctx, ev, (w, r) => {
      val tmp = ctx.freshName("geomB")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp = $ref.buffer($w, $r);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

/** `graft_st_buffer_m(wkt, radius_metres)` — the metric-radius twin of
  * [[GeomBuffer]]: local equirectangular projection at the geometry's
  * own latitude, spherical-model radius conversion, then the same
  * planar ring algebra ([[GeomConstruct.computeBufferMetres]]).
  * Constant operands fold at optimization time exactly like the degree
  * form (both children foldable → one buffer for the whole scan). */
case class GeomBufferMetres(first: Expression, second: Expression)
  extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_st_buffer_m"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType ||
      second.dataType != org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (wkt string, radius_metres double)")
    else TypeCheckResult.TypeCheckSuccess

  /** Row-level entry shared by eval and codegen. */
  def buffer(w: UTF8String, r: Double): UTF8String =
    GeomConstruct.computeBufferMetres(w.toString, r)

  override protected def nullSafeEval(w: Any, r: Any): Any =
    buffer(w.asInstanceOf[UTF8String], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomBufferM", this)
    nullSafeCodeGen(ctx, ev, (w, r) => {
      val tmp = ctx.freshName("geomBM")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $tmp = $ref.buffer($w, $r);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

/** Numeric geometry measures over WKT — `graft_st_area` /
  * `graft_st_length` (PostGIS `ST_Area`/`ST_Length` parity). Area and
  * centroid are EXACT for the even-odd region of any NON-CROSSING ring
  * set (nested holes, islands, multi-part — the shapes OGC validity
  * allows): each ring contributes its absolute shoelace area with a
  * sign given by its nesting-depth parity, where depth parity is ONE
  * even-odd ray cast of a ring interior point against all other rings.
  * Rings that properly cross another ring are outside the contract
  * (OGC-invalid polygons; PostGIS requires validity for ST_Area too).
  * The empty region (`POLYGON EMPTY`, e.g. from a disjoint
  * [[GeomOverlay]] intersection) measures 0 — so
  * `area(intersection(a, b))` composes as overlay analytics without
  * null guards. */
case class GeomMeasure(first: Expression, second: Expression)
  extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_geom_measure"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType || second.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (op, wkt) strings")
    else if (!first.foldable || first.eval(null) == null ||
      !GeomConstruct.MeasureOpSet.contains(first.eval(null).toString))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName op must be a literal in ${GeomConstruct.MeasureOpSet}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val op: String = first.eval(null).toString

  /** Row-level entry shared by eval and codegen. */
  def measure(w: UTF8String): java.lang.Double =
    GeomConstruct.computeMeasure(op, w.toString)

  override protected def nullSafeEval(o: Any, w: Any): Any =
    measure(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomMeasure", this)
    nullSafeCodeGen(ctx, ev, (_, w) => {
      val tmp = ctx.freshName("geomM")
      s"""
         |java.lang.Double $tmp = $ref.measure($w);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

object GeomConstruct {

  val UnaryOpSet: Set[String] =
    Set("envelope", "boundary", "convex_hull", "srid", "centroid")
  val MeasureOpSet: Set[String] = Set("area", "length")
  val BinaryOpSet: Set[String] =
    Set("intersection", "union", "difference", "sym_difference")

  /** Default CRS of a wktLiteral without a leading `<crs>` prefix
    * (GeoSPARQL 1.0 Req 10). */
  val DefaultCrs = "http://www.opengis.net/def/crs/OGC/1.3/CRS84"

  private val CrsP = Pattern.compile("^\\s*<([^>]*)>\\s*")
  private val TypeP = Pattern.compile(
    "^\\s*(POINT|MULTIPOINT|LINESTRING|MULTILINESTRING|POLYGON|" +
      "MULTIPOLYGON)\\s*\\(")
  private val PolyTypeP = Pattern.compile(
    "^\\s*(POLYGON|MULTIPOLYGON)\\s*\\(")
  private val LineTypeP = Pattern.compile(
    "^\\s*(LINESTRING|MULTILINESTRING)\\s*\\(")
  private val PointTypeP = Pattern.compile(
    "^\\s*(POINT|MULTIPOINT)\\s*\\(")

  // ------------------------------------------------------------------
  // Entry points (static, called from codegen)
  // ------------------------------------------------------------------

  def compute(op: String, wkt0: String): UTF8String = {
    if (op == "srid") return UTF8String.fromString(srid(wkt0))
    val wkt = stripCrs(wkt0)
    val out = op match {
      case "envelope" => envelope(wkt)
      case "boundary" => boundary(wkt)
      case "convex_hull" => convexHull(wkt)
      case "centroid" => centroid(wkt)
      case _ => null
    }
    if (out == null) null else UTF8String.fromString(out)
  }

  private val EmptyP = Pattern.compile(
    "^\\s*(POINT|MULTIPOINT|LINESTRING|MULTILINESTRING|POLYGON|" +
      "MULTIPOLYGON|GEOMETRYCOLLECTION)\\s+EMPTY\\s*$")

  def computeMeasure(op: String, wkt0: String): java.lang.Double = {
    val wkt = stripCrs(wkt0)
    if (EmptyP.matcher(wkt).matches())
      return java.lang.Double.valueOf(0.0)
    op match {
      case "area" =>
        if (PolyTypeP.matcher(wkt).find()) {
          val rings = polyRings(wkt)
          if (rings == null) null
          else ringAlgebra(rings) match {
            case Some((a, _, _)) => java.lang.Double.valueOf(a)
            case None => null
          }
        } else if (TypeP.matcher(wkt).find())
          java.lang.Double.valueOf(0.0) // points and curves have no area
        else null
      case "length" =>
        if (!TypeP.matcher(wkt).find()) return null
        if (PointTypeP.matcher(wkt).find())
          return java.lang.Double.valueOf(0.0)
        val parts = SfRelate.parseParts(wkt)
        if (parts == null || parts.isEmpty) return null
        // polygon parts retain the closing duplicate, so consecutive
        // pairs cover ring closure edges; curves sum as written
        var s = 0.0
        parts.foreach { p =>
          var i = 0
          while (i + 3 < p.length) {
            val dx = p(i + 2) - p(i); val dy = p(i + 3) - p(i + 1)
            s += Math.sqrt(dx * dx + dy * dy)
            i += 2
          }
        }
        java.lang.Double.valueOf(s)
      case _ => null
    }
  }

  /** Polygon centroid over the signed even-odd decomposition; the
    * empty region yields `POINT EMPTY` (PostGIS `ST_Centroid`). */
  private def centroid(wkt: String): String = {
    if (EmptyP.matcher(wkt).matches()) return "POINT EMPTY"
    if (!PolyTypeP.matcher(wkt).find()) return null
    val rings = polyRings(wkt)
    if (rings == null) return null
    ringAlgebra(rings) match {
      case Some((a, mx, my)) =>
        if (a == 0.0) "POINT EMPTY"
        else s"POINT(${fmt(mx / a)} ${fmt(my / a)})"
      case None => null
    }
  }

  // ------------------------------------------------------------------
  // Signed even-odd decomposition: each non-degenerate ring weighted
  // +1 at even nesting depth, −1 at odd. For NON-CROSSING rings, a
  // ring that contains any vertex of ring i contains all of ring i, so
  // depth parity is one even-odd ray cast of a ring VERTEX against all
  // other rings — probing vertices (not interior points) is essential:
  // an interior point of the ring's area can fall inside a hole nested
  // within it and misread the depth. Vertices that lie exactly ON
  // another ring are skipped; if every vertex does (fully
  // boundary-coincident rings), the decomposition is undecidable
  // without arrangement construction → None.
  // ------------------------------------------------------------------

  /** (area, Σ±mx/6, Σ±my/6) of the even-odd region; centroid is
    * (mx/area, my/area). The empty ring set measures (0, 0, 0). */
  private def ringAlgebra(
      rings0: Seq[Array[Double]]): Option[(Double, Double, Double)] = {
    val rings = rings0.map(ccw).filter(r =>
      r.length >= 6 && shoelace2(r) != 0.0)
    if (rings.isEmpty) return Some((0.0, 0.0, 0.0))
    val closed = rings.map(r => r ++ Array(r(0), r(1))).toArray
    var area = 0.0; var mx = 0.0; var my = 0.0
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      val sign =
        if (rings.length == 1) 1.0
        else {
          val others = closed.indices.filter(_ != i).map(closed).toArray
          var s = 0.0
          var vi = 0
          val nv = r.length / 2
          while (s == 0.0 && vi < nv) {
            val rc = SfRelate.rayCast(r(2 * vi), r(2 * vi + 1), others)
            if ((rc & 2) == 0) s = if ((rc & 1) == 0) 1.0 else -1.0
            vi += 1
          }
          if (s == 0.0) {
            // Shared-boundary ring sets (the overlay tilings, r13):
            // EVERY vertex of a cell can lie on sibling cells. Sample
            // the ring's own centroid instead — strictly interior for
            // the convex cells the band decomposition emits; its
            // parity against the OTHER rings fixes the sign exactly
            // as a vertex sample would.
            val a2r = shoelace2(r)
            var sx = 0.0; var sy = 0.0
            var j = 0
            while (j < nv) {
              val k = (j + 1) % nv
              val cr = r(2 * j) * r(2 * k + 1) - r(2 * k) * r(2 * j + 1)
              sx += (r(2 * j) + r(2 * k)) * cr
              sy += (r(2 * j + 1) + r(2 * k + 1)) * cr
              j += 1
            }
            val cx = sx / (3 * a2r); val cy = sy / (3 * a2r)
            if (SfRelate.rayCast(cx, cy,
                Array(r ++ Array(r(0), r(1)))) == 1) {
              val rc = SfRelate.rayCast(cx, cy, others)
              if ((rc & 2) == 0) s = if ((rc & 1) == 0) 1.0 else -1.0
            }
          }
          if (s == 0.0) return None // no off-boundary sample found
          s
        }
      val a2 = shoelace2(r) // positive: rings are CCW here
      area += sign * a2 / 2
      val n = r.length / 2
      var sx = 0.0; var sy = 0.0
      var j = 0
      while (j < n) {
        val k = (j + 1) % n
        val cr = r(2 * j) * r(2 * k + 1) - r(2 * k) * r(2 * j + 1)
        sx += (r(2 * j) + r(2 * k)) * cr
        sy += (r(2 * j + 1) + r(2 * k + 1)) * cr
        j += 1
      }
      mx += sign * sx / 6; my += sign * sy / 6
      i += 1
    }
    Some((area, mx, my))
  }


  def computeOverlay(op: String, a0: String, b0: String): UTF8String = {
    val a = polyRings(stripCrs(a0))
    val b = polyRings(stripCrs(b0))
    if (a == null || b == null) return null
    if (!BinaryOpSet.contains(op)) return null
    // Fast algebraic path — exact whenever it applies (see header);
    // null when neither operand is convex-ringed.
    val fast: Seq[Array[Double]] = op match {
      case "sym_difference" => a ++ b
      case "intersection" => pairwiseClip(a, b)
      case "union" =>
        val i = pairwiseClip(a, b); if (i == null) null else a ++ b ++ i
      case "difference" =>
        val i = pairwiseClip(a, b); if (i == null) null else a ++ i
    }
    // A fast result whose rings mutually cross is region-exact but
    // breaks the non-crossing contract downstream measures rely on
    // (ADVICE r12: area(symDifference) of overlapping squares) — such
    // outputs, and the concave×concave case the fast path can't do,
    // re-derive through the band decomposition (disjoint cells never
    // cross).
    val canonFast = if (fast == null) null else canonSet(fast)
    val rings =
      if (canonFast != null && !ringsCross(canonFast)) canonFast
      else canonSet(overlayCells(op, a, b))
    UTF8String.fromString(renderRingSet(rings))
  }

  /** Fast-path validity: [[ringAlgebra]]'s signed decomposition needs
    * a LAMINAR ring family (each pair nested or interior-disjoint).
    * Two violations are detectable locally: (a) a PROPER edge crossing
    * anywhere in the set (self-crossings included; adjacent edges
    * share endpoints, so `proper` never fires on them), and (b) edges
    * of DIFFERENT rings overlapping COLLINEARLY over positive length —
    * the rectilinear way two rings partially overlap without a proper
    * crossing (caught by the r13 staircase property test: the sign
    * decomposition measured |A⊕B| wrong by the shared-edge region).
    * Partially-overlapping interiors always produce one of the two;
    * point-touches keep laminarity and the sign sampler handles them. */
  private def ringsCross(rings: Seq[Array[Double]]): Boolean = {
    if (rings.length == 0) return false
    val closed = rings.map(r => r ++ Array(r(0), r(1))).toArray
    if (SfRelate.anyEdgeCross(closed, closed, proper = true)) return true
    var i = 0
    while (i < closed.length) {
      var j = i + 1
      while (j < closed.length) {
        if (collinearOverlap(closed(i), closed(j))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** Any edge of `r1` collinear with an edge of `r2` and overlapping
    * it over POSITIVE length (rings in closed form). */
  private def collinearOverlap(r1: Array[Double],
      r2: Array[Double]): Boolean = {
    var i = 0
    while (i < r1.length - 2) {
      val ax = r1(i); val ay = r1(i + 1)
      val bx = r1(i + 2); val by = r1(i + 3)
      var j = 0
      while (j < r2.length - 2) {
        val cx = r2(j); val cy = r2(j + 1)
        val dx = r2(j + 2); val dy = r2(j + 3)
        val o1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        val o2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
        if (o1 == 0d && o2 == 0d) {
          // collinear — 1-D overlap along the dominant axis
          val horiz = math.abs(bx - ax) >= math.abs(by - ay)
          val (a1, b1) = if (horiz) (ax, bx) else (ay, by)
          val (c1, d1) = if (horiz) (cx, dx) else (cy, dy)
          val lo = math.max(math.min(a1, b1), math.min(c1, d1))
          val hi = math.min(math.max(a1, b1), math.max(c1, d1))
          if (hi > lo) return true
        }
        j += 2
      }
      i += 2
    }
    false
  }

  /** Constructive overlay by BAND DECOMPOSITION (r13 — the header's
    * concave×concave path). The y-ordinates of every vertex and every
    * pairwise segment intersection split the plane into horizontal
    * bands whose interiors contain no endpoint and no crossing, so
    * inside a band the non-horizontal segments are totally x-ordered
    * and even-odd parity w.r.t. A and B is constant on each cell
    * between x-consecutive segments. Cells satisfying the op's parity
    * predicate are emitted as trapezoid rings; the cells' interiors
    * are pairwise disjoint, so their ring-set XOR IS their union —
    * the exact region for arbitrary even-odd operands. O((E² + B·E)
    * per row, E = total edges, B = bands): geometry-local work that
    * rides the scan like every other expression here. */
  private def overlayCells(op: String, a: Seq[Array[Double]],
      b: Seq[Array[Double]]): Seq[Array[Double]] = {
    val keep: Array[Boolean] => Boolean = op match {
      case "intersection" => p => p(0) && p(1)
      case "union" => p => p(0) || p(1)
      case "difference" => p => p(0) && !p(1)
      case "sym_difference" => p => p(0) != p(1)
    }
    arrangementCells(Seq(a, b), keep)
  }

  /** The decomposition engine behind [[overlayCells]] and
    * [[computeBuffer]]: N ring-set PIECES, one even-odd parity bit
    * each, cells kept by an arbitrary predicate over the parity
    * vector (∧ for intersection, ∃ for an N-way union, …). */
  private def arrangementCells(pieces: Seq[Seq[Array[Double]]],
      keep: Array[Boolean] => Boolean): Seq[Array[Double]] = {
    // flat edges: ax, ay, bx, by, piece index
    val edges = new ArrayBuffer[Array[Double]]()
    pieces.zipWithIndex.foreach { case (rings, owner) =>
      rings.foreach { r =>
        val n = r.length / 2
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          edges += Array(r(2 * i), r(2 * i + 1), r(2 * j), r(2 * j + 1),
            owner.toDouble)
          i += 1
        }
      }
    }
    if (edges.isEmpty) return Seq.empty
    val ys = scala.collection.mutable.SortedSet.empty[Double]
    edges.foreach { e => ys += e(1); ys += e(3) }
    // pairwise intersection ordinates — ALL pairs: even-odd ring sets
    // may self-cross within one operand too. Collinear overlaps
    // (denom = 0) contribute their endpoints, already in the set.
    var i = 0
    while (i < edges.length) {
      val e = edges(i)
      val rx = e(2) - e(0); val ry = e(3) - e(1)
      var j = i + 1
      while (j < edges.length) {
        val f = edges(j)
        val sx = f(2) - f(0); val sy = f(3) - f(1)
        val denom = rx * sy - ry * sx
        if (denom != 0d) {
          val qpx = f(0) - e(0); val qpy = f(1) - e(1)
          val t = (qpx * sy - qpy * sx) / denom
          val u = (qpx * ry - qpy * rx) / denom
          if (t >= 0d && t <= 1d && u >= 0d && u <= 1d) ys += e(1) + t * ry
        }
        j += 1
      }
      i += 1
    }
    // Scale-relative snapping: double arithmetic on intersection
    // ordinates leaves ~1e-16-scale noise (e.g. a fan edge crossing a
    // swept edge "at" y = 8.9e-16 instead of 0) that would emit sliver
    // bands — numerically hostile to the measure pass and noise in the
    // canonical serialization. Ordinates within eps collapse into one
    // band edge; the region moves by O(eps · extent), far below any
    // oracle's rounding.
    val scale = math.max(1.0, edges.iterator.map(e =>
      math.max(math.abs(e(1)), math.abs(e(3)))).max)
    val eps = 1e-9 * scale
    val bands = {
      val buf = new ArrayBuffer[Double]()
      ys.foreach { y => if (buf.isEmpty || y - buf.last > eps) buf += y }
      buf.toArray
    }
    val out = Seq.newBuilder[Array[Double]]
    var bi = 0
    while (bi < bands.length - 1) {
      val y0 = bands(bi); val y1 = bands(bi + 1)
      val ym = (y0 + y1) / 2
      // spanning (non-horizontal) segments: no endpoint or crossing
      // sits strictly inside a band, so a segment either spans it
      // fully or misses its interior, and the x-order at ym holds
      // across the whole band
      val spans = edges.iterator
        .filter(e => (e(1) > ym) != (e(3) > ym))
        .map { e =>
          val dy = e(3) - e(1); val dx = e(2) - e(0)
          Array(e(0) + (ym - e(1)) / dy * dx, // x at ym (sort key)
            e(0) + (y0 - e(1)) / dy * dx,     // x at band bottom
            e(0) + (y1 - e(1)) / dy * dx,     // x at band top
            e(4))
        }.toArray
        .sortBy(s => (s(0), s(1), s(2)))
      val par = new Array[Boolean](pieces.length)
      var k = 0
      while (k < spans.length) {
        val l = spans(k)
        par(l(3).toInt) = !par(l(3).toInt)
        if (k + 1 < spans.length && keep(par)) {
          val r = spans(k + 1)
          // CCW trapezoid: bottom left→right, up, top right→left.
          // Sliver cells (both parallel sides within eps — collinear
          // double noise between coincident spans) are dropped; true
          // zero-width duplicates would clean to nothing anyway.
          if (r(1) - l(1) > eps || r(2) - l(2) > eps)
            out += Array(l(1), y0, r(1), y0, r(2), y1, l(2), y1)
        }
        k += 1
      }
      bi += 1
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // geof:buffer (r13 — VERDICT r12 Missing #2)
  // ------------------------------------------------------------------

  /** The inscribed-disk fan directions, one CCW quarter: PYTHAGOREAN
    * unit vectors (3-4-5 and 7-24-25 triples), so fan vertices are
    * RATIONAL multiples of the radius — axis-aligned fixtures with
    * radius a multiple of 25 buffer to exact integer coordinates a
    * DuckDB oracle can string-replay, and the full 20-gon's area has
    * the closed form `386/125 · r²` (each quarter's cross-product sum
    * is 3·(7/25) + 2·(44/125) = 193/125). Max radial shortfall of the
    * inscribed fan: 1 − cos(10.31°) ≈ 1.6 % of r (the largest
    * half-gap), the documented approximation bound. */
  private val QuarterDirs: Array[(Double, Double)] = Array(
    (1d, 0d), (24d / 25, 7d / 25), (4d / 5, 3d / 5), (3d / 5, 4d / 5),
    (7d / 25, 24d / 25))

  /** All 20 fan directions, CCW from (1, 0). */
  private val DiskDirs: Array[(Double, Double)] = {
    val q = QuarterDirs
    q ++ q.map { case (x, y) => (-y, x) } ++
      q.map { case (x, y) => (-x, -y) } ++ q.map { case (x, y) => (y, -x) }
  }

  /** `geof:buffer(g, r)` by the DILATION IDENTITY
    * `buffer(R, r) = R ∪ (∂R ⊕ D_r)`: the region itself, one ±r
    * normal-offset quad per boundary/curve edge (EXACT at distance r),
    * and one inscribed 20-gon disk per vertex (the vertex-arc
    * approximation — see [[QuarterDirs]]). The N-way union evaluates
    * in ONE [[arrangementCells]] pass (parity per piece, keep = any),
    * so holed / multi-part / concave operands dilate correctly: hole
    * rims expand INTO their holes because the union covers every point
    * within r of any boundary edge. Curves and points buffer to their
    * sweep/disk alone. r = 0 returns the canonical region (empty for
    * curves and points). NEGATIVE r erodes (PostGIS negative
    * `ST_Buffer`): `erode(R, |r|) = R ∖ dilate(∂R, |r|)` — the same
    * pieces, keep = inside-the-region AND inside NO boundary piece;
    * curves and points erode to the empty region. */
  def computeBuffer(wkt0: String, r0: Double): UTF8String = {
    val wkt = stripCrs(wkt0)
    if (java.lang.Double.isNaN(r0)) return null
    val r = Math.abs(r0)
    if (EmptyP.matcher(wkt).matches())
      return UTF8String.fromString("POLYGON EMPTY")
    val pieces = new ArrayBuffer[Seq[Array[Double]]]()
    val verts = new ArrayBuffer[Double]() // x0, y0, x1, y1, …
    val sweep = new ArrayBuffer[Array[Double]]() // ax, ay, bx, by
    if (PolyTypeP.matcher(wkt).find()) {
      val rings = polyRings(wkt)
      if (rings == null) return null
      if (rings.nonEmpty) pieces += rings
      rings.foreach { ring =>
        val n = ring.length / 2
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          sweep += Array(ring(2 * i), ring(2 * i + 1),
            ring(2 * j), ring(2 * j + 1))
          verts += ring(2 * i); verts += ring(2 * i + 1)
          i += 1
        }
      }
    } else if (LineTypeP.matcher(wkt).find()) {
      val parts = SfRelate.parseParts(wkt)
      if (parts == null || parts.isEmpty) return null
      parts.foreach { p =>
        var i = 0
        while (i + 3 < p.length) {
          sweep += Array(p(i), p(i + 1), p(i + 2), p(i + 3))
          i += 2
        }
        var v = 0
        while (v + 1 < p.length) { verts += p(v); verts += p(v + 1); v += 2 }
      }
    } else if (PointTypeP.matcher(wkt).find()) {
      val parts = SfRelate.parseParts(wkt)
      if (parts == null || parts.isEmpty) return null
      parts.foreach { p =>
        var v = 0
        while (v + 1 < p.length) { verts += p(v); verts += p(v + 1); v += 2 }
      }
    } else return null
    if (r == 0)
      return UTF8String.fromString(renderRingSet(
        if (pieces.isEmpty) Seq.empty else canonSet(pieces.head)))
    // erosion of a curve/point (no areal region) is the empty region
    if (r0 < 0 && pieces.isEmpty)
      return UTF8String.fromString("POLYGON EMPTY")
    sweep.foreach { e =>
      val dx = e(2) - e(0); val dy = e(3) - e(1)
      val len = Math.sqrt(dx * dx + dy * dy)
      if (len > 0) {
        val nx = -dy / len * r; val ny = dx / len * r
        pieces += Seq(Array(e(0) + nx, e(1) + ny, e(2) + nx, e(3) + ny,
          e(2) - nx, e(3) - ny, e(0) - nx, e(1) - ny))
      }
    }
    // distinct vertices, one inscribed 20-gon each
    val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
    var v = 0
    while (v + 1 < verts.length) {
      val key = (verts(v), verts(v + 1))
      if (seen.add(key)) {
        val fan = new Array[Double](DiskDirs.length * 2)
        var d = 0
        while (d < DiskDirs.length) {
          fan(2 * d) = key._1 + r * DiskDirs(d)._1
          fan(2 * d + 1) = key._2 + r * DiskDirs(d)._2
          d += 1
        }
        pieces += Seq(fan)
      }
      v += 2
    }
    // dilation keeps any-piece parity; erosion keeps region-and-no-
    // boundary-piece (piece 0 is always the region when erosion runs —
    // the empty-region case returned above)
    val keep: Array[Boolean] => Boolean =
      if (r0 >= 0) _.exists(identity[Boolean])
      else p => p(0) && !p.iterator.drop(1).exists(identity[Boolean])
    UTF8String.fromString(renderRingSet(canonSet(
      arrangementCells(pieces.toSeq, keep))))
  }

  /** Metres per degree of great-circle arc under the SAME spherical
    * model the haversine expression uses (R = 6371.0088 km) — the one
    * conversion constant shared by [[computeBufferMetres]] and its
    * oracles. */
  val MetresPerDegree: Double = Math.PI * 6371.0088 * 1000.0 / 180.0

  /** `geof:buffer` with a METRIC radius (r14 — VERDICT r13 Missing #2;
    * the reference's distance work is metric geography,
    * etl-notes.md:117-119). The ring algebra is planar, so the metric
    * radius goes through the LOCAL EQUIRECTANGULAR projection at the
    * geometry's own latitude: scale lon by cos φ₀ (φ₀ = the bbox's
    * mid-latitude), convert the radius with [[MetresPerDegree]], run
    * the planar [[computeBuffer]], unscale lon. Exact for that
    * projection; the projection itself is the standard local-scale
    * approximation (relative error O((Δφ)²) inside a buffer-sized
    * neighborhood). Negative radius erodes, like the degree form. */
  def computeBufferMetres(wkt0: String, rMetres: Double): UTF8String = {
    val wkt = stripCrs(wkt0)
    if (java.lang.Double.isNaN(rMetres)) return null
    if (EmptyP.matcher(wkt).matches())
      return UTF8String.fromString("POLYGON EMPTY")
    var minY = Double.MaxValue
    var maxY = -Double.MaxValue
    val m = CoordPairP.matcher(wkt)
    while (m.find()) {
      val y = java.lang.Double.parseDouble(m.group(2))
      if (y < minY) minY = y
      if (y > maxY) maxY = y
    }
    if (minY > maxY) return null // no coordinates: not a geometry
    val c = Math.cos(Math.toRadians((minY + maxY) / 2.0))
    val out = computeBuffer(mapCoords(wkt, (x, y) => (x * c, y)),
      rMetres / MetresPerDegree)
    if (out == null) null
    else UTF8String.fromString(
      mapCoords(out.toString, (x, y) => (x / c, y)))
  }

  /** One coordinate pair (`x y`) inside any WKT body — numbers never
    * appear anywhere else in the grammar, so a global pair-rewrite is a
    * coordinate transform of the whole geometry. */
  private val CoordPairP = java.util.regex.Pattern.compile(
    "(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s+" +
      "(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)")

  private def mapCoords(wkt: String,
      f: (Double, Double) => (Double, Double)): String = {
    val m = CoordPairP.matcher(wkt)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val (nx, ny) = f(java.lang.Double.parseDouble(m.group(1)),
        java.lang.Double.parseDouble(m.group(2)))
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        fmt(nx) + " " + fmt(ny)))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** `geof:getSRID` — the literal's embedded `<crs>` prefix, else the
    * GeoSPARQL default CRS84. Operates on the lexical form only. */
  private def srid(wkt: String): String = {
    val m = CrsP.matcher(wkt)
    if (m.find()) m.group(1) else DefaultCrs
  }

  private def stripCrs(wkt: String): String = {
    val m = CrsP.matcher(wkt)
    if (m.find()) wkt.substring(m.end()) else wkt
  }

  // ------------------------------------------------------------------
  // Number/vertex formatting — integral doubles print as integers so
  // the DuckDB oracles replay the exact strings with integer CASTs.
  // ------------------------------------------------------------------

  private[plans] def fmt(d: Double): String =
    if (d == Math.rint(d) && Math.abs(d) < 1e15) d.toLong.toString
    else java.lang.Double.toString(d)

  /** Open-form flat ring → `"x0 y0, x1 y1, …, x0 y0"` (closed). */
  private def closedStr(r: Array[Double]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      sb.append(fmt(r(i))).append(' ').append(fmt(r(i + 1))).append(", ")
      i += 2
    }
    sb.append(fmt(r(0))).append(' ').append(fmt(r(1)))
    sb.toString
  }

  private def openStr(r: Array[Double]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      if (i > 0) sb.append(", ")
      sb.append(fmt(r(i))).append(' ').append(fmt(r(i + 1)))
      i += 2
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // Ring primitives (flat double arrays, OPEN form — no closing dup)
  // ------------------------------------------------------------------

  /** Drop the closing duplicate vertex if present. */
  private def openRing(r: Array[Double]): Array[Double] = {
    val n = r.length
    if (n >= 4 && r(0) == r(n - 2) && r(1) == r(n - 1)) r.dropRight(2)
    else r
  }

  /** Twice the signed area (positive = counter-clockwise). */
  private def shoelace2(r: Array[Double]): Double = {
    val n = r.length / 2
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
      i += 1
    }
    s
  }

  private def reverse(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i))
      out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  private def ccw(r: Array[Double]): Array[Double] =
    if (shoelace2(r) < 0) reverse(r) else r

  /** Remove consecutive duplicate and collinear vertices (both are
    * region-preserving under even-odd), ONE vertex per pass to a fixed
    * point — dropping neighbors in the same pass is unsound (the
    * second vertex may only be collinear because of the first). */
  private def cleanRing(r0: Array[Double]): Array[Double] = {
    var r = r0
    var changed = true
    while (changed && r.length >= 6) {
      changed = false
      val n = r.length / 2
      var drop = -1
      var i = 0
      while (drop < 0 && i < n) {
        val p = (i + n - 1) % n; val q = (i + 1) % n
        val px = r(2 * p); val py = r(2 * p + 1)
        val cx = r(2 * i); val cy = r(2 * i + 1)
        val qx = r(2 * q); val qy = r(2 * q + 1)
        val dup = cx == px && cy == py
        val cross = (cx - px) * (qy - py) - (cy - py) * (qx - px)
        if (dup || cross == 0.0) drop = i
        i += 1
      }
      if (drop >= 0) {
        changed = true
        val buf = new ArrayBuffer[Double](r.length - 2)
        var j = 0
        while (j < n) {
          if (j != drop) { buf += r(2 * j); buf += r(2 * j + 1) }
          j += 1
        }
        r = buf.toArray
      }
    }
    r
  }

  /** Canonical form: cleaned, CCW, rotated to the lexicographically
    * smallest vertex; None when degenerate (under 3 vertices or zero
    * area). Returns OPEN form. */
  private def canonRing(r0: Array[Double]): Option[Array[Double]] = {
    val r1 = cleanRing(openRing(r0))
    if (r1.length < 6 || shoelace2(r1) == 0.0) return None
    val r = ccw(r1)
    val n = r.length / 2
    var best = 0
    var i = 1
    while (i < n) {
      if (r(2 * i) < r(2 * best) ||
        (r(2 * i) == r(2 * best) && r(2 * i + 1) < r(2 * best + 1))) best = i
      i += 1
    }
    val out = new Array[Double](r.length)
    // + 0.0 normalizes -0.0 (clip arithmetic can produce it; boxed
    // Double equality would split the canonical groups)
    i = 0
    while (i < n) {
      out(2 * i) = r(2 * ((i + best) % n)) + 0.0
      out(2 * i + 1) = r(2 * ((i + best) % n) + 1) + 0.0
      i += 1
    }
    Some(out)
  }

  private def ringOrder(a: Array[Double], b: Array[Double]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  /** Canonicalize a ring multiset: per-ring canonical form, exact
    * duplicates cancelled in PAIRS (XOR), deterministic sort. */
  private def canonSet(rings: Seq[Array[Double]]): Seq[Array[Double]] = {
    val canon = rings.flatMap(canonRing)
    canon.groupBy(_.toSeq).collect {
      case (_, g) if g.size % 2 == 1 => g.head
    }.toSeq.sortWith(ringOrder)
  }

  private def renderRingSet(rings: Seq[Array[Double]]): String =
    if (rings.isEmpty) "POLYGON EMPTY"
    else rings.map(r => "(" + closedStr(r) + ")")
      .mkString("POLYGON(", ", ", ")")

  // ------------------------------------------------------------------
  // Overlay: pairwise Sutherland–Hodgman against a convex-ringed side
  // ------------------------------------------------------------------

  /** Rings of a (MULTI)POLYGON in open form, degenerate rings dropped;
    * null when the input is not a parseable polygon. */
  private def polyRings(wkt: String): Seq[Array[Double]] = {
    // POLYGON/MULTIPOLYGON EMPTY is the empty region (a valid operand —
    // intersection itself produces it, so overlays must compose with
    // their own outputs, ADVICE r12), not a parse failure; EMPTY
    // non-areal types stay null.
    if (EmptyP.matcher(wkt).matches())
      return if (wkt.contains("POLYGON")) Seq.empty else null
    if (!PolyTypeP.matcher(wkt).find()) return null
    val parts = SfRelate.parseParts(wkt)
    if (parts == null || parts.isEmpty) return null
    // Rings that clean to under 3 vertices are empty regions — dropped
    // (region-preserving under even-odd), never a parse error.
    parts.toSeq.map(p => cleanRing(openRing(p))).filter(_.length >= 6)
  }

  /** Open CCW ring convexity: no sign change across consecutive edge
    * cross products (zeros — collinear vertices — allowed). */
  private def isConvex(r: Array[Double]): Boolean = {
    val n = r.length / 2
    if (n < 3) return false
    var pos = false; var neg = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cr = (r(2 * j) - r(2 * i)) * (r(2 * k + 1) - r(2 * j + 1)) -
        (r(2 * j + 1) - r(2 * i + 1)) * (r(2 * k) - r(2 * j))
      if (cr > 0) pos = true else if (cr < 0) neg = true
      i += 1
    }
    pos != neg
  }

  /** `⊕ᵢⱼ (aᵢ ∩ bⱼ)` — every pairwise clip, concatenated (XOR). Null
    * when neither side has all-convex rings (the documented bound). */
  private def pairwiseClip(a: Seq[Array[Double]],
      b: Seq[Array[Double]]): Seq[Array[Double]] = {
    val aC = a.map(ccw); val bC = b.map(ccw)
    if (bC.forall(isConvex))
      for { s <- aC; c <- bC; r = clipRing(s, c) if r.length >= 6 } yield r
    else if (aC.forall(isConvex))
      for { s <- bC; c <- aC; r = clipRing(s, c) if r.length >= 6 } yield r
    else null
  }

  /** Sutherland–Hodgman: open subject ring clipped by an open CONVEX
    * CCW clip ring (closed half-planes: boundary-touching output
    * degenerates to zero-area rings that canonSet drops). */
  private def clipRing(subject: Array[Double],
      clip: Array[Double]): Array[Double] = {
    var out = subject
    val m = clip.length / 2
    var e = 0
    while (e < m && out.length >= 6) {
      val ax = clip(2 * e); val ay = clip(2 * e + 1)
      val bx = clip(2 * ((e + 1) % m)); val by = clip(2 * ((e + 1) % m) + 1)
      val in = out
      val n = in.length / 2
      val buf = new ArrayBuffer[Double](in.length + 4)
      var j = 0
      while (j < n) {
        val p = (j + n - 1) % n
        val px = in(2 * p); val py = in(2 * p + 1)
        val cx = in(2 * j); val cy = in(2 * j + 1)
        val pIn = (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
        val cIn = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) >= 0
        if (cIn != pIn) {
          // p→c strictly straddles the edge line ⇒ denominator ≠ 0
          val d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
          val d2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
          val t = d1 / (d1 - d2)
          buf += px + t * (cx - px); buf += py + t * (cy - py)
        }
        if (cIn) { buf += cx; buf += cy }
        j += 1
      }
      out = buf.toArray
      e += 1
    }
    if (out.length >= 6) out else Array.emptyDoubleArray
  }

  // ------------------------------------------------------------------
  // Unary constructs
  // ------------------------------------------------------------------

  /** Bounding geometry, PostGIS `ST_Envelope` degeneracy rules: a point
    * for a point, a LINESTRING for an axis-degenerate box, a POLYGON
    * otherwise (counter-clockwise from the min corner). */
  private def envelope(wkt: String): String = {
    if (!TypeP.matcher(wkt).find()) return null
    val parts = SfRelate.parseParts(wkt)
    if (parts == null || parts.isEmpty || parts.forall(_.isEmpty)) return null
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    parts.foreach { r =>
      var i = 0
      while (i < r.length) {
        val x = r(i); val y = r(i + 1)
        if (x < minX) minX = x; if (x > maxX) maxX = x
        if (y < minY) minY = y; if (y > maxY) maxY = y
        i += 2
      }
    }
    if (minX == maxX && minY == maxY)
      s"POINT(${fmt(minX)} ${fmt(minY)})"
    else if (minX == maxX || minY == maxY)
      s"LINESTRING(${fmt(minX)} ${fmt(minY)}, ${fmt(maxX)} ${fmt(maxY)})"
    else
      s"POLYGON((${fmt(minX)} ${fmt(minY)}, ${fmt(maxX)} ${fmt(minY)}, " +
        s"${fmt(maxX)} ${fmt(maxY)}, ${fmt(minX)} ${fmt(maxY)}, " +
        s"${fmt(minX)} ${fmt(minY)}))"
  }

  /** OGC boundary: polygon → its rings as (MULTI)LINESTRING (canonical
    * start/orientation); curves → the mod-2 endpoint set as MULTIPOINT
    * (empty for closed curves); points → the empty set. */
  private def boundary(wkt: String): String = {
    if (PolyTypeP.matcher(wkt).find()) {
      val parts = SfRelate.parseParts(wkt)
      if (parts == null || parts.isEmpty) return null
      val rings = parts.toSeq.flatMap(canonRing)
      if (rings.isEmpty) return null
      val sorted = rings.sortWith(ringOrder)
      if (sorted.length == 1) s"LINESTRING(${closedStr(sorted.head)})"
      else sorted.map(r => "(" + closedStr(r) + ")")
        .mkString("MULTILINESTRING(", ", ", ")")
    } else if (LineTypeP.matcher(wkt).find()) {
      val parts = SfRelate.parseParts(wkt)
      if (parts == null || parts.isEmpty) return null
      val counts = scala.collection.mutable.Map.empty[(Double, Double), Int]
      parts.foreach { p =>
        if (p.length >= 4) {
          val ends = Seq((p(0), p(1)), (p(p.length - 2), p(p.length - 1)))
          ends.foreach(e => counts(e) = counts.getOrElse(e, 0) + 1)
        }
      }
      val odd = counts.collect { case (pt, c) if c % 2 == 1 => pt }.toSeq
        .sortBy(identity)
      if (odd.isEmpty) "MULTIPOINT EMPTY"
      else odd.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
        .mkString("MULTIPOINT(", ", ", ")")
    } else if (PointTypeP.matcher(wkt).find()) {
      "GEOMETRYCOLLECTION EMPTY"
    } else null
  }

  /** Convex hull over every coordinate of any geometry — Andrew's
    * monotone chain. A single distinct point → POINT; a collinear set →
    * LINESTRING(min, max); otherwise a CCW POLYGON from the min vertex
    * (the monotone-chain output is already canonical). */
  private def convexHull(wkt: String): String = {
    if (!TypeP.matcher(wkt).find()) return null
    val parts = SfRelate.parseParts(wkt)
    if (parts == null || parts.isEmpty) return null
    val pts = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      parts.foreach { r =>
        var i = 0
        while (i < r.length) { seen += ((r(i), r(i + 1))); i += 2 }
      }
      seen.toArray.sorted
    }
    if (pts.isEmpty) return null
    if (pts.length == 1)
      return s"POINT(${fmt(pts(0)._1)} ${fmt(pts(0)._2)})"
    def cross(o: (Double, Double), a: (Double, Double),
        b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Iterator[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
      val h = new ArrayBuffer[(Double, Double)]
      ps.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h
    }
    val lower = half(pts.iterator)
    val upper = half(pts.reverseIterator)
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    if (hull.length == 2)
      s"LINESTRING(${fmt(hull(0)._1)} ${fmt(hull(0)._2)}, " +
        s"${fmt(hull(1)._1)} ${fmt(hull(1)._2)})"
    else {
      val flat = hull.flatMap(p => Array(p._1, p._2))
      s"POLYGON((${closedStr(flat)}))"
    }
  }

  // ------------------------------------------------------------------
  // Registration — one SQL name per op (the PostGIS-discoverable
  // surface); all build the same two expression classes.
  // ------------------------------------------------------------------

  val UnaryNames: Map[String, String] = Map(
    "graft_st_envelope" -> "envelope",
    "graft_st_boundary" -> "boundary",
    "graft_st_convex_hull" -> "convex_hull",
    "graft_st_srid" -> "srid",
    "graft_st_centroid" -> "centroid")

  val MeasureNames: Map[String, String] = Map(
    "graft_st_area" -> "area",
    "graft_st_length" -> "length")

  val BinaryNames: Map[String, String] = Map(
    "graft_st_intersection" -> "intersection",
    "graft_st_union" -> "union",
    "graft_st_difference" -> "difference",
    "graft_st_symdifference" -> "sym_difference")

  def unaryBuilder(name: String, op: String): Seq[Expression] => Expression =
    args => {
      require(args.length == 1, s"$name takes (wkt); got ${args.length}")
      GeomConstruct(Literal(op), args.head)
    }

  def binaryBuilder(name: String, op: String): Seq[Expression] => Expression =
    args => {
      require(args.length == 2,
        s"$name takes (wktA, wktB); got ${args.length}")
      GeomOverlay(Literal(op), args(0), args(1))
    }

  def measureBuilder(name: String, op: String): Seq[Expression] => Expression =
    args => {
      require(args.length == 1, s"$name takes (wkt); got ${args.length}")
      GeomMeasure(Literal(op), args.head)
    }

  val bufferBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2,
        s"graft_st_buffer takes (wkt, radius); got ${args.length}")
      GeomBuffer(args(0), org.apache.spark.sql.catalyst.expressions.Cast(
        args(1), org.apache.spark.sql.types.DoubleType))
    }

  val bufferMetresBuilder: Seq[Expression] => Expression =
    args => {
      require(args.length == 2,
        s"graft_st_buffer_m takes (wkt, radius_metres); got ${args.length}")
      GeomBufferMetres(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(
          args(1), org.apache.spark.sql.types.DoubleType))
    }

  /** Programmatic per-session registration (idempotent); the same
    * builders are injected by [[GraftExtensions]]. */
  def register(s: SparkSession): Unit = {
    UnaryNames.foreach { case (name, op) =>
      s.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomConstruct].getName, name),
        unaryBuilder(name, op))
    }
    BinaryNames.foreach { case (name, op) =>
      s.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomOverlay].getName, name),
        binaryBuilder(name, op))
    }
    MeasureNames.foreach { case (name, op) =>
      s.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GeomMeasure].getName, name),
        measureBuilder(name, op))
    }
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_st_buffer"),
      new ExpressionInfo(classOf[GeomBuffer].getName, "graft_st_buffer"),
      bufferBuilder)
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_st_buffer_m"),
      new ExpressionInfo(classOf[GeomBufferMetres].getName,
        "graft_st_buffer_m"),
      bufferMetresBuilder)
  }
}
