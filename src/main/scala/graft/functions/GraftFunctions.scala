package graft.functions

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function toolkit (SURVEY §2.8, §7.1 `core.expr`).
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * built-ins so the whole expression tree stays inside whole-stage codegen —
  * no Scala UDFs on any hot path. Each function cites the reference
  * behaviour it reproduces (file:line into /root/reference).
  */
object GraftFunctions {

  // --------------------------------------------------------------------
  // Deterministic identity (F9/F10)
  // --------------------------------------------------------------------

  /** RFC 4122 §4.3 name-based UUID (version 5, SHA-1), as a pure Catalyst
    * expression: sha1 over namespace-bytes ++ utf8(name), then the version
    * and variant nibbles patched in hex-string space.
    *
    * Reference behaviour: `cam/etl/lalf_address.py:5-27` and
    * `cam/etl/lalf_place_name.py:6-13` mint IRIs with `uuid.uuid5(ns, name)`.
    * Being a pure function of the input value (never of partitioning or
    * process seed), the IDs are stable across the cluster — the property
    * SURVEY §7.4 calls out.
    */
  def uuid5(namespace: UUID, name: Column): Column = {
    val nsBytes = uuidBytes(namespace)
    val h = sha1(concat(lit(nsBytes), encode(name, "UTF-8"))) // 40 hex chars
    // 32-hex uuid layout: g1(8) g2(4) g3(4) g4(4) g5(12);
    // version nibble = first char of g3, variant nibble = first char of g4
    // patched to (n & 0x3) | 0x8  ∈ {8,9,a,b}.
    val variantChar = element_at(
      lit(Array("8", "9", "a", "b")),
      (pmod(conv(substring(h, 17, 1), 16, 10).cast("int"), lit(4)) + lit(1)))
    concat_ws(
      "-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(variantChar, substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** JVM-side twin of [[uuid5]] for tests / driver-side minting. */
  def uuid5Jvm(namespace: UUID, name: String): UUID = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(uuidBytes(namespace))
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte
    d(8) = ((d(8) & 0x3f) | 0x80).toByte
    val bb = java.nio.ByteBuffer.wrap(d, 0, 16)
    new UUID(bb.getLong, bb.getLong)
  }

  private def uuidBytes(u: UUID): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    bb.array()
  }

  /** Namespace used for minting testdata IRIs (itself uuid5 of a fixed
    * name under the DNS namespace, so it is reproducible from this source).
    */
  val GraftNamespace: UUID = uuid5Jvm(
    UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8"), // RFC 4122 NS_DNS
    "graft.spark.engine")

  /** Stable content hash for blank-node labels (F10). The reference used
    * process-seeded Python `hash()` (`cam/etl/__init__.py:86`) — a
    * determinism bug SURVEY §7.4 fixes by spec'ing sha1. */
  def stableId(cols: Column*): Column = sha1(concat_ws("\u0000", cols: _*))

  // --------------------------------------------------------------------
  // String normalization (F3/F4/F5, slugify per etl_qrt.py:36-45)
  // --------------------------------------------------------------------

  /** `value.lower().replace(' ', '-')` — IRI slug minting, `etl_qrt.py:36-45`. */
  def slugify(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", "-")

  /** Whitespace collapse — `regexp_replace(c,'\s+',' ','g')`, etl-notes.md:107-110. */
  def normalizeWs(c: Column): Column =
    regexp_replace(trim(c), "\\s+", " ")

  /** Empty-string → NULL, the `NULLIF(x,'')` idiom (`cam/tables/qrt.py:35`). */
  def blankAsNull(c: Column): Column = nullif(trim(c), lit(""))

  /** Road-name normalization: name + type + suffix, blanks dropped, upper,
    * whitespace collapsed — the precomputed `qrt_road_name_basic` join key
    * (etl-notes.md:74-110). */
  def roadNameBasic(name: Column, typ: Column, suffix: Column): Column =
    upper(normalizeWs(concat_ws(" ",
      coalesce(blankAsNull(name), lit("")),
      coalesce(blankAsNull(typ), lit("")),
      coalesce(blankAsNull(suffix), lit("")))))

  // --------------------------------------------------------------------
  // Dates (F6/F7)
  // --------------------------------------------------------------------

  /** Packed numeric timestamp `'YYYYMMDDHH24MISS'` → timestamp
    * (`cam/tables/lf_address_history.py:38-39`). */
  def packedTimestamp(c: Column): Column =
    to_timestamp(c.cast("string"), "yyyyMMddHHmmss")

  /** Timestamp → epoch milliseconds; the canonical cross-engine-comparable
    * output form for timestamps (see oracle notes in queries). */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  // --------------------------------------------------------------------
  // Geometry (F12/F13)
  // --------------------------------------------------------------------

  /** WKT point render — `POINT (lon lat)`, `etl_lalf_geocode.py:71-74`. */
  def wktPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT ("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")"))

  /** Parse `POINT (x y)` → struct(lon, lat) (`cam/web/app.py:65-67` uses
    * shapely.loads; here a regexp, still codegen'd). */
  def wktPointParse(wkt: Column): Column = struct(
    regexp_extract(wkt, "POINT \\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)", 1)
      .cast("double").as("lon"),
    regexp_extract(wkt, "POINT \\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)", 2)
      .cast("double").as("lat"))

  /** Great-circle distance in km (spherical law of haversines). The
    * reference leans on PostGIS `ST_Distance`/`<->`
    * (`etl_lalf_road_qrt_spatial_match.py:80-83`); this is the exact-math
    * scalar for the KNN rewrite. */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val R = 6371.0088
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * R) * asin(sqrt(a))
  }

  /** Squared planar distance — pure add/multiply IEEE arithmetic, bit-identical
    * across engines; the distance used by oracle-checked spatial queries. */
  def dist2(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)

  /** Squared planar distance from a POINT to a SEGMENT — the metric the
    * reference's road KNN actually computes (`ST_Distance(q.geom,
    * rp.geom)` / `ORDER BY <->` where the road geometries are shapefile
    * LINESTRINGs, `etl_lalf_road_qrt_spatial_match.py:80-83`,
    * `etl-notes.md:57`; min over the polyline's segments = the
    * point-to-linestring distance). Project the point onto the
    * segment's supporting line, clamp the parameter to [0,1], distance to the
    * clamped foot: `t = clamp(((p-a)·(b-a)) / |b-a|², 0, 1)`. Every op
    * is IEEE add/mul/div + min/max — fixed association order, so the
    * DuckDB oracle restates the identical expression and both engines
    * agree bit-for-bit (the same parity argument as [[dist2]]).
    * Whole-stage-codegen'd column arithmetic; degenerate zero-length
    * segments divide 0/0 → NaN t, which the clamp turns into endpoint
    * distance via greatest(0, least(1, NaN)) = … engine-dependent — so
    * callers must not pass degenerate segments (the synthetic road
    * fixtures never do). */
  def pointSegDist2(px: Column, py: Column, ax: Column, ay: Column,
      bx: Column, by: Column): Column = {
    val vx = bx - ax
    val vy = by - ay
    val t = greatest(lit(0.0d), least(lit(1.0d),
      ((px - ax) * vx + (py - ay) * vy) / (vx * vx + vy * vy)))
    dist2(px, py, ax + t * vx, ay + t * vy)
  }

  /** Great-circle km from a point to the planar-parameter foot of its
    * projection on a segment — the haversine variant of
    * [[pointSegDist2]]. The foot is computed in coordinate space (exact
    * for the reference's projected planar data; an approximation on
    * raw lon/lat over long segments) and the final leg is the pinned
    * haversine composition. */
  def pointSegHaversineKm(px: Column, py: Column, ax: Column, ay: Column,
      bx: Column, by: Column): Column = {
    val vx = bx - ax
    val vy = by - ay
    val t = greatest(lit(0.0d), least(lit(1.0d),
      ((px - ax) * vx + (py - ay) * vy) / (vx * vx + vy * vy)))
    haversineKm(px, py, ax + t * vx, ay + t * vy)
  }

  // --------------------------------------------------------------------
  // Money math — cross-engine exact aggregation
  // --------------------------------------------------------------------

  /** Double → DECIMAL(18,2): sums/products in decimal are exact, so Spark
    * and the DuckDB oracle agree bit-for-bit; cast the final aggregate back
    * to double (see `asMoney`). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Final exact-decimal aggregate → double for a stable comparable output. */
  def asMoney(c: Column): Column = c.cast("double")

  // --------------------------------------------------------------------
  // Label rendering (F2 — the big address one-liner,
  // etl_lalf_address.py:677-686 / cam/compound_naming.py:36-62)
  // --------------------------------------------------------------------

  /** Compound address label: gated segments joined by single spaces;
    * blank/null components vanish without leaving doubled separators.
    * `concat_ws` skips NULLs, giving exactly the reference's
    * "only render present components" semantics. */
  def renderLabel(parts: Column*): Column =
    normalizeWs(concat_ws(" ", parts.map(blankAsNull): _*))

  /** F14: strip NUL bytes at ingest
    * (`addressdb/remove_null_terminator_char.py:11-17`). */
  def cleanNulBytes(c: Column): Column =
    regexp_replace(c, "\u0000", "")

  /** F11: declarative IRI template interpolation — `{column}`
    * placeholders substituted with column expressions, the
    * `cam/transform.py:17-46` / `cam/config.py:5-46` surface as one pure
    * Column. Unknown placeholders are a build-time error, matching the
    * reference's config validation. */
  def iriTemplate(template: String, bindings: Map[String, Column]): Column = {
    val parts = "\\{([a-zA-Z0-9_]+)\\}".r.split(template)
    val keys = "\\{([a-zA-Z0-9_]+)\\}".r.findAllMatchIn(template)
      .map(_.group(1)).toSeq
    val cols = keys.map(k => bindings.getOrElse(k,
      throw new IllegalArgumentException(s"unbound template column: $k")))
    val pieces = parts.map(p => lit(p): Column).zipAll(cols, lit(""), lit(""))
      .flatMap { case (l, c) => Seq(l, c) }
    concat(pieces: _*)
  }

  /** F16: search-query token mangling (`meili/main.py:60-85`) —
    * '-'/'/' become spaces, whitespace collapses, and the final token
    * gets the prefix-search star. */
  def searchMangle(q: Column): Column = {
    val spaced = normalizeWs(translate(q, "-/", "  "))
    concat(spaced, lit("*"))
  }

  /** J10 + §5.2 inline invariant: vocabulary lookup with fallback chain
    * ending in a hard failure — the reference aborts mid-run on an
    * unmappable code (`etl_lalf_address.py:216-219, :580-583`,
    * `etl_pndb.py:105-109`). `raise_error` kills the job from inside the
    * executor, exactly like the reference's worker `raise` cancelling the
    * whole pool (`etl_lalf_address.py:761-768`). */
  def vocabLookupOrFail(code: Column, vocabValue: Column,
      staticValue: Column): Column =
    coalesce(vocabValue, staticValue,
      raise_error(concat(lit("unmappable vocab code: "), code.cast("string"))))
}
