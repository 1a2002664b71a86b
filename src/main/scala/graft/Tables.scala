package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-provided testdata
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §B).
  *
  * All readers take the scale-factor directory explicitly so the same query
  * code runs at any SF. Schemas come from the Parquet footers; filters and
  * column projections applied downstream are pushed into the scan by
  * Catalyst (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  /** Per-(session, path) memo of the RESOLVED scan relation (r14 opt:
    * guide §1.2/§6 — `spark.read.parquet` pays a driver-side footer
    * schema-inference pass plus file listing on EVERY call, and a
    * 454-query bench touching 2-4 tables per query re-paid it
    * thousands of times per run). The memo holds the logical PLAN leaf
    * (file index + schema), never rows: every action still scans the
    * parquet from disk, filters/pruning still push down per query —
    * this is the path-based twin of a catalog table's cached
    * relation. Weak session key: entries die with the session, so
    * stopped test sessions never pin stale file indexes. */
  private val scans =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    scans.synchronized {
      val perSession = scans.computeIfAbsent(spark,
        _ => scala.collection.mutable.Map.empty)
      perSession.getOrElseUpdate(s"$dir/$name",
        spark.read.parquet(s"$dir/$name.parquet"))
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever encoding the generator used, and the
    * engine's contract downstream is a session-TZ `TIMESTAMP`. Normalize
    * every encoding seen in the wild here, once, so no query ever touches a
    * raw `ts`:
    *   - `LongType`: Parquet TIMESTAMP(NANOS) read as a raw long
    *     (`spark.sql.legacy.parquet.nanosAsLong=true` — set by every session
    *     builder in this repo). Integer division to micros: ns-since-epoch
    *     ≈ 1.7e18 exceeds double precision, so FP division would corrupt
    *     low bits.
    *   - `TimestampNTZType`: Parquet timestamp[us] with isAdjustedToUTC=
    *     false (pandas/pyarrow default). The session TZ is pinned to UTC by
    *     every builder, so the NTZ→TIMESTAMP cast is a pure re-tag of the
    *     same instant — no value shift.
    *   - `TimestampType`: already the contract; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
