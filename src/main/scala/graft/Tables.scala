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
  /** Global path→schema memo (r15 rework of the r14 resolved-scan memo;
    * ADVICE r14 medium): `spark.read.parquet` with no user schema pays a
    * driver-side footer schema-inference pass on EVERY call, and a
    * 454-query bench touching 2-4 tables per query re-paid it thousands
    * of times per run. Memoizing the inferred SCHEMA (a plain
    * StructType — no session, no file index, no rows) keeps that win
    * while fixing what the r14 memo got wrong: the old
    * WeakHashMap[SparkSession, DataFrame] values strongly referenced
    * their session key through queryExecution, so per-query
    * `newSession()` callers pinned a SessionState forever, and repeated
    * calls returned the IDENTICAL Dataset instance (latent
    * ambiguous-self-join trap). Now every call builds a fresh relation
    * from the memoized schema: file listing is re-done per call (these
    * are single-file tables — trivial), so in-session overwrites are
    * picked up, and each call gets fresh expression ids.
    *
    * The key includes the nanosAsLong legacy flag because it changes
    * what inference RETURNS for TIMESTAMP(NANOS) columns (LongType vs a
    * failure) — two sessions differing on that flag must not share an
    * entry. */
  private val schemas = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .getOrElse("false") + "|" + path
    val schema = schemas.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
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
