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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw long (`spark.sql.legacy.parquet.nanosAsLong=true` — set
    * by every session builder in this repo). Normalize it here to a proper
    * timestamp via *integer* division to micros: ns-since-epoch ≈ 1.7e18
    * exceeds double precision, so FP division would corrupt low bits.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
