package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared skew-proof pair-join salting (used by the dedup and ANN
  * catalogs): the probe side carries `salt = key % R`, the build side is
  * replicated once per salt value, and the salt joins as an extra equi
  * key — a bucket holding B rows spreads its B²/2 candidate pairs over R
  * shuffle partitions instead of one. AQE's skew-join can't help here:
  * the skewed partition is small in BYTES but quadratic in COMPUTE, so
  * the salt is explicit. Each (probe, build) pair matches exactly one
  * salt value — no duplicates, no misses. */
private[queries] object PairJoins {
  val SaltR = 32

  def salted(df: DataFrame, key: Column): (DataFrame, DataFrame) = (
    df.withColumn("salt", pmod(key, lit(SaltR.toLong))),
    df.withColumn("salt", explode(sequence(lit(0L), lit(SaltR - 1L)))))
}
