package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared skew handling for bucketed pair self-joins (dedup and ANN
  * catalogs). ONE utility, TWO documented mechanisms — pick by expected
  * bucket size, which is a property of the bucket KEY's construction:
  *
  *  - [[salted]] — for FEW, LARGE buckets (coarse keys: 16 sign-LSH
  *    buckets, 256-value simhash bands, argmin-LSH blocks). A bucket
  *    holding B rows yields B²/2 candidate pairs on ONE shuffle
  *    partition; the salt spreads them over SaltR partitions. AQE can't
  *    help: the partition is small in BYTES but quadratic in COMPUTE.
  *    Cost: the build side is replicated ×SaltR — only worth paying when
  *    B² dominates.
  *
  *  - [[probeSpread]] — for MANY, TINY buckets (fine keys: md5 band
  *    digests, where a bucket is one near-dup cluster, typically < 10
  *    rows). Replication would multiply the relation ×SaltR for pair
  *    lists that are already tiny — observed 15 s vs 2 s at sf0.1 when
  *    the ×32 exploded side additionally became a driver-built broadcast
  *    (round-4 bench). Instead the PROBE side hash-partitions by row key,
  *    spreading every bucket's pair generation across the cluster, and
  *    the unreplicated build side broadcasts (sketch-width rows only).
  *
  * Each (probe, build) pair matches exactly one salt value in [[salted]]
  * and exactly once in [[probeSpread]] — no duplicates, no misses.
  */
private[queries] object PairJoins {
  /** Default salt count ≈ cores per skewed bucket's pair work; a
    * parameter (VERDICT r2 watch item), sized so B²/2 pair generation
    * for the biggest expected bucket spreads to ~R tasks. */
  val SaltR = 32

  def salted(df: DataFrame, key: Column,
      r: Int = SaltR): (DataFrame, DataFrame) = (
    df.withColumn("salt", pmod(key, lit(r.toLong))),
    df.withColumn("salt", explode(sequence(lit(0L), lit(r - 1L)))))

  /** The build side is broadcast EXPLICITLY: the mechanism's whole point
    * is that pair generation happens map-side on the key-spread probe —
    * if the planner fell back to a sort-merge join it would re-shuffle
    * both sides by bucket key and waste the probe repartition entirely.
    * Beyond broadcast size, don't use probeSpread at all: tiny buckets
    * mean a plain bucket-keyed shuffle join has no compute skew to fix. */
  def probeSpread(df: DataFrame, key: Column): (DataFrame, DataFrame) =
    (df.repartition(key), broadcast(df))
}
