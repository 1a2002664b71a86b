package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes (builder brief: the
  * operations a large-scale training-data pipeline needs). `rand()` is
  * the wrong tool for corpus construction: a re-run, a retried task, or
  * a different partition count changes the sample, so the dataset is
  * unreproducible and downstream caches/dedups never line up. Both
  * operators here key the randomness on the ROW ID through md5 —
  * identical across runs, engines (the DuckDB oracles replay them
  * byte-for-byte), partitionings, and retries.
  *
  * Scale shape:
  *  - [[hashSample]] is a pure filter — fully pushable, no shuffle, no
  *    state; rate precision is 16 bits (hex-prefix compare).
  *  - [[quotaPerGroup]] is `row_number() <= quota` over a group window —
  *    Spark's WindowGroupLimit rewrites it to a map-side partial top-k
  *    BEFORE the shuffle (PERF.md #5), so a skewed giant source ships at
  *    most `quota` rows per input partition, not its whole group.
  */
object Sampling {

  /** Deterministic per-row sort/selection key: md5 of the id's string
    * form. Lowercase fixed-width hex ⇒ lexicographic order IS numeric
    * order, which both engines share. */
  def hashKey(id: Column): Column = md5(id.cast("string"))

  /** Keep a row iff the first 4 hex chars of its hash sort below
    * `threshold16` — a deterministic Bernoulli(threshold16/65536) sample.
    * @param threshold16 4-char lowercase hex string, e.g. "4000" ≈ 25% */
  def hashSample(df: DataFrame, id: Column, threshold16: String): DataFrame = {
    require(threshold16.matches("[0-9a-f]{4}"),
      s"threshold16 must be 4 lowercase hex chars, got '$threshold16'")
    df.filter(substring(hashKey(id), 1, 4) < threshold16)
  }

  /** First `quota` rows of each group in hash order — a fixed-size,
    * reproducible per-source quota (the mixing primitive: N docs per
    * source regardless of source skew). Ties cannot occur (md5 of
    * distinct ids collides nowhere at these widths; `id` itself breaks
    * the residual tie deterministically anyway). */
  def quotaPerGroup(df: DataFrame, group: Column, id: Column,
      quota: Int): DataFrame = {
    require(quota >= 1, "quota must be >= 1")
    val w = Window.partitionBy(group).orderBy(hashKey(id), id)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
      .drop("sample_rank")
  }

  /** Pack rows into per-group shards of ≈`budget` total `weight` (token
    * budget per training shard): rows take the group's deterministic
    * hash order and a shard closes when its running weight passes the
    * budget. `shard = floor(exclusive-running-sum / budget)` — a row
    * that straddles the boundary belongs to the shard it STARTED in, so
    * every shard holds ≥ 1 row and ≤ budget + max(weight) total.
    *
    * One window over the group partition (running sum; the shuffle key
    * is the group id) — no driver state, no second pass. Deliberately
    * per-GROUP: a single global packing would order the whole corpus
    * through one partition, which is the wrong shape at 100 TB; shard
    * ids are only meaningful within a group (source), and groups pack
    * in parallel. */
  def packShards(df: DataFrame, group: Column, id: Column, weight: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(group).orderBy(hashKey(id), id)
    df.withColumn("shard",
      floor((sum(weight).over(w) - weight).cast("double") / budget)
        .cast("long"))
  }

  /** Corpus mixture: draw a `budget`-row sample whose group composition
    * follows `weights` (the data-mixture primitive — "50% en, 30% de,
    * 20% fr"). Each group's quota is `round(budget × weight)`; members
    * are taken in deterministic hash order, so re-runs, engines and
    * repartitions agree row-for-row. Groups outside `weights` drop.
    *
    * Scale: the rank filter is split so the LITERAL max-quota bound is
    * its own conjunct — Spark's WindowGroupLimit rewrite picks it up and
    * caps every input partition at max-quota rows map-side BEFORE the
    * group shuffle; the per-group quota residual then filters exactly. */
  def mixture(df: DataFrame, group: Column, id: Column,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.nonEmpty && budget >= 1, "need weights and budget >= 1")
    val quotas = weights.toSeq.map { case (g, p) =>
      g -> math.round(budget * p)
    }
    val maxQuota = quotas.map(_._2).max
    val quotaCol = quotas.foldLeft(lit(null).cast("long")) {
      case (acc, (g, q)) => when(group === g, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(group).orderBy(hashKey(id), id)
    df.withColumn("quota", quotaCol)
      .filter(col("quota").isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= maxQuota)   // literal → WindowGroupLimit
      .filter(col("sample_rank") <= col("quota"))
      .drop("quota", "sample_rank")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis): row i
    * wins with probability ∝ `weight` via the exponential race key
    * −ln(u_i)/w_i with u_i a DETERMINISTIC per-row uniform — the first 8
    * md5 hex chars as a 32-bit fraction — so the draw is reproducible
    * and engine-replayable (both engines parse the hex and fold the same
    * doubles). Global top-k by race key = one TakeOrderedAndProject, no
    * full sort. */
  def weighted(df: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = (conv(substring(hashKey(id), 1, 8), 16, 10).cast("long")
      .cast("double") / 4294967296.0)
    df.withColumn("race_key", -log(u) / weight.cast("double"))
      .orderBy(col("race_key"), id)
      .limit(k)
  }
}
