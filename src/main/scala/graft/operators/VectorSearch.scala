package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameterized similarity-search building blocks (the library surface
  * behind the gated `q_ann_*` / `q_dedup_embedding` catalog; VERDICT r2
  * watch item — LSH bits, vector dim, hyperplane seed are parameters
  * here, pinned by the catalog for its oracles).
  *
  * All dot products go through the native codegen expression
  * [[graft.plans.DotProduct]] (`graft_dot`) — one static-call primitive
  * loop per row, bit-identical to the HOF `aggregate(zip_with(...))`
  * chain and to the DuckDB oracle's list comprehension.
  */
object VectorSearch {

  /** `graft_dot(a, b)` as SQL — register via [[withNorm]] or
    * [[graft.plans.DotProduct.register]] first on plain sessions. */
  def dotSql(a: String, b: String): String = s"graft_dot($a, $b)"

  /** Vectors with the L2 norm precomputed ONCE per vector — cosine per
    * candidate pair is then a single dot product, not three (the
    * O(pairs × dim) term is the whole verify cost at scale). The norm is
    * `coalesce`d non-nullable so join-inferred `isnotnull` constraints
    * can't push the fold into the scan (PERF.md #2). */
  def withNorm(s: SparkSession, emb: DataFrame, id: Column,
      embedding: Column): DataFrame = {
    graft.plans.DotProduct.register(s)
    emb
      .select(id.as("vec_id"), embedding.as("embedding"))
      .repartition(col("vec_id")) // spread vector math off a one-split scan
      .select(col("vec_id"), col("embedding"),
        coalesce(expr(s"sqrt(${dotSql("embedding", "embedding")})"), lit(0d))
          .as("nrm"))
  }

  /** Deterministic pseudo-random hyperplane `b` as a SQL array literal —
    * component j is a Knuth multiplicative hash of (b, j), evaluated at
    * plan-build time so any SQL engine replays it exactly.
    * @param dim vector dimensionality (the corpus's, default 64) */
  def hyperplaneSql(b: Int, dim: Int = 64): String = {
    val vals = (1 to dim)
      .map(j => s"${(((b * dim + j) * 2654435761L) % 1000 - 500).toDouble}D")
    s"array(${vals.mkString(",")})"
  }

  /** Random-hyperplane sign-LSH bucket id: bit b = sign of the dot with
    * hyperplane b. More bits → smaller buckets (2^bits of them); pair
    * that with multi-probe at higher corpus sizes.
    *
    * The hyperplanes are `dim`-long literals, so a vector of any OTHER
    * length gets a NULL bucket (graft_dot nulls on length mismatch and
    * the explicit size gate keeps it null rather than letting
    * `IF(null > 0, …, 0)` default every bit to 0) — a mis-declared dim
    * surfaces as null buckets instead of silently collapsing the whole
    * corpus into bucket 0 and turning the LSH join quadratic.
    * @param bits signature width (default 4 → 16 buckets)
    * @param dim  vector dimensionality; must match the data */
  def signLshBucketSql(e: String, bits: Int = 4, dim: Int = 64): String = {
    val bucket = (0 until bits)
      .map(b => s"IF(graft_dot($e, ${hyperplaneSql(b, dim)}) > 0, ${1 << b}, 0)")
      .mkString("(", " + ", ")")
    s"IF(size($e) = $dim, $bucket, CAST(NULL AS INT))"
  }
}
