package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the explicit skew-join rewrite (SURVEY §4
  * "Parallelism/partitioning"; PERF.md #3 documents the same decision for
  * LSH pair joins via `queries/PairJoins`). AQE's skew-join split handles
  * byte-skew it can SEE at shuffle time; salting is the planned variant
  * for keys known to be pathological up front (a handful of join keys
  * carrying a large share of the probe rows — the celebrity-key shape).
  *
  * Mechanics: every probe row gets a deterministic salt in [0, r) derived
  * from a caller-chosen high-cardinality column (never `rand()` — reruns
  * and retried tasks must salt identically), widening the hot key into r
  * shuffle keys; the build side replicates each row r ways so every
  * (key, salt) probe partition finds its build rows locally. Cost: build
  * is shipped r×, so keep r modest and the build side slim. The result is
  * provably the plain inner join — the gated catalog query's oracle
  * replays it unsalted.
  */
object SkewJoin {

  /** Inner-join `probe` to `build` on `key`, spreading each probe key over
    * `r` salted shuffle partitions. `saltSrc` must be deterministic per
    * probe row (e.g. the probe's primary key). */
  def salted(probe: DataFrame, build: DataFrame, key: String,
      saltSrc: Column, r: Int): DataFrame = {
    require(r >= 1, s"salt fan-out must be >= 1, got $r")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(r.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(r - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
