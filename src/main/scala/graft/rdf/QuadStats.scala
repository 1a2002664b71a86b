package graft.rdf

import org.apache.spark.sql.DataFrame

/** Per-store predicate-cardinality statistics for BGP join ordering —
  * the statistics step every RDF store runs at load time (GraphDB and
  * TDB2 both collect predicate histograms during their bulk import; the
  * reference preloads exactly such a store, README "importrdf
  * preload"). Collected ONCE per preloaded quad relation — one
  * aggregation over the already-materialized blocks, driver state is
  * one small map (one entry per distinct predicate; RDF corpora have
  * tens of predicates regardless of row count, so this is O(schema),
  * not O(data), at 100 TB too).
  *
  * [[Bgp.select]] consults the stats as a REFINEMENT of its structural
  * selectivity ranking (Stocker et al. WWW'08): patterns with the same
  * bound-term shape order by actual predicate cardinality, so a query
  * written common-predicate-first still seeds its join with the rarest
  * pattern. Ordering is a pure plan-shape choice — joins commute — so
  * absent stats (ad-hoc relations, the DSv2 store path) everything
  * falls back to the structural rank alone.
  */
object QuadStats {

  /** Keyed by DataFrame identity: the preloaded store relation is a
    * per-(session, dir) singleton, so identity is exactly the store;
    * weak keys die with the relation. */
  private val cache =
    new java.util.WeakHashMap[DataFrame, Map[String, Long]]()

  /** Collect predicate counts for `quads` (idempotent; one count-by-key
    * aggregation on first call) and return the same relation. */
  def register(quads: DataFrame): DataFrame = {
    val have = cache.synchronized(cache.containsKey(quads))
    if (!have) {
      val m = quads.groupBy("predicate").count().collect()
        .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
        .toMap
      cache.synchronized(cache.put(quads, m))
    }
    quads
  }

  /** Attach ALREADY-COLLECTED statistics (read from a persisted
    * store's sidecar — [[QuadStore.open]]) without any aggregation:
    * a fresh session serving a durable store must not pay a corpus
    * pass to recover what the bulk load already counted. */
  def registerPrecomputed(quads: DataFrame,
      m: Map[String, Long]): DataFrame = {
    cache.synchronized(cache.put(quads, m))
    quads
  }

  def lookup(quads: DataFrame): Option[Map[String, Long]] =
    cache.synchronized(Option(cache.get(quads)))
}
