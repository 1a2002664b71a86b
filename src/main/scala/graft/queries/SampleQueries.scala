package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Deterministic corpus sampling over `documents` (training-data mixing
  * primitives — see [[graft.operators.Sampling]] for why `rand()` is
  * banned here). Oracles replay the md5 keys byte-for-byte in DuckDB. */
object SampleQueries extends QueryCatalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hash-Bernoulli: a pure pushable filter — the shape that thins
    // 100 TB to a working set without a shuffle. ~25% at "4000".
    "q_sample_hash" -> ((s, dir) => {
      Sampling.hashSample(Tables.documents(s, dir), col("doc_id"), "4000")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Per-source quota: 5 docs per source in hash order — fixed-size
    // reproducible mix regardless of source skew. WindowGroupLimit
    // turns the rank filter into a map-side partial top-k (PERF.md #5).
    "q_sample_quota" -> ((s, dir) => {
      Sampling.quotaPerGroup(Tables.documents(s, dir), col("source"),
          col("doc_id"), quota = 5)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Stable train/val/test split: the first two hex chars of the row
    // hash partition [0,256) into ~80/10/10 — every engine, run, and
    // partitioning assigns each doc the same split, so eval sets never
    // bleed into train across reruns (the failure mode of rand() splits).
    "q_sample_split" -> ((s, dir) => {
      val h2 = substring(Sampling.hashKey(col("doc_id")), 1, 2)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          when(h2 < "cc", "train").when(h2 < "e6", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic negative sampling — the training-pair generator of
    // every two-tower / matrix-factorization recommender: for each
    // sampled user, mint 8 pseudo-random candidate items from the md5
    // counter stream (rerun/engine/partitioning-invariant, like every
    // sample here) and anti-join away true interactions, leaving
    // verified negatives. Scale shape: candidate generation is a
    // projection (8 rows per user, no shuffle); the only exchange is
    // the (user, item)-keyed anti-join against the interaction
    // relation — the join every negative-sampler needs anyway, and it
    // stays an equi-join at any corpus size. Item universe rides in as
    // a broadcast single-row max (TPC-H part keys are dense 1..P).
    "q_sample_negatives" -> ((s, dir) => {
      val inter = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("item"))
        .distinct()
      val np = Tables.part(s, dir).agg(max(col("p_partkey")).as("np"))
      val users = inter.select(col("u")).distinct()
        .filter(col("u") % 100 === 0)
      users.crossJoin(broadcast(np))
        .withColumn("j", explode(sequence(lit(1), lit(8))))
        .withColumn("item",
          (conv(substring(md5(concat_ws(":", col("u"), col("j"))), 1, 8),
            16, 10).cast("long") % col("np")) + 1)
        .join(inter, Seq("u", "item"), "left_anti")
        .select(col("u"), col("j"), col("item"))
        .orderBy(col("u"), col("j"))
    }),

    // Stratified k-fold assignment — the cross-validation twin of
    // q_sample_split: within each language stratum, docs take folds
    // round-robin in deterministic hash order, so every fold holds
    // ⌈n/k⌉ or ⌊n/k⌋ docs of EVERY stratum (exact balance, which a
    // plain hash-mod-k split only approximates) and the assignment is
    // engine/run/partitioning-invariant. One stratum-keyed window; at
    // extreme stratum sizes the rank goes range-partitioned via
    // GlobalRank like every other global ordering in this catalog.
    "q_sample_kfold" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(Sampling.hashKey(col("doc_id")), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("fold", ((row_number().over(w) - 1) % 5).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Shard packing: documents → per-source training shards of ≈200
    // whitespace tokens, deterministic hash order (Sampling.packShards —
    // one running-sum window per source, no driver state).
    "q_sample_pack_shards" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      Sampling.packShards(docs, col("source"), col("doc_id"), col("tok"),
          budget = 200L)
        .select(col("source"), col("doc_id"), col("tok"), col("shard"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Corpus mixture: 200 docs at 50% en / 30% de / 20% fr (the
    // data-mixture spec of a training run), per-language members in
    // deterministic hash order; languages outside the mix drop.
    "q_sample_mixture" -> ((s, dir) => {
      Sampling.mixture(Tables.documents(s, dir), col("lang"), col("doc_id"),
          weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2),
          budget = 200L)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Temperature-scaled mixing (the Gopher/PaLM data-mix rule): source
    // quotas ∝ cnt^(1/T) with T = 2 (sqrt), flattening the language
    // skew — rare languages are upweighted relative to proportional
    // sampling, without the fixed hand-set weights of q_sample_mixture.
    // The allocation relation is group-cardinality (broadcast); rows
    // fill quotas in deterministic md5-hash order. The quota share is
    // 6-dp-rounded BEFORE the floor so the tiny engine-order difference
    // in the 5-term weight sum can never flip an integer boundary.
    "q_sample_temperature" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(sqrt(col("cnt").cast("double"))).as("wsum"))
      val alloc = counts.crossJoin(broadcast(tot))
        .select(col("lang"), greatest(lit(1L),
          floor(round(lit(200) * sqrt(col("cnt").cast("double")) /
            col("wsum"), 6)).cast("long")).as("alloc"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(Sampling.hashKey(col("doc_id")), col("doc_id"))
      docs.join(broadcast(alloc), Seq("lang"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("alloc"))
        .select(col("lang"), col("doc_id"), col("alloc"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Importance-weighted draw: 50 docs with probability ∝ length
    // (n_chars) via the deterministic exponential race
    // (Sampling.weighted) — the upweight-long-documents mixing knob.
    "q_sample_weighted" -> ((s, dir) => {
      Sampling.weighted(Tables.documents(s, dir), col("doc_id"),
          col("n_chars"), k = 50)
        .select(col("doc_id"), col("n_chars"),
          round(col("race_key"), 9).as("race_key"))
        .orderBy(col("race_key"), col("doc_id"))
    }),

    // Proportionally-stratified sample: each source's allocation is
    // computed FROM the data (⌊100·n_g/N⌋, floor-1 minimum so no stratum
    // vanishes) and rows fill it in hash order — unlike the fixed-quota
    // sampler above, the mix tracks the corpus composition. Allocation
    // math is INTEGER division (engine-exact, no float rounding to
    // diverge); the allocation relation is group-cardinality and
    // broadcasts onto the ranked stream.
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      val tot = docs.agg(count(lit(1)).as("total"))
      val alloc = counts.crossJoin(broadcast(tot))
        .select(col("source"),
          greatest(lit(1L), expr("100 * cnt div total")).as("alloc"))
      val w = Window.partitionBy(col("source"))
        .orderBy(Sampling.hashKey(col("doc_id")), col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .join(broadcast(alloc), Seq("source"))
        .filter(col("rn") <= col("alloc"))
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Importance (acceptance) sampling: keep each document with
    // probability ∝ its length — the quality-weighted corpus thinning
    // step (upsample what matters without materializing weights or a
    // global sort). The per-row coin is the Knuth multiplicative hash
    // u = (id·2654435761) mod 2¹⁶, accepted iff u·max_w < w·2¹⁶ — ALL
    // INTEGER math, so both engines decide every row identically; only
    // the single-row max weight broadcasts. Acceptance audit per
    // source rides out with exact counts.
    "q_sample_importance" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val mx = docs.agg(max(col("n_chars")).as("max_w"))
      docs.crossJoin(broadcast(mx))
        .withColumn("u", (col("doc_id") * 2654435761L) % 65536L)
        .withColumn("accept",
          col("u") * col("max_w") < col("n_chars") * 65536L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("accept"), 1L).otherwise(0L)).as("n_accepted"),
          round(avg(col("n_chars")), 6).as("avg_chars_all"),
          round(avg(when(col("accept"), col("n_chars"))), 6)
            .as("avg_chars_accepted"))
        .orderBy(col("source"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |ORDER BY doc_id""".stripMargin,
    "q_sample_quota" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT source, doc_id FROM ranked WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,
    "q_sample_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |         THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sample_negatives" ->
      """WITH inter AS (
        |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |np AS (SELECT max(p_partkey) AS np FROM part),
        |users AS (SELECT DISTINCT u FROM inter WHERE u % 100 = 0),
        |cand AS (
        |  SELECT u, CAST(j AS INT) AS j,
        |    (('0x' || substring(md5(CAST(u AS VARCHAR) || ':' ||
        |        CAST(j AS VARCHAR)), 1, 8))::BIGINT
        |      % (SELECT np FROM np)) + 1 AS item
        |  FROM users, unnest(range(1, 9)) AS t(j))
        |SELECT u, j, item FROM cand
        |WHERE NOT EXISTS (SELECT 1 FROM inter i
        |                  WHERE i.u = cand.u AND i.item = cand.item)
        |ORDER BY u, j""".stripMargin,

    "q_sample_kfold" ->
      """SELECT doc_id, lang,
        |  CAST((row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5
        |    AS INT) AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, tok,
        |    sum(tok) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
        |  FROM t)
        |SELECT source, doc_id, CAST(tok AS BIGINT) AS tok,
        |  CAST(floor((cum - tok) / 200.0) AS BIGINT) AS shard
        |FROM r ORDER BY source, doc_id""".stripMargin,
    "q_sample_temperature" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        |tot AS (SELECT sum(sqrt(cnt::DOUBLE)) AS wsum FROM counts),
        |alloc AS (
        |  SELECT lang, greatest(CAST(1 AS BIGINT),
        |    CAST(floor(round(200 * sqrt(cnt::DOUBLE) / wsum, 6))
        |      AS BIGINT)) AS alloc
        |  FROM counts, tot),
        |ranked AS (
        |  SELECT d.lang, d.doc_id, a.alloc,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        |  FROM documents d JOIN alloc a USING (lang))
        |SELECT lang, doc_id, alloc FROM ranked WHERE rn <= alloc
        |ORDER BY lang, doc_id""".stripMargin,

    "q_sample_mixture" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 60
        |      WHEN 'fr' THEN 40 END AS quota,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents WHERE lang IN ('en', 'de', 'fr'))
        |SELECT lang, doc_id FROM ranked WHERE rn <= quota
        |ORDER BY lang, doc_id""".stripMargin,
    "q_sample_weighted" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |          ::BIGINT)::DOUBLE / 4294967296.0)
        |      / n_chars::DOUBLE AS rk_raw
        |  FROM documents),
        |top AS (SELECT * FROM keyed ORDER BY rk_raw, doc_id LIMIT 50)
        |SELECT doc_id, n_chars, round(rk_raw, 9) AS race_key
        |FROM top ORDER BY race_key, doc_id""".stripMargin,

    "q_sample_stratified" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
        |tot AS (SELECT COUNT(*) AS total FROM documents),
        |alloc AS (
        |  SELECT source, greatest(1, (100 * cnt) // total) AS alloc
        |  FROM counts, tot),
        |ranked AS (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT r.source, r.doc_id
        |FROM ranked r JOIN alloc a ON r.source = a.source
        |WHERE r.rn <= a.alloc
        |ORDER BY r.source, r.doc_id""".stripMargin,

    "q_sample_importance" ->
      """WITH mx AS (SELECT max(n_chars) AS max_w FROM documents),
        |flagged AS (
        |  SELECT source, n_chars,
        |    ((doc_id * 2654435761) % 65536) * max_w
        |      < n_chars * 65536 AS accept
        |  FROM documents, mx)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN accept THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_accepted,
        |  round(AVG(n_chars), 6) AS avg_chars_all,
        |  round(AVG(CASE WHEN accept THEN n_chars END), 6)
        |    AS avg_chars_accepted
        |FROM flagged GROUP BY source ORDER BY source""".stripMargin
  )
}
