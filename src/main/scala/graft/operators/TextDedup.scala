package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized text-deduplication building blocks (the library surface
  * behind the gated `q_dedup_*` catalog; VERDICT r2 watch item: the
  * corpus-tuned constants are PARAMETERS here, the catalog pins them for
  * its oracles).
  *
  * All sketches are md5-derived so any SQL engine can replay them
  * exactly (the DuckDB oracle does); all join keys produced here are
  * `coalesce`-wrapped non-nullable so join-inferred `isnotnull`
  * constraints fold away instead of inlining sketch expressions into
  * scan filters (PERF.md #2).
  *
  * Scale contract: every candidate generator is a bucketed equi-join —
  * bucket/band keys are the shuffle keys, candidate generation is linear
  * in corpus × bands, and pair joins should go through
  * [[graft.queries.PairJoins]] (bucket-size decision rule in its
  * scaladoc).
  */
object TextDedup {

  /** Distinct word n-gram shingle set per document.
    * @param n shingle width in words (reference default 3) */
  def wordShingles(docs: DataFrame, id: Column, text: Column,
      n: Int = 3): DataFrame =
    docs
      .select(id.as("doc_id"), split(trim(text), "\\s+").as("ws"))
      .repartition(col("doc_id")) // spread HOF sketch work off the scan
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("ws"), i + k)): _*)))
        .as("shingles"))

  /** Distinct character n-gram set per document over normalized text.
    * @param n gram width in characters (default 5) */
  def charGrams(docs: DataFrame, id: Column, text: Column,
      n: Int = 5): DataFrame =
    docs
      .select(id.as("doc_id"),
        lower(graft.functions.GraftFunctions.normalizeWs(text)).as("t"))
      .repartition(col("doc_id"))
      .filter(length(col("t")) >= n)
      .select(col("doc_id"), expr(
        s"array_distinct(transform(sequence(1, length(t) - ${n - 1}), " +
          s"i -> substring(t, i, $n)))").as("grams"))

  /** Four 32-bit slice-minima from one md5 array — slices of one digest
    * act as independent 32-bit hash functions at a quarter of the
    * hashing cost. Slices must stay ≥32 bits (PERF.md #7: 16-bit slices
    * collide far above the Jaccard rate and explode LSH buckets). */
  private[graft] def sliceMins(md5s: Column): Column =
    transform(sequence(lit(0), lit(3)),
      h => array_min(transform(md5s, m => m.substr(h * 8 + 1, lit(8)))))

  /** MinHash signature over a token-set column: `4 * seeds` 32-bit
    * components from `seeds` md5 digests per token (seed s prefixes the
    * token with a distinct salt).
    * @param seeds digests per token, 1..4 (enforced — a silent cap would
    *              hand the caller a narrower signature than requested);
    *              signature width = 4×seeds, so up to 16 components */
  def minhashSignature(tokens: Column, seeds: Int = 2): Column =
    minhashSignature(tokens, seeds, None)

  /** As above, with the seed-"" digest array optionally PRECOMPUTED by
    * the caller (r15 opt): a caller that also needs the raw md5 array
    * (e.g. the argmin-LSH block key is `array_min` of exactly that
    * array) computes it once in its own projection and passes the
    * column here, instead of paying the per-token md5 pass twice. */
  def minhashSignature(tokens: Column, seeds: Int,
      md5s0: Option[Column]): Column = {
    require(seeds >= 1 && seeds <= 4,
      s"seeds must be in 1..4 (got $seeds); signature width is 4*seeds")
    val salts = Seq("", "x", "y", "z").take(seeds)
    concat(salts.map { s =>
      val hashed =
        if (s.isEmpty) md5s0.getOrElse(transform(tokens, t => md5(t)))
        else transform(tokens, t => md5(concat(lit(s), t)))
      sliceMins(hashed)
    }: _*)
  }

  /** LSH banding of a signature: one (band, band_key) row per band, the
    * candidate-join shuffle key. `rowsPerBand` signature components hash
    * into each band key; bands × rowsPerBand must equal the signature
    * width (not statically checkable against a Column — enforced at
    * runtime by null poisoning: `concat`, unlike `concat_ws`, nulls the
    * key when a component index reads past the signature, and the
    * fallback key is UNIQUE PER DOC, so a mis-sized banding yields zero
    * candidate pairs — conspicuous — instead of silently-wrong band
    * statistics). Near-dup probability per band = J^rowsPerBand. */
  def lshBands(sig: DataFrame, bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"bands/rowsPerBand must be >= 1 (got $bands/$rowsPerBand)")
    sig
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("doc_id"), col("band"),
        coalesce(md5(concat(
          (1 to rowsPerBand).map(r =>
            element_at(col("sig"), col("band") * rowsPerBand + r)): _*)),
          concat(lit("invalid-"), col("doc_id").cast("string")))
          .as("band_key"))
  }

  /** Persistable LSH band index — the INCREMENTAL dedup shape: sketch the
    * corpus once, store `(doc_id, band, band_key)` (plus shingles if exact
    * verification is wanted), and every ingest batch dedups against the
    * whole history by equi-joining its own bands to the index on
    * (band, band_key) — no corpus re-sketching, no self-join. The index
    * is append-only (accepted docs' bands append after each batch), which
    * is the same ledger discipline as the incremental-resume pattern
    * (StreamingQueries). At 100 TB: batch side is small, index side is
    * band-key-partitioned; the candidate join shuffles only the batch. */
  def bandIndex(docs: DataFrame, id: Column, text: Column, n: Int = 3,
      seeds: Int = 2, bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    lshBands(
      wordShingles(docs, id, text, n)
        .withColumn("sig", minhashSignature(col("shingles"), seeds))
        .select(col("doc_id"), col("sig")),
      bands, rowsPerBand)

  /** One ingest batch deduped against a persisted band index — the
    * foreachBatch step of streaming near-dup dedup: batch bands
    * equi-join the index on (band, band_key), and only the CANDIDATE
    * history docs are re-shingled (semi-join into the doc store before
    * sketching) for exact-Jaccard verification. Cost scales with the
    * batch and its candidate set, never the corpus — the index side is
    * band-key-partitioned, the batch side is small, and the history
    * text is touched only where a band collided.
    * Returns `(new_doc, seen_doc, jaccard)` at or above `threshold`. */
  def dedupAgainstIndex(batch: DataFrame, batchId: Column,
      batchText: Column, index: DataFrame, seen: DataFrame, seenId: Column,
      seenText: Column, threshold: Double = 0.8, n: Int = 3,
      seeds: Int = 2, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val cand =
      bandIndex(batch, batchId, batchText, n, seeds, bands, rowsPerBand)
        .as("b")
        .join(index.as("c"), col("b.band") === col("c.band") &&
          col("b.band_key") === col("c.band_key"))
        .select(col("b.doc_id").as("new_doc"),
          col("c.doc_id").as("seen_doc"))
        .distinct()
    val shB = wordShingles(batch, batchId, batchText, n)
    val candSeen = seen.select(seenId.as("doc_id"), seenText.as("text"))
      .join(cand.select(col("seen_doc").as("doc_id")), Seq("doc_id"),
        "left_semi")
    val shC = wordShingles(candSeen, col("doc_id"), col("text"), n)
    cand
      .join(shB.as("sb"), col("new_doc") === col("sb.doc_id"))
      .join(shC.as("sc"), col("seen_doc") === col("sc.doc_id"))
      .select(col("new_doc"), col("seen_doc"),
        jaccard(col("sb.shingles"), col("sc.shingles")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash sketch over a token-set column: bit i = majority vote of
    * md5-nibble-i high bits (md5 has exactly 32 nibbles → 32 bits).
    * The md5 array is bound ONCE per row through a single-element-array
    * transform (r15 opt: the straightforward nesting re-ran the whole
    * `transform(tokens, md5)` inside every one of the 32 bit lambdas —
    * 32× the hashing per document, the dominant cost of the simhash
    * sketch pass). */
  def simhash(tokensCol: String): Column =
    coalesce(expr(
      s"""element_at(transform(
         |  array(transform($tokensCol, t -> md5(t))), mds ->
         |  aggregate(
         |    transform(sequence(0, 31), i ->
         |      IF(2 * size(filter(mds, m ->
         |           substring(m, i + 1, 1) IN ('8','9','a','b','c','d','e','f')))
         |         > size($tokensCol),
         |         shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
         |    cast(0 as bigint), (acc, x) -> acc + x)), 1)""".stripMargin),
      lit(0L))

  /** Exact Jaccard between two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Benchmark decontamination: for every training document, the number
    * of distinct word `n`-grams it shares with an evaluation corpus —
    * the standard "drop/flag train docs that contain benchmark text"
    * pipeline step (n-gram overlap, the common n is 8-13 words).
    *
    * Scale shape: the EVAL side is tiny by nature (benchmarks are KBs to
    * MBs), so its distinct gram set broadcasts and the 100 TB train side
    * is a scan → explode → broadcast-hash-join → partial-agg pipeline
    * with no train-side shuffle except the final per-doc count combine.
    * Returns `(doc_id, n_hits)` for CONTAMINATED docs only (n_hits ≥ 1);
    * anti-join the ids to drop them, or join to audit. */
  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — MOSS): k-gram rolling hashes of a (pre-normalized)
    * text column `t`, then the MINIMUM hash of every w-length window,
    * deduplicated and sorted. Guarantee: any match of length
    * ≥ w + k − 1 chars between two documents shares at least one
    * selected fingerprint (proved as a property in OperatorsSpec),
    * while only ~2/(w+1) of all hashes are stored. Pure HOF SQL — the
    * same expression replays in DuckDB for the oracle. */
  def winnowSql(t: String, k: Int = 8, w: Int = 4): String =
    winnowSelectSql(winnowHashesSql(t, k), w)

  /** Window-minimum selection over an ALREADY-COMPUTED hash-array
    * expression/column. Split out of [[winnowSql]] (r8): inlining the
    * hash array into the per-window lambda makes every window position
    * re-derive the whole O(len·k) array — O(len²·k) per document, a
    * measured hang at sf0.1 — and Catalyst's project collapsing
    * re-inlines a plain withColumn split, so callers must pin the hash
    * column behind a lineage cut (see q_text_winnowing) before applying
    * this. */
  def winnowSelectSql(hs: String, w: Int = 4): String =
    s"""array_sort(array_distinct(transform(
       | sequence(1, size($hs) - ${w - 1}),
       | i -> array_min(slice($hs, i, $w)))))"""
      .stripMargin.replace("\n", "")

  /** The k-gram polynomial rolling-hash array behind [[winnowSql]]. */
  def winnowHashesSql(t: String, k: Int = 8): String =
    s"""transform(sequence(1, length($t) - ${k - 1}),
       | i -> aggregate(sequence(i, i + ${k - 1}), cast(0 as bigint),
       |   (acc, j) -> (acc * 31 + ascii(substring($t, j, 1)))
       |     % 1000000007))""".stripMargin.replace("\n", "")

  def contaminationHits(train: DataFrame, trainId: Column, trainText: Column,
      evalDf: DataFrame, evalId: Column, evalText: Column,
      n: Int = 8): DataFrame = {
    import graft.operators.Checkpoints.CutOps
    // Lazy checkpoint BEFORE the explode (the PERF.md #2/#8 pattern):
    // InferFiltersFromGenerate adds `size(shingles) > 0 AND
    // isnotnull(shingles)` above the generator, and predicate pushdown
    // then inlines the whole n-gram transform into the SCAN filter —
    // evaluated twice per row, inside whatever parallelism the raw scan
    // has (a single-file scan = one task; measured 15.7 s vs 1.5 s at
    // sf0.1). The checkpointed leaf pins the shingle relation at the
    // repartitioned parallelism and leaves the inferred filter a cheap
    // array-size test on a materialized column.
    val tg = wordShingles(train, trainId, trainText, n)
      .cutLineage(eager = false)
      .select(col("doc_id"), explode(col("shingles")).as("gram"))
    val eg = wordShingles(evalDf, evalId, evalText, n)
      .cutLineage(eager = false)
      .select(explode(col("shingles")).as("gram")).distinct()
    tg.join(broadcast(eg), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
  }
}
