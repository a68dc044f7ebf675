package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), token-bag normalization, n-gram Jaccard,
  * MinHash+LSH banding, SimHash. Designed scale-first:
  *
  *  - exact/normalized dedup = one shuffle on a 128-bit hash (no full-text
  *    comparison crosses the wire);
  *  - MinHash/LSH = narrow signature map + shuffle on (band, bandHash)
  *    buckets only — candidate pairs are generated per-bucket, never the
  *    O(n²) cross join;
  *  - Jaccard verification joins only the candidate pairs.
  *
  * All stages are built-in expressions (codegen'd); no UDFs.
  */
object Dedup {

  /** Exact duplicates: rows sharing md5(text). Keeps the minimum-id row per
    * group (`is_kept`), reports group size.
    *
    * min-id + size come from an AGGREGATE, not a window: `row_number`
    * over the fp partitioning SORTS every group in one task — a
    * boilerplate mega-group (the exact thing a dedup op exists to find)
    * becomes the straggler. The aggregate's map-side partials keep one
    * (min, count) pair per fp per partition, and the flag join re-keys
    * without sorting anything.
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    keepMinId(docs.select(id.as("doc_id"), md5(text).as("fp")))

  /** Normalized (token-bag) duplicates: same pipeline keyed on the sorted
    * token multiset hash — catches word-order shuffles.
    */
  def normalized(docs: DataFrame, id: Column, text: Column): DataFrame =
    keepMinId(docs.select(id.as("doc_id"),
      TextAnalysis.normalizedHash(text).as("fp")))

  /** (doc_id, fp) → + (group_n, is_kept = id == min id of the fp group),
    * sort-free (see [[exact]]). The flag join is NULL-SAFE (`<=>`): a
    * NULL fp (null text) forms one group exactly as the window's
    * partitionBy did — a plain equi-join would silently drop those rows.
    */
  private def keepMinId(keyed: DataFrame): DataFrame = {
    val stats = keyed.groupBy(col("fp")).agg(
      min(col("doc_id")).as("__min_id"), count(lit(1)).as("group_n"))
    keyed.alias("k")
      .join(stats.alias("s"), col("k.fp") <=> col("s.fp"))
      .select(col("k.doc_id").as("doc_id"), col("k.fp").as("fp"),
        col("s.group_n").as("group_n"),
        (col("k.doc_id") === col("s.__min_id")).as("is_kept"))
  }

  /** The (doc_id, shingle) relation: distinct character shingles per doc.
    * Dedup happens PER DOCUMENT via `array_distinct` on the shingle array
    * BEFORE the explode — a map-side operation, where a post-explode
    * `distinct()` would shuffle the whole exploded relation just to remove
    * within-doc repeats (shingles are already doc-scoped, so the global
    * and per-doc distinct produce the same rows).
    */
  def shingles(docs: DataFrame, id: Column, text: Column,
      len: Int = 16, stride: Int = 4): DataFrame =
    docs.select(id.as("doc_id"),
        TextAnalysis.charShingles(text, len, stride).as("shs"))
      .select(col("doc_id"), explode(array_distinct(col("shs"))).as("sh"))

  /** The (doc_id, shingle-hash) relation, deduped per doc AFTER hashing:
    * `array_distinct` compares 8-byte longs instead of 16-char strings,
    * and runs map-side on each doc's own array — no shuffle at all (the
    * previous global `distinct()` was the single most expensive exchange
    * in the shingle family; per-doc dedup produces the identical relation
    * because shingle rows are doc-scoped). Within-doc hash collisions
    * merge two distinct shingles (~shingles²/2⁶⁴ per doc — negligible,
    * same concession the hash-keyed joins already make). Shared subplan
    * for Jaccard df-capping, pair intersection, and MinHash signatures.
    *
    * `portable = true` swaps xxhash64 for the [[portableHash64]] md5 fold
    * so the same hashes are reproducible in the DuckDB oracle.
    *
    * r13: shingle + hash + per-doc dedup run as ONE codegen'd loop
    * ([[graft.functions.ShingleHashesExpr]], property-gated equal to the
    * composed `array_distinct(transform(charShingles, hash))` chain) —
    * `transform` is a HigherOrderFunction and evaluates INTERPRETED per
    * element, which dominated the shingle family's scan stages.
    */
  def hashedShingles(docs: DataFrame, id: Column, text: Column,
      len: Int = 16, stride: Int = 4, portable: Boolean = false): DataFrame =
    docs.select(id.as("doc_id"),
      explode(shingleHashes(text, len, stride, portable,
        distinct = true)).as("shh"))

  /** [[hashedShingles]] with the per-doc set size RIDING the projection:
    * `size(arr)` is known BEFORE the explode, so (doc_id, shh, n_sh)
    * costs zero extra exchanges — where sizing the exploded relation is
    * a groupBy + join-back (two exchanges per side, measured ~1.5 s of
    * q102's sf1 wall before this). The hashed array is STAGED as its own
    * attribute (consumed twice: explode + size), per the HOF-staging
    * rule.
    */
  private[graft] def hashedShinglesWithSize(docs: DataFrame, id: Column,
      text: Column, len: Int = 16, stride: Int = 4,
      portable: Boolean = false): DataFrame =
    docs.select(id.as("doc_id"),
        shingleHashes(text, len, stride, portable,
          distinct = true).as("__shs"))
      .select(col("doc_id"), explode(col("__shs")).as("shh"),
        size(col("__shs")).cast("long").as("n_sh"))

  /** Column wrapper over [[graft.functions.ShingleHashesExpr]] — the
    * fused `array_distinct(transform(charShingles(text), hash))` loop
    * shared by [[hashedShingles]], [[hashedShinglesWithSize]] and
    * [[minhashSigArray]].
    */
  private[graft] def shingleHashes(text: Column, len: Int, stride: Int,
      portable: Boolean, distinct: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge
    ExprBridge.column(graft.functions.ShingleHashesExpr(
      ExprBridge.expr(text), len, stride, portable, distinct))
  }

  /** Portable 60-bit hash: the first 15 hex chars of md5, parsed base-16.
    * Both engines spell it exactly — Spark as the fused
    * [[graft.functions.Md5FoldExpr]] (property-gated equal to
    * `conv(substr(md5(x),1,15),16,10)`, whose per-row hex-string round
    * trip was pure overhead on 12 M-row shingle relations), DuckDB
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` — so hash-keyed
    * pipelines (MinHash signatures, SimHash bit votes) are
    * oracle-checkable end to end. 15 hex chars = 60 bits keeps the value
    * positive in a signed long with headroom for modular arithmetic.
    */
  def portableHash64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge
    ExprBridge.column(graft.functions.Md5FoldExpr(
      ExprBridge.expr(c.cast("binary"))))
  }

  /** The composed-builtin spelling of [[portableHash64]] — the
    * property-test oracle for the fused expression (never used in a hot
    * path).
    */
  private[graft] def portableHash64Composed(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Exact n-gram Jaccard pairs above a threshold, over shingles with
    * document frequency <= `maxDf`. The df cap drops corpus-common shingles
    * before the self-join — the standard guard that keeps the pair blowup
    * proportional to true near-dups instead of O(hot-shingle²); near-dup
    * pairs share plenty of rare shingles, so recall is unaffected at any
    * realistic threshold. At 100 TB you'd feed this only LSH candidates
    * (see [[minhashCandidates]]); on its own it is the oracle-checkable
    * exact form.
    */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double, len: Int = 16, stride: Int = 4,
      maxDf: Int = 50): DataFrame =
    shinglePairStats(docs, id, text, len, stride, maxDf)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
        col("n_b"), col("jaccard"))

  /** Directed CONTAINMENT pairs over the same shingle statistics:
    * `cont_a = |A∩B|/|A|` (how much of doc a lives inside doc b) and the
    * mirror `cont_b`; a pair survives when EITHER direction clears
    * `threshold`. Containment is what Jaccard misses at unequal sizes —
    * a tweet quoted whole inside a long article has near-zero Jaccard
    * (the union is article-sized) but containment ~1 for the tweet — so
    * this is the sub-document/boilerplate-inclusion dedup signal
    * (Broder's containment coefficient, the original resemblance paper's
    * second measure). Same df-capped shingle relation, same single
    * shuffle shape as [[jaccardPairs]] (shared core, so the cap and join
    * key cannot drift).
    */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double, len: Int = 16, stride: Int = 4,
      maxDf: Int = 50): DataFrame =
    shinglePairStats(docs, id, text, len, stride, maxDf)
      .withColumn("cont_a",
        col("inter").cast("double") / col("n_a").cast("double"))
      .withColumn("cont_b",
        col("inter").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
        col("n_b"), col("cont_a"), col("cont_b"))

  /** Shared pair-statistics core of [[jaccardPairs]] /
    * [[containmentPairs]]: df-capped shingle self-join → one row per
    * colliding doc pair with the intersection size and both (capped)
    * set sizes. See the in-body notes for why the cap is a window and
    * the sizes ride the join.
    */
  private def shinglePairStats(docs: DataFrame, id: Column, text: Column,
      len: Int, stride: Int, maxDf: Int): DataFrame = {
    // The join/df-cap key is the 64-bit shingle hash, not the 16-char
    // string: half the shuffle bytes and a long-vs-long compare; two
    // distinct shingles of one doc pair colliding (~n²/2⁶⁴) is negligible.
    // NOT cached (r13): since the r12 bridge checkpoint landed below the
    // df-cap window, this relation has exactly ONE consumer in the plan
    // (the window) — the cache was a full extra materialization of the
    // 12 M-row shingle relation into the storage pool per invocation,
    // kept only for cross-query plan sharing that the checkpoint already
    // absorbs (q34/q115 share nothing above the checkpoint barrier).
    val allSh = hashedShingles(docs, id, text, len, stride)
    // df cap via a WINDOW on shh, not aggregate-then-join: the one shh
    // exchange it costs is the SAME clustering the self-join below
    // requires, so the df filter, the capped relation and both self-join
    // sides ride a single shuffle+sort of the shingle relation — the
    // aggregate-then-join form re-shuffled 12 M rows against a ~10 M-key
    // df relation just to apply the cap (7.0 s → 3.7 s at sf1)
    val sh0 = allSh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shh"))))
      .filter(col("df") <= maxDf).drop("df")
    // materialize the CAPPED relation once (r12): ReuseExchange shares
    // the shh exchange across this relation's consumers (sizes agg +
    // both self-join sides), but NOT the Sort+Window above it — each
    // consumer re-sorted and re-windowed the full shingle relation
    // (q115's plan ran the 12 M-row window 4×). The bridge checkpoint
    // keeps the window's shh hash partitioning AND its partition-local
    // shh sort, so both self-join sides plan exchange- AND sort-free.
    val sh = org.apache.spark.sql.graftbridge.CheckpointBridge
      .checkpointPartitioned(sh0)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // n_sh rides INTO the self-join so the denominators fall out of the
    // pair aggregation itself (the pre-r6 shape joined `sizes` onto the
    // PAIR relation twice; colliding pairs outnumber capped shingles —
    // 4.7 M pairs vs 1.8 M shingle rows at sf1). No broadcast hint: the
    // size relation is one row per DOC (corpus-sized at 100 TB), so AQE
    // broadcasts it at test SF and shuffle-joins past broadcast scale.
    val shN = sh.join(sizes, "doc_id")
    shN.as("a").join(shN.as("b"),
        col("a.shh") === col("b.shh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"), max(col("a.n_sh")).as("n_a"),
        max(col("b.n_sh")).as("n_b"))
  }

  /** MDM-style blocked fuzzy match: pairs within one blocking-key group
    * whose `key` columns are within levenshtein `maxDist`. Shared by the
    * q64 pair query and the q75 dedup endgame so per-pair cost fixes
    * cannot drift apart.
    *
    * Candidate generation is a PassJoin-style SEGMENT filter (Li, Deng &
    * Feng, "PASS-JOIN: a partition-based method for similarity joins",
    * VLDB 2011 — a public algorithm), not the all-pairs block scan: a key
    * is partitioned into τ+1 segments, and if lev(a, b) ≤ τ then at least
    * one of a's segments is untouched by every edit and appears VERBATIM
    * in b, shifted by at most τ (pigeonhole over edit operations). So
    * candidates come from an EQUI-join of a's segments against b's
    * windowed substrings on (block, partner-length, segment-index,
    * string) — linear in matches, never O(block²) — and only candidates
    * pay the thresholded levenshtein verify. The r6 form ran the banded
    * levenshtein over every in-block pair: 156 M probe calls and 17 s of
    * q75's 18 s at sf1; the segment join is ~4 s for the identical
    * output ([[fuzzyBlockPairsNaive]] stays as the spec's cross-check
    * oracle).
    *
    * Scale shape: both join sides are narrow exploded projections —
    * segments (τ+1 rows/doc) and windowed substrings (≤ (2τ+1)²·(τ+1)
    * rows/doc, all ≤ key-length strings); the join shuffles on the
    * (block, length, segment, string) tuple like every LSH-banded
    * candidate generator here, so parallelism follows the hash of the
    * segment content, not the block cardinality. The blocking key still
    * bounds the candidate universe; a coarse block only costs what its
    * true near-matches cost, not its squared size.
    */
  def fuzzyBlockPairs(docs: DataFrame, id: Column, block: Column,
      key: Column, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ExprBridge
    val t = maxDist
    val nseg = t + 1
    // the packed char bag rides every row from here so the
    // per-candidate bag reject below never re-scans a string
    def bagHalf(c: Column, half: Int): Column =
      ExprBridge.column(graft.functions.CharBagExpr(ExprBridge.expr(c), half))
    val d = docs.select(id.as("fz_id"), block.as("fz_block"),
        key.as("fz_key"), length(key).as("fz_len"))
      .withColumn("bag0", bagHalf(col("fz_key"), 0))
      .withColumn("bag1", bagHalf(col("fz_key"), 1))
    // ENTROPY-ADAPTIVE scheme(block, L): boundaries equalize per-segment
    // COLLISION entropy (Rényi-2: w_p = −ln Σ_c (f_c/n)² per character
    // position) instead of length. The pigeonhole only needs both sides
    // to replay the SAME contiguous partition for a given (block, L) —
    // nothing says the segments must be equal-length — and even-length
    // segments melt down on real text: first words repeat, so segment 0
    // of a 32-char head carried 69% of the candidate join's Σm² bucket
    // mass at sf3 (measured — the r7 "segment entropy" growth defect:
    // q64/q75 grew ~5× for 3× data). Equalizing collision mass makes
    // the hot low-entropy head absorb MORE characters and the diverse
    // tail split finer, flattening bucket sizes with zero effect on
    // exactness ([[fuzzyBlockPairsNaive]] equivalence is spec-gated).
    // Keys shorter than nseg (or zero-entropy groups) fall back to the
    // even split floor(i·L/nseg). The boundary relation is
    // (block, length)-sized — broadcast to both join sides.
    val bounds = segmentBounds(d, t)
    // the join keys on a HASH of (block, partition-side key length,
    // segment-index, segment text) — 8 bytes instead of a string tuple; a
    // hash collision only admits a spurious candidate, which the
    // levenshtein verify kills (exactness preserved)
    def segKey(blockC: Column, lenC: Column, si: Column,
        seg: Column): Column =
      xxhash64(blockC, lenC, si, seg)
    // boundary i (0-based) of the joined scheme array; element_at is
    // 1-based and barr(0) = 0, barr(nseg) = L
    def bAt(i: Column): Column = element_at(col("barr"), i + 1)
    // partition side: one row per (doc, segment) under the doc's OWN
    // (block, length) scheme
    val dk = d.withColumn("bk", xxhash64(col("fz_block")))
    val segs = dk.join(broadcast(bounds), Seq("bk", "fz_len"))
      .select(col("fz_id"), col("fz_block"), col("fz_key"),
        col("fz_len"), col("bag0"), col("bag1"), col("barr"),
        explode(sequence(lit(0), lit(t))).as("si"))
      .select(col("fz_id").as("a_id"), col("fz_key").as("a_key"),
        col("fz_len").as("a_len"),
        col("bag0").as("a_bag0"), col("bag1").as("a_bag1"),
        segKey(col("fz_block"), col("fz_len"), col("si"),
          substring_index_safe(col("fz_key"), bAt(col("si")),
            bAt(col("si") + 1) - bAt(col("si")))).as("sk"))
    // probe side: for every partner length l within ±τ and every segment
    // index, the substrings whose shift δ = p − p_i(l) satisfies the
    // TIGHT feasibility bound |δ| + |Δ − δ| ≤ τ with Δ = len(b) − l
    // (δ indels must happen before the segment and the suffix still has
    // to close a Δ−δ length gap after it — both consume edits), clamped
    // to valid substring starts. Window size ≤ τ+1 positions vs the
    // naive ±τ's 2τ+1 — half the exploded rows. Empty windows guard to
    // an empty array (`sequence` would otherwise DESCEND).
    def seqTo(lo: Column, hi: Column): Column =
      when(lo <= hi, sequence(lo, hi))
        .otherwise(array().cast("array<int>"))
    val probes = dk.select(col("fz_id"), col("fz_block"), col("bk"),
        col("fz_len"), col("fz_key"), col("bag0"), col("bag1"),
        explode(seqTo(greatest(col("fz_len") - t, lit(0)),
          col("fz_len") + t)).as("l"))
      // partner-length scheme boundaries; INNER: a probe row for a
      // (block, length) no document has cannot match anything anyway
      .join(broadcast(bounds.select(col("bk"),
        col("fz_len").as("l"), col("barr"))), Seq("bk", "l"))
      .select(col("fz_id"), col("fz_block"), col("fz_len"), col("fz_key"),
        col("bag0"), col("bag1"), col("l"), col("barr"),
        explode(sequence(lit(0), lit(t))).as("si"))
      .withColumn("segLen", bAt(col("si") + 1) - bAt(col("si")))
      .withColumn("delta", col("fz_len") - col("l"))
      .withColumn("half",
        floor((lit(t) - abs(col("delta"))) / 2).cast("int"))
      .select(col("fz_id").as("b_id"), col("fz_block").as("b_block"),
        col("fz_key").as("b_key"), col("bag0").as("b_bag0"),
        col("bag1").as("b_bag1"), col("l"), col("si"), col("segLen"),
        col("barr"),
        explode(seqTo(
          greatest(bAt(col("si")) +
            least(col("delta"), lit(0)) - col("half"), lit(0)),
          least(bAt(col("si")) +
            greatest(col("delta"), lit(0)) + col("half"),
            col("fz_len") - col("segLen")))).as("p"))
      .select(col("b_id"), col("b_key"), col("b_bag0"), col("b_bag1"),
        segKey(col("b_block"), col("l"), col("si"),
          substring_index_safe(col("b_key"), col("p"), col("segLen")))
          .as("sk"))
    // the segment index broadcasts ((τ+1)·n narrow rows — the same
    // build-side trade the pre-r7 form made with the full blocked
    // projection; past broadcast scale, drop the hint and this is a
    // plain shuffle equi-join). The levenshtein verify runs INLINE on
    // the matches — IN the join condition, after the O(1) id half-prune
    // (a select-then-filter form lets Catalyst push the distance
    // predicate AHEAD of the cheap conjunct — the q53 And-order lesson)
    // — and only then the (tiny) surviving pair set dedups;
    // materializing/distinct-ing the raw candidate relation first was
    // the dominant shuffle at sf1 (33 M rows).
    val dist = levenshtein(col("a_key"), col("b_key"), t)
    // conjunct order is load-bearing (And short-circuit): O(1) id prune,
    // then the ~O(lanes) bag reject (kills 95% of candidates at 1/10 a
    // levenshtein's cost — measured on sf3; soundness: bag L1 ≤ 2·lev,
    // see CharBagExpr), and only survivors pay the banded levenshtein
    val bagOk = ExprBridge.column(graft.functions.BagL1LeExpr(
      ExprBridge.expr(col("a_bag0")), ExprBridge.expr(col("a_bag1")),
      ExprBridge.expr(col("b_bag0")), ExprBridge.expr(col("b_bag1")),
      2 * t))
    broadcast(segs).join(probes,
        segs("sk") === probes("sk") && col("a_id") < col("b_id") &&
          bagOk && dist >= 0)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
        dist.as("dist"))
      .distinct()
  }

  /** 0-based substring of `s` at `start`, `len` chars (Spark's substring
    * is 1-based and treats position 0 specially — this wrapper keeps the
    * segment arithmetic in 0-based form on both join sides).
    */
  private def substring_index_safe(s: Column, start: Column,
      len: Column): Column =
    s.substr(start + 1, greatest(len, lit(0)))

  /** Segment-length flexibility around the even share: a segment may be
    * up to 2 chars shorter or [[SegExtUp]] chars longer (see
    * [[segmentBounds]]).
    */
  private val SegExtDown = 2
  private val SegExtUp = 8

  /** Grid-row ceiling for the driver-side boundary solver — (block,
    * length, start, extension)-granular stats, INDEPENDENT of corpus
    * size (bounded by groups × key length × extension range). Past it
    * the scheme falls back to the even split for every group
    * (exactness unaffected — only candidate volume). `var` solely as a
    * test seam (DedupSpec forces the overflow branch); never mutated
    * in main.
    */
  private[graft] var SegGridMaxRows = 1000000

  /** Key sample size the boundary statistics are estimated from: the
    * collision probabilities only STEER segment placement (never
    * exactness), and the hot buckets that matter are dense enough that
    * a ~30k-doc hash sample pins them — the full-corpus grid pass was
    * 5.3 s of q64's 22 s at sf3 for identical boundaries. `var` solely
    * as a test seam; never mutated in main.
    */
  private[graft] var SegStatsSampleDocs = 30000L

  /** Below this corpus size the adaptive scheme is even-split: small
    * corpora have no collision problem to solve, and the stats job's
    * fixed latency (~1 s driver-sequential at toy SF) would dominate
    * the win. Documented policy switch, not a silent cap — boundaries
    * stay consistent either way. `var` solely as a test seam (DedupSpec
    * forces the adaptive branch on a toy corpus); never mutated in main.
    */
  private[graft] var SegStatsMinDocs = 20000L

  /** Collision-adaptive PassJoin boundary relation: for every (block,
    * length) group of keys, the τ+2 boundaries (0 = b_0 < … < b_{τ+1}
    * = L) splitting a length-L key into the τ+1 contiguous segments
    * that MINIMIZE TOTAL MEASURED COLLISION MASS, keyed on
    * xxhash64(block) (a block-hash collision only makes the colliding
    * blocks share boundaries — consistency, not optimality, is what
    * the pigeonhole needs). Even-length segments melt down on real
    * text: first words repeat, so segment 0 of a 32-char head carried
    * 69% of the candidate join's Σm² bucket mass at sf3; marginal
    * per-position entropy cannot see it (positions are individually
    * diverse but jointly repeat whole words), and a greedy
    * first-segment-first walk starves the tail into 1-char segments
    * that collide worse than the head did (all three measured). So:
    *
    *  - ONE aggregation computes, for every (block, L, start s,
    *    extension x ∈ [share−2, share+8]), the collision probability
    *    cp(s, x) = Σ_v (f_v/n)² of the substring [s, s+x) over the
    *    group's keys — grid rows are group-bounded (≤ L·11 per group),
    *    never corpus-bounded, so the collect stays under
    *    [[SegGridMaxRows]] (the Bloom/Pipelines bounded-collect
    *    precedent; past the guard: even split).
    *  - A deterministic driver DP over (segment index, boundary)
    *    states picks the composition Σx_i = L minimizing Σ_i cp_i —
    *    exactly the expected candidate-pair mass Σ_i n²·cp_i the
    *    partition side will pay. ~2k transitions per group.
    *
    * Groups with L < τ+1 fall back to the even split floor(i·L/(τ+1)).
    * Only boundary CONSISTENCY between the two join sides matters for
    * exactness ([[fuzzyBlockPairsNaive]] equivalence is spec-gated);
    * the statistics steer candidate volume only.
    *
    * COMPLETENESS CONTRACT: the returned relation carries a row for
    * EVERY (block, length) group in `d` — [[fuzzyBlockPairs]]
    * inner-joins both the partition and probe sides to it, so a missing
    * group would silently drop that group's true pairs. Every fallback
    * path therefore derives the even-split boundaries as an EXPRESSION
    * over the distributed group universe (never from a driver collect
    * that a `limit` may have truncated — the round-8 overflow bug); the
    * driver-side DP only ever OVERRIDES rows of a universe it collected
    * whole.
    */
  private[graft] def segmentBounds(d: DataFrame, t: Int): DataFrame = {
    val nseg = t + 1
    val spark = d.sparkSession
    import spark.implicits._
    val keyed = d.filter(col("fz_len").isNotNull)
      .select(xxhash64(col("fz_block")).as("bk"), col("fz_len"),
        col("fz_key"), col("fz_id"))
    // the complete (block, length) universe, kept DISTRIBUTED — the
    // even-split fallback is an expression over it, so the bounds
    // relation is complete by construction regardless of what the
    // driver-side solver manages to collect
    val universe = keyed.groupBy(col("bk"), col("fz_len"))
      .agg(count(lit(1)).as("n"))
    // floor(i·L/nseg), exact in double for any realistic key length
    val evenExpr = transform(sequence(lit(0), lit(nseg)),
      i => floor(i.cast("long") * col("fz_len") / nseg).cast("int"))
    def evenAll(): DataFrame =
      universe.select(col("bk"), col("fz_len"), evenExpr.as("barr"))
    val lensCounts: Array[(Long, Int, Long)] =
      universe.limit(SegGridMaxRows + 1)
        .as[(Long, Int, Long)].collect()
    // a universe too large to collect whole: even split everywhere,
    // computed distributively — the truncated array must never feed a
    // joined relation
    if (lensCounts.length > SegGridMaxRows) return evenAll()
    // the collect is COMPLETE from here: driver-local relations are safe
    val lens: Array[(Long, Int)] = lensCounts.map(r => (r._1, r._2))
    val total = lensCounts.map(_._3).sum
    def evenArr(l: Int): Seq[Int] = (0 to nseg).map(i => i * l / nseg)
    // τ = 0 (whole key is the one segment) or a corpus too small for
    // collisions to matter: even split everywhere, as a broadcast-cheap
    // local relation over the complete universe
    if (t == 0 || total < SegStatsMinDocs)
      return broadcast(lens.toSeq.map { case (bk, l) =>
        (bk, l, evenArr(l)) }.toDF("bk", "fz_len", "barr"))
    // per-row candidate extension range [share−2, share+8] clamped ≥1;
    // the range is reachability-complete: nseg·max(1, share−2) ≤ L ≤
    // nseg·(share+8) for every L ≥ nseg, so the DP always has a
    // composition summing exactly to L
    val share = ceil(col("fz_len").cast("double") / nseg).cast("int")
    val xsCands =
      sequence(greatest(share - SegExtDown, lit(1)), share + SegExtUp)
    // deterministic hash sample of the keys feeding the statistics
    // (estimation only — boundaries stay consistent because both join
    // sides read the SAME bounds relation)
    val sampled =
      if (total <= SegStatsSampleDocs) keyed
      else keyed.filter(pmod(xxhash64(col("fz_id")), lit(1L << 20)) <
        lit((SegStatsSampleDocs.toDouble / total * (1L << 20)).toLong + 1L))
    val gridDf = sampled.filter(col("fz_len") >= nseg)
      .select(col("bk"), col("fz_len"), col("fz_key"),
        explode(sequence(lit(0), col("fz_len") - 1)).as("st"))
      .select(col("bk"), col("fz_len"), col("fz_key"), col("st"),
        explode(filter(xsCands,
          x => x + col("st") <= col("fz_len"))).as("x"))
      .select(col("bk"), col("fz_len"), col("st"), col("x"),
        col("fz_key").substr(col("st") + 1, col("x")).as("sub"))
      .groupBy("bk", "fz_len", "st", "x", "sub")
      .agg(count(lit(1)).cast("double").as("m"))
      .groupBy("bk", "fz_len", "st", "x")
      .agg((sum(col("m") * col("m")) /
        (sum(col("m")) * sum(col("m")))).as("cp"))
    val grid: Array[(Long, Int, Int, Int, Double)] =
      gridDf.limit(SegGridMaxRows + 1)
        .as[(Long, Int, Int, Int, Double)].collect()
    if (grid.length > SegGridMaxRows) return evenAll()
    val stats: Map[(Long, Int), Map[(Int, Int), Double]] = grid
      .groupBy(r => (r._1, r._2))
      .map { case (g, rs) => g -> rs.map(r => (r._3, r._4) -> r._5).toMap }
    // min-total-cp composition of L into nseg parts from the candidate
    // range; deterministic (fixed iteration order, strict improvement)
    def solve(bk: Long, l: Int): Seq[Int] = {
      val cps = stats((bk, l))
      val shareI = (l + nseg - 1) / nseg
      val xs = math.max(1, shareI - SegExtDown) to (shareI + SegExtUp)
      val INF = Double.MaxValue / 4
      val f = Array.fill(nseg + 1, l + 1)(INF)
      val choice = Array.fill(nseg + 1, l + 1)(-1)
      f(0)(0) = 0.0
      for (i <- 0 until nseg; b <- 0 to l if f(i)(b) < INF; x <- xs) {
        val nb = b + x
        val rem = nseg - i - 1
        if (nb <= l && nb + rem.toLong * xs.head <= l &&
            nb + rem.toLong * xs.last >= l && (rem > 0 || nb == l)) {
          val c = f(i)(b) + cps.getOrElse((b, x), 1.0)
          if (c < f(i + 1)(nb)) { f(i + 1)(nb) = c; choice(i + 1)(nb) = x }
        }
      }
      if (f(nseg)(l) >= INF) return evenArr(l)
      val bs = new Array[Int](nseg + 1)
      bs(nseg) = l
      var b = l
      var i = nseg
      while (i > 0) { b -= choice(i)(b); i -= 1; bs(i) = b }
      bs.toSeq
    }
    val rows: Seq[(Long, Int, Seq[Int])] = lens.toSeq.map { case (bk, l) =>
      if (l < nseg || !stats.contains((bk, l))) (bk, l, evenArr(l))
      else (bk, l, solve(bk, l))
    }
    broadcast(rows.toDF("bk", "fz_len", "barr"))
  }

  /** The pre-round-7 all-pairs form of [[fuzzyBlockPairs]] — O(block²)
    * banded-levenshtein probes. Kept PRIVATE as the property-test oracle
    * certifying the segment filter loses no pairs ([[DedupSpec]] runs
    * both over randomized corpora).
    */
  private[graft] def fuzzyBlockPairsNaive(docs: DataFrame, id: Column,
      block: Column, key: Column, maxDist: Int): DataFrame = {
    val d = docs.select(id.as("fz_id"), block.as("fz_block"),
      key.as("fz_key"))
    val np = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val dist = levenshtein(col("a.fz_key"), col("b.fz_key"), maxDist)
    d.repartition(np, col("fz_id")).as("a").join(broadcast(d.as("b")),
        col("a.fz_block") === col("b.fz_block") &&
          col("a.fz_id") < col("b.fz_id") &&
          abs(length(col("a.fz_key")) - length(col("b.fz_key"))) <= maxDist &&
          dist >= 0)
      .select(col("a.fz_id").as("id_a"), col("b.fz_id").as("id_b"),
        dist.as("dist"))
  }

  // --- MinHash ------------------------------------------------------------

  /** Fixed affine hash family over the 31-bit Mersenne prime — products
    * stay below 2^62, so the modular math runs in plain (ANSI-checked) long
    * arithmetic. Deterministic literals (no RNG at plan time) so signatures
    * are reproducible across runs and cluster layouts.
    */
  val P = 2147483647L // 2^31 - 1
  private[graft] def hashParams(k: Int): Seq[(Long, Long)] =
    (1 to k).map { i =>
      // distinct multipliers/offsets from a fixed LCG, folded into [1, P)
      val a = 6364136223846793005L * i + 1442695040888963407L
      val b = 2862933555777941757L * i + 3037000493L
      (((a & Long.MaxValue) % (P - 1)) + 1, (b & Long.MaxValue) % P)
    }

  /** Per-doc MinHash signature ARRAY as a PURE PROJECTION: all k mins
    * run in one fused loop over the doc's shingle hashes
    * ([[graft.functions.MinHashSigsExpr]]), so signature building costs
    * ZERO exchanges and never explodes the shingle relation (the
    * explode → groupBy(doc_id) aggregate form shuffled ~shingles/doc
    * rows per document with k partial mins — measured 0.65 s per corpus
    * side of q102's 3.1 s at sf1). Docs with NULL text (no shingles)
    * are filtered, matching the aggregate form's absent row. Duplicate
    * shingle hashes can't move a min, so this path skips the distinct
    * the verify-side shingle relation needs.
    */
  private[graft] def minhashSigArray(docs: DataFrame, id: Column,
      text: Column, k: Int, shingleLen: Int = 16,
      stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.ExprBridge
    // fused shingle+md5fold loop (r13): duplicates can't move a min, so
    // distinct stays off — the hash array feeds MinHashSigsExpr directly
    val hashes = shingleHashes(text, shingleLen, stride, portable = true,
      distinct = false)
    docs.select(id.as("doc_id"), ExprBridge.column(
        graft.functions.MinHashSigsExpr(ExprBridge.expr(hashes), k))
      .as("__sig"))
      .filter(col("__sig").isNotNull)
  }

  /** Per-doc MinHash signature as `sig_0..sig_{k-1}` columns — the
    * wide-schema view over [[minhashSigArray]]. Built on the
    * [[portableHash64]] shingle hash, so the whole signature pipeline is
    * reproducible in plain SQL on any engine with md5 (the q36 oracle).
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
      k: Int = 16, shingleLen: Int = 16, stride: Int = 4): DataFrame =
    minhashSigArray(docs, id, text, k, shingleLen, stride)
      .select(col("doc_id") +: (0 until k).map(i =>
        element_at(col("__sig"), i + 1).as(s"sig_$i")): _*)

  /** LSH banding: split the k-wide signature into `bands` bands and bucket
    * on (band index, band signature slice). Shuffle key = the band tuple,
    * so candidate generation is linear in bucket sizes, never O(n²). The
    * bucket is the raw signature slice (an int array), not an opaque
    * rehash: exact band equality (no bucket collisions) and portable to
    * the SQL oracle.
    */
  /** The banded (doc_id, band, bucket) relation of a MinHash signature
    * frame: each doc explodes into `bands` rows whose bucket is the raw
    * signature slice for that band. ONE definition shared by the
    * self-join ([[minhashCandidates]]) and cross-side
    * ([[incrementalDedup]]) candidate generators — the band layout also
    * backs the q36/q102 oracle generators, so a format change here is
    * the single place all four must move together.
    */
  private[graft] def bandedSignatures(docs: DataFrame, id: Column,
      text: Column, k: Int, bands: Int): DataFrame =
    bandedFromSigArray(minhashSigArray(docs, id, text, k), k, bands)

  /** The banding step alone, over an existing [[minhashSigArray]] frame
    * (so a caller that caches the signature frame derives banding from
    * the SAME relation instead of rebuilding the pipeline). `__sig` is
    * referenced by every band's slice — more than once, so CollapseProject
    * keeps it staged (the HOF-staging rule).
    */
  private def bandedFromSigArray(sig: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        slice(col("__sig"), bnd * rowsPerBand + 1, rowsPerBand)
          .as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  def minhashCandidates(docs: DataFrame, id: Column, text: Column,
      k: Int = 16, bands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    minhashCandidatesFromBanded(
      bandedSignatures(docs, id, text, k, bands), maxBucketSize)

  private def minhashCandidatesFromBanded(banded: DataFrame,
      maxBucketSize: Int): DataFrame = {
    // Hot-bucket fuse, STAR variant: a MinHash bucket over-fills when the
    // corpus has a giant cluster of (near-)identical documents — template
    // pages, empty docs — and unlike q41's junk buckets its members ARE
    // true dups, so dropping the bucket (annPairs' fuse) would lose them.
    // Past the cap the bucket emits only the pairs (bucket-min, other):
    // linear in bucket size instead of B²/2, while keeping every member
    // connected to the same component — so transitive-closure dedup
    // (components / keep-first survivors) is UNCHANGED; only pair-level
    // enumeration inside the mega-cluster is thinned. Both join sides
    // share the bucket, so gating the LEFT side on its own (__bsz,
    // __bmin) is enough.
    val capped =
      if (maxBucketSize == Int.MaxValue) banded
      else {
        val w = Window.partitionBy(col("band"), col("bucket"))
        banded
          .withColumn("__bsz", count(lit(1)).over(w))
          .withColumn("__bmin", min(col("doc_id")).over(w))
      }
    val starGate =
      if (maxBucketSize == Int.MaxValue) lit(true)
      else col("a.__bsz") <= maxBucketSize ||
        col("a.doc_id") === col("a.__bmin")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") && starGate)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** ESTIMATE-ONLY MinHash near-dup pairs: LSH-banded candidates scored
    * by the SIGNATURE-estimated Jaccard (matching components / k) instead
    * of the exact shingle-intersection verify — the 100 TB fast path,
    * where re-shuffling the shingle relation to verify every candidate
    * costs more than the estimate's error (stderr ≈ √(s(1−s)/k) ≈ 0.12
    * at k = 16; raise k to tighten). Emits (doc_a, doc_b, n_match,
    * est_jaccard) for pairs with at least `ceil(threshold·k)` matching
    * components — an integer decision both engines make identically.
    *
    * Scale shape: signatures are ONE shuffle of the shingle relation
    * (map-side partial min); candidates shuffle on (band, bucket) with
    * [[minhashCandidates]]' star-cap available; scoring joins the
    * doc-sized signature frame (k ints per doc) twice on doc_id — never
    * the shingle relation. The signature frame is cached because three
    * subtrees reference it (banding + both pair sides).
    */
  def minhashEstimatedPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double, k: Int = 16, bands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"minhashEstimatedPairs: need 0 < threshold <= 1, got $threshold")
    val minMatch = math.ceil(threshold * k).toInt
    // three subtrees consume the signature frame (banding + both pair
    // sides): cache the ARRAY frame once and derive all three from it
    val sig = minhashSigArray(docs, id, text, k).cache()
    val cands = minhashCandidatesFromBanded(
      bandedFromSigArray(sig, k, bands), maxBucketSize)
    val aSide = sig.select(col("doc_id").as("doc_a"),
      col("__sig").as("__a_sig"))
    val bSide = sig.select(col("doc_id").as("doc_b"),
      col("__sig").as("__b_sig"))
    // k inline equality terms, codegen'd (no per-element HOF; 16 trivial
    // expressions sits far under the JIT method-size cliff)
    val nMatch = (0 until k)
      .map(i => (element_at(col("__a_sig"), i + 1) ===
        element_at(col("__b_sig"), i + 1)).cast("int"))
      .reduce(_ + _)
    cands.join(aSide, "doc_a").join(bSide, "doc_b")
      .withColumn("n_match", nMatch)
      .filter(col("n_match") >= minMatch)
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        (col("n_match").cast("double") / lit(k.toDouble)).as("est_jaccard"))
  }

  /** CONTINUOUS-INGESTION dedup: flag each BATCH document against an
    * existing BASE corpus — the shape a production pipeline runs on every
    * new crawl drop, where re-deduping the whole corpus is off the table.
    * Two stages, both cross-side only (the base NEVER self-joins):
    *  - exact: the batch doc's normalized token-bag fingerprint
    *    ([[TextAnalysis.normalizedHash]]) already exists in base;
    *  - near: a MinHash band-bucket mate in base whose exact shingle
    *    Jaccard clears `threshold` (the [[minhashDedup]] verify, applied
    *    to cross-side candidates only).
    * Returns every batch row: (doc_id, is_exact_dup, is_near_dup).
    *
    * Scale shape: the base side contributes only its fingerprint and
    * signature index (what a real pipeline keeps MATERIALIZED between
    * batches — recomputed here from the table so the whole operator
    * replays in the SQL oracle); the candidate join shuffles on the
    * (band, bucket) tuple; verification touches candidate pairs only.
    *
    * `maxBucketSize` is the hot-bucket fuse (see [[crossCandidates]]):
    * past the cap a base-side (band, bucket) keeps only its
    * `maxBucketSize` lowest-doc_id representatives, bounding candidates
    * per batch doc at bands × cap — without it a boilerplate bucket
    * present on both sides goes O(|base bucket| × |batch bucket|).
    */
  def incrementalDedup(base: DataFrame, batch: DataFrame, id: Column,
      text: Column, threshold: Double, k: Int = 16,
      bands: Int = 4, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val baseFp = base.select(id.as("doc_id"),
      TextAnalysis.normalizedHash(text).as("fp"))
    // verify-side shingles are RECOMPUTED from the candidate docs only
    // (see restrictedShingles in the core) — re-shingling a few thousand
    // candidate texts is cheaper than caching the corpus-wide shingle
    // relation to share it with the signature pipeline (the cache
    // materialization + sizes agg/join-back cost more than the recompute
    // at every SF measured).
    incrementalDedupCore(baseFp, bandedSignatures(base, id, text, k, bands),
      restrictedShingles(base, id, text), batch, id, text, threshold,
      k, bands, maxBucketSize)
  }

  /** The base-side index of [[incrementalDedup]], MATERIALIZED — what a
    * production continuous-ingestion pipeline keeps between crawl drops
    * instead of recomputing the whole base corpus every batch (at corpus
    * scale the base-side fingerprint/signature/shingle recompute IS the
    * dominant cost; the batch side is tiny). Three parquet relations:
    * `fp/` normalized token-bag fingerprints, `banded/` MinHash band
    * buckets, `sh/` portable shingle hashes with per-doc set sizes.
    * [[incrementalDedupWithIndex]] consumes them and returns the
    * IDENTICAL verdicts to the recompute path (spec-gated equality).
    * After admitting a batch, append its surviving docs' index rows the
    * same way — the relations are unioned-by-schema, so incremental
    * maintenance is a parquet append.
    */
  def writeDedupIndex(base: DataFrame, id: Column, text: Column,
      path: String, k: Int = 16, bands: Int = 4): Unit = {
    base.select(id.as("doc_id"), TextAnalysis.normalizedHash(text).as("fp"))
      .write.mode("overwrite").parquet(s"$path/fp")
    bandedSignatures(base, id, text, k, bands)
      .write.mode("overwrite").parquet(s"$path/banded")
    hashedShinglesWithSize(base, id, text, portable = true)
      .write.mode("overwrite").parquet(s"$path/sh")
  }

  /** [[incrementalDedup]] against a [[writeDedupIndex]]-materialized base:
    * the batch is flagged without touching the base TEXT at all — the
    * scans are the three narrow index relations. `k`/`bands` must match
    * the index's build parameters (the band layout is positional).
    */
  def incrementalDedupWithIndex(indexPath: String, batch: DataFrame,
      id: Column, text: Column, threshold: Double, k: Int = 16,
      bands: Int = 4, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val spark = batch.sparkSession
    incrementalDedupCore(
      spark.read.parquet(s"$indexPath/fp"),
      spark.read.parquet(s"$indexPath/banded"),
      ids => spark.read.parquet(s"$indexPath/sh")
        .join(ids, Seq("doc_id"), "left_semi"),
      batch, id, text, threshold, k, bands, maxBucketSize)
  }

  /** Candidate-restricted (doc_id, shh, n_sh) provider for the INLINE
    * paths: semi-filter the DOCS to the candidate ids, then shingle —
    * the shingle compute itself runs over candidate texts only, and
    * n_sh rides the projection ([[hashedShinglesWithSize]]) so the
    * restriction costs one semi-join exchange and nothing else. The id
    * set is runtime-sized, so AQE broadcasts it at test SF and falls
    * back to a shuffle semi-join at corpus scale.
    */
  private def restrictedShingles(docs: DataFrame, id: Column,
      text: Column)(ids: DataFrame): DataFrame =
    hashedShinglesWithSize(
      docs.select(id.as("doc_id"), text.as("__text"))
        .join(ids, Seq("doc_id"), "left_semi"),
      col("doc_id"), col("__text"), portable = true)

  /** Shared verdict pipeline over a (fp, banded, shingle-provider) base
    * index — computed inline by [[incrementalDedup]] (`baseShOf` =
    * restricted recompute from the base TEXT), loaded from parquet by
    * [[incrementalDedupWithIndex]] (`baseShOf` = semi-filtered scan of
    * the stored `sh/` relation, which carries `n_sh`).
    *
    * Verify-stage shape: the candidate pair set is MATERIALIZED (it is
    * bounded — the bucket cap fuses it at bands × cap per batch doc —
    * and its plan embeds both signature pipelines, which three consumers
    * would otherwise re-run); both verify-side shingle relations are
    * built over CANDIDATE docs only, with n_sh riding the projection —
    * no corpus-wide shingle shuffle, cache, or sizes join-back anywhere
    * in the verify stage.
    */
  private def incrementalDedupCore(baseFp: DataFrame, baseBanded: DataFrame,
      baseShOf: DataFrame => DataFrame, batch: DataFrame, id: Column,
      text: Column, threshold: Double, k: Int, bands: Int,
      maxBucketSize: Int): DataFrame = {
    val exactDup = batch
      .select(id.as("doc_id"), TextAnalysis.normalizedHash(text).as("fp"))
      .join(baseFp.select(col("fp")), Seq("fp"), "left_semi")
      .select(col("doc_id"))
    // bridge checkpoint, not localCheckpoint: the bridge carries the
    // distinct's (doc_base, doc_new) partitioning AND the materialized
    // size as stats — a bare localCheckpoint reports defaultSizeInBytes,
    // so both restrictedShingles semi-joins planned the DOCS table into
    // a doc_id sort-merge shuffle instead of broadcasting the bounded
    // candidate id set (AQE's leaf stages run concurrently: by the time
    // runtime stats proved the ids tiny, the docs exchange had already
    // executed)
    val cand = org.apache.spark.sql.graftbridge.CheckpointBridge
      .checkpointPartitioned(crossCandidatesFromBanded(baseBanded,
        bandedSignatures(batch, id, text, k, bands), maxBucketSize))
    // no distinct: both consumers are LEFT_SEMI probes, where duplicate
    // right-side ids are free — a distinct here is a wasted exchange
    val candB = cand.select(col("doc_base").as("doc_id"))
    val candN = cand.select(col("doc_new").as("doc_id"))
    val nearDup = cand
      .join(baseShOf(candB).select(col("doc_id").as("doc_base"),
        col("shh"), col("n_sh").as("n_b0")), Seq("doc_base"))
      .join(restrictedShingles(batch, id, text)(candN)
        .select(col("doc_id").as("doc_new"),
          col("shh"), col("n_sh").as("n_n0")), Seq("doc_new", "shh"))
      .groupBy(col("doc_base"), col("doc_new"))
      .agg(count(lit(1)).as("inter"), max(col("n_b0")).as("n_b"),
        max(col("n_n0")).as("n_n"))
      .filter(col("inter").cast("double") /
        (col("n_b") + col("n_n") - col("inter")).cast("double") >= threshold)
      .select(col("doc_new").as("doc_id")).distinct()
    batch.select(id.as("doc_id"))
      .join(exactDup.withColumn("__e", lit(true)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("__n", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__e"), lit(false)).as("is_exact_dup"),
        coalesce(col("__n"), lit(false)).as("is_near_dup"))
  }

  /** Cross-side LSH candidate pairs for [[incrementalDedup]]: base and
    * batch banded signatures ([[bandedSignatures]] — the same layout the
    * self-join path uses) equi-joined on (band, bucket).
    *
    * Hot-bucket fuse, REPRESENTATIVE variant: a bucket shared by a
    * mega-cluster of boilerplate docs appears on BOTH sides, and the
    * cross join of its memberships is O(|base| × |batch|) — the exact
    * blowup [[minhashCandidates]]' star cap fuses against. The batch
    * side cannot be thinned (every batch doc needs a verdict), so the
    * cap applies to the BASE side only: past `maxBucketSize` a bucket
    * keeps its `maxBucketSize` LOWEST-doc_id members as representatives
    * — deterministic (rank by doc_id), so the q102 oracle replays the
    * identical selection with a window. Candidates per batch doc are
    * then bounded at bands × cap. An over-cap bucket's members agree on
    * a full band slice — overwhelmingly a near-identical cluster — so
    * any batch doc it would have matched still meets `cap`
    * representatives of that cluster for the Jaccard verify; as with
    * q41's junk-bucket cap, a true mate hiding PAST the representatives
    * of a diverse junk bucket is the accepted recall trade at scale.
    */
  private[graft] def crossCandidates(base: DataFrame, batch: DataFrame,
      id: Column, text: Column, k: Int, bands: Int,
      maxBucketSize: Int): DataFrame =
    crossCandidatesFromBanded(bandedSignatures(base, id, text, k, bands),
      bandedSignatures(batch, id, text, k, bands), maxBucketSize)

  private def crossCandidatesFromBanded(baseBanded0: DataFrame,
      batchBanded: DataFrame, maxBucketSize: Int): DataFrame = {
    // lowest-`cap` representatives via the bounded heap, not a
    // row_number window: the over-cap bucket this fuse exists for is
    // exactly the partition the window would sort in one task (the
    // oracle's ranked-CTE replay selects the identical ids)
    val baseBanded =
      if (maxBucketSize == Int.MaxValue) baseBanded0
      else TopK.perGroup(baseBanded0, Seq("band", "bucket"),
          struct(col("doc_id")), payload = Seq("doc_id"),
          k = maxBucketSize, largest = false)
        .select(col("doc_id"), col("band"), col("bucket"))
    baseBanded.as("a").join(batchBanded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("doc_base"), col("b.doc_id").as("doc_new"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates verified with exact
    * Jaccard — the scale path (verification join touches candidates only).
    */
  def minhashDedup(docs: DataFrame, id: Column, text: Column,
      threshold: Double, k: Int = 16, bands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    // NOTE: unlike incrementalDedupCore, the verify stage here does NOT
    // restrict shingles to candidate docs — a whole-corpus self-dedup's
    // candidate id set approaches the corpus (measured at sf1: the
    // restriction + checkpoint barrier cost 1.6 s and filtered almost
    // nothing), where the cross-side batch case is cap-bounded tiny.
    val cand = minhashCandidates(docs, id, text, k, bands, maxBucketSize)
    // portable hash: the verification intersection must count the same
    // shingle-hash universe the signatures were built from
    val sh = hashedShingles(docs, id, text, portable = true).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // intersection via join on hashed shingle within candidate pairs
    val inter = cand.join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shh") === col("sb.shh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Cross-document repeated-passage detection — the SUBSTRING-level
    * dedup signal doc-level dedup misses (boilerplate paragraphs pasted
    * across otherwise-distinct pages; the ExactSubstr axis of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022 — a public method). Documents are cut into
    * NON-overlapping `windowTokens`-token windows (tail fragments
    * dropped — only full windows are comparable); a window is REPEATED
    * when its [[portableHash64]] occurs in more than one distinct
    * document. Per doc: total full windows, repeated-window
    * occurrences, and the repeated fraction (4dp). Docs with no full
    * window are absent (nothing to measure).
    *
    * Scale shape: window fan-out is bounded by [[TextAnalysis.chunks]]'
    * `maxChunksPerDoc` fuse; per-doc occurrence counts aggregate BEFORE
    * the cross-doc frequency window, so that window's exchange moves
    * one row per (doc, window-hash); the per-doc re-aggregation is the
    * only other exchange. Portable hash → the q104 oracle replays the
    * pipeline end to end.
    */
  def repeatedPassages(docs: DataFrame, id: Column, text: Column,
      windowTokens: Int = 32): DataFrame = {
    val ch = TextAnalysis.chunks(docs, id, text, windowTokens, 0)
      .filter(col("chunk_tokens") === windowTokens)
    val occ = ch.select(col("doc_id"),
        portableHash64(col("chunk_text")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("n_occ"))
    occ
      .withColumn("n_docs",
        count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id")).agg(
        sum(col("n_occ")).as("n_windows"),
        sum(when(col("n_docs") > 1, col("n_occ")).otherwise(lit(0L)))
          .as("n_repeated"))
      .withColumn("repeated_frac",
        round(col("n_repeated").cast("double") /
          col("n_windows").cast("double"), 4))
  }

  // --- SimHash ------------------------------------------------------------

  /** SimHash bit width: 60 usable bits from the [[portableHash64]] token
    * hash (bits 60-63 of every token hash are 0, so their majority vote is
    * always negative — computing them would only pad the aggregation).
    */
  val SimhashBits = 60

  /** Per-token vote weight saturation for [[simhash]]: votes = min(tf,
    * cap) — BM25-style sublinear term frequency. Shared with the q37
    * oracle generator so the two engines cannot drift.
    */
  val SimhashTfCap = 3

  /** 60-bit SimHash over whitespace tokens with SATURATED frequency
    * weights (vote weight = min(tf, [[SimhashTfCap]])): per-bit weighted
    * majority vote of token hashes, computed as 60 codegen'd conditional
    * sums in one aggregation. Token hash = [[portableHash64]], so the full
    * bit-vote pipeline is reproducible in the DuckDB oracle (q37).
    *
    * Why saturated tf, not raw tf or a distinct-token set (all three were
    * measured): with RAW multiset votes one template token repeated
    * hundreds of times per page dominates every bit vote, all pages
    * carrying that boilerplate collapse onto near-identical hashes, and
    * the band join degenerates into per-template mega-buckets (a
    * corpus-wide repeated tag made simhash pairs the slowest query in the
    * suite at 50k docs). With BINARY (set) votes the guard holds but all
    * frequency signal is lost — on template-generated corpora whose docs
    * differ mainly in token multiplicities, pair density exploded ~500×.
    * Saturation keeps both properties: boilerplate is bounded at `cap`
    * votes, small multiplicity differences still separate hashes. True
    * byte-identical mega-dup clusters are [[exact]]-deduped BEFORE any
    * near-dup pass — that pipeline order (q79) bounds bucket sizes at
    * corpus scale.
    */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // r13: the signature is a PER-DOCUMENT reduction (every vote depends
    // only on the doc's own token multiset), so it runs as one fused
    // projection expression — zero exchanges, no corpus×tokens explode
    // (the same observation that made MinHash signatures a projection).
    // [[simhashComposed]] keeps the explode → tf-agg → 60-vote-agg
    // pipeline as the property oracle (`SimhashExprSpec`); NULL text
    // yields NULL here where the composed form emitted no row — the
    // filter reproduces the absent-doc contract.
    import org.apache.spark.sql.graftbridge.ExprBridge
    docs.select(id.as("doc_id"), ExprBridge.column(
        graft.functions.SimhashExpr(ExprBridge.expr(text),
          SimhashBits, SimhashTfCap)).as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** The composed explode/aggregate spelling of [[simhash]] — the
    * property-test oracle for the fused expression (never used in a hot
    * path).
    */
  private[graft] def simhashComposed(docs: DataFrame, id: Column,
      text: Column): DataFrame = {
    // (doc_id, token) weights: one shuffle with map-side partial counts —
    // the combiner reduces each task's contribution to its distinct-token
    // volume before anything crosses the wire
    val tok = docs.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(least(count(lit(1)), lit(SimhashTfCap.toLong)).as("w"))
      .withColumn("h", portableHash64(col("t")))
    val bitSums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, col("w"))
        .otherwise(-col("w"))).as(s"bit_$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until SimhashBits).map { b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs within a Hamming radius, candidate-bucketed on
    * 16-bit sub-bands (pigeonhole: radius<=3 ⇒ some 16-bit band equal).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    // materialize the signatures: the self-join below consumes the frame
    // twice, and one side broadcasts — whose exchange shape blocks Spark's
    // ReusedExchange, so WITHOUT truncation the whole tokenize + 60-bit
    // vote pipeline (the dominant cost) would execute once per side. The
    // checkpoint is one narrow (id, long) row per doc — doc-count-bounded,
    // never corpus-bytes (same trade as [[components]]; use reliable
    // `checkpoint` on a cluster for fault tolerance).
    // bridge checkpoint: carries the vote aggregate's doc_id partitioning
    // plus materialized-size stats, so the banded self-join below can
    // broadcast one side in the INITIAL plan when the signature relation
    // is small (a bare localCheckpoint reports defaultSizeInBytes and
    // forces the sort-merge shape until AQE's runtime stats undo it)
    val sim = org.apache.spark.sql.graftbridge.CheckpointBridge
      .checkpointWithStats(simhash(docs, id, text))
    val banded = sim.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
              .as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val ham = (a: Column, b: Column) => bit_count(a.bitwiseXOR(b))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        ham(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- Connected components -----------------------------------------------

  /** Transitive dedup clustering: near-dup PAIRS → connected COMPONENTS
    * (component id = min member id), the step that turns pairwise
    * similarity into keep-one-per-cluster decisions. Iterative min-label
    * propagation: each round takes the min label over self ∪ neighbors
    * (one join + one aggregation) AND a pointer-jump step (label :=
    * label of my label), so convergence is logarithmic in the component
    * diameter — a chain of length 2^k resolves in ~k rounds (the real
    * sf0.1 cosine graph has a deep component that a plain hop-per-round
    * loop left wrong at the default budget). Labels are monotone
    * non-increasing, so convergence is detected by an unchanged decimal
    * label-sum — a scalar read off the same action that materializes the
    * round. `maxIter` is a safety bound and exhausting it THROWS rather
    * than silently emitting a partial clustering. Each round's labels are
    * materialized through `localCheckpoint` — the label relation appears
    * twice in the next round's plan, so WITHOUT lineage truncation the
    * logical plan doubles per round and analysis cost explodes
    * exponentially (on a cluster use reliable `checkpoint` for fault
    * tolerance instead). Round cost at small graph sizes is Spark's
    * per-action latency, not data: AQE's stage coalescing matters (3×
    * measured), and small edge sets drop to one partition so every
    * round-internal exchange disappears.
    *
    * @param pairs two-column undirected pair relation (src, dst)
    * @param ids   one-column relation of ALL node ids (isolated nodes keep
    *              their own id as component)
    * @param driverMaxEdges edge-count bound for the driver union-find fast
    *              path; 0 forces the distributed loop (on non-empty graphs —
    *              an empty edge set short-circuits to all-isolated labels)
    */
  def components(pairs: DataFrame, ids: DataFrame,
      maxIter: Int = 25, driverMaxEdges: Long = 2000000L): DataFrame = {
    // Integral node ids are the contract (as in GraphX's Long VertexId):
    // the driver fast path collects longs, and the distributed loop's
    // decimal convergence sum is numeric — fail LOUDLY for other key
    // types instead of silently miscasting, and BEFORE materializing the
    // edge relation (the schema check is free; the union+distinct is a
    // full shuffle at scale). Callers with string/struct keys should
    // densify first (zipWithIndex), which is also what keeps 100 TB
    // shuffle keys narrow.
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // ALL THREE id columns must be integral — a (long, string) pair frame
    // or a string-keyed `ids` relation would otherwise pass a first-column
    // check and then either throw an opaque ANSI cast error in the driver
    // fast path or silently label every node isolated (long labels never
    // join back to string ids)
    val badCols =
      (pairs.schema.take(2) ++ ids.schema.take(1)).filterNot(f => integral(f.dataType))
    require(badCols.isEmpty,
      s"components() requires integral node ids, got " +
        badCols.map(f => s"${f.name}: ${f.dataType.catalogString}")
          .mkString(", ") +
        " — map keys to longs (zipWithIndex) before clustering")
    val src = pairs.columns(0)
    val dst = pairs.columns(1)
    val idc = ids.columns(0)
    // Symmetrize in ONE scan of `pairs` (explode both directions per row):
    // a two-branch union would embed the pair subplan twice and Spark
    // evaluates each branch independently — for the expensive pair plans
    // that feed this (a blocked levenshtein join, an all-pairs cosine
    // join) that doubles the whole query. Falls back to the union form
    // when the two id columns disagree on type (explode needs identical
    // struct shapes; union's implicit widening handles the mismatch).
    val sym =
      if (pairs.schema(0).dataType == pairs.schema(1).dataType)
        pairs.select(explode(array(
          struct(col(src).as("e_src"), col(dst).as("e_dst")),
          struct(col(dst).as("e_src"), col(src).as("e_dst")))).as("e"))
          .select(col("e.e_src").as("e_src"), col("e.e_dst").as("e_dst"))
      else
        pairs.select(col(src).as("e_src"), col(dst).as("e_dst"))
          .union(pairs.select(col(dst).as("e_src"), col(src).as("e_dst")))
    val edgesWide = sym.distinct().localCheckpoint(true)
    val edgeCount = edgesWide.count()
    // no edges: every node is its own component (neither loop below can
    // improve on that, and the distributed convergence sum is undefined
    // over an empty label relation)
    if (edgeCount == 0)
      return ids.select(col(idc).as("id"), col(idc).as("component"))
    // Size-adaptive execution, decided on the MEASURED edge count (the
    // AQE move applied across the whole algorithm). A near-dup pair graph
    // is sparse by construction — LSH/blocking emits a tiny fraction of
    // the corpus as pairs — so even a 100 TB corpus usually yields an edge
    // set that fits on the driver. Below `driverMaxEdges` (the collected
    // rows + boxed hash map cost a few hundred MB of transient driver
    // heap at the default bound — size it for your driver), union-find
    // on the driver replaces O(log D) Spark rounds (each a join + agg +
    // checkpoint + convergence action) with one collect + one O(E α(E))
    // pass + one broadcast-joined label frame. Above the bound, the
    // distributed logarithmic-round loop below is the scale path.
    if (edgeCount <= driverMaxEdges)
      return componentsOnDriver(edgesWide, ids, idc)
    // the edge count is free off the checkpoint, and when the pair graph
    // is small a single partition makes every join and aggregation below
    // exchange-free (SinglePartition satisfies any required clustering),
    // collapsing each round to one task instead of a multi-stage shuffle
    // cascade. Large graphs keep full-width shuffles.
    val edges =
      if (edgeCount <= 2000000) edgesWide.coalesce(1)
      else edgesWide
    // propagate only over nodes that actually appear in a pair — isolated
    // nodes (the vast majority of a deduped corpus) are attached with
    // their own id at the end, not dragged through every iteration
    var labels = edges.select(col("e_src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    // hop: min label over self ∪ neighbors — one join + one agg shuffle.
    // The self branch re-aliases its columns: both union legs descend
    // from the same `labels` plan and Catalyst's union constraint
    // rewrite rejects duplicate attribute ids across branches.
    def hop(l: DataFrame): DataFrame = l
      .select(col("id").as("id"), col("component").as("component"))
      .union(edges.join(l, edges("e_dst") === l("id"))
        .select(col("e_src").as("id"), col("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
    // pointer jump: adopt the label of my current label — doubles the
    // propagation distance per step (logarithmic convergence)
    def jump(l: DataFrame): DataFrame = l.as("l")
      .join(l.select(col("id").as("c_id"),
        col("component").as("c_comp")).as("c"),
        col("l.component") === col("c_id"), "left")
      .select(col("l.id").as("id"),
        least(col("l.component"),
          coalesce(col("c_comp"), col("l.component"))).as("component"))
    var iter = 0
    var converged = false
    // labels are monotone non-increasing per id (every update is a min),
    // so the decimal label-sum is a strictly decreasing scalar until the
    // fixed point: an unchanged sum IS convergence. That replaces a
    // prev-label carry + filter-count with a plain sum over the same
    // materializing action (decimal, not long — a 100 TB corpus sums ids
    // past 2^63 and ANSI mode would throw).
    var prevSum: java.math.BigDecimal = null
    while (iter < maxIter && !converged) {
      val stepped = jump(hop(labels))
      val next = stepped.localCheckpoint(false) // materialized by the sum
      val sumNow = next
        .agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .first().getDecimal(0)
      labels = next
      converged = prevSum != null && prevSum.compareTo(sumNow) == 0
      prevSum = sumNow
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"components() did not converge within $maxIter rounds — " +
          "raise maxIter (propagation distance doubles per round)")
    ids.select(col(idc).as("id"))
      .join(labels.withColumnRenamed("component", "paired_c"), Seq("id"), "left")
      .select(col("id"), coalesce(col("paired_c"), col("id")).as("component"))
  }

  /** Small-graph fast path: collect the (already deduped, symmetric) edge
    * relation, run union-find with path compression on the driver, and
    * broadcast-join the labels back onto the full id relation. Roots are
    * kept at the minimum member id (smaller root wins every union), so the
    * output is identical to the distributed min-label propagation.
    */
  private def componentsOnDriver(edges: DataFrame, ids: DataFrame,
      idc: String): DataFrame = {
    val spark = ids.sparkSession
    val idType = ids.schema.head.dataType
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) {
        val next = parent.getOrElse(c, c)
        parent(c) = r
        c = next
      }
      r
    }
    edges.select(col("e_src").cast("long"), col("e_dst").cast("long"))
      .collect().foreach { row =>
        // null-keyed pairs carry no connectivity (they join to nothing in
        // the distributed loop either) — skip them
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ra = find(row.getLong(0))
          val rb = find(row.getLong(1))
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
      }
    val nodes = parent.keySet.toSeq
    val labels = nodes.map(n => (n, find(n)))
    import spark.implicits._
    val labelDf = labels.toDF("id", "paired_c")
      .select(col("id").cast(idType).as("id"),
        col("paired_c").cast(idType).as("paired_c"))
    ids.select(col(idc).as("id"))
      .join(broadcast(labelDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("paired_c"), col("id")).as("component"))
  }

  /** Survivor selection: keep the best-quality member of each component
    * (ties broken by lowest id) — the decision step of a pretraining dedup
    * pipeline (drop near-dups, keep the highest-quality copy).
    *
    * The per-component argmax is an AGGREGATE ([[TopK.argmax]] over
    * `struct(q, -id)` — largest quality, then smallest id; a NULL quality
    * sorts below every non-null, matching the window's `q.desc`
    * nulls-last), not a `row_number` window: the window SORTS each
    * component in one task,
    * and the mega-component of boilerplate near-dups is precisely the
    * case this operator exists for. Map-side partials keep one struct
    * per component per partition; the flag join re-keys without sorting.
    * Isolated nodes survive trivially.
    *
    * @param components (id, component) relation from [[components]]
    * @param quality    relation carrying `id` plus the quality column(s)
    * @param q          quality ordering column (higher = better)
    */
  def survivors(components: DataFrame, quality: DataFrame,
      q: Column): DataFrame = {
    val joined = components.join(quality, "id")
    val best = joined.groupBy(col("component"))
      // TopK.argmax, not max(struct): identical interpreted struct
      // ordering, but ObjectHashAggregate instead of a SortAggregate
      // that per-partition sorts the whole doc-quality join (r12)
      .agg(TopK.argmax(struct(q.as("q"), (-col("id")).as("nid"))).as("__b"))
      .select(col("component"), (-col("__b.nid")).as("__best"))
    joined.join(best, Seq("component"))
      .select(joined.columns.map(col) :+
        (col("id") === col("__best")).as("is_survivor"): _*)
  }

  /** Batch-vs-base shingle NOVELTY: per batch doc, the fraction of its
    * distinct shingles unseen anywhere in the base corpus — the
    * "how much genuinely new content does this crawl drop add"
    * admission signal that complements [[incrementalDedup]]'s binary
    * dup verdicts (a doc can be 40% recycled without being a near-dup
    * of any single base doc).
    *
    * Scale shape: one shuffle of each shingle relation on the 60-bit
    * portable hash (the base side map-side-partial-distincts first);
    * per-doc totals come from the join output itself — no second pass
    * over the batch. novelty = an exact IEEE quotient of two longs.
    */
  def noveltyVsBase(base: DataFrame, batch: DataFrame, id: Column,
      text: Column): DataFrame = {
    val shN = hashedShingles(batch, id, text, portable = true)
    val seen = hashedShingles(base, id, text, portable = true)
      .select(col("shh")).distinct()
    shN.join(seen.withColumn("__seen", lit(true)), Seq("shh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        count(when(col("__seen").isNull, lit(1))).as("n_new"))
      .select(col("doc_id"), col("n_sh"), col("n_new"),
        (col("n_new").cast("double") / col("n_sh").cast("double"))
          .as("novelty"))
  }
}
