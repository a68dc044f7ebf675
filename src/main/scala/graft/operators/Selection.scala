package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus SELECTION operators — the step between a cleaned/deduped corpus
  * and a training mixture: importance-reweighting toward a target
  * distribution (DSIR) and greedy per-group token-budget fill. Both are
  * formulated scale-first: the only corpus-wide exchanges are bounded
  * aggregations (a `buckets`-row distribution, a 4dp score grid), never a
  * corpus-wide sort.
  *
  * Reference scope: the reference pipeline has no selection stage — these
  * are the LLM-training-data brief's operators (hashed-ngram importance
  * resampling per Xie et al. 2023 "Data Selection for Language Models via
  * Importance Resampling"; budget fill is the standard quality-ranked
  * corpus cut).
  */
object Selection {

  /** DSIR-style importance scoring + deterministic top-k selection.
    *
    * Features are hashed word-BIGRAM counts in `buckets` buckets (the
    * portable md5-fold hash, so the DuckDB oracle replays bucketing
    * exactly). Bucket unigram models are fit add-one-smoothed for the
    * TARGET slice (`isTarget`) and the RAW corpus; a document's score is
    * its log-likelihood ratio
    * `sum_g [ ln p_tgt(b(g)) - ln p_raw(b(g)) ]` over its bigrams, and
    * the k highest-scoring documents win (ties broken by ascending id —
    * a TOTAL order, so the selected SET is deterministic).
    *
    * Cross-engine determinism: each per-bucket log-ratio is quantized to
    * integer MICROS (`floor(x*1e6 + 0.5)` — |x| <= ~ln(corpus grams) so
    * the scaled value is far below 2^53) BEFORE the per-document sum, so
    * accumulation is exact BIGINT math on both engines and immune to FP
    * addition order (the CLAUDE.md quantize-then-sum rule). The only
    * engine-computed transcendental is `ln` of an identical double — its
    * known <=1-ulp wobble cannot move a *1e6 quantization boundary (that
    * would need ln(r) within ~1e-10 of (k+0.5)e-6; ln of a rational is
    * transcendental, q90's precedent).
    *
    * Plan shape (the 100 TB argument): the per-document bucket array is
    * computed ONCE (tokenize -> bigrams -> hash, all staged attributes
    * per the HOF re-evaluation rules) and locally checkpointed — it is
    * consumed by BOTH the distribution aggregate and the scoring
    * projection, and a checkpoint is the documented real barrier for a
    * computed array feeding further HOFs. The distribution aggregate
    * emits `buckets` rows (map-side partials make the exchange tiny);
    * the fitted log-ratio table folds to ONE dense-array row broadcast
    * into the scorer, so scoring is a pure projection; the final top-k
    * is a TakeOrdered (O(k) per partition), never a global sort. Nothing
    * corpus-sized ever shuffles.
    */
  def dsirTopK(docs: DataFrame, id: Column, text: Column, isTarget: Column,
      buckets: Int = 0, k: Int = 200): DataFrame = {
    require(k >= 1, s"dsirTopK: k=$k must be >= 1")
    // buckets <= 0 -> size to the corpus (the autoCells convention);
    // the count rides Similarity's table-statistics memo
    val b =
      if (buckets <= 0) autoBuckets(Similarity.corpusSize(docs))
      else buckets
    require(b >= 2, s"dsirTopK: buckets=$b must be >= 2")
    // stage tokens as an attribute (ngrams' internal lambda references
    // the token array per element — inlined, the tokenizer would re-run
    // per gram, the q81 trap); then hash bigrams to buckets in the same
    // projection chain. The pre-filter runs on the CHEAP precursors
    // (text/token count), never on the computed gram array, so predicate
    // pushdown cannot re-evaluate the hash chain (the q134 trap).
    val bk = docs
      .filter(text.isNotNull)
      .select(id.as("doc_id"), isTarget.as("is_tgt"),
        TextAnalysis.tokens(text).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("doc_id"), col("is_tgt"),
        TextAnalysis.ngrams(col("__tk"), 2).as("__bg"))
      .select(col("doc_id"), col("is_tgt"),
        transform(col("__bg"),
          g => pmod(Dedup.portableHash64(g), lit(b)).cast("int"))
          .as("__bk"))
      .localCheckpoint(true)

    // bucket distribution: `buckets` rows out, map-side combined
    val dist = bk
      .select(col("is_tgt"), explode(col("__bk")).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("r_cnt"),
        count(when(col("is_tgt"), lit(1))).as("t_cnt"))

    // fold the fitted model to ONE row holding the dense per-bucket
    // quantized log-ratio array (index = bucket id; buckets no gram
    // hashed to cannot be referenced by any document, but the add-one
    // formula still gives them a well-defined entry)
    val lamRow = dist
      .agg(sum(col("r_cnt")).as("rtot"), sum(col("t_cnt")).as("ttot"),
        map_from_entries(collect_list(
          struct(col("b"), struct(col("r_cnt"), col("t_cnt"))))).as("m"))
      .select(transform(sequence(lit(0), lit(b - 1)), i => {
        val e = try_element_at(col("m"), i)
        val tc = coalesce(e.getField("t_cnt"), lit(0L))
        val rc = coalesce(e.getField("r_cnt"), lit(0L))
        val lt = log((tc + lit(1L)).cast("double") /
          (col("ttot") + lit(b.toLong)).cast("double"))
        val lr = log((rc + lit(1L)).cast("double") /
          (col("rtot") + lit(b.toLong)).cast("double"))
        floor((lt - lr) * lit(1e6) + lit(0.5)).cast("long")
      }).as("__lam"))

    // scoring: pure projection over the checkpointed bucket arrays; the
    // per-row fold is exact BIGINT; top-k plans as TakeOrdered
    bk.crossJoin(broadcast(lamRow))
      .select(col("doc_id"),
        size(col("__bk")).cast("long").as("n_bigrams"),
        aggregate(col("__bk"), lit(0L),
          (acc, bi) => acc + element_at(col("__lam"), bi + lit(1)))
          .as("logw_u"))
      .withColumn("logw", col("logw_u").cast("double") / lit(1e6))
      .orderBy(col("logw_u").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Bucket count for [[dsirTopK]]'s hashed-bigram model, sized so the
    * MEAN bucket sees ~`targetDocsPerBucket` documents: smallest power
    * of two in [256, 2^20] with buckets · target >= n — pure integer
    * arithmetic (the [[Similarity.autoCells]] convention) so the SQL
    * oracle derives the identical count from count(*) of the SAME
    * unfiltered relation. Model resolution now grows with the corpus
    * instead of saturating a fixed 1024 buckets at 100 TB; the 2^20 cap
    * bounds the broadcast model row at 8 MB of longs, past which
    * (~67M docs at the default target) resolution saturates gracefully
    * (more docs per bucket, same model size).
    */
  def autoBuckets(n: Long, targetDocsPerBucket: Int = 64): Int =
    (8 to 20).map(1 << _).find(b => b.toLong * targetDocsPerBucket >= n)
      .getOrElse(1 << 20)

  /** Greedy per-group token-budget fill: within each `grp`, documents are
    * ranked (quality `score` DESC, id ASC) and kept while the running
    * token total stays within `budget` — the strict-prefix rule (an
    * overflowing document is dropped and nothing later back-fills), so
    * the kept set is a deterministic function of (score, id).
    *
    * Scale shape: the obvious spelling — a per-group window over the
    * whole corpus — sorts entire groups on single executors (the
    * documented per-group hot-path anti-pattern). Instead the cut is
    * decided on the (grp, score) GRID, q100's value-grid argument: the
    * score is a 4dp ratio (<= 10001 distinct values), so the grid
    * aggregate is tiny; a grid window computes each band's
    * tokens-strictly-above (`cum_before`), broadcast back onto the
    * corpus, and every document in a band that fits wholly within
    * (`cum_before + band_tok <= budget`) or wholly beyond
    * (`cum_before > budget`) the budget is decided BY PROJECTION. Only
    * the single boundary band per group — restricted FIRST, then
    * windowed, per the restrict-then-recompute rule — pays a per-row
    * prefix sum (partitioned by (grp, score), ordered by id). Degenerate
    * worst case (every document the same score) collapses to the naive
    * window, documented and spec-gated; typical corpora window <1% of
    * rows.
    *
    * CALLER CONTRACT: `score` must be grid-valued (quantized — q137
    * rounds to 4dp, <= 10001 distinct values). The (grp, score) grid is
    * checkpointed and BROADCAST; an unquantized continuous score makes
    * the grid corpus-sized and the broadcast the bottleneck.
    */
  def budgetCut(scored: DataFrame, grp: Column, id: Column, score: Column,
      nTokens: Column, budget: Long): DataFrame = {
    require(budget >= 0L, s"budgetCut: budget=$budget must be >= 0")
    val base = scored.select(grp.as("grp"), id.as("doc_id"),
        score.as("score"), nTokens.as("n_tokens"))
      .filter(col("score").isNotNull)
    // coalesce: a band whose EVERY n_tokens is NULL sums to NULL, which
    // would make wholeIn AND the boundary predicate both NULL and
    // silently drop the band from BOTH union branches (naive keeps them:
    // its window sum ignores nulls). band_tok = 0 matches that
    // null-ignoring window semantics exactly.
    val grid = base.groupBy(col("grp"), col("score"))
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("band_tok"))
    val above = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the grid is tiny (groups x <=10001 score values) but feeds BOTH
    // union branches — checkpoint it once or the whole grid subtree
    // (two exchanges + a corpus scan) plans twice
    val cum = grid.withColumn("cum_before",
      coalesce(sum(col("band_tok")).over(above), lit(0L)))
      .localCheckpoint(true)
    // null-SAFE keys: a NULL grp is its own group (window-partition
    // semantics, what the oracle's PARTITION BY does) — a plain equi-join
    // would silently drop those rows (the edge-corpus NULL-lang bug)
    val cumR = cum.withColumnRenamed("grp", "__g")
      .withColumnRenamed("score", "__s")
    val joined = base.join(broadcast(cumR),
        col("grp") <=> col("__g") && col("score") <=> col("__s"))
      .drop("__g", "__s")
    val wholeIn = col("cum_before") + col("band_tok") <= lit(budget)
    val wholeOut = col("cum_before") > lit(budget)
    val outCols = Seq(col("grp"), col("doc_id"), col("score"),
      col("n_tokens"))
    val easy = joined.filter(wholeIn || wholeOut)
      .select(outCols :+ wholeIn.as("kept"): _*)
    val inBand = Window.partitionBy(col("grp"), col("score"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // coalesce: leading NULL-n_tokens rows inside the boundary band
    // would otherwise get cum_in = NULL -> kept = NULL
    val boundary = joined.filter(!wholeIn && !wholeOut)
      .withColumn("cum_in",
        coalesce(sum(col("n_tokens")).over(inBand), lit(0L)))
      .select(outCols :+
        (col("cum_before") + col("cum_in") <= lit(budget)).as("kept"): _*)
    easy.unionByName(boundary)
  }

  /** The naive window spelling of [[budgetCut]] — the spec's equivalence
    * oracle (and the DuckDB oracle's shape). Never used in a hot path:
    * it sorts whole groups.
    */
  private[graft] def budgetCutNaive(scored: DataFrame, grp: Column,
      id: Column, score: Column, nTokens: Column, budget: Long): DataFrame = {
    val base = scored.select(grp.as("grp"), id.as("doc_id"),
        score.as("score"), nTokens.as("n_tokens"))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // coalesce: a group-leading run of NULL n_tokens has running sum
    // NULL (null-ignoring sum over nothing), which must read as 0 kept
    // tokens, not a NULL kept flag
    base.withColumn("kept",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)) <= lit(budget))
      .select(col("grp"), col("doc_id"), col("score"), col("n_tokens"),
        col("kept"))
  }
}
