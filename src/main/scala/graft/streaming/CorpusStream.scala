package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Enriched, quality-gated document ready for budget accounting. */
case class CuratedDoc(doc_id: Long, ingest_ts: Timestamp, lang_pred: String,
    n_tokens: Long, fp: String)

/** Budget-gate verdict: running per-language token total at admission. */
case class Admission(doc_id: Long, lang_pred: String, n_tokens: Long,
    cum_tokens: Long, admitted: Boolean)

/** Per-language budget accumulator carried across micro-batches. */
case class BudgetState(total: Long)

/** The corpus-curation pipeline (q79's batch shape) on an UNBOUNDED
  * document stream — the online form of training-data ingestion: quality
  * gate → watermark-bounded exact dedup on the token-bag fingerprint →
  * stateful per-language token-budget admission. Stages 1-2 are the same
  * plans batch and streaming (Structured Streaming's unified Dataset
  * contract); stage 3 carries one O(1) counter per language in the state
  * store, so the operator scales to any stream rate — the state size is
  * the language cardinality, not the document count.
  */
object CorpusStream {

  /** Stateless enrichment + quality gate: token count, language ID, and
    * the normalized (token-bag) fingerprint — one narrow projection, no
    * shuffle, identical in batch and streaming. Untimed rows (null
    * ingest_ts) are EXCLUDED, the same event-time contract the batch
    * window queries pin: a null event time cannot be watermarked, and it
    * would NPE the budget gate's in-batch ordering.
    */
  def enrich(docs: DataFrame, minTokens: Long = 20): Dataset[CuratedDoc] = {
    implicit val enc: Encoder[CuratedDoc] = Encoders.product[CuratedDoc]
    // staged: tokens → scores → predict (the interpreted stopword filters
    // and the argmax CASE chain would otherwise re-tokenize per mention —
    // see TextAnalysis.stopwordHits)
    val scores = TextAnalysis.langScores(col("__tk"))
    val scoreAttrs = scores.map { case (n, _) => n -> col(n) }
    docs.filter(col("ingest_ts").isNotNull)
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .select(Seq(
        col("doc_id"),
        col("ingest_ts"),
        TextAnalysis.tokenCountFrom(col("text"), col("__tk")).as("n_tokens"),
        TextAnalysis.normalizedHashFrom(col("__tk")).as("fp")) ++
        scores.map { case (n, c) => c.as(n) }: _*)
      .select(
        col("doc_id"),
        col("ingest_ts"),
        TextAnalysis.langPredict(scoreAttrs).as("lang_pred"),
        col("n_tokens"),
        col("fp"))
      .filter(col("n_tokens") >= minTokens)
      .as[CuratedDoc]
  }

  /** Watermark-bounded exact dedup on the normalized fingerprint: the
    * streaming form of q33's keep-first. State holds only fingerprints
    * inside the lateness horizon — an unbounded dedup set would OOM at
    * stream scale; the watermark makes eviction explicit.
    */
  def dedup(docs: Dataset[CuratedDoc],
      watermark: String = "10 minutes"): Dataset[CuratedDoc] = {
    implicit val enc: Encoder[CuratedDoc] = Encoders.product[CuratedDoc]
    docs.withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .as[CuratedDoc]
  }

  /** Stateful per-language token-budget admission: each document is
    * emitted with the language's running total at its admission point and
    * an `admitted` verdict (docs arriving after the budget filled are
    * flagged, not dropped — the caller chooses to divert or discard).
    * A rejected document does NOT advance the total, and its row carries
    * the unchanged running total — `cum_tokens` is always the tokens
    * actually consumed so far, monotone within a language. Within a
    * micro-batch, documents are ordered by (ingest_ts, doc_id) so the
    * cutoff is deterministic under any partitioning/arrival order.
    *
    * Memory bound: persistent STATE is O(1) per language, but the
    * deterministic in-batch ordering buffers each language's share of ONE
    * micro-batch in its task's heap (`ds.toSeq.sortBy`). That is the
    * micro-batch sizing knob (`maxOffsetsPerTrigger` etc.), not a stream-
    * length bound — a hot language still must fit its per-trigger slice,
    * so size triggers accordingly.
    */
  def budgetGate(docs: Dataset[CuratedDoc],
      budgetPerLang: Long): Dataset[Admission] = {
    implicit val admitEnc: Encoder[Admission] = Encoders.product[Admission]
    implicit val stateEnc: Encoder[BudgetState] = Encoders.product[BudgetState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    docs.groupByKey(_.lang_pred)
      .flatMapGroupsWithState[BudgetState, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (lang: String, ds: Iterator[CuratedDoc],
            state: GroupState[BudgetState]) =>
          var total = state.getOption.map(_.total).getOrElse(0L)
          val out = ds.toSeq.sortBy(d => (d.ingest_ts.getTime, d.doc_id))
            .map { d =>
              val admitted = total < budgetPerLang
              if (admitted) total += d.n_tokens
              Admission(d.doc_id, lang, d.n_tokens, total, admitted)
            }
          state.update(BudgetState(total))
          out.iterator
      }
  }

  /** The full streaming pipeline, composed. */
  def pipeline(docs: DataFrame, minTokens: Long = 20,
      watermark: String = "10 minutes",
      budgetPerLang: Long = 50000L): Dataset[Admission] =
    budgetGate(dedup(enrich(docs, minTokens), watermark), budgetPerLang)

  /** NEAR-dup admission against a static BASE corpus — the stage the
    * in-stream stages above cannot express: [[dedup]] catches only exact
    * token-bag repeats *within* the stream's watermark, while a crawl
    * drop's worst duplicates are near-copies of documents already IN the
    * accepted corpus. Runs [[graft.operators.Dedup.incrementalDedup]]
    * (exact fingerprint + cross-side MinHash-banded candidates + exact
    * Jaccard verify, hot buckets capped) base-vs-batch and keeps only
    * batch docs that are neither exact nor near dups.
    *
    * This is a multi-join batch plan, so it runs per micro-batch inside
    * `foreachBatch` with `base` as a static frame — the standard
    * stream-static pattern for joins streaming can't run incrementally:
    *
    * {{{
    * enriched.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
    *   CorpusStream.admitAgainstBase(b, base).write(...)   // + append to base
    * }
    * }}}
    *
    * The base side's fingerprint/signature/shingle relations are what a
    * production pipeline keeps MATERIALIZED between drops; here they are
    * recomputed from `base`'s plan each micro-batch — use
    * [[admitAgainstIndex]] when the drop cadence makes that recompute
    * matter (it reads only the narrow stored index relations).
    */
  def admitAgainstBase(batch: DataFrame, base: DataFrame,
      threshold: Double = 0.5, maxBucketSize: Int = 64): DataFrame =
    admitVerdicts(batch,
      graft.operators.Dedup.incrementalDedup(base, batch, col("doc_id"),
        col("text"), threshold, maxBucketSize = maxBucketSize))

  /** [[admitAgainstBase]] against a
    * [[graft.operators.Dedup.writeDedupIndex]]-materialized base — the
    * production form: per micro-batch the base corpus' TEXT is never
    * read, only its narrow parquet index relations; appending the
    * admitted docs' index rows after each batch keeps the index current.
    */
  def admitAgainstIndex(batch: DataFrame, indexPath: String,
      threshold: Double = 0.5, maxBucketSize: Int = 64): DataFrame =
    admitVerdicts(batch,
      graft.operators.Dedup.incrementalDedupWithIndex(indexPath, batch,
        col("doc_id"), col("text"), threshold,
        maxBucketSize = maxBucketSize))

  private def admitVerdicts(batch: DataFrame,
      verdicts: DataFrame): DataFrame =
    batch.join(
      verdicts.filter(!col("is_exact_dup") && !col("is_near_dup"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
}
