package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Multimodal, Sampling, Stats, TextAnalysis}

/** Training-data text operators as named, oracle-checked queries over the
  * `documents` table: token/quality stats, language ID, exact+normalized
  * dedup, n-gram Jaccard near-dup, MinHash-LSH and SimHash (rows-only
  * where a SQL oracle can't express the hash family), fingerprinting, and
  * the multimodal binary-column pipeline.
  */
object TextOps {

  private val q31_text_stats = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      // tokens staged as an attribute: the feature columns reference the
      // array 3+ times and the stopword filter runs interpreted —
      // CollapseProject keeps the layer because the alias is non-cheap
      // and multiply-used
      val feats = TextAnalysis.qualityFeatures(col("text"), col("__tk"))
      docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
    },
    oracle = Some("""
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_m,
        CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS n_distinct_tokens,
        CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE) /
          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS avg_token_len,
        CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
          t -> t IN ('the','a','of','and','is'))) AS BIGINT) AS stopword_hits
      FROM documents"""),
    doc = "text quality features: lengths, token stats, stopword ratio")

  private val q32_langid = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      // two staged layers: tokens (referenced by 4 interpreted filter
      // HOFs), then the score attributes (each referenced up to 3 more
      // times by the argmax CASE chain). Inlining both re-tokenized every
      // row ~11 times — 3× slower at 50k docs.
      val scores = TextAnalysis.langScores(col("__tk"))
      val scoreAttrs = scores.map { case (n, _) => n -> col(n) }
      docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id") +: scores.map { case (n, c) => c.as(n) }: _*)
        .select(
          (col("doc_id") +: scoreAttrs.map { case (n, c) => c } :+
            TextAnalysis.langPredict(scoreAttrs).as("lang_pred")): _*)
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      scores AS (
        SELECT doc_id,
          CAST(len(list_filter(tk, t -> t IN ('the','and','is','of','a'))) AS BIGINT) AS score_en,
          CAST(len(list_filter(tk, t -> t IN ('el','la','de','que','y'))) AS BIGINT) AS score_es,
          CAST(len(list_filter(tk, t -> t IN ('le','les','et','une','est'))) AS BIGINT) AS score_fr,
          CAST(len(list_filter(tk, t -> t IN ('der','die','und','das','ist'))) AS BIGINT) AS score_de
        FROM toks)
      SELECT doc_id, score_en, score_es, score_fr, score_de,
        CASE WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
             WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
             WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
             WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
             WHEN score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
             ELSE 'und' END AS lang_pred
      FROM scores"""),
    doc = "n-gram/stopword language-ID heuristic with deterministic argmax")

  private val q33_dedup_norm = Q(
    run = (s, d) =>
      Dedup.normalized(Tables.documents(s, d), col("doc_id"), col("text")),
    oracle = Some("""
      WITH fps AS (
        SELECT doc_id,
          md5(array_to_string(list_sort(
            regexp_split_to_array(lower(trim(text)), '\s+')), ' ')) AS fp
        FROM documents)
      SELECT doc_id, fp,
        count(*) OVER (PARTITION BY fp) AS group_n,
        row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS is_kept
      FROM fps"""),
    doc = "normalized (token-bag) exact dedup, keep-min-id")

  private val q34_jaccard_pairs = Q(
    run = (s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        threshold = 0.5),
    oracle = Some("""
      WITH sh0 AS (
        SELECT DISTINCT doc_id, substr(text, CAST(g AS INTEGER), 16) AS sh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents)),
      rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 50),
      sh AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
        CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5"""),
    doc = "exact char-shingle Jaccard near-dup pairs")

  // Shuffle-free form: the fingerprint is a PER-DOC reduction, so it never
  // needs the exploded (doc, shingle) relation — `array_min(transform(...))`
  // folds each doc's own shingle array map-side (min over the distinct set
  // equals min over the multiset, so the dedup only feeds the count). The
  // explode+groupBy form shuffled a 200-rows-per-doc relation just to fold
  // it right back to one row per doc — 4× slower at 50k docs. The distinct
  // array is STAGED as an attribute before the lambdas reference it
  // (HOF lambdas re-evaluate inlined subtrees per element).
  private val q35_fingerprint = Q(
    run = (s, d) =>
      Tables.documents(s, d)
        // NULL text: both engines see greatest(NULL, 1) = 1, so the doc
        // keeps ONE [NULL] shingle → a (NULL fingerprint, n_shingles=1)
        // row — pinned by the edge corpus; do not filter NULL text here
        .select(col("doc_id"),
          array_distinct(graft.operators.TextAnalysis.charShingles(
            col("text"))).as("dsh"))
        .select(col("doc_id"),
          array_min(transform(col("dsh"), s0 => md5(s0))).as("fingerprint"),
          size(col("dsh")).cast("long").as("n_shingles")),
    oracle = Some("""
      WITH sh AS (
        SELECT DISTINCT doc_id, substr(text, CAST(g AS INTEGER), 16) AS sh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents))
      SELECT doc_id, min(md5(sh)) AS fingerprint, count(*) AS n_shingles
      FROM sh GROUP BY doc_id"""),
    doc = "min-shingle-hash document fingerprint (winnowing-style)")

  // The MinHash/SimHash hash families run on Dedup.portableHash64 (a
  // 60-bit md5 fold both engines can compute), so the FULL signature →
  // banding → verification pipelines are reproduced in DuckDB SQL below —
  // hard rows+schema+hash oracles, not rows-only checks. The SQL is
  // generated from the same hashParams/band constants the Spark plans use,
  // so the two sides cannot drift.

  // DuckDB spelling of Dedup.portableHash64
  private def duckHash64(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  private val minhashOracleSql: String = {
    val k = 16
    val bands = 4
    val rowsPerBand = k / bands
    val sigDefs = Dedup.hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      s"min((x * $a + $b) % ${Dedup.P}) AS sig_$i"
    }.mkString(",\n          ")
    val bandEq = (0 until bands).map { bnd =>
      (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
        .map(i => s"a.sig_$i = b.sig_$i").mkString("(", " AND ", ")")
    }.mkString("\n              OR ")
    s"""
      WITH sh AS (
        SELECT DISTINCT doc_id,
          ${duckHash64("substr(text, CAST(g AS INTEGER), 16)")} AS shh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents)),
      sig AS (
        SELECT doc_id,
          $sigDefs
        FROM (SELECT doc_id, shh % ${Dedup.P} AS x FROM sh)
        GROUP BY doc_id),
      cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          AND ($bandEq)),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT doc_a, doc_b, count(*) AS inter
        FROM cand
        JOIN sh sa ON sa.doc_id = doc_a
        JOIN sh sb ON sb.doc_id = doc_b AND sa.shh = sb.shh
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5"""
  }

  // q118's oracle: the same signature/band replay as q36, but scored by
  // the SIGNATURE-estimated Jaccard (matching components / k) with an
  // integer minimum-match cut — no shingle-verify join at all.
  private val estimatedPairsOracleSql: String = {
    val k = 16
    val bands = 4
    val threshold = 0.5
    val minMatch = math.ceil(threshold * k).toInt
    val rowsPerBand = k / bands
    val sigDefs = Dedup.hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      s"min((x * $a + $b) % ${Dedup.P}) AS sig_$i"
    }.mkString(",\n          ")
    val bandEq = (0 until bands).map { bnd =>
      (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
        .map(i => s"a.sig_$i = b.sig_$i").mkString("(", " AND ", ")")
    }.mkString("\n              OR ")
    val matchTerms = (0 until k)
      .map(i => s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" +\n            ")
    s"""
      WITH sh AS (
        SELECT DISTINCT doc_id,
          ${duckHash64("substr(text, CAST(g AS INTEGER), 16)")} AS shh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents)),
      sig AS (
        SELECT doc_id,
          $sigDefs
        FROM (SELECT doc_id, shh % ${Dedup.P} AS x FROM sh)
        GROUP BY doc_id),
      scored AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          $matchTerms AS n_match
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          AND ($bandEq))
      SELECT doc_a, doc_b, CAST(n_match AS INTEGER) AS n_match,
        CAST(n_match AS DOUBLE) / $k AS est_jaccard
      FROM scored WHERE n_match >= $minMatch"""
  }

  private val q118_estimated_pairs = Q(
    run = (s, d) =>
      Dedup.minhashEstimatedPairs(Tables.documents(s, d), col("doc_id"),
        col("text"), threshold = 0.5),
    oracle = Some(estimatedPairsOracleSql),
    doc = "estimate-only MinHash pairs: signature-component Jaccard, no " +
      "shingle verify (the 100 TB fast path)")

  private val q36_minhash_pairs = Q(
    run = (s, d) =>
      Dedup.minhashDedup(Tables.documents(s, d), col("doc_id"), col("text"),
        threshold = 0.5),
    oracle = Some(minhashOracleSql),
    doc = "MinHash+LSH banded near-dup (candidates verified with Jaccard)")

  private val simhashOracleSql: String = {
    val bitTerms = (0 until Dedup.SimhashBits).map { b =>
      s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN w ELSE -w END) > 0" +
        s" THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" +\n          ")
    val bandEq = (0 until 4).map { bnd =>
      s"((a.simhash >> ${bnd * 16}) & 65535) = ((b.simhash >> ${bnd * 16}) & 65535)"
    }.mkString("\n              OR ")
    s"""
      WITH tok AS (
        -- saturated tf votes: w = least(tf, cap), mirroring
        -- Dedup.simhash's groupBy(doc_id, t) + least(count, cap)
        SELECT doc_id, ${duckHash64("t")} AS h,
               least(count(*), ${Dedup.SimhashTfCap}) AS w
        FROM (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
              FROM documents)
        GROUP BY doc_id, t),
      sim AS (
        SELECT doc_id,
          $bitTerms AS simhash
        FROM tok GROUP BY doc_id)
      SELECT doc_a, doc_b, hamming FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
          AND ($bandEq))
      WHERE hamming <= 6"""
  }

  private val q37_simhash = Q(
    run = (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        maxHamming = 6),
    oracle = Some(simhashOracleSql),
    doc = "60-bit SimHash near-dup pairs, 16-bit band pigeonhole buckets")

  private val q38_multimodal = Q(
    run = (s, d) =>
      Multimodal.extractFeatures(
        Multimodal.ingestAsBinary(Tables.documents(s, d))),
    oracle = Some("""
      SELECT doc_id AS asset_id,
        'application/octet-stream' AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
        CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height,
        CAST(ascii(text) AS INTEGER) AS first_byte,
        source AS meta_source
      FROM documents"""),
    doc = "multimodal binary-column pipeline (deterministic fake decode)")

  // --- perceptual image dedup, fully oracled on the DETERMINISTIC fake
  //     decode: the "luma thumb" is the codepoints of the first 64 chars
  //     (space-padded — ascii() is codepoint-identical across engines,
  //     verified incl. astral planes), and everything downstream is the
  //     REAL production pipeline — Multimodal.aHash (integer mean
  //     threshold, two-half packing) → 4×16-bit pigeonhole bands →
  //     XOR+popcount verify (imageDupPairs), exactly what the
  //     javax.imageio decode feeds; the codec itself stays spec-gated
  //     because binary codecs aren't DuckDB-expressible (q38's split).
  //     Oracle notes: DuckDB ERRORS on left-shift overflow (1<<63), so
  //     the oracle reconstructs the signed 64-bit hash as a HUGEINT sum
  //     with bit 64 weighted −2^63 (exact two's complement), and band
  //     extraction uses (h >> 16b) & 65535, which is shift-flavor
  //     agnostic after the mask.
  private val imageDupOracleSql: String = {
    val pw = "CASE WHEN i = 64 THEN CAST(-9223372036854775808 AS BIGINT) " +
      "ELSE CAST(1 AS BIGINT) << CAST(i - 1 AS INTEGER) END"
    val bandEq = (0 until 4).map { b =>
      s"((a.h >> ${b * 16}) & 65535) = ((b.h >> ${b * 16}) & 65535)"
    }.mkString("\n              OR ")
    s"""
      WITH t AS (
        SELECT doc_id AS asset_id, rpad(text, 64, ' ') AS p
        FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      pix AS (
        SELECT asset_id, CAST(r.i AS INTEGER) AS i,
          CAST(ascii(substr(p, CAST(r.i AS INTEGER), 1)) AS BIGINT) AS v
        FROM t, range(1, 65) r(i)),
      tot AS (SELECT asset_id, sum(v) AS total FROM pix GROUP BY 1),
      hash AS (
        SELECT pix.asset_id,
          CAST(sum(CASE WHEN v * 64 >= total THEN $pw
                        ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h
        FROM pix JOIN tot USING (asset_id)
        GROUP BY pix.asset_id)
      SELECT asset_a, asset_b, dist FROM (
        SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
          CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS dist
        FROM hash a JOIN hash b ON a.asset_id < b.asset_id
          AND ($bandEq))
      WHERE dist <= 3"""
  }

  private val q134_image_dup = Q(
    run = (s, d) => {
      // the fake decode mirrors the REAL decoder's physical shape — a
      // typed mapPartitions producing the thumb as a materialized
      // attribute. A declarative transform() spelling is a trap here:
      // CollapseProject re-inlines the staged rpad/thumb aliases into
      // the HOF lambdas (each is textually referenced once, so the
      // more-than-once staging rule doesn't hold), and the inlined
      // aHash then re-computes the 64-element thumb PER BIT, per
      // consumer, re-evaluated again by a pushed isnotnull filter —
      // measured at 85 s for 5k docs vs 0.4 s for this form. Codepoint
      // walk == both engines' character-based substr/ascii semantics.
      import s.implicits._
      val decoded = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val ok = text != null && text.nonEmpty
          val thumb = if (!ok) null else {
            val arr = new Array[Long](64)
            var i = 0
            var p = 0
            while (i < 64) {
              if (p < text.length) {
                val cp = text.codePointAt(p)
                arr(i) = cp.toLong
                p += Character.charCount(cp)
              } else arr(i) = 32L // the rpad(…, ' ') tail
              i += 1
            }
            arr
          }
          (id, ok, thumb)
        }).toDF("asset_id", "decode_ok", "thumb8")
      graft.operators.Multimodal.imageDupPairs(decoded, maxBits = 3)
    },
    oracle = Some(imageDupOracleSql),
    doc = "perceptual image near-dup pairs: aHash + pigeonhole bands + " +
      "hamming verify on the deterministic fake-decode thumb")

  // --- concat-and-chunk sequence packing: the batch-prep step between a
  //     curated corpus and a trainer. Every assignment (shard, seq_no,
  //     offset) is integer-exact off the portable hash + md5 priority, so
  //     the DuckDB oracle replays the full layout bit-for-bit — including
  //     documents that span a sequence boundary (offset + n_tokens >
  //     seqLen), exactly as the standard loader cuts them.
  private val q135_seq_packing = Q(
    run = (s, d) =>
      TextAnalysis.packSequences(Tables.documents(s, d),
        col("doc_id"), col("text"), seqLen = 2048, shards = 32),
    oracle = Some(s"""
      WITH t AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(len(regexp_split_to_array(lower(trim(text)),
                 '\\s+')) AS BIGINT) END AS n_tokens
        FROM documents),
      p AS (
        SELECT doc_id, n_tokens,
          CAST(${duckHash64("CAST(doc_id AS VARCHAR)")} % 32 AS INTEGER)
            AS shard,
          md5(CAST(doc_id AS VARCHAR)) AS pri
        FROM t WHERE n_tokens > 0),
      c AS (
        SELECT doc_id, shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY shard
            ORDER BY pri NULLS LAST, doc_id NULLS LAST
            ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
        FROM p)
      SELECT doc_id, shard, CAST(strt // 2048 AS BIGINT) AS seq_no,
        CAST(strt % 2048 AS BIGINT) AS offset_in_seq, n_tokens
      FROM c"""),
    doc = "concat-and-chunk sequence packing: deterministic sharded " +
      "token-budget layout, boundary-spanning docs included")

  // --- the curation endgame, composed from the oracle-proven pieces
  //     above: quality gate (token count) ∧ normalized-dedup keep set →
  //     per-language corpus budget (docs + total tokens). This is the
  //     shape of a pretraining-corpus accounting query: every stage is a
  //     narrow column transform or one aggregation, no stage widens data.
  private val q79_corpus_pipeline = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      // staged: tokens → scores → predict (see q32 for the layering)
      val scores = TextAnalysis.langScores(col("__tk"))
      val scoreAttrs = scores.map { case (n, _) => n -> col(n) }
      val enriched = docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id") +: size(col("__tk")).cast("long")
          .as("n_tokens") +: scores.map { case (n, c) => c.as(n) }: _*)
        .select(col("doc_id"), col("n_tokens"),
          TextAnalysis.langPredict(scoreAttrs).as("lang_pred"))
      val kept = Dedup.normalized(docs, col("doc_id"), col("text"))
        .filter(col("is_kept")).select(col("doc_id"))
      enriched.join(kept, Seq("doc_id"), "left_semi")
        .filter(col("n_tokens") >= 20)
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      enriched AS (
        SELECT doc_id,
          CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(tk, t -> t IN ('the','and','is','of','a'))) AS BIGINT) AS score_en,
          CAST(len(list_filter(tk, t -> t IN ('el','la','de','que','y'))) AS BIGINT) AS score_es,
          CAST(len(list_filter(tk, t -> t IN ('le','les','et','une','est'))) AS BIGINT) AS score_fr,
          CAST(len(list_filter(tk, t -> t IN ('der','die','und','das','ist'))) AS BIGINT) AS score_de
        FROM toks),
      langs AS (
        SELECT doc_id, n_tokens,
          CASE WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
               WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
               WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
               WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
               WHEN score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
               ELSE 'und' END AS lang_pred
        FROM enriched),
      kept AS (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY
            md5(array_to_string(list_sort(
              regexp_split_to_array(lower(trim(text)), '\s+')), ' '))
            ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1)
      SELECT lang_pred, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM langs JOIN kept USING (doc_id)
      WHERE n_tokens >= 20
      GROUP BY lang_pred"""),
    doc = "corpus curation: quality gate ∧ dedup keep → per-language budget")

  // --- Gopher/C4-style repetition signals: duplicate-bigram ratio and
  //     top-token share — the "document is degenerate boilerplate" gate a
  //     pretraining filter applies before anything expensive. Pure HOF
  //     column math (no explode, no shuffle): per-row work, trivially
  //     partition-parallel at any scale.
  private val q81_repetition = Q(
    run = (s, d) => {
      // Materialize tokens, then bigrams, as ATTRIBUTES in staged
      // projections before anything references them repeatedly. An
      // inlined alias referenced inside a HOF lambda is re-evaluated PER
      // ELEMENT (HOFs run interpreted, outside codegen's subexpression
      // elimination) — with `tk` inlined, every bigram re-ran the regex
      // tokenizer over the full text and this query was ~10× slower.
      // CollapseProject keeps the stages apart: it never re-inlines an
      // expensive alias that is referenced more than once.
      val tkc = col("tk")
      val withTk = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      val withBg = withTk.select(col("doc_id"), tkc,
        TextAnalysis.ngrams(tkc, 2).as("bigrams"))
      // max token multiplicity via sorted run-length scan: equal tokens
      // are adjacent after array_sort, so the longest run IS the top
      // token's count; the fold carries (prev, run, best) — O(n log n)
      // per doc vs the O(n²) count-each-token-against-all form.
      val topTokN = aggregate(
        array_sort(tkc),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, t) => {
          val run = when(t === acc("prev"), acc("run") + lit(1L))
            .otherwise(lit(1L))
          struct(t.as("prev"), run.as("run"),
            greatest(acc("best"), run).as("best"))
        },
        acc => acc("best"))
      val bg = col("bigrams")
      withBg.select(col("doc_id"),
        size(bg).cast("long").as("n_bigrams"),
        size(array_distinct(bg)).cast("long").as("n_distinct_bigrams"),
        // 0 bigrams -> NULL ratio, matching the oracle's NULL division
        when(size(bg) > 0,
          lit(1.0) - size(array_distinct(bg)).cast("double") /
            size(bg).cast("double"))
          .otherwise(lit(null).cast("double")).as("dup_bigram_ratio"),
        (topTokN.cast("double") / size(tkc).cast("double"))
          .as("top_token_share"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      bg AS (
        SELECT doc_id, tk,
          list_transform(generate_series(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i + 1]) AS bigrams
        FROM toks)
      SELECT doc_id,
        CAST(len(bigrams) AS BIGINT) AS n_bigrams,
        CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
        CASE WHEN len(bigrams) = 0 THEN NULL
             ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) /
                        CAST(len(bigrams) AS DOUBLE) END AS dup_bigram_ratio,
        CAST(list_max(list_transform(tk,
               t -> len(list_filter(tk, u -> u = t)))) AS DOUBLE) /
          CAST(len(tk) AS DOUBLE) AS top_token_share
      FROM bg"""),
    doc = "repetition quality signals: dup-bigram ratio, top-token share")

  // --- regex redaction (the PII-scrub shape: emails/URLs/entities →
  //     placeholder) with hit accounting; per-row regexp work inside
  //     codegen, no shuffle
  private val q82_scrub = Q(
    run = (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        regexp_replace(col("text"), lit("\\b(customer|value)\\b"),
          lit("<redacted>")).as("scrubbed"),
        size(regexp_extract_all(col("text"),
          lit("\\b(customer|value)\\b"), lit(0))).cast("long").as("n_hits")),
    oracle = Some("""
      SELECT doc_id,
        regexp_replace(text, '\b(customer|value)\b', '<redacted>', 'g')
          AS scrubbed,
        CAST(len(regexp_extract_all(text, '\b(customer|value)\b'))
          AS BIGINT) AS n_hits
      FROM documents"""),
    doc = "regex redaction with hit counts (PII/entity scrub shape)")

  // --- decontamination probe: which corpus docs share any character
  //     shingle with a (small) probe/benchmark set — the n-gram-overlap
  //     contamination check run before training. The probe side is tiny
  //     by construction → broadcast; the corpus side never self-joins.
  private val q83_contamination = Q(
    run = (s, d) => {
      val sh = Dedup.shingles(Tables.documents(s, d), col("doc_id"),
        col("text"))
      val probes = sh.filter(col("doc_id") < 10)
        .select(col("sh"), col("doc_id").as("probe_id"))
      sh.filter(col("doc_id") >= 10)
        .join(broadcast(probes), Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("probe_id")).as("n_probes_hit"),
          countDistinct(col("sh")).as("n_shingles_hit"))
    },
    oracle = Some("""
      WITH sh AS (
        SELECT DISTINCT doc_id, substr(text, CAST(g AS INTEGER), 16) AS sh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents)),
      probes AS (SELECT sh, doc_id AS probe_id FROM sh WHERE doc_id < 10)
      SELECT s.doc_id,
             count(DISTINCT p.probe_id) AS n_probes_hit,
             count(DISTINCT s.sh) AS n_shingles_hit
      FROM sh s JOIN probes p USING (sh)
      WHERE s.doc_id >= 10
      GROUP BY s.doc_id"""),
    doc = "decontamination: corpus docs sharing shingles with a probe set")

  // --- TF-IDF top terms per document: the classic two-aggregation shape
  //     (term frequencies, then document frequencies off the same relation)
  //     + a broadcast scalar for N. Both aggregations are partial-agg
  //     friendly; the per-doc top-3 is one window over the scored relation.
  //     Scores are rounded to 6dp BEFORE ranking so the rank order (ties
  //     then broken by term) is identical across engines.
  private val q85_tfidf = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("term_tf"))
      // document frequency as a WINDOW over tf, not a groupBy+self-join:
      // the join form re-scans and re-aggregates the corpus (column
      // pruning makes the two tf subtrees differ, so AQE cannot reuse the
      // exchange) — the window computes df in the same pass
      val withDf = tf.withColumn("term_df",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = withDf
        .crossJoin(broadcast(n))
        .withColumn("tfidf", round(col("term_tf") *
          log(col("n_docs").cast("double") / col("term_df").cast("double")),
          6))
      // per-doc top-3 via the bounded heap (r13), not the
      // row_number().over(partitionBy) idiom: the window form exchanged
      // and SORTED every (doc, term) row by (doc_id, tfidf) just to keep
      // 3 per doc — CollectTopK keeps O(3) state per doc with map-side
      // partials, so <=3 rows per doc per partition enter the shuffle.
      // Ordering (tfidf DESC, term ASC) spelled as the k-SMALLEST of
      // (-tfidf, term) — tfidf is never negative (df <= n_docs), so the
      // negation cannot hit the -0.0/-Infinity ordering edges; ties are
      // impossible (term is unique per doc). The window spelling stays in
      // the ORACLE, per the repo rule.
      graft.operators.TopK.perGroup(scored, Seq("doc_id"),
          struct((-col("tfidf")).as("nt"), col("term").as("t")),
          payload = Seq("term", "term_tf", "term_df", "tfidf"),
          k = 3, largest = false)
        .select(col("doc_id"), col("term"), col("term_tf"), col("term_df"),
          col("tfidf"), col("rank").cast("long").as("rk"))
    },
    oracle = Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS term_tf
        FROM (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
              FROM documents)
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS term_df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.term_tf, dfreq.term_df,
               round(tf.term_tf * ln(CAST(n_docs AS DOUBLE) /
                 CAST(dfreq.term_df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN dfreq USING (term), n)
      SELECT doc_id, term, term_tf, term_df, tfidf, rk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term) AS rk
        FROM scored)
      WHERE rk <= 3"""),
    doc = "TF-IDF top terms per doc (two-phase agg + broadcast N)")

  // --- corpus n-gram counting (the language-model counts job): explode
  //     trigrams → one partial-agg'd count shuffle → global top-k via
  //     TakeOrdered. The <3-token guard mirrors q81's bigram edge fix.
  private val q86_ngram_counts = Q(
    run = (s, d) => {
      Tables.documents(s, d)
        .select(TextAnalysis.tokens(col("text")).as("tk"))
        .select(explode(TextAnalysis.ngrams(col("tk"), 3)).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    },
    oracle = Some("""
      WITH toks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      tri AS (
        SELECT unnest(list_transform(generate_series(1, len(tk) - 2),
          i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS ngram
        FROM toks)
      SELECT ngram, count(*) AS n FROM tri
      GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20"""),
    doc = "corpus trigram counts, global top-k (LM counts shape)")

  // --- deterministic hash-priority sampling per stratum: the reproducible
  //     "reservoir" — rank by md5(id) inside each language and keep the
  //     k smallest. Rerunnable on any cluster layout (no RNG state), and
  //     the sample is stable under corpus growth except where new docs
  //     genuinely displace old ranks — the property mixture re-balancing
  //     jobs rely on.
  private val q87_priority_sample = Q(
    // bottom-k per stratum rides TopK.perGroup's bounded heap: a hot
    // language is O(k) aggregation state, not a one-partition sort of
    // millions of md5 priorities (the row_number window this replaced —
    // still the oracle's spelling, same rows)
    run = (s, d) => {
      val pri = md5(col("doc_id").cast("string").cast("binary"))
      graft.operators.TopK.perGroup(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          Seq("lang"), struct(pri.as("p"), col("doc_id").as("i")),
          payload = Seq("doc_id"), k = 5, largest = false)
        .select(col("doc_id"), col("lang"), col("rank").cast("long").as("rk"))
    },
    oracle = Some("""
      SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      WHERE rk <= 5"""),
    doc = "hash-priority stratified sample (deterministic bottom-k per lang)")

  // --- dataset-mixture planning: per-language token inventory vs target
  //     mixture weights → per-language sampling rate against a global
  //     token budget. The aggregate is corpus-wide but the output is one
  //     row per language — the planning step that precedes q87-style
  //     sampled extraction. Weights/budget are plan literals (broadcast
  //     by constant folding, no side table).
  private val q88_mixture_plan = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      // staged: tokens → scores → predict (see q32 for the layering)
      val scores = TextAnalysis.langScores(col("__tk"))
      val scoreAttrs = scores.map { case (n, _) => n -> col(n) }
      val budget = 50000L
      val weight = typedLit(Map(
        "en" -> 0.5, "es" -> 0.2, "fr" -> 0.2, "de" -> 0.1))
      val perLang = docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(TextAnalysis.tokenCountFrom(col("text"), col("__tk"))
          .as("n_tokens") +: scores.map { case (n, c) => c.as(n) }: _*)
        .select(
          TextAnalysis.langPredict(scoreAttrs).as("lang_pred"),
          col("n_tokens"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
      perLang
        // try_element_at: ANSI mode makes plain element_at THROW on a map
        // miss ('und' has no weight) instead of returning NULL
        .withColumn("target_tokens",
          (coalesce(try_element_at(weight, col("lang_pred")), lit(0.0)) *
            lit(budget.toDouble)).cast("double"))
        // try_divide: a zero-token stratum (all-empty docs in a language)
        // would ANSI-throw on plain division; NULL drops out of least()
        // on both engines (DuckDB's inf/NaN likewise lose to 1.0)
        .withColumn("sample_rate",
          round(least(lit(1.0),
            try_divide(col("target_tokens"),
              col("lang_tokens").cast("double"))), 6))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
               END AS n_tokens
        FROM documents),
      scored AS (
        SELECT n_tokens,
          CAST(len(list_filter(tk, t -> t IN ('the','and','is','of','a'))) AS BIGINT) AS score_en,
          CAST(len(list_filter(tk, t -> t IN ('el','la','de','que','y'))) AS BIGINT) AS score_es,
          CAST(len(list_filter(tk, t -> t IN ('le','les','et','une','est'))) AS BIGINT) AS score_fr,
          CAST(len(list_filter(tk, t -> t IN ('der','die','und','das','ist'))) AS BIGINT) AS score_de
        FROM toks),
      langs AS (
        SELECT n_tokens,
          CASE WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
               WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
               WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
               WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
               WHEN score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
               ELSE 'und' END AS lang_pred
        FROM scored),
      per_lang AS (
        SELECT lang_pred, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
        FROM langs GROUP BY lang_pred)
      SELECT lang_pred, n_docs, lang_tokens,
        CASE lang_pred WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.2
                       WHEN 'fr' THEN 0.2 WHEN 'de' THEN 0.1
                       ELSE 0.0 END * 50000.0 AS target_tokens,
        round(least(1.0, (CASE lang_pred WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.2
                            WHEN 'fr' THEN 0.2 WHEN 'de' THEN 0.1
                            ELSE 0.0 END * 50000.0)
          / CAST(lang_tokens AS DOUBLE)), 6) AS sample_rate
      FROM per_lang"""),
    doc = "dataset-mixture plan: per-language sample rate vs token budget")

  // --- greedy sequence packing: assign docs to fixed token-budget bins
  //     (the training-sequence packing pass). One ordered window per
  //     language computes the running token offset; the bin id is
  //     offset div budget. Deterministic order (doc_id), pure long math.
  private val q89_pack_bins = Q(
    run = (s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("bin",
          floor((col("cum_tokens") - col("n_tokens"))
            .cast("double") / 2048.0).cast("long"))
        .withColumn("bin_offset", col("cum_tokens") - col("n_tokens")
          - col("bin") * 2048L)
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
               END AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
        FROM t)
      SELECT doc_id, lang, n_tokens, cum_tokens,
             CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 2048.0)
               AS BIGINT) AS bin,
             cum_tokens - n_tokens -
               CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 2048.0)
                 AS BIGINT) * 2048 AS bin_offset
      FROM c"""),
    doc = "greedy token-budget sequence packing (per-lang running offset)")

  // --- count-based LM scoring: the perplexity-filter shape — score each
  //     document by how common its trigrams are corpus-wide (avg ln of
  //     the corpus count). One explode feeds BOTH the count table and the
  //     per-doc relation (window over the same rows, not a self-join /
  //     re-scan — q85's lesson), so the corpus is tokenized once.
  private val q90_lm_score = Q(
    run = (s, d) => {
      val docTri = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          explode(TextAnalysis.ngrams(col("tk"), 3)).as("ngram"))
      val withCount = docTri.withColumn("n_corpus",
        count(lit(1)).over(Window.partitionBy(col("ngram"))))
      withCount.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_trigrams"),
          round(avg(log(col("n_corpus").cast("double"))), 6)
            .as("avg_ln_count"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      tri AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 2),
                 i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS ngram
        FROM toks),
      counted AS (
        SELECT doc_id, count(*) OVER (PARTITION BY ngram) AS n_corpus
        FROM tri)
      SELECT doc_id, count(*) AS n_trigrams,
             round(avg(ln(CAST(n_corpus AS DOUBLE))), 6) AS avg_ln_count
      FROM counted GROUP BY doc_id"""),
    doc = "count-based LM score per doc (perplexity-filter shape)")

  // --- token-window chunking: the context-length splitter --------------
  //
  // 64-token windows advancing by 48 (16-token overlap). The oracle
  // rebuilds the same start grid with generate_series and DuckDB's
  // 1-based inclusive list slice; NULL/whitespace-only docs emit nothing
  // on both sides (the tokenCount=0 contract).
  private val q92_chunks = Q(
    run = (s, d) => TextAnalysis.chunks(Tables.documents(s, d),
      col("doc_id"), col("text"), chunkSize = 64, overlap = 16),
    oracle = Some("""
      WITH tk AS (
        SELECT doc_id,
          CASE WHEN text IS NULL OR trim(text) = '' THEN NULL
               ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS tk
        FROM documents),
      n AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok
        FROM tk WHERE tk IS NOT NULL),
      s AS (
        SELECT doc_id, tk, n_tok,
          unnest(generate_series(0, greatest(n_tok - 16 - 1, 0), 48))
            AS tok_start
        FROM n)
      SELECT doc_id,
        CAST(tok_start // 48 AS BIGINT) AS chunk_idx,
        CAST(tok_start AS BIGINT) AS tok_start,
        CAST(least(64, n_tok - tok_start) AS BIGINT) AS chunk_tokens,
        array_to_string(tk[tok_start + 1 : tok_start + 64], ' ')
          AS chunk_text
      FROM s"""),
    doc = "overlapping token-window chunking (64/16 overlap)")

  // --- ADAPTIVE quality cut: the corpus decides its own threshold. A
  //     doc's quality score (4dp stopword density — codegen'd
  //     CountInSetExpr over a staged token array) is cut at the GLOBAL
  //     exact interpolated 20th percentile, computed scale-first via
  //     [[Stats.globalPercentiles]]: the single-partition step sees the
  //     4dp score GRID (<= 10001 distinct values), never the rows. NULL
  //     text -> NULL score -> excluded from both the percentile and the
  //     output (the percentile-aggregate contract).
  private val q100_quality_cut = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          round(try_divide(
            TextAnalysis.stopwordHits(col("__tk"),
              Seq("the", "a", "of", "and", "is")).cast("double"),
            size(col("__tk")).cast("double")), 4).as("score"))
      val thr = Stats.globalPercentiles(scored, "score", Seq("p20" -> 0.2))
      scored.filter(col("score").isNotNull)
        .crossJoin(broadcast(thr))
        .select(col("doc_id"), col("score"), col("p20"),
          (col("score") >= col("p20")).as("kept"))
    },
    oracle = Some("""
      WITH sc AS (
        SELECT doc_id,
          round(CAST(len(list_filter(tk, t -> t IN ('the','a','of','and','is'))) AS DOUBLE) /
                CAST(len(tk) AS DOUBLE), 4) AS score
        FROM (SELECT doc_id,
                regexp_split_to_array(lower(trim(text)), '\s+') AS tk
              FROM documents)),
      hist AS (
        SELECT score AS val, count(*) AS cnt
        FROM sc WHERE score IS NOT NULL GROUP BY 1),
      cum AS (
        SELECT val, sum(cnt) OVER (ORDER BY val) AS cum,
               sum(cnt) OVER () AS n
        FROM hist),
      agg AS (
        SELECT CAST(max(n) AS DOUBLE) AS n,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.2)+1 THEN val END) AS DOUBLE) AS lo,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.2)+2 THEN val END) AS DOUBLE) AS hi
        FROM cum),
      thr AS (
        SELECT round(CASE WHEN (n-1)*0.2 = floor((n-1)*0.2) THEN lo
          ELSE lo + ((n-1)*0.2 - floor((n-1)*0.2)) * (hi - lo) END, 6) AS p20
        FROM agg)
      SELECT s.doc_id, s.score, t.p20, s.score >= t.p20 AS kept
      FROM sc s, thr t WHERE s.score IS NOT NULL"""),
    doc = "adaptive quality filter: cut at the corpus's exact global p20")

  // --- deterministic training-shard export layout: portable-hash shard
  //     assignment (md5-fold, the q36/q87 hash) + a total order WITHIN
  //     each shard. The per-shard row_number IS the export sort — writing
  //     ordered shards requires exactly this one shuffle, keyed on the
  //     shard id, with 1/nshards of the corpus per sort (spilling, never
  //     buffering). Reproducible across cluster layouts: hash and
  //     tie-break are data-derived, nothing depends on partitioning.
  private val q101_shards = Q(
    run = (s, d) => {
      val h = Dedup.portableHash64(col("doc_id").cast("string"))
      Tables.documents(s, d).select(col("doc_id"))
        .withColumn("__h", h)
        .withColumn("shard", pmod(col("__h"), lit(64)).cast("int"))
        .withColumn("seq", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("__h"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("shard"), col("seq"))
    },
    oracle = Some("""
      WITH h AS (
        SELECT doc_id,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS h
        FROM documents)
      SELECT doc_id, CAST(h % 64 AS INT) AS shard,
        CAST(row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id)
             AS BIGINT) AS seq
      FROM h"""),
    doc = "deterministic shard export: portable-hash assignment + in-shard order")

  // --- RANGE-partitioned (equal-depth) shard export: the curriculum
  //     layout — shards ordered by a quality score, so shard k holds the
  //     corpus's k-th score band and within-shard order is the global
  //     sort restricted to the band. Boundaries are the EXACT global
  //     i/16 percentiles of the 4dp score (the q100 value-grid argument:
  //     the single-partition step sees <= 10001 distinct values, never
  //     rows), broadcast into a pure-map shard assignment; the only
  //     corpus-width exchange is the export shuffle itself, keyed on the
  //     shard id, each shard sorting 1/16 of the corpus (spilling, never
  //     buffering). Equal-depth up to score TIES — a 4dp grid puts many
  //     docs on each boundary value and ties never split (determinism
  //     beats exact balance; q101 is the hash layout when balance wins).
  //     i/16 fractions are exact in binary AND decimal, so the
  //     interpolated boundaries replay bit-identically in the oracle.
  private val RangeShardCount = 16
  private val q103_range_shards = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          round(try_divide(
            TextAnalysis.stopwordHits(col("__tk"),
              Seq("the", "a", "of", "and", "is")).cast("double"),
            size(col("__tk")).cast("double")), 4).as("score"))
        .filter(col("score").isNotNull)
      val bounds = Stats.globalPercentiles(scored, "score",
        (1 until RangeShardCount).map(i =>
          s"b$i" -> i.toDouble / RangeShardCount))
      // shard = boundaries strictly below the score (boundary ties go to
      // the LOWER shard) — a codegen'd sum of compares, no search
      val shardCol = (1 until RangeShardCount)
        .map(i => when(col("score") > col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      scored.crossJoin(broadcast(bounds))
        .select(col("doc_id"), col("score"),
          shardCol.cast("int").as("shard"))
        .withColumn("seq", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("score"), col("doc_id"))).cast("long"))
    },
    oracle = Some(rangeShardsOracleSql),
    doc = "equal-depth range shards: exact percentile boundaries + " +
      "in-band global order")

  private def rangeShardsOracleSql: String = {
    val n = RangeShardCount
    val fr = (1 until n).map(i => i -> (i.toDouble / n).toString).toMap
    val loHis = (1 until n).map { i =>
      s"""CAST(min(CASE WHEN cum >= floor((n-1)*${fr(i)})+1 THEN val END)
            AS DOUBLE) AS lo$i,
          CAST(min(CASE WHEN cum >= floor((n-1)*${fr(i)})+2 THEN val END)
            AS DOUBLE) AS hi$i"""
    }.mkString(",\n          ")
    val interps = (1 until n).map { i =>
      s"""round(CASE WHEN (n-1)*${fr(i)} = floor((n-1)*${fr(i)}) THEN lo$i
            ELSE lo$i + ((n-1)*${fr(i)} - floor((n-1)*${fr(i)}))
                 * (hi$i - lo$i) END, 6) AS b$i"""
    }.mkString(",\n          ")
    val shardSum = (1 until n)
      .map(i => s"(CASE WHEN s.score > t.b$i THEN 1 ELSE 0 END)")
      .mkString(" +\n            ")
    s"""
      WITH sc AS (
        SELECT doc_id,
          round(CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS DOUBLE) /
                CAST(len(tk) AS DOUBLE), 4) AS score
        FROM (SELECT doc_id,
                regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
              FROM documents)),
      hist AS (
        SELECT score AS val, count(*) AS cnt
        FROM sc WHERE score IS NOT NULL GROUP BY 1),
      cum AS (
        SELECT val, sum(cnt) OVER (ORDER BY val) AS cum,
               sum(cnt) OVER () AS n
        FROM hist),
      agg AS (
        SELECT CAST(max(n) AS DOUBLE) AS n,
          $loHis
        FROM cum),
      thr AS (
        SELECT
          $interps
        FROM agg),
      sh AS (
        SELECT s.doc_id, s.score,
          CAST($shardSum AS INT) AS shard
        FROM sc s, thr t WHERE s.score IS NOT NULL)
      SELECT doc_id, score, shard,
        CAST(row_number() OVER (PARTITION BY shard
          ORDER BY score, doc_id) AS BIGINT) AS seq
      FROM sh"""
  }

  // --- cross-document repeated passages: the SUBSTRING-level dedup
  //     signal (doc-level dedup keeps two distinct pages that share a
  //     pasted boilerplate paragraph; this flags the shared windows).
  //     Windows = q92's chunking at 32/0 (full windows only), hashed
  //     with the portable md5 fold, cross-doc frequency via a window on
  //     the hash (the q34 one-exchange df shape).
  private val q104_repeated_passages = Q(
    run = (s, d) => Dedup.repeatedPassages(Tables.documents(s, d),
      col("doc_id"), col("text"), windowTokens = 32),
    oracle = Some(s"""
      WITH tk AS (
        SELECT doc_id,
          CASE WHEN text IS NULL OR trim(text) = '' THEN NULL
               ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS tk
        FROM documents),
      n AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok
        FROM tk WHERE tk IS NOT NULL),
      w AS (
        SELECT doc_id,
          ${duckHash64(
            "array_to_string(tk[tok_start + 1 : tok_start + 32], ' ')")} AS h
        FROM (SELECT doc_id, tk, n_tok,
                unnest(generate_series(0, greatest(n_tok - 1, 0), 32))
                  AS tok_start
              FROM n)
        WHERE n_tok - tok_start >= 32),
      occ AS (SELECT doc_id, h, count(*) AS n_occ FROM w GROUP BY 1, 2),
      df AS (SELECT doc_id, n_occ,
               count(*) OVER (PARTITION BY h) AS n_docs
             FROM occ)
      SELECT doc_id,
        CAST(sum(n_occ) AS BIGINT) AS n_windows,
        CAST(sum(CASE WHEN n_docs > 1 THEN n_occ ELSE 0 END) AS BIGINT)
          AS n_repeated,
        round(CAST(sum(CASE WHEN n_docs > 1 THEN n_occ ELSE 0 END) AS DOUBLE)
              / CAST(sum(n_occ) AS DOUBLE), 4) AS repeated_frac
      FROM df GROUP BY doc_id"""),
    doc = "cross-doc repeated passages (ExactSubstr-style window fingerprints)")

  // q102's oracle: the full two-stage incremental-dedup replay — the q33
  // fingerprint and the q36 signature/band/verify machinery, applied
  // CROSS-SIDE (base = even doc_ids, batch = odd). Generated from the
  // same hashParams/band constants as the Spark plan.
  // base-side hot-bucket cap for q102 — replayed verbatim in the oracle's
  // per-band ranked candidate CTEs (the q41/q99 replay-the-fuse pattern)
  private val IncDedupCap = 16

  private val incrementalOracleSql: String = {
    val k = 16
    val bands = 4
    val rowsPerBand = k / bands
    val sigDefs = Dedup.hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      s"min((x * $a + $b) % ${Dedup.P}) AS sig_$i"
    }.mkString(",\n          ")
    // cross-side candidates per band, with the base side ranked inside
    // its (band, bucket) and cut at the cap — the exact selection
    // Dedup.crossCandidates makes (representatives = lowest doc_ids)
    val bandCands = (0 until bands).map { bnd =>
      val cols = (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
      val part = cols.map(i => s"sig_$i").mkString(", ")
      val eq = cols.map(i => s"a.sig_$i = b.sig_$i").mkString(" AND ")
      s"""SELECT a.doc_id AS doc_base, b.doc_id AS doc_new
          FROM (SELECT doc_id, $part,
                  row_number() OVER (PARTITION BY $part
                    ORDER BY doc_id) AS rn
                FROM sigb) a
          JOIN sign b ON $eq
          WHERE a.rn <= $IncDedupCap"""
    }.mkString("\n          UNION ALL\n          ")
    def shCte(name: String, src: String) = s"""
      $name AS (
        SELECT DISTINCT doc_id,
          ${duckHash64("substr(text, CAST(g AS INTEGER), 16)")} AS shh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM $src))"""
    def sigCte(name: String, sh: String) = s"""
      $name AS (
        SELECT doc_id,
          $sigDefs
        FROM (SELECT doc_id, shh % ${Dedup.P} AS x FROM $sh)
        GROUP BY doc_id)"""
    s"""
      WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      fpb AS (SELECT md5(array_to_string(list_sort(
                regexp_split_to_array(lower(trim(text)), '\\s+')), ' ')) AS fp
              FROM base),
      fpn AS (SELECT doc_id, md5(array_to_string(list_sort(
                regexp_split_to_array(lower(trim(text)), '\\s+')), ' ')) AS fp
              FROM batch),
      exact_dup AS (
        SELECT DISTINCT n.doc_id FROM fpn n JOIN fpb b ON n.fp = b.fp),
      ${shCte("shb", "base")},
      ${shCte("shn", "batch")},
      ${sigCte("sigb", "shb")},
      ${sigCte("sign", "shn")},
      cand AS (
        SELECT DISTINCT doc_base, doc_new FROM (
          $bandCands)),
      szb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY doc_id),
      szn AS (SELECT doc_id, count(*) AS n FROM shn GROUP BY doc_id),
      inter AS (
        SELECT doc_base, doc_new, count(*) AS inter
        FROM cand
        JOIN shb sa ON sa.doc_id = doc_base
        JOIN shn sb ON sb.doc_id = doc_new AND sa.shh = sb.shh
        GROUP BY 1, 2),
      near_dup AS (
        SELECT DISTINCT doc_new AS doc_id
        FROM inter
        JOIN szb ON szb.doc_id = doc_base
        JOIN szn ON szn.doc_id = doc_new
        WHERE CAST(inter AS DOUBLE) / CAST(szb.n + szn.n - inter AS DOUBLE)
              >= 0.5)
      SELECT t.doc_id,
             (e.doc_id IS NOT NULL) AS is_exact_dup,
             (n.doc_id IS NOT NULL) AS is_near_dup
      FROM batch t
      LEFT JOIN exact_dup e ON t.doc_id = e.doc_id
      LEFT JOIN near_dup n ON t.doc_id = n.doc_id"""
  }

  // --- continuous-ingestion dedup: flag a NEW batch against the existing
  //     base corpus — exact fingerprint hit + cross-side MinHash-banded
  //     near-dup (verified). The base never self-joins; every stage of
  //     both engines' pipelines is generated from the same constants.
  private val q102_incremental_dedup = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        col("doc_id"), col("text"), threshold = 0.5,
        maxBucketSize = IncDedupCap)
    },
    oracle = Some(incrementalOracleSql),
    doc = "incremental batch-vs-base dedup (exact fp + cross-side LSH verify)")

  // --- bounded-heap per-group top-k: the 3 longest documents per
  //     (lang, source) stratum — the "best exemplars per slice" pick a
  //     curation pipeline runs before manual review. TopK.perGroup's
  //     CollectTopK aggregate keeps O(k) state per group and forwards at
  //     most k rows per group per input partition into the shuffle; the
  //     row_number-window oracle is the semantic it replaces (that form
  //     sorts every group member to keep 3).
  private val q107_topk_pergroup = Q(
    run = (s, d) =>
      graft.operators.TopK.perGroup(Tables.documents(s, d),
        Seq("lang", "source"),
        graft.operators.TopK.descByWithIdTieBreak(
          col("n_chars"), col("doc_id")),
        payload = Seq("doc_id", "n_chars"), k = 3),
    oracle = Some("""
      SELECT lang, source, rank, doc_id, n_chars FROM (
        SELECT lang, source, doc_id, n_chars,
          CAST(row_number() OVER (PARTITION BY lang, source
            ORDER BY n_chars DESC NULLS LAST, doc_id) AS INTEGER) AS rank
        FROM documents)
      WHERE rank <= 3"""),
    doc = "bounded-heap top-k per (lang, source): O(k) state, no window sort")

  // --- Directed shingle CONTAINMENT (|A∩B|/|A|): the sub-document
  //     inclusion signal Jaccard misses at unequal sizes (a doc quoted
  //     whole inside a much longer one). Same df-capped shingle relation
  //     as q34; either direction above the threshold keeps the pair.
  private val q115_containment = Q(
    run = (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), col("doc_id"),
        col("text"), threshold = 0.6),
    oracle = Some("""
      WITH sh0 AS (
        SELECT DISTINCT doc_id, substr(text, CAST(g AS INTEGER), 16) AS sh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM documents)),
      rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 50),
      sh AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
        CAST(inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS cont_a,
        CAST(inter AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS cont_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE greatest(CAST(inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE),
                     CAST(inter AS DOUBLE) / CAST(sb.n_sh AS DOUBLE))
            >= 0.6"""),
    doc = "directed shingle containment pairs: sub-document inclusion " +
      "dedup signal")

  // --- Boilerplate line removal (CCNet/RefinedWeb line-level cleanup):
  //     lines in >= 30% of a source's docs (df >= 2) are boilerplate;
  //     per-doc totals of kept/stripped occurrences. All shuffle keys are
  //     the portable 60-bit line hash; the boilerplate set and per-source
  //     doc counts are broadcast (bounded by lines-per-doc / 30%, not by
  //     corpus size). Threshold test is integer math on both engines.
  private val q116_boilerplate = Q(
    run = (s, d) => TextAnalysis.boilerplateLineStats(Tables.documents(s, d),
      col("doc_id"), col("source"), col("text"),
      boilerPct = 30, minDf = 2),
    oracle = Some(s"""
      WITH ln AS (
        SELECT doc_id, source, trim(l) AS line
        FROM (SELECT doc_id, source,
                unnest(string_split(text, chr(10))) AS l
              FROM documents)
        WHERE trim(l) <> ''),
      occ AS (
        SELECT source, doc_id, ${duckHash64("line")} AS lh,
          count(*) AS n_occ, max(length(line)) AS len
        FROM ln GROUP BY 1, 2, 3),
      dps AS (SELECT source, count(DISTINCT doc_id) AS n_docs
              FROM occ GROUP BY 1),
      ldf AS (SELECT source, lh, count(*) AS df FROM occ GROUP BY 1, 2),
      bl AS (SELECT ldf.source, ldf.lh
             FROM ldf JOIN dps USING (source)
             WHERE ldf.df * 100 >= 30 * dps.n_docs AND ldf.df >= 2)
      SELECT o.doc_id, o.source,
        CAST(sum(o.n_occ) AS BIGINT) AS n_lines,
        CAST(sum(CASE WHEN b.lh IS NOT NULL THEN o.n_occ ELSE 0 END)
          AS BIGINT) AS n_boiler,
        CAST(sum(CASE WHEN b.lh IS NULL THEN o.n_occ * o.len ELSE 0 END)
          AS BIGINT) AS kept_chars
      FROM occ o
      LEFT JOIN bl b ON o.source = b.source AND o.lh = b.lh
      GROUP BY 1, 2"""),
    doc = "boilerplate line removal stats: per-source line df threshold, " +
      "per-doc kept/stripped totals")

  // --- Proportional-allocation sampling: a GLOBAL budget of 50 docs
  //     apportioned across languages by token mass (Hamilton largest-
  //     remainder, pure integer arithmetic), each stratum then taking its
  //     allocation by md5 hash priority (the q87 selection). The entire
  //     allocation decision is integer DIV/MOD — no floating-point rate
  //     can round differently across engines.
  private val q119_proportional_sample = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Sampling.proportionalSample(
          docs.withColumn("__tk", TextAnalysis.tokens(col("text")))
            .select(col("doc_id"), col("lang"),
              TextAnalysis.tokenCountFrom(col("text"), col("__tk"))
                .as("__m")),
          col("doc_id"), col("lang"), col("__m"), budget = 50)
        .withColumnRenamed("stratum", "lang")
    },
    oracle = Some("""
      WITH tk AS (
        SELECT doc_id, lang,
          CASE WHEN text IS NULL THEN NULL
               WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
          END AS tc
        FROM documents WHERE lang IS NOT NULL),
      mass AS (SELECT lang, coalesce(sum(tc), 0) AS toks
               FROM tk GROUP BY lang),
      tot AS (SELECT greatest(coalesce(sum(toks), 0), 1) AS tot FROM mass),
      base AS (SELECT lang, toks, (50 * toks) // tot AS fl,
                      (50 * toks) % tot AS rem
               FROM mass, tot),
      sfl AS (SELECT coalesce(sum(fl), 0) AS sfl FROM base),
      alloc AS (
        SELECT lang,
          CAST(fl + (CASE WHEN rn <= 50 - sfl THEN 1 ELSE 0 END)
            AS BIGINT) AS alloc
        FROM (SELECT lang, fl,
                row_number() OVER (ORDER BY rem DESC, lang ASC NULLS LAST)
                  AS rn
              FROM base), sfl),
      sel AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents WHERE lang IS NOT NULL)
      SELECT s.doc_id, s.lang, CAST(s.rk AS BIGINT) AS rk, a.alloc
      FROM sel s JOIN alloc a ON s.lang = a.lang
      WHERE s.rk <= a.alloc"""),
    doc = "proportional-allocation sample: Hamilton integer apportionment " +
      "of a global budget by token mass, hash-priority selection")

  // --- Vocabulary coverage: top-100 tokens by corpus frequency with the
  //     prefix's cumulative share of all token occurrences — tokenizer
  //     vocab planning. cum_frac is an UNROUNDED double quotient of two
  //     longs (IEEE division is correctly rounded on every engine;
  //     round() on decimal boundaries is what splits them).
  private val q120_vocab_coverage = Q(
    run = (s, d) => TextAnalysis.vocabCoverage(Tables.documents(s, d),
      col("text"), v = 100),
    oracle = Some("""
      WITH toks AS (
        SELECT t AS tok
        FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
                '\s+')) AS t
              FROM documents)
        WHERE t <> ''),
      freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      total AS (SELECT coalesce(sum(cnt), 0) AS tot FROM freq),
      top AS (
        SELECT tok, cnt,
          CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rk,
          sum(cnt) OVER (ORDER BY cnt DESC, tok
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM freq)
      SELECT rk, tok, CAST(cnt AS BIGINT) AS cnt,
        CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_frac
      FROM top, total
      WHERE rk <= 100"""),
    doc = "vocab coverage: top-100 tokens, cumulative occurrence share")

  // --- Corpus drift report: token-distribution shift between the BASE
  //     corpus (even doc_ids) and a NEW batch (odd doc_ids) — the
  //     continuous-ingestion QA readout that catches a crawl drop whose
  //     language/spam mix moved. Per-token rates are IEEE quotients of
  //     exact longs (no rounding); the report is the top-50 tokens by
  //     absolute rate shift (ties: token ASC) — per-token OUTPUT rows,
  //     never a floating-point accumulation across tokens (order-
  //     dependent double sums are the cross-engine hazard).
  //     Scale: ONE corpus exchange (the conditional-sum token aggregate);
  //     totals broadcast; top-50 is TakeOrdered.
  private val q121_corpus_drift = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs
        .select((pmod(col("doc_id"), lit(2)) === 0).as("__is_base"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      // cached: totals and the report both consume the vocab-sized
      // frequency frame — without the cache the corpus token aggregate
      // runs TWICE (once under the broadcast totals subtree)
      val freq = toks.groupBy("tok")
        .agg(sum(when(col("__is_base"), lit(1L)).otherwise(lit(0L)))
          .as("cnt_base"),
          sum(when(!col("__is_base"), lit(1L)).otherwise(lit(0L)))
            .as("cnt_batch"))
        .cache()
      val totals = freq.agg(
        greatest(coalesce(sum(col("cnt_base")), lit(0L)), lit(1L)).as("tb"),
        greatest(coalesce(sum(col("cnt_batch")), lit(0L)), lit(1L)).as("tn"))
      freq.crossJoin(broadcast(totals))
        .select(col("tok"), col("cnt_base"), col("cnt_batch"),
          (col("cnt_base").cast("double") / col("tb").cast("double"))
            .as("p_base"),
          (col("cnt_batch").cast("double") / col("tn").cast("double"))
            .as("p_batch"))
        .withColumn("drift", abs(col("p_base") - col("p_batch")))
        .orderBy(col("drift").desc, col("tok").asc)
        .limit(50)
    },
    oracle = Some("""
      WITH toks AS (
        SELECT (doc_id % 2 = 0) AS is_base, t AS tok
        FROM (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
              FROM documents)
        WHERE t <> ''),
      freq AS (
        SELECT tok,
          CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT)
            AS cnt_base,
          CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT)
            AS cnt_batch
        FROM toks GROUP BY tok),
      totals AS (
        SELECT greatest(coalesce(sum(cnt_base), 0), 1) AS tb,
               greatest(coalesce(sum(cnt_batch), 0), 1) AS tn
        FROM freq),
      scored AS (
        SELECT tok, cnt_base, cnt_batch,
          CAST(cnt_base AS DOUBLE) / CAST(tb AS DOUBLE) AS p_base,
          CAST(cnt_batch AS DOUBLE) / CAST(tn AS DOUBLE) AS p_batch,
          abs(CAST(cnt_base AS DOUBLE) / CAST(tb AS DOUBLE) -
              CAST(cnt_batch AS DOUBLE) / CAST(tn AS DOUBLE)) AS drift
        FROM freq, totals)
      SELECT tok, cnt_base, cnt_batch, p_base, p_batch, drift
      FROM scored
      ORDER BY drift DESC, tok
      LIMIT 50"""),
    doc = "corpus drift: top-50 token-rate shifts between base corpus " +
      "and new batch")

  // --- Per-source dedup rate: the "which crawl source is most
  //     duplicated" QA readout — q33's normalized keep-flags rolled up by
  //     source with doc/char savings. The flag relation re-joins the
  //     narrow (doc_id, source, n_chars) projection on doc_id; NULL
  //     fingerprints (null text) group together on both engines (the
  //     null-safe q33 contract), and a dropped doc with NULL n_chars
  //     contributes nothing to chars_dropped on either engine.
  private val q124_source_dedup_rate = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.normalized(docs, col("doc_id"), col("text"))
        .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("is_kept"), lit(1L)).otherwise(lit(0L)))
            .as("n_dups"),
          sum(when(!col("is_kept"), col("n_chars")).otherwise(lit(0L)))
            .as("chars_dropped"))
        .withColumn("dup_frac",
          col("n_dups").cast("double") / col("n_docs").cast("double"))
    },
    oracle = Some("""
      WITH fps AS (
        SELECT doc_id, source, n_chars,
          md5(array_to_string(list_sort(
            regexp_split_to_array(lower(trim(text)), '\s+')), ' ')) AS fp
        FROM documents),
      fl AS (
        SELECT doc_id, source, n_chars,
          row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS is_kept
        FROM fps)
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
        CAST(sum(CASE WHEN is_kept THEN 0 ELSE n_chars END) AS BIGINT)
          AS chars_dropped,
        CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS dup_frac
      FROM fl GROUP BY source"""),
    doc = "per-source dedup rate: normalized-dup share and chars saved " +
      "by source")

  // --- Shard integrity manifest: per-shard doc/token counts and an
  //     ORDER-INDEPENDENT content checksum (bit_xor of a per-doc 60-bit
  //     content hash covering id + text, with a NULL-text sentinel so
  //     every doc is accounted). The reproducibility receipt a 100 TB
  //     export writes next to each shard: re-running the export on any
  //     partitioning/cluster must reproduce every checksum. XOR commutes,
  //     so the aggregate needs no ordering — ONE exchange with map-side
  //     partials.
  private val q125_shard_manifest = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val h = Dedup.portableHash64(col("doc_id").cast("string"))
      val contentHash = Dedup.portableHash64(
        concat(col("doc_id").cast("string"), lit(":"),
          coalesce(md5(col("text").cast("binary")), lit("null"))))
      docs
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(pmod(h, lit(64)).cast("int").as("shard"),
          TextAnalysis.tokenCountFrom(col("text"), col("__tk")).as("__tc"),
          contentHash.as("__ch"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("__tc")), lit(0L)).as("n_tokens"),
          expr("bit_xor(__ch)").as("checksum"))
    },
    oracle = Some("""
      WITH b AS (
        SELECT
          CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 64 AS INT) AS shard,
          CASE WHEN text IS NULL THEN NULL
               WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
          END AS tc,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
               coalesce(md5(text), 'null')), 1, 15) AS BIGINT) AS ch
        FROM documents)
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(coalesce(sum(tc), 0) AS BIGINT) AS n_tokens,
        bit_xor(ch) AS checksum
      FROM b GROUP BY shard"""),
    doc = "shard integrity manifest: per-shard counts + order-independent " +
      "XOR content checksum")

  // --- top PMI collocations: ranked by integer pair count (cross-engine
  //     exact); the PMI value itself is a libm ln, emitted 4dp-rounded as
  //     an OUTPUT-ONLY column (the CLAUDE.md round contract: rounds that
  //     are compared/accumulated are the hazard, output rounds are not).
  private val q129_pmi_bigrams = Q(
    run = (s, d) => TextAnalysis.pmiBigrams(Tables.documents(s, d),
      col("text"), minCount = 3, topK = 50),
    oracle = Some("""
      WITH tk AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents),
      big AS (
        SELECT t[CAST(g AS INTEGER)] AS w1,
               t[CAST(g AS INTEGER) + 1] AS w2
        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS g
              FROM tk WHERE len(t) >= 2)),
      uni AS (SELECT u AS w, count(*) AS c
              FROM (SELECT unnest(t) AS u FROM tk) GROUP BY 1),
      pc AS (SELECT w1, w2, count(*) AS n_pair
             FROM big GROUP BY 1, 2 HAVING count(*) >= 3),
      tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM big) AS nbg,
                     (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS ntok)
      SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
        round(ln(CAST(n_pair AS DOUBLE) * ntok * ntok /
          (nbg * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 4) AS pmi
      FROM pc JOIN uni ca ON ca.w = pc.w1
              JOIN uni cb ON cb.w = pc.w2, tot
      ORDER BY n_pair DESC, w1, w2 LIMIT 50"""),
    doc = "top PMI collocations: count-ranked adjacent token pairs with " +
      "output-only PMI")

  // --- batch-vs-base shingle novelty: the graded admission signal next
  //     to q102's binary verdicts (base = even doc_ids, batch = odd, the
  //     q102 convention).
  private val q130_novelty = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.noveltyVsBase(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        col("doc_id"), col("text"))
    },
    oracle = Some(s"""
      WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      shb AS (
        SELECT DISTINCT
          ${duckHash64("substr(text, CAST(g AS INTEGER), 16)")} AS shh
        FROM (SELECT text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM base)),
      shn AS (
        SELECT DISTINCT doc_id,
          ${duckHash64("substr(text, CAST(g AS INTEGER), 16)")} AS shh
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 15, 1), 4)) AS g
              FROM batch))
      SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
        CAST(count(*) FILTER (WHERE b.shh IS NULL) AS BIGINT) AS n_new,
        CAST(count(*) FILTER (WHERE b.shh IS NULL) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS novelty
      FROM shn n LEFT JOIN shb b USING (shh)
      GROUP BY 1"""),
    doc = "batch-vs-base shingle novelty: fraction of each batch doc's " +
      "shingles unseen in the base corpus")

  // --- weighted Bernoulli sampling by token mass: include prob
  //     min(1, m/500) decided by a pure integer compare on the avalanched
  //     hash bucket — the size-biased draw of the sampling family
  //     (uniform q87, stratified q54, proportional-allocation q119).
  private val q131_weighted_sample = Q(
    run = (s, d) => {
      val w = Tables.documents(s, d)
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCountFrom(col("text"), col("__tk")).as("m"))
      Sampling.weightedBernoulli(w, col("doc_id"),
          col("m"), num = 1, den = 500)
        .select(col("doc_id"), col("lang"), col("m"),
          least(lit(1.0), col("m").cast("double") / lit(500.0)).as("prob"))
    },
    oracle = Some(s"""
      WITH w AS (
        SELECT doc_id, lang,
          CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(len(regexp_split_to_array(lower(trim(text)),
                 '\\s+')) AS BIGINT) END AS m
        FROM documents)
      SELECT doc_id, lang, m,
        least(1.0, CAST(m AS DOUBLE) / 500.0) AS prob
      FROM w
      WHERE ${Sampling.hashBucketSql("doc_id")} * 500 <
        least(least(greatest(coalesce(m, 0), 0), 500) * 1, 500)
          * 4294967296"""),
    doc = "weighted Bernoulli sample by token mass: integer-exact " +
      "inclusion, no RNG")

  // --- the corpus DATASHEET card: the one-row summary every exported
  //     dataset ships with (docs/tokens/langs/sources, exact-dup rate,
  //     char mass). Pure counts + one exact-division rate — everything
  //     integer until the final quotients. Two shuffles total: the
  //     fingerprint group sizes and the global aggregate.
  private val q133_corpus_card = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      val flagged = Dedup.normalized(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), col("is_kept"))
      docs.withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"),
          TextAnalysis.tokenCountFrom(col("text"), col("__tk")).as("__m"))
        .join(flagged, Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("__m")), lit(0L)).as("n_tokens"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(col("source")).as("n_sources"),
          coalesce(sum(col("n_chars")), lit(0L)).as("n_chars"),
          count(when(!col("is_kept"), lit(1))).as("n_exact_dups"))
        .select(col("n_docs"), col("n_tokens"), col("n_langs"),
          col("n_sources"), col("n_chars"), col("n_exact_dups"),
          try_divide(col("n_exact_dups").cast("double"),
            col("n_docs").cast("double")).as("dup_rate"),
          try_divide(col("n_tokens").cast("double"),
            col("n_docs").cast("double")).as("tokens_per_doc"))
    },
    oracle = Some("""
      WITH fp AS (
        SELECT doc_id,
          md5(array_to_string(list_sort(
            regexp_split_to_array(lower(trim(text)), '\s+')), ' ')) AS f
        FROM documents),
      grp AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f),
      flags AS (
        SELECT fp.doc_id, (fp.doc_id = grp.keep_id) AS is_kept
        FROM fp JOIN grp ON fp.f IS NOT DISTINCT FROM grp.f),
      m AS (
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
          CASE WHEN length(trim(d.text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(lower(trim(d.text)),
                 '\s+')) END AS m,
          flags.is_kept
        FROM documents d JOIN flags ON d.doc_id = flags.doc_id)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(coalesce(sum(m), 0) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_chars,
        CAST(count(CASE WHEN NOT is_kept THEN 1 END) AS BIGINT)
          AS n_exact_dups,
        CASE WHEN count(*) = 0 THEN NULL
             ELSE CAST(count(CASE WHEN NOT is_kept THEN 1 END) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) END AS dup_rate,
        CASE WHEN count(*) = 0 THEN NULL
             ELSE CAST(coalesce(sum(m), 0) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) END AS tokens_per_doc
      FROM m"""),
    doc = "corpus datasheet card: one-row docs/tokens/langs/sources/" +
      "dup-rate summary")

  // --- DSIR importance selection: reweight the raw corpus toward a
  //     target distribution (here the English slice) over hashed-bigram
  //     bucket models, keep the k best. Per-bucket log-ratios are
  //     quantized to integer micros BEFORE the per-doc sum (exact BIGINT
  //     accumulation on both engines — the quantize-then-sum rule); the
  //     md5-fold hash makes bucketing replayable in SQL. See
  //     [[graft.operators.Selection.dsirTopK]] for the plan-shape story
  //     (one bounded distribution exchange, broadcast model row,
  //     projection scoring, TakeOrdered top-k).
  private val q136_dsir_select = Q(
    run = (s, d) =>
      graft.operators.Selection.dsirTopK(Tables.documents(s, d),
        col("doc_id"), col("text"), col("lang") === "en",
        buckets = 0, k = 200), // 0 = corpus-sized (Selection.autoBuckets)
    oracle = Some("""
      WITH params AS (
        SELECT coalesce(min(t.c), 1048576) AS nb
        FROM (VALUES (256),(512),(1024),(2048),(4096),(8192),(16384),
                     (32768),(65536),(131072),(262144),(524288),
                     (1048576)) t(c),
             (SELECT count(*) AS n FROM documents) n
        WHERE CAST(t.c AS BIGINT) * 64 >= n.n),
      tk AS (
        SELECT doc_id, lang = 'en' AS is_tgt,
               regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE text IS NOT NULL),
      bg AS (
        SELECT doc_id, is_tgt,
          unnest(list_transform(generate_series(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i + 1])) AS g
        FROM tk WHERE len(tk) >= 2),
      bk AS (
        SELECT doc_id, is_tgt,
          CAST(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % params.nb
               AS INTEGER) AS b
        FROM bg, params),
      dist AS (
        SELECT b, count(*) AS r_cnt,
               count(*) FILTER (WHERE is_tgt) AS t_cnt
        FROM bk GROUP BY b),
      tot AS (SELECT sum(r_cnt) AS rtot, sum(t_cnt) AS ttot FROM dist),
      lam AS (
        SELECT b,
          CAST(floor((ln((t_cnt + 1) / (ttot + CAST(params.nb AS DOUBLE)))
                    - ln((r_cnt + 1) / (rtot + CAST(params.nb AS DOUBLE))))
                     * 1e6 + 0.5)
               AS BIGINT) AS lam_u
        FROM dist, tot, params),
      w AS (
        SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(lam_u) AS BIGINT) AS logw_u
        FROM bk JOIN lam USING (b)
        GROUP BY bk.doc_id)
      SELECT doc_id, n_bigrams, logw_u,
             CAST(logw_u AS DOUBLE) / 1e6 AS logw
      FROM w
      ORDER BY logw_u DESC, doc_id
      LIMIT 200"""),
    doc = "DSIR importance selection: hashed-bigram target/raw " +
      "log-ratio weights, deterministic top-k")

  // --- greedy token-budget fill per language: rank by 4dp stopword
  //     density (score DESC, id ASC), keep the strict prefix whose token
  //     total fits 20k. The cut is decided on the (lang, score) GRID —
  //     only each language's single boundary band pays a per-row window;
  //     see [[graft.operators.Selection.budgetCut]].
  private val q137_token_budget = Q(
    run = (s, d) => {
      val scored = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCountFrom(col("text"), col("__tk"))
            .as("n_tokens"),
          // 4dp quantize in pure double math, NOT round(double, 4): the
          // score drives the budget-cut grid + kept flags, and round
          // splits engines on decimal-boundary rationals like 1/800
          // (the q108 rule). floor(x*1e4 + 0.5)/1e4 is bit-identical on
          // IEEE engines; x <= 1 so the scaled value is far below 2^53.
          (floor(try_divide(
            TextAnalysis.stopwordHits(col("__tk"),
              Seq("the", "a", "of", "and", "is")).cast("double"),
            size(col("__tk")).cast("double")) * lit(1e4) + lit(0.5))
            .cast("double") / lit(1e4)).as("score"))
      graft.operators.Selection.budgetCut(scored, col("lang"),
          col("doc_id"), col("score"), col("n_tokens"), budget = 20000L)
        .withColumnRenamed("grp", "lang")
    },
    oracle = Some("""
      WITH sc AS (
        SELECT doc_id, lang,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
          END AS n_tokens,
          floor(CAST(len(list_filter(tk, t ->
                  t IN ('the','a','of','and','is'))) AS DOUBLE) /
                CAST(len(tk) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS score
        FROM (SELECT doc_id, lang, text,
                regexp_split_to_array(lower(trim(text)), '\s+') AS tk
              FROM documents WHERE text IS NOT NULL)),
      cum AS (
        SELECT lang, doc_id, score, n_tokens,
          sum(n_tokens) OVER (PARTITION BY lang
            ORDER BY score DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS c
        FROM sc WHERE score IS NOT NULL)
      SELECT lang, doc_id, score, n_tokens, c <= 20000 AS kept
      FROM cum"""),
    doc = "greedy per-language token-budget fill (grid-decided cut, " +
      "boundary-band-only window)")

  // --- composite rule-based quality filter (Gopher-style, Rae et al.
  //     2021): each rule an independent boolean, pass = conjunction.
  //     Pure projection over staged tokens — ZERO exchanges, the ideal
  //     100 TB shape. NULL text pins every rule to false (the coalesce
  //     contract, not 3VL leak-through).
  private val q138_quality_rules = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("__tk", TextAnalysis.tokens(col("text")))
      val n = size(col("__tk")).cast("double")
      val nonWs = length(regexp_replace(trim(col("text")), "\\s+", ""))
      val alphaFrac = size(filter(col("__tk"),
        t => t.rlike("[a-z]"))).cast("double") / n
      val digitFrac = size(filter(col("__tk"),
        t => t.rlike("^[0-9]+$"))).cast("double") / n
      val avgLen = nonWs.cast("double") / n
      def r(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        coalesce(c, lit(false))
      val rules = Seq(
        "r_ntok" -> r(size(col("__tk")).between(50, 100000)),
        "r_len" -> r(avgLen.between(3.0, 10.0)),
        "r_stop" -> r(TextAnalysis.stopwordHits(col("__tk"),
          Seq("the", "a", "of", "and", "is")) >= 2),
        "r_alpha" -> r(alphaFrac >= 0.8),
        "r_digit" -> r(digitFrac <= 0.3))
      docs.select(col("doc_id") +: rules.map { case (nm, c) => c.as(nm) }: _*)
        .withColumn("pass",
          rules.map { case (nm, _) => col(nm) }.reduce(_ && _))
    },
    oracle = Some("""
      WITH tk AS (
        SELECT doc_id, text,
          regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      f AS (
        SELECT doc_id,
          coalesce(len(tk) BETWEEN 50 AND 100000, false) AS r_ntok,
          coalesce(CAST(length(regexp_replace(trim(text), '\s+', '', 'g'))
                        AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                   BETWEEN 3.0 AND 10.0, false) AS r_len,
          coalesce(len(list_filter(tk, t ->
            t IN ('the','a','of','and','is'))) >= 2, false) AS r_stop,
          coalesce(CAST(len(list_filter(tk, t ->
              regexp_matches(t, '[a-z]'))) AS DOUBLE) /
            CAST(len(tk) AS DOUBLE) >= 0.8, false) AS r_alpha,
          coalesce(CAST(len(list_filter(tk, t ->
              regexp_matches(t, '^[0-9]+$'))) AS DOUBLE) /
            CAST(len(tk) AS DOUBLE) <= 0.3, false) AS r_digit
        FROM tk)
      SELECT doc_id, r_ntok, r_len, r_stop, r_alpha, r_digit,
             r_ntok AND r_len AND r_stop AND r_alpha AND r_digit AS pass
      FROM f"""),
    doc = "composite rule-based quality filter: projection-only booleans" +
      " + conjunction pass flag")

  // --- EXACT word-n-gram decontamination (GPT-3 App. C / PaLM standard;
  //     q83 is the char-shingle probe, q117 the embedding-cosine semantic
  //     variant). The benchmark gram universe collects into ONE codegen'd
  //     count-in-set probe, so the corpus side is a pure projection —
  //     zero exchanges, no explode (PlanShapeSpec-gated). Every doc gets
  //     a row: instance count + flag; NULL text counts 0 by contract.
  private val q143_exact_decontam = Q(
    run = (s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.exactDecontamination(
        docs, col("doc_id"), col("text"),
        benchmark = docs.filter(col("doc_id") % 101 === 0),
        benchText = col("text"), n = 8)
    },
    oracle = Some("""
      WITH btoks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE doc_id % 101 = 0),
      bgrams AS (
        SELECT DISTINCT gram FROM (
          SELECT unnest(list_transform(generate_series(1, len(tk) - 7),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||
                 tk[i+4]||' '||tk[i+5]||' '||tk[i+6]||' '||tk[i+7])) AS gram
          FROM btoks)),
      dtoks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents),
      dgrams AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(tk) - 7),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||
                 tk[i+4]||' '||tk[i+5]||' '||tk[i+6]||' '||tk[i+7])) AS gram
        FROM dtoks),
      hits AS (
        SELECT doc_id, count(*) AS n
        FROM dgrams JOIN bgrams USING (gram) GROUP BY doc_id)
      SELECT d.doc_id, coalesce(h.n, 0) AS n_contaminated,
             coalesce(h.n, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id)"""),
    doc = "exact 8-gram benchmark decontamination: instance counts via " +
      "the zero-exchange in-set projection")

  val all: Seq[(String, Q)] = Seq(
    "q31_text_stats" -> q31_text_stats,
    "q32_langid" -> q32_langid,
    "q33_dedup_norm" -> q33_dedup_norm,
    "q34_jaccard_pairs" -> q34_jaccard_pairs,
    "q35_fingerprint" -> q35_fingerprint,
    "q36_minhash_pairs" -> q36_minhash_pairs,
    "q37_simhash" -> q37_simhash,
    "q38_multimodal" -> q38_multimodal,
    "q79_corpus_pipeline" -> q79_corpus_pipeline,
    "q81_repetition" -> q81_repetition,
    "q82_scrub" -> q82_scrub,
    "q83_contamination" -> q83_contamination,
    "q85_tfidf" -> q85_tfidf,
    "q86_ngram_counts" -> q86_ngram_counts,
    "q87_priority_sample" -> q87_priority_sample,
    "q88_mixture_plan" -> q88_mixture_plan,
    "q89_pack_bins" -> q89_pack_bins,
    "q90_lm_score" -> q90_lm_score,
    "q92_chunks" -> q92_chunks,
    "q100_quality_cut" -> q100_quality_cut,
    "q101_shards" -> q101_shards,
    "q102_incremental_dedup" -> q102_incremental_dedup,
    "q103_range_shards" -> q103_range_shards,
    "q104_repeated_passages" -> q104_repeated_passages,
    "q107_topk_pergroup" -> q107_topk_pergroup,
    "q115_containment" -> q115_containment,
    "q116_boilerplate" -> q116_boilerplate,
    "q118_estimated_pairs" -> q118_estimated_pairs,
    "q119_proportional_sample" -> q119_proportional_sample,
    "q120_vocab_coverage" -> q120_vocab_coverage,
    "q121_corpus_drift" -> q121_corpus_drift,
    "q124_source_dedup_rate" -> q124_source_dedup_rate,
    "q125_shard_manifest" -> q125_shard_manifest,
    "q129_pmi_bigrams" -> q129_pmi_bigrams,
    "q130_novelty" -> q130_novelty,
    "q131_weighted_sample" -> q131_weighted_sample,
    "q133_corpus_card" -> q133_corpus_card,
    "q134_image_dup" -> q134_image_dup,
    "q135_seq_packing" -> q135_seq_packing,
    "q136_dsir_select" -> q136_dsir_select,
    "q137_token_budget" -> q137_token_budget,
    "q138_quality_rules" -> q138_quality_rules,
    "q143_exact_decontam" -> q143_exact_decontam)
}
