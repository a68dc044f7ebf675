package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table. Cosines are
  * computed in double precision and rounded to 4 decimals before compare /
  * rank so results are stable across summation orders and engines.
  */
object VectorOps {

  private val q39_knn_brute = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    oracle = Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id,
        CASE WHEN list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) = 0
               OR list_sum(list_transform(CAST(qv AS DOUBLE[]), x -> x * x)) = 0
             THEN NULL
             ELSE round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                               CAST(qv AS DOUBLE[])), 4) END AS cos
      FROM embeddings, q WHERE vec_id <> 0
      ORDER BY cos DESC, vec_id LIMIT 10"""),
    doc = "brute-force cosine top-k for one query vector")

  private val q40_embed_norms = Q(
    run = (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"),
          round(Similarity.l2norm(col("embedding")), 4).as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(max(col("norm")), 4).as("max_norm"),
          round(min(col("norm")), 4).as("min_norm")),
    oracle = Some("""
      WITH norms AS (
        SELECT label,
          round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
            x -> x * x))), 4) AS norm
        FROM embeddings)
      SELECT label, count(*) AS n, round(max(norm), 4) AS max_norm,
             round(min(norm), 4) AS min_norm
      FROM norms GROUP BY label"""),
    doc = "embedding L2 norms aggregated per label")

  // The LSH hash family IS oracle-able: signatures are sign bits of
  // ±1-weighted dots over floor(x·10⁶)-quantized vectors — exact integer
  // arithmetic in IEEE double on both engines (Similarity.quantize), with
  // the ±1 weights inlined as literals into both plans from the same
  // Scala constants (Similarity.radWeight). The SQL below reproduces the
  // full pipeline: quantize → band signatures → hot-bucket cap →
  // candidate join → exact-cosine verify (4dp before filter, the q53
  // contract). Threshold 0.4 ≈ the top decile-of-similarity on the
  // synthetic embeddings so the query yields real rows at every SF.
  private def annOracle(threshold: Double, bands: Int,
      dims: Int, maxBucketSize: Int, multiProbe: Boolean = false,
      nProbes: Int = 3, src: String = "embeddings"): String = {
    def plane(p: Int): String = (0 until dims)
      .map(i => if (Similarity.radWeight(p, i) > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")
    // Bits-per-band is DATA-ADAPTIVE (Similarity.autoPlanesPerBand): the
    // params CTE derives the same r from count(*) with the same pure-
    // integer comparison the Scala side uses, and each of the PlaneStride
    // candidate bits is gated `i < r` — plane numbering is band·stride+i
    // on both engines so every weight array stays a static literal.
    val stride = Similarity.PlaneStride
    val rs = (6 to stride).map(r => s"($r)").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val bits = (0 until stride).map { i =>
        s"(CASE WHEN $i < p.r AND " +
          s"list_dot_product(qv, ${plane(b * stride + i)})" +
          s" >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $bits AS sig FROM q, params p"
    }.mkString("\nUNION ALL\n")
    // per-(vec, band, plane) margins for query-directed probing: the
    // same list_dot_product terms as the sig bits, as ROWS — exact
    // integer sums over quantized vectors, so the (m ASC, i ASC) rank
    // below reproduces RhpProbesExpr's picks bit for bit. NULLS LAST
    // pins the NULL-vector case to plane order on both engines.
    val marginSelects = (0 until bands).flatMap { b =>
      (0 until stride).map { i =>
        s"SELECT vec_id, $b AS band, $i AS i, " +
          s"abs(list_dot_product(qv, ${plane(b * stride + i)})) AS m " +
          s"FROM q, params p WHERE $i < p.r"
      }
    }.mkString("\nUNION ALL\n")
    s"""
      WITH params AS (
        SELECT coalesce(min(t.r), $stride) AS r
        FROM (VALUES $rs) t(r),
             (SELECT count(*) AS n FROM $src) c
        WHERE (CAST(1 AS BIGINT) << t.r) * 32 >= c.n),
      q AS (
        SELECT vec_id,
          list_transform(CAST(embedding AS DOUBLE[]),
                         x -> floor(x * 1000000.0)) AS qv
        FROM $src),
      sigs AS ($bandSelects),
      banded AS (
        SELECT vec_id, band, sig FROM (
          SELECT vec_id, band, sig,
                 count(*) OVER (PARTITION BY band, sig) AS bsz FROM sigs)
        WHERE bsz <= $maxBucketSize),${if (multiProbe) s"""
      margins AS ($marginSelects),
      picks AS (
        SELECT vec_id, band, i FROM (
          SELECT vec_id, band, i,
            row_number() OVER (PARTITION BY vec_id, band
              ORDER BY m ASC NULLS LAST, i) AS rk
          FROM margins)
        WHERE rk <= $nProbes),
      probes AS (
        SELECT vec_id, band, sig FROM banded
        UNION ALL
        SELECT b.vec_id, b.band,
               xor(b.sig, CAST(1 AS BIGINT) << k.i) AS sig
        FROM banded b JOIN picks k USING (vec_id, band)),""" else ""}
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM ${if (multiProbe) "probes" else "banded"} a JOIN banded b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
      SELECT c.vec_a, c.vec_b,
        round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])), 4) AS cos
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
      WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])), 4)
            >= $threshold"""
  }

  private val q41_ann_lsh = Q(
    run = (s, d) =>
      Similarity.annPairs(Tables.embeddings(s, d), threshold = 0.4)
        .select(col("vec_a"), col("vec_b"), col("cos")),
    oracle = Some(annOracle(threshold = 0.4, bands = 4,
      dims = 64, maxBucketSize = 2000)),
    doc = "banded random-hyperplane LSH near-dup pairs (scale path)")

  // Query-directed multi-probe LSH at HALF q41's bands: each vector also
  // probes the 3 lowest-margin hamming-1 flips of its band signature
  // (Lv et al. 2007), recovering most of the recall the dropped bands
  // cost at a CONSTANT (T+1)× probe fan-out — margin ranking is exact
  // integer math over quantized vectors, replayed in the oracle's
  // (m ASC NULLS LAST, i) window.
  private val q113_ann_multiprobe = Q(
    run = (s, d) =>
      Similarity.annPairsMultiProbe(Tables.embeddings(s, d),
          threshold = 0.4, bands = 2)
        .select(col("vec_a"), col("vec_b"), col("cos")),
    oracle = Some(annOracle(threshold = 0.4, bands = 2,
      dims = 64, maxBucketSize = 2000, multiProbe = true)),
    doc = "query-directed multi-probe LSH near-dup pairs: 3 lowest-" +
      "margin flips, half the signature tables")

  // Exact all-pairs similarity join — the oracle-checked baseline the LSH
  // path approximates. Cosines rounded to 4dp on both engines before the
  // threshold filter so the compare is order/precision stable.
  private val q53_sim_join = Q(
    run = (s, d) =>
      Similarity.exactCosinePairs(Tables.embeddings(s, d), threshold = 0.4),
    oracle = Some("""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 4) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 4) >= 0.4"""),
    doc = "exact cosine similarity join above threshold (LSH ground truth)")

  // IVF cell assignment — the index-build step of the partitioned ANN
  // path: every vector → nearest of 8 deterministic seed centroids (the
  // first 8 vectors), rounded-cosine argmax with centroid-id tie-break.
  private val q71_ivf_assign = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.ivfAssign(emb, centroids, roundDp = 4)
    },
    oracle = Some("""
      WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), x -> x * x)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS cos
        FROM embeddings e, c)
      SELECT vec_id, centroid_id, cos AS centroid_cos
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, centroid_id) AS rn
            FROM scored)
      WHERE rn = 1"""),
    doc = "IVF cell assignment (nearest-centroid argmax, index-build step)")

  // --- the clustering UPDATE step on top of q71's assignment: recompute
  //     each cell's center per dimension. Medians, not means: an exact
  //     interpolated median touches two sorted elements, so the result is
  //     independent of row order / partitioning — a float mean's summation
  //     order is not, and would flake a cross-engine hash compare.
  //     (k-medians update; one shuffle to (cell, dim) after the explode)
  private val q80_kmedians_step = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      // keep=embedding: the assignment carries the vector, so the update
      // step never re-joins the corpus against its own assignment
      Similarity.ivfAssign(emb, centroids, roundDp = 4,
          keep = Seq("embedding"))
        .select(col("centroid_id"), posexplode(col("embedding")))
        .groupBy(col("centroid_id"), col("pos"))
        // + 0.0 canonicalizes IEEE negative zero (a -0.0 median hashes
        // as "-0" and the engines disagree on which zero they produce)
        .agg((round(percentile(col("col").cast("double"), lit(0.5)), 4)
          + lit(0.0)).as("med"), count(lit(1)).as("n_members"))
    },
    oracle = Some("""
      WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), x -> x * x)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS cos
        FROM embeddings e, c),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      dims AS (
        SELECT a.centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               CAST(e.embedding[CAST(g AS INTEGER)] AS DOUBLE) AS x
        FROM assigned a
        JOIN embeddings e USING (vec_id),
        unnest(generate_series(1, len(e.embedding))) AS t(g))
      SELECT centroid_id, pos, round(quantile_cont(x, 0.5), 4) + 0.0 AS med,
             count(*) AS n_members
      FROM dims GROUP BY centroid_id, pos"""),
    doc = "k-medians centroid update over IVF cells (order-stable exact median)")

  // --- the IVF QUERY path completing q71's index build: rank the 8 cells
  //     by query↔centroid cosine, probe the top 3, exact-rerank only their
  //     members. Fully deterministic (fixed centroids, rounded cosines,
  //     id tie-breaks) → oracle-checked end to end, unlike hash-family ANN.
  private val q84_ivf_search = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      Similarity.ivfSearch(emb.filter(col("vec_id") =!= 0), centroids, qv,
        nprobe = 3, k = 10)
    },
    oracle = Some("""
      WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
                 FROM embeddings WHERE vec_id < 8),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), x -> x * x)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS ccos
        FROM embeddings e, c WHERE e.vec_id <> 0),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      probed AS (
        SELECT centroid_id FROM c, q
        ORDER BY CASE WHEN list_sum(list_transform(CAST(cv AS DOUBLE[]), x -> x * x)) = 0
                        OR list_sum(list_transform(CAST(qv AS DOUBLE[]), x -> x * x)) = 0
                      THEN NULL
                      ELSE round(list_cosine_similarity(CAST(cv AS DOUBLE[]),
                                                        CAST(qv AS DOUBLE[])), 4) END DESC,
                 centroid_id
        LIMIT 3)
      SELECT e.vec_id, a.centroid_id,
             CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) = 0
                    OR list_sum(list_transform(CAST(q.qv AS DOUBLE[]), x -> x * x)) = 0
                  THEN NULL
                  ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(q.qv AS DOUBLE[])), 4) END AS cos
      FROM embeddings e
      JOIN assigned a USING (vec_id)
      JOIN probed p ON a.centroid_id = p.centroid_id, q
      ORDER BY cos DESC, e.vec_id
      LIMIT 10"""),
    doc = "IVF ANN query: probe nprobe nearest cells, exact rerank within")

  // --- Product quantization: encode + ADC search ------------------------
  //
  // Codebook = subvector slices of the first 16 vectors (deterministic,
  // so the whole pipeline replays in SQL — the q80/q84 convention). The
  // argmin is over round(|c|² − 2·x·c, 6) with ties to the smallest
  // code_id; |x|² is constant per subvector so the ranking equals squared
  // L2. Exploded to (vec_id, sub_id, code) rows — a relational shape both
  // engines hash identically.
  private val q93_pq_encode = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      Similarity.pqEncode(emb, cb, dims = 64, m = 8)
        .select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos").cast("int").as("sub_id"),
          col("col").cast("bigint").as("code"))
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js),
      scored AS (SELECT s.vec_id, s.sub_id, c.code_id,
          round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6) AS d
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      best AS (SELECT vec_id, sub_id, code_id,
          row_number() OVER (PARTITION BY vec_id, sub_id
                             ORDER BY d, code_id) AS rn
        FROM scored)
      SELECT vec_id, CAST(sub_id AS INTEGER) AS sub_id,
             CAST(code_id AS BIGINT) AS code
      FROM best WHERE rn = 1"""),
    doc = "PQ encode: per-subvector nearest codebook entry (32x compression)")

  private val q94_pq_search = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      val codes = Similarity.pqEncode(emb.filter(col("vec_id") =!= 0),
        cb, dims = 64, m = 8)
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      Similarity.pqSearch(codes, cb, query, dims = 64, m = 8, k = 10)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js WHERE e.vec_id <> 0),
      best AS (SELECT s.vec_id, s.sub_id, c.code_id,
          row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
            round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6),
            c.code_id) AS rn
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
            WHERE vec_id = 0),
      lut AS (SELECT c.sub_id, c.code_id,
                list_dot_product(qv[c.sub_id*8 + 1 : c.sub_id*8 + 8],
                  c.sv) AS lv
              FROM cbn c, q)
      SELECT b.vec_id,
             round(sum(l.lv), 4) AS score
      FROM best b JOIN lut l
        ON b.sub_id = l.sub_id AND b.code_id = l.code_id
      WHERE b.rn = 1
      GROUP BY b.vec_id
      ORDER BY score DESC, b.vec_id LIMIT 10"""),
    doc = "PQ asymmetric-distance top-k: m table lookups per row, no d-wide math")

  // --- symmetric int8 embedding quantization: the 4x compression a
  //     RAM-resident vector index runs on. Output exploded to scalar
  //     columns (the driver compare stringifies arrays engine-specifically)
  //     with every null/degenerate contract pinned on both sides: NULL
  //     vectors emit no rows (both explodes drop them), NULL elements stay
  //     NULL, a zero vector codes to 0s with scale 0.0.
  private val q95_int8_quant = Q(
    run = (s, d) =>
      Similarity.int8Quantize(Tables.embeddings(s, d))
        .select(col("vec_id"), col("qscale"), posexplode(col("qvec")))
        .select(col("vec_id"), col("qscale"), col("pos").cast("int").as("pos"),
          col("col").as("q")),
    oracle = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      s AS (SELECT vec_id, v,
              CASE WHEN v IS NULL THEN NULL
                   ELSE coalesce(list_max(list_transform(
                          list_filter(v, x -> x IS NOT NULL),
                          x -> abs(x))) / 127.0, 0.0) END AS qscale
            FROM v),
      e AS (SELECT vec_id, qscale, v,
              unnest(generate_series(1, len(v))) AS i
            FROM s)
      SELECT vec_id, qscale, CAST(i - 1 AS INT) AS pos,
        CASE WHEN v[i] IS NULL THEN NULL
             WHEN qscale = 0 THEN 0
             ELSE CAST(greatest(-127, least(127, round(v[i] / qscale)))
                       AS INT) END AS q
      FROM e"""),
    doc = "symmetric int8 embedding quantization (4x index compression)")

  // --- ONE k-medians training iteration of the PQ codebook, driver-gated
  //     end to end: assign every subvector with the exact q93 argmin
  //     (round-6dp distances, ties to smallest code), move each code to
  //     the per-dimension MEDIAN of its members (the q80 convention —
  //     exact interpolated median, 4dp + negative-zero canonicalization),
  //     codes with no members keep their seed position (left join +
  //     coalesce on both engines). Composes the two proven oracles, so the
  //     trained path [[Similarity.pqTrainCodebook]] is itself hash-gated,
  //     not just spec-tested.
  private val q96_pq_train = Q(
    run = (s, d) =>
      Similarity.pqTrainCodebook(Tables.embeddings(s, d),
          dims = 64, m = 8, codes = 16, iters = 1)
        .select(col("sub_id"), col("code_id"), posexplode(col("sv")))
        .select(col("sub_id").cast("int").as("sub_id"), col("code_id"),
          col("pos").cast("int").as("pos"), col("col").as("w")),
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js),
      scored AS (SELECT s.vec_id, s.sub_id, c.code_id,
          round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6) AS d
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      assigned AS (SELECT vec_id, sub_id, code_id FROM (
          SELECT vec_id, sub_id, code_id,
            row_number() OVER (PARTITION BY vec_id, sub_id
                               ORDER BY d, code_id) AS rn
          FROM scored) WHERE rn = 1),
      members AS (
        SELECT a.sub_id, a.code_id, CAST(g - 1 AS INTEGER) AS pos,
               s.sub[CAST(g AS INTEGER)] AS x
        FROM assigned a
        JOIN subs s ON s.vec_id = a.vec_id AND s.sub_id = a.sub_id,
        unnest(generate_series(1, len(s.sub))) AS t(g)),
      moved AS (
        SELECT sub_id, code_id, pos,
               round(quantile_cont(x, 0.5), 4) + 0.0 AS med
        FROM members GROUP BY sub_id, code_id, pos),
      seed AS (
        SELECT c.sub_id, c.code_id, CAST(g - 1 AS INTEGER) AS pos,
               c.sv[CAST(g AS INTEGER)] AS w0
        FROM cb c, unnest(generate_series(1, len(c.sv))) AS t(g))
      SELECT CAST(s.sub_id AS INTEGER) AS sub_id, s.code_id,
             s.pos, coalesce(m.med, s.w0) AS w
      FROM seed s
      LEFT JOIN moved m ON m.sub_id = s.sub_id
        AND m.code_id = s.code_id AND m.pos = s.pos"""),
    doc = "PQ codebook k-medians training iteration (assign + median move)")

  // --- IVF-PQ: the composed full-scale ANN architecture — IVF cells
  //     prune WHICH rows are scored, PQ codes shrink WHAT is scored.
  //     Probe the 3 nearest of 8 cells, ADC-score only their members,
  //     top-10. Composes the q84 (probed/assigned) and q94 (codes/LUT)
  //     oracles, so the combined path is hash-gated end to end.
  private val q98_ivfpq_search = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      Similarity.ivfPqSearch(emb.filter(col("vec_id") =!= 0), centroids,
        cb, query, dims = 64, m = 8, nprobe = 3, k = 10)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS ccos
        FROM embeddings x, c WHERE x.vec_id <> 0),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      probed AS (
        SELECT centroid_id FROM c, q
        ORDER BY CASE WHEN list_sum(list_transform(CAST(cv AS DOUBLE[]), y -> y * y)) = 0
                        OR list_sum(list_transform(CAST(qv AS DOUBLE[]), y -> y * y)) = 0
                      THEN NULL
                      ELSE round(list_cosine_similarity(CAST(cv AS DOUBLE[]),
                                                        CAST(qv AS DOUBLE[])), 4) END DESC,
                 centroid_id
        LIMIT 3),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js WHERE e.vec_id <> 0),
      best AS (SELECT s.vec_id, s.sub_id, c.code_id,
          row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
            round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6),
            c.code_id) AS rn
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      qd AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
             WHERE vec_id = 0),
      lut AS (SELECT c.sub_id, c.code_id,
                list_dot_product(qv[c.sub_id*8 + 1 : c.sub_id*8 + 8],
                  c.sv) AS lv
              FROM cbn c, qd)
      SELECT b.vec_id, round(sum(l.lv), 4) AS score
      FROM best b
      JOIN lut l ON b.sub_id = l.sub_id AND b.code_id = l.code_id
      JOIN assigned a ON a.vec_id = b.vec_id
      JOIN probed p ON p.centroid_id = a.centroid_id
      WHERE b.rn = 1
      GROUP BY b.vec_id
      ORDER BY score DESC, b.vec_id LIMIT 10"""),
    doc = "IVF-PQ ANN: probed cells prune rows, ADC lookups prune math")

  // --- IVF-PQ + exact rerank: the production refine stage. Same index
  //     walk as q98 but with a 25-deep ADC shortlist, then the TRUE
  //     cosine recomputed for those 25 rows only; final top-10 ranks on
  //     the exact score (4dp, vec_id ties, NULLs LAST on both engines).
  //     The oracle is q98's CTE chain with the old final SELECT demoted
  //     to a `short` CTE and one broadcast-sized rerank join on top.
  private val q105_ivfpq_rerank = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      Similarity.ivfPqSearchRerank(emb.filter(col("vec_id") =!= 0),
        centroids, cb, query, dims = 64, m = 8, nprobe = 3,
        shortlist = 25, k = 10)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS ccos
        FROM embeddings x, c WHERE x.vec_id <> 0),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      probed AS (
        SELECT centroid_id FROM c, q
        ORDER BY CASE WHEN list_sum(list_transform(CAST(cv AS DOUBLE[]), y -> y * y)) = 0
                        OR list_sum(list_transform(CAST(qv AS DOUBLE[]), y -> y * y)) = 0
                      THEN NULL
                      ELSE round(list_cosine_similarity(CAST(cv AS DOUBLE[]),
                                                        CAST(qv AS DOUBLE[])), 4) END DESC,
                 centroid_id
        LIMIT 3),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js WHERE e.vec_id <> 0),
      best AS (SELECT s.vec_id, s.sub_id, c.code_id,
          row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
            round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6),
            c.code_id) AS rn
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      qd AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
             WHERE vec_id = 0),
      lut AS (SELECT c.sub_id, c.code_id,
                list_dot_product(qv[c.sub_id*8 + 1 : c.sub_id*8 + 8],
                  c.sv) AS lv
              FROM cbn c, qd),
      short AS (
        SELECT b.vec_id, round(sum(l.lv), 4) AS adc_score
        FROM best b
        JOIN lut l ON b.sub_id = l.sub_id AND b.code_id = l.code_id
        JOIN assigned a ON a.vec_id = b.vec_id
        JOIN probed p ON p.centroid_id = a.centroid_id
        WHERE b.rn = 1
        GROUP BY b.vec_id
        ORDER BY adc_score DESC, b.vec_id LIMIT 25)
      SELECT s.vec_id, s.adc_score,
             CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                    OR list_sum(list_transform(CAST(qd.qv AS DOUBLE[]), y -> y * y)) = 0
                  THEN NULL
                  ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                    CAST(qd.qv AS DOUBLE[])), 4) END AS score
      FROM short s
      JOIN embeddings x ON x.vec_id = s.vec_id, qd
      ORDER BY score DESC NULLS LAST, s.vec_id LIMIT 10"""),
    doc = "IVF-PQ + exact rerank: ADC shortlist, true-cosine refine top-k")

  // --- BATCH IVF-PQ: top-10 per query for 3 queries in ONE index pass —
  //     per-query probed cells and LUTs broadcast, candidates fan out to
  //     the queries probing their cell, per-query window top-k. Corpus
  //     rows 3+ are the index; rows 0-2 are the query batch.
  private val q106_ivfpq_batch = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.ivfPqSearchBatch(emb.filter(col("vec_id") >= 3),
        centroids, cb, queries, dims = 64, m = 8, nprobe = 3, k = 10)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
      qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 3),
      probed AS (
        SELECT query_id, centroid_id FROM (
          SELECT q.query_id, c.centroid_id,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              CASE WHEN list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                     OR list_sum(list_transform(q.qv, y -> y * y)) = 0
                   THEN NULL
                   ELSE round(list_cosine_similarity(CAST(c.cv AS DOUBLE[]),
                                                     q.qv), 4) END DESC,
              c.centroid_id) AS rn
          FROM qs q, c)
        WHERE rn <= 3),
      scored AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS ccos
        FROM embeddings x, c WHERE x.vec_id >= 3),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js WHERE e.vec_id >= 3),
      best AS (SELECT s.vec_id, s.sub_id, c.code_id,
          row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
            round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6),
            c.code_id) AS rn
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      lut AS (SELECT q.query_id, c.sub_id, c.code_id,
                list_dot_product(q.qv[c.sub_id*8 + 1 : c.sub_id*8 + 8],
                  c.sv) AS lv
              FROM cbn c, qs q),
      cand AS (
        SELECT p.query_id, b.vec_id, round(sum(l.lv), 4) AS score
        FROM best b
        JOIN assigned a ON a.vec_id = b.vec_id
        JOIN probed p ON p.centroid_id = a.centroid_id
        JOIN lut l ON l.query_id = p.query_id
          AND l.sub_id = b.sub_id AND l.code_id = b.code_id
        WHERE b.rn = 1
        GROUP BY p.query_id, b.vec_id)
      SELECT query_id, rank, vec_id, score FROM (
        SELECT query_id, vec_id, score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC NULLS LAST, vec_id) AS INTEGER) AS rank
        FROM cand)
      WHERE rank <= 10"""),
    doc = "batch IVF-PQ: top-k for a query RELATION in one index pass")

  // --- batch IVF-PQ + exact rerank: q106's 25-deep per-query ADC
  //     shortlist, then each query's candidates re-scored on the true
  //     cosine (broadcast vector fetch + per-query bounded-heap top-10).
  //     The batch analog of q105, ranked on exact scores end to end.
  private val q111_ivfpq_batch_rerank = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.ivfPqSearchBatchRerank(emb.filter(col("vec_id") >= 3),
        centroids, cb, queries, dims = 64, m = 8, nprobe = 3,
        shortlist = 25, k = 10)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
      qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 3),
      probed AS (
        SELECT query_id, centroid_id FROM (
          SELECT q.query_id, c.centroid_id,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              CASE WHEN list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                     OR list_sum(list_transform(q.qv, y -> y * y)) = 0
                   THEN NULL
                   ELSE round(list_cosine_similarity(CAST(c.cv AS DOUBLE[]),
                                                     q.qv), 4) END DESC,
              c.centroid_id) AS rn
          FROM qs q, c)
        WHERE rn <= 3),
      scored AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS ccos
        FROM embeddings x, c WHERE x.vec_id >= 3),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      js AS (SELECT unnest(generate_series(0, 7)) AS j),
      cb AS (SELECT j AS sub_id, vec_id AS code_id,
               v[j*8 + 1 : j*8 + 8] AS sv
             FROM e, js WHERE vec_id < 16),
      cbn AS (SELECT sub_id, code_id, sv,
                list_sum(list_transform(sv, x -> x * x)) AS c2 FROM cb),
      subs AS (SELECT e.vec_id, j AS sub_id, v[j*8 + 1 : j*8 + 8] AS sub
               FROM e, js WHERE e.vec_id >= 3),
      best AS (SELECT s.vec_id, s.sub_id, c.code_id,
          row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
            round(c.c2 - 2 * list_dot_product(s.sub, c.sv), 6),
            c.code_id) AS rn
        FROM subs s JOIN cbn c ON s.sub_id = c.sub_id),
      lut AS (SELECT q.query_id, c.sub_id, c.code_id,
                list_dot_product(q.qv[c.sub_id*8 + 1 : c.sub_id*8 + 8],
                  c.sv) AS lv
              FROM cbn c, qs q),
      cand AS (
        SELECT p.query_id, b.vec_id, round(sum(l.lv), 4) AS score
        FROM best b
        JOIN assigned a ON a.vec_id = b.vec_id
        JOIN probed p ON p.centroid_id = a.centroid_id
        JOIN lut l ON l.query_id = p.query_id
          AND l.sub_id = b.sub_id AND l.code_id = b.code_id
        WHERE b.rn = 1
        GROUP BY p.query_id, b.vec_id),
      short AS (
        SELECT query_id, vec_id, score AS adc_score FROM (
          SELECT query_id, vec_id, score,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC NULLS LAST, vec_id) AS rn
          FROM cand)
        WHERE rn <= 25)
      SELECT query_id, rank, vec_id, adc_score, score FROM (
        SELECT s.query_id, s.vec_id, s.adc_score,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(q.qv, y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      q.qv), 4) END AS score,
               CAST(row_number() OVER (PARTITION BY s.query_id ORDER BY
                 CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                        OR list_sum(list_transform(q.qv, y -> y * y)) = 0
                      THEN NULL
                      ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                        q.qv), 4) END DESC NULLS LAST,
                 s.vec_id) AS INTEGER) AS rank
        FROM short s
        JOIN embeddings x ON x.vec_id = s.vec_id
        JOIN qs q ON q.query_id = s.query_id)
      WHERE rank <= 10"""),
    doc = "batch IVF-PQ + exact rerank: per-query refine on true cosines")

  // --- per-label mean embedding (k-means M-step / trained-centroid
  //     build): float sums are order-dependent and round(double, n)
  //     itself splits engines on boundary doubles, so both engines
  //     quantize in pure double math — floor(clamp(x)·1e6 + 0.5) — sum
  //     the exact integers through DECIMAL(38,0), and divide in double.
  //     Non-finite elements are excluded; finite ones clamp into ±1e9.
  private val q108_label_centroids = Q(
    run = (s, d) =>
      Similarity.groupCentroids(Tables.embeddings(s, d), "label"),
    oracle = Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      x AS (
        SELECT label, CAST(g - 1 AS INTEGER) AS pos,
               CASE WHEN v[CAST(g AS INTEGER)] IS NOT NULL
                      AND NOT isnan(v[CAST(g AS INTEGER)])
                      AND NOT isinf(v[CAST(g AS INTEGER)])
                    THEN floor(least(greatest(v[CAST(g AS INTEGER)],
                                              -1e9), 1e9) * 1e6 + 0.5)
               END AS qx
        FROM e, unnest(generate_series(1, len(v))) AS t(g))
      SELECT label, pos,
             CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE)
               / (count(qx) * 1e6) AS centroid
      FROM x GROUP BY label, pos"""),
    doc = "per-label mean embedding: exact integer sums, one tiny exchange")

  // --- one k-MEANS Lloyd iteration (assign + mean move): composes the
  //     q84/q98 assignment contract (cosine 4dp, ccos DESC + centroid_id
  //     ties) with the q108 mean contract (pure-double quantize, exact
  //     decimal sums); empty cells keep their seed (q96 convention).
  private val q109_kmeans_step = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.kmeansStep(emb, centroids)
    },
    oracle = Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(c.cv, y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      c.cv), 4) END AS ccos
        FROM embeddings x, c),
      assigned AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      x AS (
        SELECT a.centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               CASE WHEN e.v[CAST(g AS INTEGER)] IS NOT NULL
                      AND NOT isnan(e.v[CAST(g AS INTEGER)])
                      AND NOT isinf(e.v[CAST(g AS INTEGER)])
                    THEN floor(least(greatest(e.v[CAST(g AS INTEGER)],
                                              -1e9), 1e9) * 1e6 + 0.5)
               END AS qx
        FROM assigned a
        JOIN e ON e.vec_id = a.vec_id,
        unnest(generate_series(1, len(e.v))) AS t(g)),
      means AS (
        SELECT centroid_id, pos,
               CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE)
                 / (count(qx) * 1e6) AS m
        FROM x GROUP BY centroid_id, pos),
      seed AS (
        SELECT centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               cv[CAST(g AS INTEGER)] AS w0
        FROM c, unnest(generate_series(1, len(cv))) AS t(g))
      SELECT s.centroid_id, s.pos, coalesce(m.m, s.w0) AS w
      FROM seed s
      LEFT JOIN means m ON m.centroid_id = s.centroid_id
        AND m.pos = s.pos"""),
    doc = "k-means Lloyd iteration: map-only assign, exact-sum mean move")

  // One Lloyd iteration as a reusable oracle CTE chain: assignment
  // (cosine 4dp, ccos DESC + centroid_id ties) + exact-quantized mean
  // move + empty-cell seed keep — the q109 contract, parameterized by
  // the input-centroid CTE so iterations CHAIN (q127). Requires an `e`
  // CTE (vec_id, v) of non-null embeddings in scope.
  private def lloydStepSql(cin: String, p: String): String = s"""
      scored$p AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(c.cv, y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      c.cv), 4) END AS ccos
        FROM embeddings x, $cin c),
      assigned$p AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored$p)
        WHERE rn = 1),
      x$p AS (
        SELECT a.centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               CASE WHEN e.v[CAST(g AS INTEGER)] IS NOT NULL
                      AND NOT isnan(e.v[CAST(g AS INTEGER)])
                      AND NOT isinf(e.v[CAST(g AS INTEGER)])
                    THEN floor(least(greatest(e.v[CAST(g AS INTEGER)],
                                              -1e9), 1e9) * 1e6 + 0.5)
               END AS qx
        FROM assigned$p a
        JOIN e ON e.vec_id = a.vec_id,
        unnest(generate_series(1, len(e.v))) AS t(g)),
      means$p AS (
        SELECT centroid_id, pos,
               CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE)
                 / (count(qx) * 1e6) AS m
        FROM x$p GROUP BY centroid_id, pos),
      seed$p AS (
        SELECT centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               cv[CAST(g AS INTEGER)] AS w0
        FROM $cin, unnest(generate_series(1, len(cv))) AS t(g)),
      stepped$p AS (
        SELECT s.centroid_id, s.pos, coalesce(m.m, s.w0) AS w
        FROM seed$p s
        LEFT JOIN means$p m ON m.centroid_id = s.centroid_id
          AND m.pos = s.pos)"""

  // --- TWO chained Lloyd iterations: step 2 assigns against step 1's
  //     MOVED centroids — the convergence loop a training job runs,
  //     proven deterministic across engines because every step-1 output
  //     weight is engine-exact (the q108/q109 quantized-decimal sums),
  //     so step-2 cosines see bit-identical centroids. Per iteration the
  //     corpus never shuffles: assignment is a broadcast-centroid map,
  //     the mean move is one tiny (centroid, pos) exchange.
  private val q127_kmeans_two_steps = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val c0 = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val c1 = Similarity.assembleCentroids(Similarity.kmeansStep(emb, c0))
      Similarity.kmeansStep(emb, c1)
    },
    oracle = Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      c0 AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings WHERE vec_id < 8),
      ${lloydStepSql("c0", "1")},
      cent1 AS (
        SELECT centroid_id, list(w ORDER BY pos) AS cv
        FROM stepped1 GROUP BY centroid_id),
      ${lloydStepSql("cent1", "2")}
      SELECT centroid_id, pos, w FROM stepped2"""),
    doc = "two chained k-means Lloyd iterations: step 2 on step 1's " +
      "engine-exact moved centroids")

  // --- SemDeDup on TRAINED centroids: adaptive seed count (q99's params
  //     contract) → one q109 Lloyd iteration → cell-local semantic dedup
  //     against the MOVED centroids. The full train-then-dedup read path,
  //     hash-oracled end to end by composing the three proven CTE chains.
  private val q110_semdedup_trained = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val k = Similarity.autoCells(Similarity.corpusSize(emb))
      val seeds = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val trained =
        Similarity.assembleCentroids(Similarity.kmeansStep(emb, seeds))
      Similarity.semanticDedup(emb, trained, threshold = 0.4)
    },
    oracle = Some("""
      WITH params AS (
        SELECT coalesce(min(t.c), 4096) AS k
        FROM (VALUES (8),(16),(32),(64),(128),(256),(512),(1024),(2048),
                     (4096)) t(c),
             (SELECT count(*) AS n FROM embeddings) n
        WHERE CAST(t.c AS BIGINT) * 256 >= n.n),
      c0 AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings, params WHERE vec_id < params.k),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE embedding IS NOT NULL),
      scored0 AS (
        SELECT x.vec_id, c.centroid_id,
               CASE WHEN list_sum(list_transform(CAST(x.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(c.cv, y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                      c.cv), 4) END AS ccos
        FROM embeddings x, c0 c),
      assigned0 AS (
        SELECT vec_id, centroid_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, centroid_id) AS rn
              FROM scored0)
        WHERE rn = 1),
      xq AS (
        SELECT a.centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               CASE WHEN e.v[CAST(g AS INTEGER)] IS NOT NULL
                      AND NOT isnan(e.v[CAST(g AS INTEGER)])
                      AND NOT isinf(e.v[CAST(g AS INTEGER)])
                    THEN floor(least(greatest(e.v[CAST(g AS INTEGER)],
                                              -1e9), 1e9) * 1e6 + 0.5)
               END AS qx
        FROM assigned0 a
        JOIN e ON e.vec_id = a.vec_id,
        unnest(generate_series(1, len(e.v))) AS t(g)),
      means AS (
        SELECT centroid_id, pos,
               CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE)
                 / (count(qx) * 1e6) AS m
        FROM xq GROUP BY centroid_id, pos),
      seed AS (
        SELECT centroid_id, CAST(g - 1 AS INTEGER) AS pos,
               cv[CAST(g AS INTEGER)] AS w0
        FROM c0, unnest(generate_series(1, len(cv))) AS t(g)),
      trained AS (
        SELECT s.centroid_id, list(coalesce(m.m, s.w0) ORDER BY s.pos)
                 AS cv
        FROM seed s
        LEFT JOIN means m ON m.centroid_id = s.centroid_id
          AND m.pos = s.pos
        GROUP BY s.centroid_id),
      scored AS (
        SELECT e2.vec_id, t.centroid_id, CAST(e2.embedding AS DOUBLE[]) AS v,
               CASE WHEN list_sum(list_transform(CAST(e2.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(t.cv, y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]),
                                                      t.cv), 4) END AS cos
        FROM embeddings e2, trained t),
      assigned AS (
        SELECT vec_id, centroid_id, v
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE CASE WHEN list_sum(list_transform(a.v, y -> y * y)) = 0
                     OR list_sum(list_transform(b.v, y -> y * y)) = 0
                   THEN NULL
                   ELSE round(list_cosine_similarity(a.v, b.v), 4) END
              >= 0.4)
      SELECT a.vec_id, a.centroid_id,
             (d.vec_id IS NOT NULL) AS is_dup
      FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id"""),
    doc = "train-then-dedup: one Lloyd iteration, SemDeDup on moved cells")

  // --- SemDeDup-style semantic dedup: cluster the space (adaptive seed
  //     cell count, mean cell ~256), mark every vector with an
  //     above-threshold smaller-id neighbor in its own cell. Pairwise
  //     work is cell-local — Σ|cell|²/2, never n²/2.
  private val q99_semdedup = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val k = Similarity.autoCells(Similarity.corpusSize(emb))
      val centroids = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.semanticDedup(emb, centroids, threshold = 0.4)
    },
    oracle = Some("""
      WITH params AS (
        SELECT coalesce(min(t.c), 4096) AS k
        FROM (VALUES (8),(16),(32),(64),(128),(256),(512),(1024),(2048),
                     (4096)) t(c),
             (SELECT count(*) AS n FROM embeddings) n
        WHERE CAST(t.c AS BIGINT) * 256 >= n.n),
      c AS (SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings, params WHERE vec_id < params.k),
      scored AS (
        SELECT e.vec_id, c.centroid_id, CAST(e.embedding AS DOUBLE[]) AS v,
               CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), y -> y * y)) = 0
                      OR list_sum(list_transform(CAST(c.cv AS DOUBLE[]), y -> y * y)) = 0
                    THEN NULL
                    ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                      CAST(c.cv AS DOUBLE[])), 4) END AS cos
        FROM embeddings e, c),
      assigned AS (
        SELECT vec_id, centroid_id, v
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, centroid_id) AS rn
              FROM scored)
        WHERE rn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE CASE WHEN list_sum(list_transform(a.v, y -> y * y)) = 0
                     OR list_sum(list_transform(b.v, y -> y * y)) = 0
                   THEN NULL
                   ELSE round(list_cosine_similarity(a.v, b.v), 4) END
              >= 0.4)
      SELECT a.vec_id, a.centroid_id,
             (d.vec_id IS NOT NULL) AS is_dup
      FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id"""),
    doc = "semantic dedup: cell-local above-threshold smaller-id neighbor")

  // --- Hard-negative mining: per query vector, the top-k nearest corpus
  //     vectors of a DIFFERENT label (contrastive-training negatives).
  //     Exact cosine, one corpus scan for the whole query batch, bounded-
  //     heap top-k. Query set = every 97th vec_id (≥1 query at every SF
  //     including the edge corpus).
  private val q112_hard_negatives = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      Similarity.hardNegatives(emb, queries, k = 5)
    },
    oracle = Some("""
      WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
               label AS qlabel
        FROM embeddings WHERE vec_id % 97 = 0),
      scored AS (
        SELECT q.query_id, e.vec_id, e.label,
          CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                            x -> x * x)) = 0
                 OR list_sum(list_transform(q.qv, x -> x * x)) = 0
               THEN NULL
               ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 q.qv), 4) END AS cos
        FROM embeddings e, q
        WHERE e.label <> q.qlabel AND e.vec_id <> q.query_id)
      SELECT query_id, rank, vec_id, label, cos FROM (
        SELECT query_id, vec_id, label, cos,
          CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC NULLS LAST, vec_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5"""),
    doc = "hard-negative mining: top-k nearest different-label vectors " +
      "per query, bounded-heap top-k over one corpus scan")

  // --- Embedding outlier detection: cosine to the own-label mean
  //     embedding (the q108 exact-accumulation contract), cut at the
  //     label's exact p05 of that cosine (the q20 grid-percentile
  //     contract). NULL-propagating: zero-norm vectors and labels with
  //     no measurable cosine yield NULL, never a guess.
  private val q114_embed_outliers = Q(
    run = (s, d) =>
      Similarity.centroidOutliers(Tables.embeddings(s, d), "label",
        p = 0.05),
    oracle = Some("""
      WITH ec AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE embedding IS NOT NULL),
      x AS (
        SELECT label, CAST(g - 1 AS INTEGER) AS pos,
               CASE WHEN v[CAST(g AS INTEGER)] IS NOT NULL
                      AND NOT isnan(v[CAST(g AS INTEGER)])
                      AND NOT isinf(v[CAST(g AS INTEGER)])
                    THEN floor(least(greatest(v[CAST(g AS INTEGER)],
                                              -1e9), 1e9) * 1e6 + 0.5)
               END AS qx
        FROM ec, unnest(generate_series(1, len(v))) AS t(g)),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS cv
        FROM (SELECT label, pos,
                CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE)
                  / (count(qx) * 1e6) AS c
              FROM x GROUP BY label, pos)
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label,
          CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                            y -> y * y)) = 0
                 OR list_sum(list_transform(c.cv, y -> y * y)) = 0
               THEN NULL
               ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cv), 4) END AS cos
        FROM embeddings e LEFT JOIN cent c ON e.label = c.label),
      hist AS (
        SELECT label, cos AS val, count(*) AS cnt
        FROM scored WHERE cos IS NOT NULL GROUP BY 1, 2),
      cum AS (
        SELECT label, val,
          sum(cnt) OVER (PARTITION BY label ORDER BY val) AS cum,
          sum(cnt) OVER (PARTITION BY label) AS n
        FROM hist),
      qa AS (
        SELECT label, CAST(max(n) AS DOUBLE) AS n,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.05)+1 THEN val END)
            AS DOUBLE) AS lo,
          CAST(min(CASE WHEN cum >= floor((n-1)*0.05)+2 THEN val END)
            AS DOUBLE) AS hi
        FROM cum GROUP BY label),
      cut AS (
        SELECT label, round(CASE WHEN (n-1)*0.05 = floor((n-1)*0.05)
            THEN lo
            ELSE lo + ((n-1)*0.05 - floor((n-1)*0.05)) * (hi - lo) END, 6)
          AS cut
        FROM qa)
      SELECT s.vec_id, s.label, s.cos, (s.cos < m.cut) AS is_outlier
      FROM scored s LEFT JOIN cut m ON s.label = m.label"""),
    doc = "embedding outliers: cosine to own-label centroid below the " +
      "label's exact p05")

  // --- Semantic decontamination: corpus vectors within cosine >= 0.35 of
  //     ANY benchmark vector (vec_id % 7 == 0 plays the eval suite;
  //     the synthetic embeddings are near-orthogonal, so the threshold
  //     sits where real cross-vector similarity lives).
  //     Benchmark broadcasts (eval-suite-sized); the corpus never
  //     shuffles for scoring — the embedding-space analog of q83's
  //     n-gram contamination check. Cosines rounded 4dp BEFORE the
  //     threshold (cross-engine contract); zero-norm => NULL => clean.
  private val q117_semantic_decontam = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.benchmarkContamination(
        emb.filter(col("vec_id") % 7 =!= 0),
        emb.filter(col("vec_id") % 7 === 0)
          .select(col("vec_id").as("bench_id"), col("embedding").as("bv")),
        threshold = 0.35)
    },
    oracle = Some("""
      WITH b AS (
        SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
        FROM embeddings WHERE vec_id % 7 = 0),
      scored AS (
        SELECT e.vec_id, b.bench_id,
          CASE WHEN list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                            x -> x * x)) = 0
                 OR list_sum(list_transform(b.bv, x -> x * x)) = 0
               THEN NULL
               ELSE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 b.bv), 4) END AS cos
        FROM embeddings e, b
        WHERE e.vec_id % 7 <> 0),
      hits AS (
        SELECT vec_id, bench_id, cos,
          CAST(row_number() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, bench_id) AS BIGINT) AS rn,
          CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n_hits
        FROM scored WHERE cos >= 0.35)
      SELECT vec_id, n_hits, bench_id AS best_bench_id, cos AS best_cos
      FROM hits WHERE rn = 1"""),
    doc = "semantic decontamination: corpus vectors within cosine 0.35 of " +
      "any broadcast benchmark vector, with best-match attribution")

  // --- ANN RECALL EVALUATION: the index-quality readout a pipeline runs
  //     before trusting an approximate path — LSH pairs vs exact brute
  //     ground truth at the same threshold, on a deterministic 1-in-5
  //     hash sample (ground truth is inherently O(n²), so production
  //     evals always run on a sample; both pipelines see the SAME
  //     sample, so recall is the index's true pair recall there).
  //     n_found counts truth pairs the LSH surfaced (LSH output is a
  //     verified subset of truth by construction, so precision is 1 and
  //     recall is the only free metric). recall = exact IEEE quotient
  //     of two longs; NULL when the sample has no qualifying pairs.
  private val q128_ann_recall = Q(
    run = (s, d) => {
      val sample = Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(5)) === 0)
      // truth pairs carry their similarity BAND: LSH recall is a
      // function of similarity (collision prob ~ s^r per band), so one
      // blended number hides that the index is near-perfect exactly
      // where near-dup dedup operates and porous in the moderate tail
      // by design. floor(cos·5) runs on the identical 4dp-rounded
      // double both engines produced, so the binning is engine-exact.
      val truth = Similarity.exactCosinePairs(sample, threshold = 0.4)
        .select(col("vec_a"), col("vec_b"),
          least(floor(col("cos") * 5), lit(4)).cast("int").as("__b"))
      val found = Similarity.annPairs(sample, threshold = 0.4)
        .select(col("vec_a"), col("vec_b"), lit(true).as("__f"))
      truth.join(found, Seq("vec_a", "vec_b"), "left")
        .groupBy(col("__b"))
        .agg(count(lit(1)).as("n_true"), count(col("__f")).as("n_found"))
        .select(
          when(col("__b") === 2, lit("0.4-0.6"))
            .when(col("__b") === 3, lit("0.6-0.8"))
            .otherwise(lit("0.8-1.0")).as("sim_band"),
          col("n_true"), col("n_found"),
          try_divide(col("n_found").cast("double"),
            col("n_true").cast("double")).as("recall"))
    },
    oracle = Some(s"""
      WITH sample AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
      truth AS (
        SELECT vec_a, vec_b,
          least(floor(cos * 5), 4) AS b FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 4)
              AS cos
          FROM sample a JOIN sample b ON a.vec_id < b.vec_id)
        WHERE cos >= 0.4),
      lsh AS (
        SELECT vec_a, vec_b FROM (
          ${annOracle(threshold = 0.4, bands = 4, dims = 64,
            maxBucketSize = 2000, src = "sample")}) t)
      SELECT CASE WHEN b = 2 THEN '0.4-0.6'
                  WHEN b = 3 THEN '0.6-0.8'
                  ELSE '0.8-1.0' END AS sim_band,
        count(*) AS n_true,
        count(l.vec_a) AS n_found,
        CASE WHEN count(*) = 0 THEN NULL
             ELSE CAST(count(l.vec_a) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) END AS recall
      FROM truth tr
      LEFT JOIN lsh l ON tr.vec_a = l.vec_a AND tr.vec_b = l.vec_b
      GROUP BY b"""),
    doc = "ANN index recall evaluation BY SIMILARITY BAND: LSH pairs vs " +
      "exact ground truth on a deterministic corpus sample")

  // --- dedup IMPACT report over the SCALE path: LSH candidate pairs →
  //     transitive components → cluster-size histogram. q73 anchors the
  //     same composition on exact all-pairs ground truth (quadratic by
  //     design); this is the banded production sibling — pairs from
  //     capped buckets, components via size-adaptive min-label, and the
  //     histogram is two tiny aggregates. The whole pipeline is the
  //     "how much will dedup shrink this corpus" readout.
  private val q132_dup_clusters = Q(
    run = (s, d) => {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity.annPairs(emb, threshold = 0.4)
        .select(col("vec_a"), col("vec_b"))
      graft.operators.Dedup.components(pairs, emb.select(col("vec_id")))
        .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    },
    oracle = Some(s"""
      WITH RECURSIVE lsh AS (
        SELECT vec_a, vec_b FROM (
          ${annOracle(threshold = 0.4, bands = 4, dims = 64,
            maxBucketSize = 2000)}) t),
      edges AS (SELECT vec_a AS s, vec_b AS d FROM lsh
                UNION ALL SELECT vec_b, vec_a FROM lsh),
      reach(s, d) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
      comp AS (SELECT s AS vec_id, min(d) AS component FROM reach
               GROUP BY s),
      szs AS (SELECT component, count(*) AS cluster_size FROM comp
              GROUP BY 1)
      SELECT cluster_size, count(*) AS n_clusters FROM szs
      GROUP BY 1"""),
    doc = "near-dup cluster-size histogram over the banded LSH scale path")

  val all: Seq[(String, Q)] = Seq(
    "q39_knn_brute" -> q39_knn_brute,
    "q40_embed_norms" -> q40_embed_norms,
    "q41_ann_lsh" -> q41_ann_lsh,
    "q53_sim_join" -> q53_sim_join,
    "q71_ivf_assign" -> q71_ivf_assign,
    "q80_kmedians_step" -> q80_kmedians_step,
    "q84_ivf_search" -> q84_ivf_search,
    "q93_pq_encode" -> q93_pq_encode,
    "q94_pq_search" -> q94_pq_search,
    "q95_int8_quant" -> q95_int8_quant,
    "q96_pq_train" -> q96_pq_train,
    "q98_ivfpq_search" -> q98_ivfpq_search,
    "q99_semdedup" -> q99_semdedup,
    "q105_ivfpq_rerank" -> q105_ivfpq_rerank,
    "q106_ivfpq_batch" -> q106_ivfpq_batch,
    "q108_label_centroids" -> q108_label_centroids,
    "q109_kmeans_step" -> q109_kmeans_step,
    "q110_semdedup_trained" -> q110_semdedup_trained,
    "q111_ivfpq_batch_rerank" -> q111_ivfpq_batch_rerank,
    "q112_hard_negatives" -> q112_hard_negatives,
    "q113_ann_multiprobe" -> q113_ann_multiprobe,
    "q114_embed_outliers" -> q114_embed_outliers,
    "q117_semantic_decontam" -> q117_semantic_decontam,
    "q127_kmeans_two_steps" -> q127_kmeans_two_steps,
    "q128_ann_recall" -> q128_ann_recall,
    "q132_dup_clusters" -> q132_dup_clusters)
}
