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
        round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                     CAST(qv AS DOUBLE[])), 4) AS cos
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

  // RHP-LSH bucketing: hash family not SQL-expressible → rows-only check;
  // recall vs the brute-force baseline is asserted in ScalaTest.
  private val q41_ann_lsh = Q(
    run = (s, d) =>
      Similarity.annPairs(Tables.embeddings(s, d), threshold = 0.9),
    oracle = None,
    doc = "random-hyperplane LSH bucketed near-dup pairs (scale path)")

  val all: Seq[(String, Q)] = Seq(
    "q39_knn_brute" -> q39_knn_brute,
    "q40_embed_norms" -> q40_embed_norms,
    "q41_ann_lsh" -> q41_ann_lsh)
}
