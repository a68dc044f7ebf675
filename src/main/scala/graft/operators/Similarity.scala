package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a deterministic random-hyperplane
  * LSH bucketing as the scale path (candidates per bucket instead of the
  * O(n·m) cross join).
  *
  * Dot products run through the codegen'd `zip_with`/`aggregate` HOFs in
  * double precision, left-to-right — deterministic across partitionings.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force top-k cosine neighbors of one query vector.
    * The query side is a 1-row broadcast; the corpus scan is a narrow map
    * then TakeOrdered — no shuffle of the corpus.
    */
  def topKForQuery(corpus: DataFrame, queryVec: DataFrame, k: Int): DataFrame = {
    corpus.crossJoin(broadcast(queryVec))
      .select(col("vec_id"),
        cosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim i weight =
    * sin(p·12289 + i·1627) — computed once at plan-build time and embedded
    * as a foldable array literal (never per row; HOF lambdas don't
    * constant-fold).
    */
  private def planeWeights(p: Int, dims: Int): Column =
    array((0 until dims).map(i =>
      lit(math.sin(p * 12289.0 + i * 1627.0))): _*)

  /** Random-hyperplane LSH signature: `planes` sign bits packed to a long. */
  def rhpSignature(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      when(dot(vec, planeWeights(p, dims)) >= 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN near-dup pairs: bucket by the RHP signature, verify cosine within
    * buckets only. `threshold` on true cosine; signature width trades recall
    * for bucket size. Norms are computed once per vector in the signature
    * map (not per pair), so the pair stage is a single zip_with dot.
    */
  def annPairs(emb: DataFrame, threshold: Double,
      planes: Int = 12, dims: Int = 64): DataFrame = {
    val sig = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"),
      rhpSignature(col("embedding"), planes, dims).as("bucket"))
    sig.as("a").join(sig.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF-style partitioned top-k: assign every vector to its nearest of
    * `nCentroids` deterministic seed centroids (vec_id-hash sampled), then
    * search only the query's cell and its neighbors. Returned here as the
    * per-cell assignment + within-cell ranking — the building block a
    * 100 TB ANN index job materializes as a partitioned table.
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"),
        cosine(col("embedding"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cos").as("centroid_cos"))
  }
}
