package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a deterministic random-hyperplane
  * LSH bucketing as the scale path (candidates per bucket instead of the
  * O(n·m) cross join).
  *
  * Dot products run through the custom codegen'd [[graft.functions.DotProduct]]
  * expression in double precision, left-to-right — deterministic across
  * partitionings, and ~1000× cheaper per pair than the interpreted
  * `zip_with`/`aggregate` HOF path when evaluated inside a join condition.
  */
object Similarity {
  import org.apache.spark.sql.graftbridge.ExprBridge

  /** Σ aᵢ·bᵢ in double, left-to-right (codegen'd primitive loop). */
  def dot(a: Column, b: Column): Column =
    ExprBridge.column(graft.functions.DotProduct(
      ExprBridge.expr(a), ExprBridge.expr(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

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

  /** One band's signature: `planesPerBand` sign bits from the band's own
    * disjoint plane slice (plane index = band·planesPerBand + i).
    */
  def bandSignature(vec: Column, band: Int, planesPerBand: Int,
      dims: Int): Column =
    (0 until planesPerBand).map { i =>
      when(dot(vec, planeWeights(band * planesPerBand + i, dims)) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN near-dup pairs via BANDED random-hyperplane LSH (the classic
    * OR-of-ANDs construction): a pair is a candidate if it agrees on ALL
    * sign bits of ANY band, so recall for moderately-similar pairs is
    * `1-(1-s^r)^b` instead of the single-bucket `s^(r·b)` that only ever
    * surfaces near-identical vectors. Candidates are deduped as (id, id)
    * pairs BEFORE re-fetching vectors, so each pair's cosine is verified
    * exactly once regardless of how many bands it collided in.
    *
    * Scale shape: signatures are a narrow map over the corpus; the band
    * self-join shuffles on (band, sig) — never an O(n²) cross join; the
    * id-pair dedup and the two vector re-fetch joins shuffle only the
    * candidate set. All plane weights are fixed literals → reproducible
    * across cluster layouts.
    */
  def annPairs(emb: DataFrame, threshold: Double,
      planesPerBand: Int = 6, bands: Int = 4, dims: Int = 64): DataFrame = {
    val banded = emb.select(col("vec_id"), explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("band"),
          bandSignature(col("embedding"), b, planesPerBand, dims).as("sig"))
      }: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    candidates
      .join(vecs.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"), col("norm").as("norm_a")), Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"), col("norm").as("norm_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs cosine similarity join above `threshold` (4-dp
    * rounded before the filter for cross-engine stability). The probe
    * side is repartitioned so the broadcast nested-loop join parallelizes
    * (a cached table arrives in one partition). Shared by the q53 sim
    * join, [[embeddingDups]], and the q73 component clustering — one
    * definition so rounding/partitioning fixes can't drift apart.
    */
  def exactCosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val sig = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("norm"))
    val np = emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    sig.repartition(np).as("a").join(broadcast(sig.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-dup dedup marking: a vector is a duplicate when
    * some LOWER-id vector sits within `threshold` cosine — the keep-first
    * policy of [[Dedup.exact]] applied to the vector space. `exact = true`
    * compares all pairs (oracle-checkable, n² verify); `exact = false`
    * takes candidates from the banded LSH ([[annPairs]]) — the 100 TB
    * path, where only bucket-mates are verified.
    */
  def embeddingDups(emb: DataFrame, threshold: Double,
      exact: Boolean = true): DataFrame = {
    val pairs =
      if (exact) exactCosinePairs(emb, threshold)
      else annPairs(emb, threshold)
    val dupIds = pairs.select(col("vec_b").as("vec_id")).distinct()
    emb.select(col("vec_id"))
      .join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** IVF-style partitioned top-k: assign every vector to its nearest of
    * `nCentroids` deterministic seed centroids (vec_id-hash sampled), then
    * search only the query's cell and its neighbors. Returned here as the
    * per-cell assignment + within-cell ranking — the building block a
    * 100 TB ANN index job materializes as a partitioned table.
    */
  /** `roundDp`: decimals the scores are rounded to BEFORE ranking, so the
    * argmax (ties broken by centroid id) is deterministic across engines
    * and summation orders.
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame,
      roundDp: Int = 6): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"),
        round(cosine(col("embedding"), col("cv")), roundDp).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cos").as("centroid_cos"))
  }
}
