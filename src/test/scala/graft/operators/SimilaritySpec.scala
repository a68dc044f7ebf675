package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: self = 1, orthogonal = 0") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(1f, 0f, 2f), Seq(0f, 3f, 0f)))
      .toDF("a", "b", "o")
    val (same, orth) = df.select(
      round(Similarity.cosine(col("a"), col("b")), 9),
      round(Similarity.cosine(col("a"), col("o")), 9))
      .as[(Double, Double)].head()
    assert(same == 1.0 && orth == 0.0)
  }

  test("brute-force topK returns k rows ordered by cosine desc") {
    val emb = Tables.embeddings(spark, sf())
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val r = Similarity.topKForQuery(emb.filter(col("vec_id") =!= 0), qv, 5)
      .as[(Long, Double)].collect()
    assert(r.length == 5)
    assert(r.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("ANN LSH pairs are a high-cosine subset of brute force") {
    val emb = Tables.embeddings(spark, sf())
    val pairs = Similarity.annPairs(emb, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(_._3 >= 0.9))
  }
}
