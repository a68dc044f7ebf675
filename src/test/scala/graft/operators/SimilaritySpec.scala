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

  test("zero-norm vectors are inert, not fatal: cosine is NULL (never a " +
      "DIVIDE_BY_ZERO crash), pairs exclude them, argmax never picks them") {
    val df = Seq(
      (0L, Seq(1f, 2f, 3f)), (1L, Seq(0f, 0f, 0f)), (2L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val cos01 = df.filter(col("vec_id") === 0)
      .crossJoin(df.filter(col("vec_id") === 1)
        .select(col("embedding").as("zv")))
      .select(Similarity.cosine(col("embedding"), col("zv")))
      .collect().head
    assert(cos01.isNullAt(0)) // undefined, NOT an ANSI crash
    val pairs = Similarity.exactCosinePairs(df, 0.1)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((0L, 2L))) // the zero vector pairs with nothing
    val cents = df.select(col("vec_id").as("centroid_id"),
      col("embedding").as("cv"))
    val assigned = Similarity.ivfAssign(df, cents, roundDp = 4)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    // real vectors choose a real centroid (0, the lowest-id of the tied
    // identical pair), never the zero one; the zero vector falls back to
    // the lowest centroid id with NULL cos
    assert(assigned == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("brute-force topK returns k rows ordered by cosine desc") {
    val emb = Tables.embeddings(spark, sf())
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val r = Similarity.topKForQuery(emb.filter(col("vec_id") =!= 0), qv, 5)
      .as[(Long, Double)].collect()
    assert(r.length == 5)
    assert(r.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("ivfAssign: every vector lands on its nearest centroid, " +
      "ties broken by centroid id") {
    val emb = Tables.embeddings(spark, sf())
    val centroids = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val assigned = Similarity.ivfAssign(emb, centroids, roundDp = 4)
      .as[(Long, Long, Double)].collect()
    assert(assigned.length == emb.count())
    // seed vectors assign to themselves at cosine 1
    (0L until 4L).foreach { i =>
      val row = assigned.find(_._1 == i).get
      assert(row._2 == i && row._3 == 1.0)
    }
  }

  test("ivfAssign: empty centroid set yields zero rows, not null " +
      "assignments") {
    val emb = Tables.embeddings(spark, sf())
    val none = emb.filter(col("vec_id") < 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    assert(Similarity.ivfAssign(emb, none).count() == 0)
  }

  test("QuantMeanAgg fused centroid accumulation == composed posexplode/" +
      "decimal form bit-for-bit: random floats, NULL vectors/elements, " +
      "NaN/Inf, clamp-range extremes, mixed lengths, all-null positions, " +
      "and partition-count invariance") {
    val rng = new scala.util.Random(20260819L)
    def v(n: Int): Seq[java.lang.Double] = Seq.fill(n) {
      rng.nextInt(8) match {
        case 0 => null
        case 1 => java.lang.Double.valueOf(Double.NaN)
        case 2 => java.lang.Double.valueOf(
          if (rng.nextBoolean()) Double.PositiveInfinity
          else Double.NegativeInfinity)
        case 3 => java.lang.Double.valueOf((rng.nextDouble() - 0.5) * 1e10)
        case _ => java.lang.Double.valueOf((rng.nextDouble() - 0.5) * 4)
      }
    }
    val rows = ((1 to 400).map { i =>
      val len = Seq(0, 3, 8, 8, 8, 12)(rng.nextInt(6))
      (i.toLong, s"g${i % 7}", if (i % 19 == 0) null else v(len))
    }).toDF("vec_id", "key", "embedding")
    for (parts <- Seq(1, 7)) {
      val d = rows.repartition(parts)
      val fused = Similarity.groupCentroids(d, "key")
        .collect().map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) null
          else java.lang.Double.valueOf(r.getDouble(2)))).toSet
      val composed = Similarity.groupCentroidsComposed(d, "key")
        .collect().map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) null
          else java.lang.Double.valueOf(r.getDouble(2)))).toSet
      assert(fused == composed, s"parts=$parts: " +
        s"missing=${(composed -- fused).take(3)} " +
        s"extra=${(fused -- composed).take(3)}")
      assert(fused.nonEmpty)
    }
  }

  test("IvfArgmaxExpr fused assignment == composed array_max(transform) " +
      "form: random float/double vectors, NULL embeddings, NULL elements, " +
      "zero vectors, duplicate centroids (tie -> smallest id), NULL " +
      "centroid id, int-typed ids, dim mismatches, empty centroid set") {
    val rng = new scala.util.Random(20260818L)
    def v(n: Int): Seq[Float] =
      Seq.fill(n)((rng.nextDouble() * 4 - 2).toFloat)
    val emb = ((1 to 120).map { i =>
      val dims = if (i % 11 == 0) 5 else 8 // occasional dim mismatch
      (i.toLong, if (i % 17 == 0) null else v(dims))
    } ++ Seq(
      (200L, Seq.fill(8)(0f)),                       // zero vector
      (201L, null.asInstanceOf[Seq[Float]])          // NULL embedding
    )).toDF("vec_id", "embedding")
    val dupCv = v(8)
    val centsLong = (Seq(
      (java.lang.Long.valueOf(3L), dupCv),           // tie pair (3 < 9)
      (java.lang.Long.valueOf(9L), dupCv),
      (java.lang.Long.valueOf(5L), Seq.fill(8)(0f)), // zero-norm centroid
      (null.asInstanceOf[java.lang.Long], v(8)),     // NULL centroid id
      (java.lang.Long.valueOf(7L), v(6))             // short centroid
    ) ++ (20 to 40).map(i => (java.lang.Long.valueOf(i.toLong), v(8))))
      .toDF("centroid_id", "cv")
    for ((cents, tag) <- Seq(
        (centsLong, "long-ids"),
        (centsLong.select(col("centroid_id").cast("int")
          .as("centroid_id"), col("cv").cast("array<double>").as("cv")),
          "int-ids-double-cv"))) {
      val fused = Similarity.ivfAssign(emb, cents, roundDp = 4)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.get(1).toString,
          if (r.isNullAt(2)) null else r.getDouble(2))).toSet
      val composed = Similarity.ivfAssignComposed(emb, cents, roundDp = 4)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.get(1).toString,
          if (r.isNullAt(2)) null else r.getDouble(2))).toSet
      assert(fused == composed, s"[$tag] fused != composed: " +
        s"missing=${(composed -- fused).take(3)} " +
        s"extra=${(fused -- composed).take(3)}")
      assert(fused.nonEmpty)
    }
    // empty centroid set: zero rows on both paths
    val none = centsLong.filter(col("centroid_id") === -1)
    assert(Similarity.ivfAssign(emb, none, roundDp = 4).count() == 0)
    assert(Similarity.ivfAssignComposed(emb, none, roundDp = 4).count() == 0)
  }

  test("IvfArgmaxExpr two-pass rounded argmax (constCents) == general " +
      "path == composed: rounded near-ties where the smaller id has the " +
      "LOWER raw cosine, exact scalar-multiple ties, NULL elements both " +
      "sides, NaN/Inf elements, dp 4 and 6") {
    import org.apache.spark.sql.graftbridge.ExprBridge
    val rng = new scala.util.Random(20260820L)
    val dims = 8
    val base = Seq.fill(dims)(rng.nextDouble() * 2 - 1)
    def jitter(eps: Double): Seq[java.lang.Double] =
      base.zipWithIndex.map { case (x, i) =>
        java.lang.Double.valueOf(if (i == 0) x + eps else x)
      }
    def boxed(s: Seq[Double]): Seq[java.lang.Double] =
      s.map(java.lang.Double.valueOf)
    // centroids: exact scalar multiples (raw-equal cos, tie -> min id),
    // tiny perturbations below the rounding bracket (rounded-equal,
    // raw-unequal — the two-pass margin scan must still pick the
    // smallest id even when it holds the LOWER raw cosine), larger
    // perturbations spanning brackets, null/NaN/Inf elements
    val tieCents = Seq(
      (90L, boxed(base.map(_ * 2.0))),
      (10L, jitter(1e-9)),     // rounds equal at dp 4 and 6
      (40L, jitter(-1e-9)),
      (20L, jitter(1e-7)),
      (60L, jitter(5e-5)),     // may cross the dp-6 bracket, not dp-4
      (70L, jitter(2e-3)),     // crosses dp-4
      (31L, boxed(base).updated(2, null.asInstanceOf[java.lang.Double]))
    ) ++ (100 to 140).map(i =>
      (i.toLong, boxed(Seq.fill(dims)(rng.nextDouble() * 2 - 1))))
    // NaN/Inf centroids in a separate case: a NaN cosine is SQL-greatest
    // and would swallow every row's argmax, hiding the tie logic above
    val nanInfCents = tieCents ++ Seq(
      (32L, boxed(base).updated(0, java.lang.Double.valueOf(Double.NaN))),
      (33L, boxed(base).updated(1,
        java.lang.Double.valueOf(Double.PositiveInfinity))))
    val emb = ((1 to 150).map { i =>
      val v: Seq[java.lang.Double] =
        if (i % 13 == 0) boxed(base.map(_ * (i % 7 + 1)))  // tie magnets
        else if (i % 29 == 0) null
        else if (i % 5 == 0) boxed(Seq.fill(dims)(rng.nextDouble() * 2 - 1))
          .updated(i % dims, null.asInstanceOf[java.lang.Double])
        else boxed(Seq.fill(dims)(rng.nextDouble() * 2 - 1))
      (i.toLong, v)
    }).toDF("vec_id", "embedding")
    // general-path twin of ivfAssign (constCents = false)
    def assignGeneral(cents: org.apache.spark.sql.DataFrame, dp: Int) = {
      val packed = cents.groupBy().agg(
        collect_list(struct(col("centroid_id"), col("cv"),
          Similarity.l2norm(col("cv")).as("cnorm"))).as("cents"))
      val best = ExprBridge.column(graft.functions.IvfArgmaxExpr(
        ExprBridge.expr(col("embedding")), ExprBridge.expr(col("cents")),
        dp, constCents = false))
      emb.crossJoin(broadcast(packed))
        .select(col("vec_id"), best.as("best"))
        .filter(col("best").isNotNull)
        .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
          col("best.cos").as("centroid_cos"))
    }
    for (dp <- Seq(4, 6);
         (centRows, tag) <- Seq((tieCents, "ties"),
                                (nanInfCents, "nan-inf"))) {
      val cents = centRows.toDF("centroid_id", "cv")
      // doubles encoded via toString: a boxed-NaN tuple is never ==
      // under Scala numeric equality, so raw sets of NaN rows can't
      // compare; "NaN"/"Infinity" strings can
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.get(1).toString,
          if (r.isNullAt(2)) null else r.getDouble(2).toString)).toSet
      val fast = norm(Similarity.ivfAssign(emb, cents, roundDp = dp))
      val gen = norm(assignGeneral(cents, dp))
      val composed = norm(Similarity.ivfAssignComposed(emb, cents,
        roundDp = dp))
      assert(fast == composed, s"[$tag] dp=$dp fast != composed: " +
        s"missing=${(composed -- fast).take(3)} " +
        s"extra=${(fast -- composed).take(3)}")
      assert(gen == composed, s"[$tag] dp=$dp general != composed: " +
        s"missing=${(composed -- gen).take(3)} " +
        s"extra=${(gen -- composed).take(3)}")
      assert(fast.nonEmpty)
      // the tie corpus must actually exercise rounded ties: the scalar-
      // multiple magnets and sub-bracket jitters tie at 10, never 40/90
      if (tag == "ties")
        assert(fast.exists(_._2 == "10"), s"tie corpus lost its point")
    }
  }

  test("ivfSearch: probing ALL cells equals brute-force top-k; " +
      "fewer probes return a subset of the searched cells") {
    val emb = Tables.embeddings(spark, sf())
    val corpus = emb.filter(col("vec_id") =!= 0)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    // nprobe = k(cells): the rerank sees every vector -> exact top-k
    val full = Similarity.ivfSearch(corpus, centroids, qv, nprobe = 8, k = 10)
      .select(col("vec_id"), col("cos")).as[(Long, Double)].collect()
    val brute = Similarity.topKForQuery(corpus, qv, 10)
      .select(col("vec_id"), round(col("cos"), 4)).as[(Long, Double)].collect()
    // brute ranks pre-rounding, ivfSearch post-rounding: a tie AT the k
    // cutoff may legitimately keep different rows, so compare (a) the
    // rounded-score multisets and (b) exact rows above the cutoff score
    assert(full.map(_._2).sorted.toSeq == brute.map(_._2).sorted.toSeq)
    val cutoff = brute.map(_._2).min
    assert(full.filter(_._2 > cutoff).toSet == brute.filter(_._2 > cutoff).toSet)
    // partial probe: results come only from probed cells, sorted desc
    val part = Similarity.ivfSearch(corpus, centroids, qv, nprobe = 2, k = 10)
      .as[(Long, Long, Double)].collect()
    assert(part.map(_._2).distinct.length <= 2)
    assert(part.map(_._3).zip(part.map(_._3).drop(1)).forall(w => w._1 >= w._2))
  }

  test("embeddingDups: keep-first marking, exact and LSH variants agree " +
      "on LSH-surfaced dups") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val exact = Similarity.embeddingDups(emb, 0.4, exact = true)
      .as[(Long, Boolean)].collect().toMap
    assert(exact.size == emb.count())
    assert(exact.values.exists(identity) && exact.values.exists(!_))
    // lowest id overall can never be a dup (no lower id exists)
    assert(!exact(exact.keys.min))
    val lsh = Similarity.embeddingDups(emb, 0.4, exact = false)
      .as[(Long, Boolean)].collect().toMap
    // LSH candidates are a subset of exact pairs -> dup marks are a subset
    assert(lsh.collect { case (id, true) => id }.toSet
      .subsetOf(exact.collect { case (id, true) => id }.toSet))
  }

  test("banded ANN LSH pairs: nonempty, subset of exact, no duplicates") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val lsh = Similarity.annPairs(emb, threshold = 0.4)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "banded LSH must surface pairs on the fixture data")
    assert(lsh.forall(_._3 >= 0.4))
    val lshSet = lsh.map(p => (p._1, p._2)).toSet
    assert(lshSet.size == lsh.length, "multi-band collisions must be deduped")
    // exact ground truth via full pair join (test-scale only)
    val sig = emb.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("norm"))
    val exact = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .as[(Long, Long, Double)].collect()
    assert(lshSet.subsetOf(exact.map(p => (p._1, p._2)).toSet))
    val recall = lshSet.size.toDouble / exact.length
    assert(recall >= 0.1, s"LSH recall $recall over ${exact.length} pairs")

    // the anisotropy knob changes only WHICH candidates surface, never
    // their scores: still exact-verified, deduped, nonempty
    val centered = Similarity
      .annPairs(emb, threshold = 0.4, center = true)
      .as[(Long, Long, Double)].collect()
    assert(centered.nonEmpty, "centered LSH must still surface pairs")
    assert(centered.forall(_._3 >= 0.4))
    val cSet = centered.map(p => (p._1, p._2)).toSet
    assert(cSet.size == centered.length)
    assert(cSet.subsetOf(exact.map(p => (p._1, p._2)).toSet))

    // the hot-bucket fuse drops oversized buckets, so its output is a
    // subset of the uncapped run and empties out as the cap goes to zero-ish
    val tiny = Similarity
      .annPairs(emb, threshold = 0.4, maxBucketSize = 1)
      .as[(Long, Long, Double)].collect()
    assert(tiny.map(p => (p._1, p._2)).toSet.subsetOf(lshSet))
  }

  // Regression gates for the round-6 postmortem: a sin-based weight family
  // had plane pairs up to PERFECTLY correlated (median |corr| 0.5), which
  // collapsed signature entropy, produced buckets 43× the n/2^r mean full
  // of DISSIMILAR vectors, and made candidate verification quadratic
  // (q41's 20×-for-10×-rows sf1 curve). These two tests fail on any such
  // family long before a scale probe would.
  test("LSH plane family: pairwise near-orthogonal (avalanche gate)") {
    val dims = 64
    val planes = (0 until 4 * Similarity.PlaneStride)
      .map(p => (0 until dims).map(i => Similarity.radWeight(p, i)))
    val worst = (for {
      a <- planes.indices; b <- planes.indices if a < b
    } yield math.abs((0 until dims)
      .map(i => planes(a)(i) * planes(b)(i)).sum / dims)).max
    // E|corr| for random ±1 is ~1/sqrt(dims)=0.125; the broken family hit
    // 1.0. Bound generous enough for the family's true tail (~0.44).
    assert(worst <= 0.6, f"max plane |corr| $worst%.3f — correlated family")
  }

  test("fused RhpSignaturesExpr == composed bandSignature on real and " +
      "hostile vectors (null elements, NULL array, short arrays)") {
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val hostile = Seq(
      (9001L, Seq[java.lang.Double](1.0, -2.0, null, 3.0)), // null element
      (9002L, Seq[java.lang.Double]()),                     // empty
      (9003L, null.asInstanceOf[Seq[java.lang.Double]]),    // NULL array
      (9004L, Seq[java.lang.Double](0.0))                   // shorter than dims
    ).toDF("vec_id", "q")
    val all = emb.unionByName(hostile)
    val ppb = 10
    val fused = all.select(col("vec_id"),
      Similarity.allBandSignatures(col("q"), 4, ppb, 64).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    val composed = all.select(col("vec_id") +: (0 until 4).map(b =>
        Similarity.bandSignature(col("q"), b, ppb, 64).as(s"s$b")): _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    assert(fused == composed)
  }

  test("fused RhpProbesExpr == composed sig + lowest-|margin| flips on " +
      "real and hostile vectors (null elements, NULL array, short, ties)") {
    val dims = 64
    val bands = 2
    val ppb = 10
    val t = 3
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val hostile = Seq(
      (9001L, Seq[java.lang.Double](1.0, -2.0, null, 3.0)), // null element
      (9002L, Seq[java.lang.Double]()),                     // empty
      (9003L, null.asInstanceOf[Seq[java.lang.Double]]),    // NULL array
      (9004L, Seq[java.lang.Double](0.0)),                  // short: all-tie
      (9005L, Seq[java.lang.Double](0.0, 0.0, 0.0, 0.0))    // zero: all-tie
    ).toDF("vec_id", "q")
    val all = emb.unionByName(hostile)
    val fused = all.select(col("vec_id"),
        org.apache.spark.sql.graftbridge.ExprBridge.column(
          graft.functions.RhpProbesExpr(
          org.apache.spark.sql.graftbridge.ExprBridge.expr(col("q")),
          bands, ppb, dims, Similarity.PlaneStride, t)).as("p"))
      .as[(Long, Seq[Seq[Long]])].collect().toMap
    // composed reference: bandSignature for the identity, per-plane
    // |dot| margins ranked (margin ASC, plane ASC) for the flips; a
    // NULL vector has sig 0 and margin 0 everywhere (picks 0..T-1)
    def w(p: Int): Seq[Double] =
      (0 until dims).map(i => Similarity.radWeight(p, i))
    val margined = all.select(
      col("vec_id") +:
        (0 until bands).map(b =>
          Similarity.bandSignature(col("q"), b, ppb, dims).as(s"s$b")) ++:
        (for (b <- 0 until bands; i <- 0 until ppb) yield
          abs(coalesce(Similarity.dot(col("q"),
            array(w(b * Similarity.PlaneStride + i).map(lit): _*)),
            lit(0.0))).as(s"m${b}_$i")): _*)
    // NULL array: the composed bandSignature also yields 0 (each dot
    // NULL -> otherwise-0) and margins coalesce to 0, so the reference
    // needs no special case.
    val composed = margined.collect().map { r =>
      val vid = r.getLong(0)
      val sigs = (0 until bands).map(b => r.getLong(1 + b))
      val probes = (0 until bands).map { b =>
        val sig = sigs(b)
        val picks = (0 until ppb)
          .map(i => (r.getDouble(1 + bands + b * ppb + i), i))
          .sortBy { case (m, i) => (m, i) }
          .take(t).map(_._2)
        sig +: picks.map(i => sig ^ (1L << i))
      }
      vid -> probes.map(_.toSeq).toSeq
    }.toMap
    assert(fused.keySet == composed.keySet)
    for (k <- fused.keySet)
      assert(fused(k) == composed(k), s"vec $k: ${fused(k)} vs ${composed(k)}")
  }

  test("LSH bucket sizes stay near the n/2^r mean (skew gate)") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf()).cache()
    val n = emb.count()
    val r = Similarity.autoPlanesPerBand(n)
    val sigs = emb
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          Similarity.bandSignature(col("q"), b, r, 64).as("sig"))): _*))
        .as("bs"))
      .groupBy(col("bs.band"), col("bs.sig")).count()
      .as[(Int, Long, Long)].collect()
    val mean = n.toDouble / (1L << r)
    val top = sigs.map(_._3).max
    // binomial max over 2^r buckets sits within a few σ of the mean; the
    // correlated family produced 43× (949 vs a 19.5 mean at sf1)
    assert(top <= math.max(8 * mean, mean + 6 * math.sqrt(mean) + 4),
      s"top bucket $top vs mean $mean — skewed signature distribution")
  }

  test("int8 quantization: codes bounded, round-trip error <= scale/2 " +
      "per element, int8 cosine tracks exact cosine") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val q = Similarity.int8Quantize(emb).cache()
    val rows = q.join(emb, "vec_id")
      .select(col("vec_id"), col("qscale"), col("qvec"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Double, Seq[Int], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, codes, v) =>
      assert(codes.length == v.length)
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id")
      if (scale > 0) {
        // |x - q·scale| <= scale/2 + ulp slack: the defining property
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - c * scale) <= scale / 2 + 1e-9,
            s"vec $id: x=$x c=$c scale=$scale")
        }
      } else v.foreach(x => assert(x == 0.0, s"vec $id zero-scale"))
    }
    // int8 dot (rescaled) approximates exact cosine: rank the corpus
    // against vector 0 both ways, top-10 overlap must be high
    val exact = rows.map { case (id, _, _, v) => id -> v }.toMap
    val v0 = exact(0L)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val exactTop = exact.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(v0, v) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val qm = rows.map { case (id, s, codes, _) =>
      id -> (s, codes.map(_.toDouble)) }.toMap
    val (s0, q0) = qm(0L)
    val approxTop = qm.toSeq.filter(_._1 != 0L)
      .map { case (id, (s, qv)) => id -> cos(q0, qv) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    assert(exactTop.intersect(approxTop).size >= 7,
      s"int8 top-10 overlap ${exactTop.intersect(approxTop).size}")
  }

  test("PQ encode: codebook vectors are their own nearest code in every " +
      "subspace; codes stay in range and don't depend on partitioning") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
    val enc = Similarity.pqEncode(emb, cb, dims = 64, m = 8)
      .as[(Long, Seq[Long])].collect()
    assert(enc.length == emb.count())
    enc.foreach { case (_, codes) =>
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    // a codebook vector's subvector is AT its own centroid: squared L2
    // distance 0 is the unique minimum on continuous random data
    enc.filter(_._1 < 16).foreach { case (id, codes) =>
      assert(codes.forall(_ == id), s"vector $id must self-encode: $codes")
    }
    val reshuffled = Similarity
      .pqEncode(emb.repartition(7, col("label")), cb, dims = 64, m = 8)
      .as[(Long, Seq[Long])].collect()
    assert(enc.toMap == reshuffled.toMap,
      "codes must not depend on partitioning")
  }

  test("PqEncodeExpr == the composed transform/array_min argmin, " +
      "including NULL and short vectors") {
    val emb = Tables.embeddings(spark, sf())
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
    val hostile = Seq(
      (9001L, null.asInstanceOf[Seq[Float]]),
      (9002L, Seq(1.0f, -2.0f, 3.0f)), // far shorter than dims
      (9003L, Seq.fill(64)(0.0f))
    ).toDF("vec_id", "embedding")
    val all = emb.select(col("vec_id"), col("embedding")).unionByName(hostile)
    val fused = Similarity.pqEncode(all, cb, dims = 64, m = 8)
      .as[(Long, Seq[Long])].collect().toMap
    // composed reference (the pre-round-6 implementation, verbatim)
    val packed = cb.groupBy(col("sub_id"))
      .agg(collect_list(struct(col("code_id"), col("sv"), col("c2")))
        .as("codes"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("sub_id"), col("codes"))))
        .as("cb"))
    val ds = 8
    val subs = transform(sequence(lit(0), lit(7)),
      j => slice(col("__v"), j * ds + 1, lit(ds)))
    val codesCol = transform(sequence(lit(0), lit(7)), j => {
      val sub = element_at(col("__subs"), j + 1)
      val entries = element_at(col("cb"), j + 1)("codes")
      array_min(transform(entries, c =>
        struct(
          round(c("c2") - lit(2.0) * Similarity.dot(sub, c("sv")), 6)
            .as("d"),
          c("code_id").as("code_id"))))("code_id")
    })
    val composed = all
      .withColumn("__v", col("embedding").cast("array<double>"))
      .withColumn("__subs", subs)
      .crossJoin(broadcast(packed))
      .select(col("vec_id"), codesCol.as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused == composed)
  }

  test("PQ trained codebook: k-medians refinement lowers quantization " +
      "error vs the first-rows seed and drops into the same encode path") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val seed = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16)
      .cache()
    val trained = Similarity
      .pqTrainCodebook(emb, dims = 64, m = 8, codes = 16, iters = 2)
      .cache()
    // same shape, every code present, schema-compatible with the seed
    val tRows = trained.as[(Int, Long, Seq[Double], Double)].collect()
    assert(tRows.length == 8 * 16)
    assert(tRows.forall(_._3.length == 8))
    // quantization error = mean over (vector, subspace) of the winning
    // squared L2 distance |x|^2 - 2 x.c + |c|^2; deterministic on the
    // fixture, so the comparison can't flake
    def qerr(cb: org.apache.spark.sql.DataFrame): Double = {
      val ds = 8
      val assigned = Similarity
        .pqEncode(emb, cb, dims = 64, m = 8, keep = Seq("embedding"))
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          posexplode(col("codes")))
        .select(col("pos").as("sub_id"), col("col").as("code_id"),
          slice(col("v"), col("pos") * ds + 1, lit(ds)).as("xv"))
      assigned.join(cb, Seq("sub_id", "code_id"))
        .select((Similarity.dot(col("xv"), col("xv"))
          - lit(2.0) * Similarity.dot(col("xv"), col("sv"))
          + col("c2")).as("d2"))
        .agg(avg(col("d2"))).as[Double].head()
    }
    val eSeed = qerr(seed)
    val eTrained = qerr(trained)
    assert(eTrained < eSeed,
      f"training must reduce quantization error: seed $eSeed%.5f vs " +
        f"trained $eTrained%.5f")
    // and the trained book still self-consistently encodes: codes in range
    val enc = Similarity.pqEncode(emb, trained, dims = 64, m = 8)
      .as[(Long, Seq[Long])].collect()
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 16)))
  }

  test("PQ ADC search: scores equal an independent LUT-sum recompute of " +
      "each row's codes; ranking is descending") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16).cache()
    val corpus = emb.filter(col("vec_id") =!= 0)
    val codes = Similarity.pqEncode(corpus, cb, dims = 64, m = 8)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val top = Similarity.pqSearch(codes, cb, query, dims = 64, m = 8, k = 10)
      .as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(top.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    // independent recompute: explode codes relationally, join the codebook,
    // take exact query-subvector dot products, sum per vector
    val qd = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("qv"))
    val recomputed = codes
      .select(col("vec_id"), posexplode(col("codes")))
      .join(cb, col("pos") === cb("sub_id") && col("col") === cb("code_id"))
      .crossJoin(broadcast(qd))
      .select(col("vec_id"), Similarity.dot(
        slice(col("qv"), col("sub_id") * 8 + 1, lit(8)), col("sv")).as("lv"))
      .groupBy(col("vec_id")).agg(round(sum(col("lv")), 4).as("score"))
      .as[(Long, Double)].collect().toMap
    top.foreach { case (id, s) =>
      assert(math.abs(recomputed(id) - s) < 1e-9,
        s"ADC score for $id: search=$s recompute=${recomputed(id)}")
    }
  }

  test("ANN signatures are engine-exact: quantized dots are integer-valued " +
      "and the pair set is invariant to input partitioning") {
    val emb = Tables.embeddings(spark, sf())
    // quantize emits integer-valued doubles (floor(x·1e6)) — the property
    // that keeps every ±1-weighted partial sum exact in IEEE double, so
    // the sign bits (and thus the q41 oracle compare) cannot depend on
    // summation order, partitioning, or engine
    val nonIntegral = emb
      .select(explode(Similarity.quantize(col("embedding"))).as("qx"))
      .filter(col("qx") =!= floor(col("qx")))
    assert(nonIntegral.count() == 0)
    val base = Similarity.annPairs(emb, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val reshuffled = Similarity
      .annPairs(emb.repartition(7, col("label")), threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(base == reshuffled, "pair set must not depend on partitioning")
  }

  test("ivfPqSearch: probing ALL cells equals pqSearch over the full " +
      "corpus; fewer probes return members of probed cells only") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val corpus = emb.filter(col("vec_id") =!= 0)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16).cache()
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val full = Similarity.ivfPqSearch(corpus, centroids, cb, query,
        dims = 64, m = 8, nprobe = 8, k = 10)
      .as[(Long, Double)].collect()
    val flat = Similarity.pqSearch(
        Similarity.pqEncode(corpus, cb, dims = 64, m = 8), cb, query,
        dims = 64, m = 8, k = 10)
      .as[(Long, Double)].collect()
    assert(full.toSeq == flat.toSeq,
      s"nprobe=all must equal flat ADC search:\n$full\nvs\n$flat")
    // partial probe: every hit belongs to one of the probed cells
    val assigned = Similarity.ivfAssign(corpus, centroids, roundDp = 4)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    val probedCells = centroids.crossJoin(broadcast(query))
      .select(col("centroid_id"),
        round(Similarity.cosine(col("cv"), col("qv")), 4).as("c"))
      .orderBy(col("c").desc, col("centroid_id")).limit(3)
      .as[(Long, Double)].collect().map(_._1).toSet
    val part = Similarity.ivfPqSearch(corpus, centroids, cb, query,
        dims = 64, m = 8, nprobe = 3, k = 10)
      .as[(Long, Double)].collect()
    assert(part.nonEmpty)
    assert(part.forall { case (id, _) => probedCells(assigned(id)) },
      "partial probe surfaced a vector from an unprobed cell")
  }

  test("ivfPqSearchRerank: results come from the ADC shortlist, rank on " +
      "the EXACT cosine, and a corpus-wide shortlist recovers exact top-k") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val corpus = emb.filter(col("vec_id") =!= 0)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16).cache()
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val short = Similarity.ivfPqSearch(corpus, centroids, cb, query,
        dims = 64, m = 8, nprobe = 3, k = 25)
      .as[(Long, Double)].collect().map(_._1).toSet
    val got = Similarity.ivfPqSearchRerank(corpus, centroids, cb, query,
        dims = 64, m = 8, nprobe = 3, shortlist = 25, k = 10)
      .as[(Long, Double, Double)].collect()
    assert(got.length == 10)
    assert(got.forall { case (id, _, _) => short(id) },
      "rerank hit outside its own ADC shortlist")
    // ranked by the exact score desc (NULLs absent in fixture), id ties
    val scores = got.map(_._3)
    assert(scores.sameElements(scores.sortBy(-_)), "not exact-score ranked")
    // exact scores must equal the brute-force cosine for those ids
    val brute = Similarity.topKForQuery(corpus, query, Int.MaxValue)
      .select(col("vec_id"), round(col("cos"), 4).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(got.forall { case (id, _, s) => brute(id) == s },
      "rerank score diverged from the brute-force cosine")
    // degenerate check: probing ALL cells with a corpus-wide shortlist
    // must reproduce the exact brute-force top-k (PQ loss fully refined)
    val n = corpus.count().toInt
    val full = Similarity.ivfPqSearchRerank(corpus, centroids, cb, query,
        dims = 64, m = 8, nprobe = 8, shortlist = n, k = 10)
      .as[(Long, Double, Double)].collect().map(r => (r._1, r._3))
    val exact = brute.toSeq.sortBy { case (id, c) => (-c, id) }.take(10)
    assert(full.toSeq == exact,
      s"full-shortlist rerank must equal exact top-k:\n${full.toSeq}\nvs\n$exact")
  }

  test("ivfPqSearchBatch: each query's slice equals the single-query " +
      "ivfPqSearch, ranks are dense 1..k per query") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val corpus = emb.filter(col("vec_id") >= 3)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16).cache()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.ivfPqSearchBatch(corpus, centroids, cb, queries,
        dims = 64, m = 8, nprobe = 3, k = 10)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (qid <- 0L to 2L) {
      val single = Similarity.ivfPqSearch(corpus, centroids, cb,
          emb.filter(col("vec_id") === qid)
            .select(col("embedding").as("qv")),
          dims = 64, m = 8, nprobe = 3, k = 10)
        .as[(Long, Double)].collect().toSeq
      assert(batch(qid) == single,
        s"batch slice for query $qid diverged:\n${batch(qid)}\nvs\n$single")
      assert(batch(qid).length == 10)
    }
    // partitioning independence: the result set survives a reshuffle
    val reshuffled = Similarity.ivfPqSearchBatch(
        corpus.repartition(7, col("label")), centroids, cb, queries,
        dims = 64, m = 8, nprobe = 3, k = 10)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(reshuffled == batch.flatMap { case (q, rs) =>
      rs.zipWithIndex.map { case ((id, s), i) => (q, i + 1, id, s) }
    }.toSet, "batch result must not depend on input partitioning")
  }

  test("groupCentroids: partitioning-invariant (decimal-exact sums), " +
      "matches a driver-side mean, singleton group = its own vector") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val base = Similarity.groupCentroids(emb, "label")
      .as[(Int, Int, Option[Double])].collect().toSet
    val reshuffled = Similarity
      .groupCentroids(emb.repartition(11, col("vec_id")), "label")
      .as[(Int, Int, Option[Double])].collect().toSet
    assert(base == reshuffled,
      "float-sum order leaked into the centroid (not decimal-exact)")
    // driver replay for one label: quantize floor(x*1e6 + 0.5), exact
    // integer sum, double division — the engine's exact contract
    def quant(x: Double): Long =
      math.floor(math.min(math.max(x, -1e9), 1e9) * 1e6 + 0.5).toLong
    val rows = emb.filter(col("label") === 0)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
    val dims = rows.head.length
    val got = base.filter(_._1 == 0).toSeq.sortBy(_._2).map(_._3.get)
    val want = (0 until dims).map { p =>
      val s = rows.map(r => BigInt(quant(r(p)))).sum
      s.toDouble / (rows.length.toDouble * 1e6)
    }
    assert(got.size == dims)
    assert(got == want, s"centroid replay mismatch:\n$got\nvs\n$want")
    // singleton group: centroid == the vector quantized at 6dp
    val single = emb.filter(col("vec_id") === 3)
      .withColumn("label", lit(999))
    val sc = Similarity.groupCentroids(single, "label")
      .as[(Int, Int, Option[Double])].collect().sortBy(_._2).map(_._3.get)
    val sv = single.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].head().map(x => quant(x) / 1e6)
    assert(sc.toSeq == sv.toSeq)
  }

  test("kmeansStep: members' quantized mean moves the centroid, a " +
      "duplicate (higher-id, member-less) centroid keeps its seed") {
    val emb = Tables.embeddings(spark, sf()).cache()
    // centroid 100 duplicates centroid 0 exactly: cosine ties always
    // break to the smaller id, so 100 gets no members and must keep
    // its seed coordinates verbatim
    val seedBase = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(100L).as("centroid_id"), col("embedding").as("cv"))
    val seeds = seedBase.unionByName(dup)
    val stepped = Similarity.kmeansStep(emb, seeds)
      .as[(Long, Int, Double)].collect()
    val byCid = stepped.groupBy(_._1)
    assert(byCid.keySet == Set(0L, 1L, 2L, 3L, 100L))
    val dupSeed = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
    val dupOut = byCid(100L).sortBy(_._2).map(_._3).toSeq
    assert(dupOut == dupSeed.toSeq,
      "member-less duplicate centroid must keep its seed verbatim")
    // centroid 1's output = quantized mean of its assigned members
    val assigned = Similarity.ivfAssign(emb, seeds, roundDp = 4)
      .select(col("vec_id"), col("centroid_id")).as[(Long, Long)]
      .collect().filter(_._2 == 1L).map(_._1).toSet
    assert(assigned.nonEmpty)
    val members = emb.filter(col("vec_id").isInCollection(assigned))
      .select(col("embedding").cast("array<double>")).as[Seq[Double]]
      .collect()
    def quant(x: Double): Long =
      math.floor(math.min(math.max(x, -1e9), 1e9) * 1e6 + 0.5).toLong
    val want = (0 until members.head.length).map { p =>
      members.map(r => BigInt(quant(r(p)))).sum.toDouble /
        (members.length.toDouble * 1e6)
    }
    assert(byCid(1L).sortBy(_._2).map(_._3).toSeq == want)
  }

  test("ivfPqSearchBatchRerank: each query's slice equals the " +
      "single-query ivfPqSearchRerank") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val corpus = emb.filter(col("vec_id") >= 3)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val cb = Similarity.pqCodebook(emb, dims = 64, m = 8, codes = 16).cache()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.ivfPqSearchBatchRerank(corpus, centroids, cb,
        queries, dims = 64, m = 8, nprobe = 3, shortlist = 25, k = 10)
      .as[(Long, Int, Long, Double, Double)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq }
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (qid <- 0L to 2L) {
      val single = Similarity.ivfPqSearchRerank(corpus, centroids, cb,
          emb.filter(col("vec_id") === qid)
            .select(col("embedding").as("qv")),
          dims = 64, m = 8, nprobe = 3, shortlist = 25, k = 10)
        .as[(Long, Double, Double)].collect().toSeq
      assert(batch(qid) == single,
        s"batch rerank slice for query $qid diverged:\n${batch(qid)}" +
          s"\nvs\n$single")
    }
  }

  test("assembleCentroids round-trips kmeansStep into ivfAssign's input " +
      "shape; trained dedup still partitions the whole corpus") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val stepped = Similarity.kmeansStep(emb, seeds).cache()
    val dims = stepped.groupBy(col("centroid_id")).count()
      .select(max(col("count"))).as[Long].head()
    val trained = Similarity.assembleCentroids(stepped)
    val arr = trained.select(col("centroid_id"), size(col("cv")).as("d"))
      .as[(Long, Int)].collect()
    assert(arr.length == 8 && arr.forall(_._2 == dims.toInt),
      "every trained centroid must re-assemble to the full dimension")
    // the assembled relation drops straight into semanticDedup and the
    // flags still cover every corpus row exactly once
    val flags = Similarity.semanticDedup(emb, trained, threshold = 0.4)
    assert(flags.count() == emb.count())
    assert(flags.select(col("vec_id")).distinct().count() == emb.count())
    // cached `stepped` IS q109's subtree — leave it cached and the
    // PlanShapeSpec exchange-count gate sees an InMemoryRelation plan
    stepped.unpersist()
  }

  test("semanticDedup: dup iff an above-threshold smaller-id neighbor " +
      "shares the cell (brute-force replay); partitioning-independent") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val k = Similarity.autoCells(emb.count())
    val centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val got = Similarity.semanticDedup(emb, centroids, threshold = 0.4)
      .select(col("vec_id"), col("is_dup")).as[(Long, Boolean)]
      .collect().toMap
    assert(got.size == emb.count())
    assert(got.values.exists(identity), "fixture must contain semantic dups")
    // brute-force replay: exact all-pairs above threshold, restricted to
    // same-cell pairs, keep-smallest-id
    val cell = Similarity.ivfAssign(emb, centroids, roundDp = 4)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    val expectDup = Similarity.exactCosinePairs(emb, 0.4)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect()
      .filter { case (a, b) => cell(a) == cell(b) }
      .map(_._2).toSet
    assert(got.filter(_._2).keySet == expectDup,
      "semanticDedup marks must equal the brute-force same-cell replay")
    // semantic dups are a SUBSET of global near-dups (cell pruning only
    // ever removes pairs)
    val globalDup = Similarity.embeddingDups(emb, 0.4).filter(col("is_dup"))
      .select(col("vec_id")).as[Long].collect().toSet
    assert(expectDup.subsetOf(globalDup))
    val reshuffled = Similarity
      .semanticDedup(emb.repartition(7, col("label")), centroids, 0.4)
      .select(col("vec_id"), col("is_dup")).as[(Long, Boolean)]
      .collect().toMap
    assert(got == reshuffled, "marks must not depend on partitioning")
  }

  test("annPairsMultiProbe: recall superset of same-params annPairs, " +
      "subset of exact pairs, identical scores, no duplicate pairs") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val single = Similarity.annPairs(emb, 0.4, bands = 2)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .as[(Long, Long, Double)].collect()
    val multi = Similarity.annPairsMultiProbe(emb, 0.4, bands = 2)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(multi.nonEmpty)
    assert(multi.length == multi.map(p => (p._1, p._2)).distinct.length,
      "no duplicate pairs")
    assert(single.map(p => (p._1, p._2)).toSet
        .subsetOf(multi.map(p => (p._1, p._2)).toSet),
      "hamming-1 probing can only ADD candidate pairs")
    val exact = Similarity.exactCosinePairs(emb, 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    multi.foreach { case (a, b, c) =>
      assert(exact.get((a, b)).contains(c),
        s"pair ($a,$b) must appear in the exact join with the same score")
    }
  }

  test("hardNegatives: equals the window form, never returns the query's " +
      "own label or itself, partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf()).cache()
    val queries = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val got = Similarity.hardNegatives(emb, queries, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("label"),
        col("cos"))
      .as[(Long, Int, Long, Int, Option[Double])].collect().sorted.toSeq
    // window-form oracle: rank by (cos desc nulls last, vec_id)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
    val want = emb.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("qlabel") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("label"),
        col("cos"))
      .as[(Long, Int, Long, Int, Option[Double])].collect().sorted.toSeq
    assert(got.nonEmpty, "hard negatives must exist at every SF")
    assert(got == want, "bounded-heap form must equal the window form")
    // no self pairs, no same-label pairs
    val qlab = queries.select(col("query_id"), col("qlabel"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (qid, _, vid, lab, _) =>
      assert(vid != qid, s"self pair for query $qid")
      assert(lab != qlab(qid), s"same-label negative for query $qid")
    }
    val reshuffled = Similarity
      .hardNegatives(emb.repartition(7, col("label")), queries, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("label"),
        col("cos"))
      .as[(Long, Int, Long, Int, Option[Double])].collect().sorted.toSeq
    assert(got == reshuffled, "results must not depend on partitioning")
  }

  test("centroidOutliers: ~p fraction flagged per label, NULL for " +
      "degenerate vectors, partitioning-invariant") {
    val emb = Tables.embeddings(spark, sf()).cache()
    val got = Similarity.centroidOutliers(emb, "label", p = 0.05)
      .select(col("vec_id"), col("label"), col("cos"), col("is_outlier"))
      .as[(Long, Int, Option[Double], Option[Boolean])].collect()
    assert(got.length == emb.count())
    // flagged fraction per label stays at ~p: below-cut means strictly
    // below the p-quantile, so at most ~p of measurable rows per label
    got.groupBy(_._2).foreach { case (lab, rows) =>
      val measurable = rows.count(_._3.isDefined)
      val flagged = rows.count(_._4.contains(true))
      assert(flagged <= math.max(1, math.ceil(measurable * 0.05).toInt),
        s"label $lab flags $flagged of $measurable (> p05 fraction)")
    }
    // a NULL cosine (degenerate vector) must yield NULL is_outlier
    got.filter(_._3.isEmpty).foreach { case (vid, _, _, o) =>
      assert(o.isEmpty, s"vec $vid: NULL cos must give NULL is_outlier")
    }
    // every flagged outlier's cosine is strictly below every unflagged
    // measurable cosine of the same label
    got.groupBy(_._2).foreach { case (lab, rows) =>
      val fl = rows.filter(_._4.contains(true)).flatMap(_._3)
      val un = rows.filter(_._4.contains(false)).flatMap(_._3)
      if (fl.nonEmpty && un.nonEmpty)
        assert(fl.max < un.min + 1e-12,
          s"label $lab: an outlier scores above a kept vector")
    }
    val reshuffled = Similarity
      .centroidOutliers(emb.repartition(7, col("vec_id")), "label", 0.05)
      .select(col("vec_id"), col("label"), col("cos"), col("is_outlier"))
      .as[(Long, Int, Option[Double], Option[Boolean])].collect()
    assert(got.sortBy(_._1).toSeq == reshuffled.sortBy(_._1).toSeq,
      "flags must not depend on partitioning")
  }

  test("benchmarkContamination: threshold hit flagged with best-match " +
      "attribution; orthogonal and zero-norm vectors stay clean") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // exact match of bench 10 and 12
      (2L, Array(0.0f, 1.0f)),   // orthogonal to every benchmark
      (3L, Array(0.0f, 0.0f)),   // zero-norm => NULL cosine => clean
      (4L, Array(0.9f, 0.1f))    // near bench 10/12, one hit over 0.8
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (10L, Array(1.0f, 0.0f)),
      (12L, Array(1.0f, 0.0f)),  // duplicate benchmark: tie on cosine
      (14L, Array(0.0f, -1.0f))
    ).toDF("bench_id", "bv")
    val got = Similarity.benchmarkContamination(corpus, bench,
        threshold = 0.8)
      .select("vec_id", "n_hits", "best_bench_id", "best_cos")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // vec 1 ties bench 10/12 at cos 1.0 => lowest bench_id wins
    assert(got(1L) == ((1L, 2L, 10L, 1.0)))
    assert(got(4L)._2 == 2L && got(4L)._3 == 10L && got(4L)._4 >= 0.8)
    assert(!got.contains(2L) && !got.contains(3L))
  }

  test("autoCells: power-of-two in [8, 4096], mean cell stays <= target") {
    assert(Similarity.autoCells(0) == 8)
    assert(Similarity.autoCells(2048) == 8)
    assert(Similarity.autoCells(2049) == 16)
    assert(Similarity.autoCells(32000) == 128)
    assert(Similarity.autoCells(Long.MaxValue) == 4096)
    val ks = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(n => Similarity.autoCells(n))
    assert(ks.forall(c => c >= 8 && c <= 4096 && (c & (c - 1)) == 0))
    assert(ks == ks.sorted)
  }
}
