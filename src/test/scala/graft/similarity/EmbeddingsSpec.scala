package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Embeddings

/** Semantic invariants for the cluster-balanced sampling and SemDeDup
  * operators (q114/q115) that the oracle hash-compare can't express.
  */
class EmbeddingsSpec extends SparkSpec {

  private def q(name: String) =
    Embeddings.qs.find(_.name == name).get.run(spark, sfDir)

  /** Recompute the nearest-seed assignment the q114/q115 plans use. */
  private def assignment() = {
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val seeds = v.filter(col("vec_id") < 8).toDF("seed_id", "se")
    v.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("e"),
        struct(Vectors.sqDist(col("e"), col("se")).as("dist"),
          col("seed_id")).as("cand"))
      .groupBy(col("vec_id"), col("e"))
      .agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("e"), col("m.seed_id").as("cluster"))
  }

  test("cluster sample: <=10 per cluster, dense ranks, honest clusters") {
    val sample = q("q114_cluster_balanced_sample")
    val per = sample.groupBy("cluster")
      .agg(count(lit(1)).as("n"), max("rn").as("max_rn"))
    assert(per.filter(col("n") > 10).count() == 0)
    // rn is dense 1..n within each cluster
    assert(per.filter(col("max_rn") =!= col("n")).count() == 0)
    // every sampled row carries the vector's true nearest-seed cluster
    val asg = assignment().select(col("vec_id"), col("cluster").as("true_c"))
    assert(sample.join(asg, "vec_id")
      .filter(col("cluster") =!= col("true_c")).count() == 0)
  }

  test("nearest-seed expression == interpreted HOF argmin on every vector") {
    // the codegen'd kernel must agree with the lambda composition
    // bit-for-bit (same fold order, same strict-< tie-break) — this is
    // the referee that licenses swapping it into q114/q115/q120
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val seeds = v.filter(col("vec_id") < 8)
      .agg(sort_array(collect_list(struct(col("vec_id").as("sid"),
        col("e").as("se")))).as("seeds"))
    val both = v.crossJoin(broadcast(seeds))
      .select(col("vec_id"),
        graft.functions.NearestSeed(spark, col("e"), col("seeds")).as("fast"),
        graft.queries.Embeddings.nearestSeedHof(col("e"), col("seeds"))
          .as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    assert(both.filter(col("fast") < 0).count() == 0)
  }

  test("pq adc retrieval: shape invariants and real recall lift") {
    val pq = q("q121_pq_adc_topk").collect()
    assert(pq.length == 100) // 20 queries x top-5
    assert(!pq.exists(r => r.getLong(0) == r.getLong(1))) // no self-pairs
    // recall@5 against the exact L2 top-5: the crude 8-code-per-subspace
    // codebook measured 12/100 on this corpus — far above the ~1/100 a
    // random 5-of-499 pick would score. Assert a floored lift so a
    // broken encoding (recall ~ random) fails loudly.
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val qs = v.filter(col("vec_id") < 20).toDF("q_id", "qe")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d"), col("n_id"))
    val exact = qs.join(v.toDF("n_id", "ne"), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Vectors.sqDist(col("qe"), col("ne")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits >= 8, s"PQ recall collapsed: $hits/100 exact-top-5 hits")
  }

  test("kmeans codebook: complete partition, stable under re-run") {
    val cb = q("q120_kmeans_codebook")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // every dim row of every cluster carries that cluster's member
    // count; per-dim totals must equal the corpus size exactly
    val perDim = cb.groupBy("dim").agg(sum("n").as("tot"))
    assert(perDim.filter(col("tot") =!= n).count() == 0)
    assert(cb.filter(col("n") <= 0).count() == 0)
    // 64 dims per surviving cluster
    val dims = cb.groupBy("cluster").agg(count(lit(1)).as("d"))
    assert(dims.filter(col("d") =!= 64).count() == 0)
    // deterministic: a second run produces the identical codebook
    val again = q("q120_kmeans_codebook")
    assert(cb.collect().toSeq == again.collect().toSeq)
  }

  test("semdedup: per-cluster minimum always survives, survivors are " +
    "pairwise below the threshold") {
    val survivors = q("q115_semdedup")
    val asg = assignment()
    // the smallest vec_id of every cluster has no smaller-id mate, so it
    // must survive
    val minPerCluster = asg.groupBy("cluster").agg(min("vec_id").as("vec_id"))
    assert(minPerCluster.join(survivors, Seq("cluster", "vec_id"), "left_anti")
      .count() == 0)
    // no surviving same-cluster pair with cosine above the threshold: if
    // a < b survive with cos > tau, b should have been dropped (the rule
    // tests against ALL smaller-id mates, surviving or not)
    val sv = survivors.join(asg, Seq("vec_id", "cluster"))
      .withColumn("nrm", Vectors.norm(col("e")))
    val b = sv.toDF("b_id", "b_cluster", "be", "bn")
    val bad = sv.join(b,
      col("cluster") === col("b_cluster") && col("vec_id") < col("b_id") &&
        Vectors.cosinePre(Vectors.dot(col("e"), col("be")),
          col("nrm"), col("bn")) > 0.3)
    assert(bad.count() == 0)
  }

  test("codegen'd dot kernel == HOF sequential fold on every corpus " +
      "pair (the referee that licenses DotExpr in the q281 hot path)") {
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val b = v.toDF("b_id", "be")
    val both = v.join(b, col("vec_id") <= col("b_id"))
      .select(
        graft.functions.Dot(spark, col("e"), col("be")).as("fast"),
        Vectors.dot(col("e"), col("be")).as("ref"))
    // bit-for-bit: same IEEE fold order — compare with =!= (exact),
    // not a tolerance
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    assert(both.filter(col("fast").isNull).count() == 0)
  }

  test("q281 graph ANN: recall@5 vs the q36 brute force — the beam " +
      "search over the LSH-multiprobe k-NN graph must recover most " +
      "true neighbors, and every reported pair must be real " +
      "(cosine re-verified, no self matches, dense ranks)") {
    import spark.implicits._
    val graph = q("q281_ann_graph")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val brute = q("q36_cosine_topk")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // shape discipline
    assert(graph.nonEmpty)
    assert(!graph.exists { case (qid, nid, _, _) => qid == nid })
    graph.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.length), s"q$qid ranks")
    }
    // every reported cosine agrees with the brute-force value for the
    // same pair when brute force ranked it (same fold, same engines)
    val bruteMap = brute.map { case (a, b, _, c) => (a, b) -> c }.toMap
    graph.foreach { case (qid, nid, _, c) =>
      bruteMap.get((qid, nid)).foreach { bc =>
        assert(bc == c, s"cosine mismatch ($qid,$nid)")
      }
    }
    // recall@5: fraction of brute-force top-5 pairs the graph search
    // recovered, averaged over queries. Measured 0.99 here (sf0.001)
    // with the Hamming<=2 seed + 2 NN-descent rounds + 24-beam 3-hop
    // search; 0.83 at sf0.1 (BASELINE.md r15).
    val bruteTop = brute.groupBy(_._1)
      .map { case (qid, rs) => qid -> rs.map(_._2).toSet }
    val gotTop = graph.groupBy(_._1)
      .map { case (qid, rs) => qid -> rs.map(_._2).toSet }
    val recalls = bruteTop.toSeq.map { case (qid, want) =>
      val got = gotTop.getOrElse(qid, Set.empty)
      want.intersect(got).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, f"mean recall@5 $mean%.3f too low: $recalls")
  }
}
