package graft

import org.apache.spark.sql.functions.col

/** Quantifies the LSH-bucketed ANN against the brute-force baseline. On
  * this corpus the best pair cosine is only ~0.44 — no vector has a truly
  * near neighbor, so sign-plane bucket agreement is near-random and top-1
  * recall is legitimately low (logged, not asserted). What must hold
  * structurally: the bucketed answer can never beat the brute-force
  * optimum, and whenever the true NN shares the query's bucket the bucketed
  * search returns exactly it.
  */
class AnnRecallSpec extends SparkSpec {

  test("LSH ANN is bucket-optimal and never beats brute force") {
    val brute = SparkEntry.queries("q54_embed_knn")(spark, sfDir)
      .filter(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lsh = SparkEntry.queries("q55_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(brute.nonEmpty && lsh.nonEmpty)

    // bucket assignment recomputed independently of q55
    val emb = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id",
        """cast(if(element_at(embedding, 1) > 0, 1, 0) + if(element_at(embedding, 2) > 0, 2, 0)
           + if(element_at(embedding, 3) > 0, 4, 0) + if(element_at(embedding, 4) > 0, 8, 0) AS int) AS bucket""")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    lsh.foreach { case (q, bucket, nb, sim) =>
      assert(emb(q) == bucket && emb(nb) == bucket, "candidates must share the bucket")
      val (bruteNb, bruteSim) = brute(q)
      assert(sim <= bruteSim + 1e-9, s"bucketed sim $sim beats optimum $bruteSim")
      if (emb(bruteNb) == bucket)
        assert(nb == bruteNb, s"true NN $bruteNb in-bucket but LSH chose $nb")
    }
    val recall = lsh.count { case (q, _, nb, _) => brute(q)._1 == nb }.toDouble / lsh.length
    info(s"top-1 recall = $recall over ${lsh.length} queries (low-similarity corpus)")
  }
}
