package graft

import org.apache.spark.sql.SaveMode

import graft.operators.Similarity

/** ANN semantics: brute force is exact; the bucketed variant has high recall
  * on clustered vectors (its design regime).
  */
class SimilaritySpec extends SparkSpec {

  /** Two tight clusters around orthogonal axes + the query vectors 0..4 in
    * cluster A: within-cluster neighbors dominate every top-k list.
    */
  private def writeClustered(): String = {
    import spark.implicits._
    val dir = tempSfDir()
    val dim = 64
    def axis(i: Int, eps: Float, at: Int): Array[Float] = {
      val v = Array.fill(dim)(eps)
      v(at) = 1.0f
      v(i % 7) = v(i % 7) + 0.01f * (i % 5) // small deterministic jitter
      v
    }
    val clusterA = (0L until 30L).map(i => (i, axis(i.toInt, 0.02f, 0), 0))
    val clusterB = (30L until 60L).map(i => (i, axis(i.toInt, 0.02f, 40), 1))
    (clusterA ++ clusterB).toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("s1 brute-force top-k ranks within-cluster neighbors first") {
    val dir = writeClustered()
    val got = Similarity.annTopK(spark, dir).collect()
    assert(got.length == 5 * 10)
    // every neighbor of the cluster-A queries is itself in cluster A
    assert(got.forall(r => r.getLong(1) < 30L))
    // ranks are 1..10 per query
    val byQ = got.groupBy(_.getLong(0))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 10L)))
  }

  test("s2 bucketed ANN reaches full recall on clustered vectors") {
    val dir = writeClustered()
    val exact = Similarity.annTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annIvf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall was $recall")
  }
}
