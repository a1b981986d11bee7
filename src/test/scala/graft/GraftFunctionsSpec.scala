package graft

import org.apache.spark.sql.graftbridge.GraftFunctions

/** SQL surface of the native expressions via function registration. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered graft functions are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_poly_hash('abc') AS p,
        |       graft_min_window_hash('abcdefghij', 4) AS mw,
        |       graft_simhash64(array('a', 'b')) AS sh,
        |       graft_dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       graft_equal_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS eq,
        |       graft_hash_embedding(array('a', 'b'), 8) AS he,
        |       graft_shingle_hash64('a b c', 2) AS sg,
        |       xxhash64('a b') AS x1, xxhash64('b c') AS x2
        |""".stripMargin).collect().head
    // poly hash of "abc" = (('a'*31)+'b')*31+'c'
    val expected = ((97L * 31 + 98) * 31) + 99
    assert(r.getAs[Long]("p") == expected)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Long]("eq") == 2L)
    val he = r.getSeq[Double](r.fieldIndex("he"))
    assert(he.length == 8)
    assert(math.abs(math.sqrt(he.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(r.getSeq[Long](r.fieldIndex("sg")) ==
      Seq(r.getAs[Long]("x1"), r.getAs[Long]("x2")),
      "shingle hashes must equal xxhash64 of the joined shingles")
  }

  test("set-membership and sorted-intersect kernels are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_sorted_intersect(array('a','b','c'), array('b','c','d')) AS si,
        |       graft_count_in_set(array('the','x','the'), array('the','a')) AS cs
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("si") == 2L)
    assert(r.getAs[Long]("cs") == 2L, "multiplicity counts")
  }

  test("the top-k aggregator is callable from SQL group-bys") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("b", 1.0, 4L))
      .toDF("g", "v", "id").createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT g, graft_top5(v, id) AS top FROM topk_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1)))))
    assert(got.toSeq == Seq(
      ("a", Seq((9.0, 2L), (9.0, 3L), (5.0, 1L))), // value desc, tie by id
      ("b", Seq((1.0, 4L)))))
  }

  test("literal-int parameters are validated") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_min_window_hash('abc', 'oops')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal int"))
  }

  test("CentroidCosines kernel equals the declarative round(cos) spelling") {
    // The round-17 shuffle-free assignment kernel must produce, slot for
    // slot, the exact double the crossJoin form's
    // round(dot / (nrm * c_nrm), scale) evaluated — on real corpus
    // vectors, at both rounding scales in use (6 and 9), float and
    // double centroid components.
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    for ((toDouble, scale) <- Seq((false, 6), (true, 9))) {
      val cEmb = if (toDouble)
        transform(col("embedding"), _.cast("double")) else col("embedding")
      val cents = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), cEmb.as("c_emb"),
          col("nrm").as("c_nrm"))
      val withTab = base.crossJoin(broadcast(centroidTableFrame(cents)))
      val kernel = withTab
        .select(col("vec_id"), centCosines(col("embedding"), col("nrm"), scale).as("coss"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val declarative = withTab
        .select(col("vec_id"), array((0 until 8).map { i =>
          val slot = element_at(col("cent_tab"), i + 1)
          round(cosineWithNorms(dotD(col("embedding"), slot.getField("c_emb")),
            col("nrm"), slot.getField("c_nrm")), scale)
        }: _*).as("coss"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(kernel == declarative,
        s"kernel vs declarative diverge at scale=$scale double=$toDouble")
    }
  }

  test("PqL2Distances kernel equals the unrolled round(l2sq) spelling") {
    // The s5 encode kernel must produce, slot for slot, the exact double
    // the former declarative form evaluated:
    // round((d1*d1 + d2*d2) + ... left fold, 6) per codeword — on real
    // corpus subvectors against a real codeword table.
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    val dir = "/root/testdata/sf0.001"
    val subDim = 4
    val kCodes = 8
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("ne"))
      .select(col("vec_id"), slice(col("ne"), 1, subDim).as("sv"))
    val cws = base.filter(col("vec_id") < kCodes)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("sv"))))
        .as("tab"))
      .select(transform(col("tab"), _.getField("sv")).as("cvs"))
    val withTab = base.crossJoin(broadcast(cws))
    def l2sqDecl(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until subDim).map { i =>
        val d = element_at(a, i + 1) - element_at(b, i + 1)
        d * d
      }.reduceLeft(_ + _)
    val kernel = withTab
      .select(col("vec_id"), pqL2Distances(col("sv"), col("cvs"), 6).as("d2s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val declarative = withTab
      .select(col("vec_id"), array((0 until kCodes).map(j =>
        round(l2sqDecl(col("sv"), element_at(col("cvs"), j + 1)), 6)): _*)
        .as("d2s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kernel == declarative)
  }
}
