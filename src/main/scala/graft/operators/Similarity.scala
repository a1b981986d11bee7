package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Doubles
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * s1 is the exact baseline: broadcast the handful of query vectors and make
  * one pass over the fleet — a map-side cross join, cost O(n·q), no shuffle
  * of the big side except the final per-query top-k (TakeOrdered-style,
  * partial top-k per partition first).
  *
  * s2 is the scale path: a sign-random-projection (SRP) code partitions the
  * space into 256 buckets; queries probe their own bucket plus all buckets
  * at hamming distance 1 (multi-probe LSH), then rank exactly within the
  * candidates. Candidate volume ≈ 9/256 of the fleet per query.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 5

  private def queryVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** s1: brute-force cosine top-k per query vector — the recall=1 baseline.
    * Ordering happens on the *rounded* cosine (plus id tie-break) so ranks
    * are reproducible against the oracle bit-for-bit.
    */
  /** The brute-force ranking substrate shared by s1, s4 and i4: every
    * candidate scored against the broadcast labeled query set under
    * `cond`, round-6 cosines, rank by (cosim desc, n_id). ONE
    * definition so the rounding/tie-break discipline the three oracles
    * replay can never diverge between the operators.
    */
  private def rankedAgainstQueries(spark: SparkSession, dir: String,
                                   cond: org.apache.spark.sql.Column): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
      .withColumn("q_nrm", normD(col("q_emb")))
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("label").as("n_label"), normD(col("embedding")).as("n_nrm"))
      .join(broadcast(q), cond)
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id")))
          .cast("long"))
  }

  /** The neq-id brute-force ranked substrate, projected to the narrow
    * audit columns and memo-shared on (dir, substrate) — s1, s4, i4 and
    * i5 all start from this frame (the d4/cls6 family convention), so a
    * harness pass pays the O(|corpus|·|queries|) scoring exactly once:
    * the alphabetically-first consumer (i4) owns the build, the others
    * time their marginals (a top-k cut, a filtered re-rank, the eval
    * joins). Narrow projection keeps the cached frame ∝ pairs × 6
    * columns — the embeddings themselves never persist.
    */
  private def rankedNeqId(spark: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memoShared(
      s"s1ranked:${spark.sparkContext.applicationId}:$dir:" +
        s"${graft.Tables.substrate(spark)}")(
      rankedAgainstQueries(spark, dir, col("n_id") =!= col("q_id"))
        .select("q_id", "q_label", "n_id", "n_label", "cosim", "rnk"))

  def annTopK(spark: SparkSession, dir: String): DataFrame =
    rankedNeqId(spark, dir)
      .filter(col("rnk") <= K)
      .select("q_id", "n_id", "cosim", "rnk")
      .orderBy("q_id", "rnk")

  /** Fixed SRP hyperplanes: `nBits` x `dim` pseudo-random components from a
    * seeded LCG (deterministic across runs; no runtime randomness).
    * private[graft] so SparkEntry can interpolate the SAME constants into
    * the s2 DuckDB oracle as double literals (Double.toString round-trips,
    * so both engines see bit-identical plane components).
    */
  private[graft] def srpPlanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    Array.fill(nBits, dim)(next())
  }

  /** SRP bucket code of an embedding column: bit i = sign(dot(v, plane_i)). */
  private[operators] def srpCode(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = dotD(emb, lit(p))
      when(dot >= 0, shiftleft(lit(1), i)).otherwise(0)
    }.reduce(_ bitwiseOR _)

  /** s2: IVF/LSH-bucketed ANN. Multi-probe: each query expands to its SRP
    * bucket plus every bucket within hamming distance `maxProbeHamming`; the
    * bucket id is the join key, so the fleet is scanned once and shuffled
    * only by bucket. Recall/cost dial: probed-buckets / 2^nBits of the fleet
    * is scored per query (22/64 ≈ 34% at the defaults — tuned for the
    * near-uniform synthetic vectors; clustered real embeddings concentrate
    * neighbors in far fewer buckets).
    */
  def annIvf(spark: SparkSession, dir: String,
             nBits: Int = 6, maxProbeHamming: Int = 2): DataFrame = {
    val planes = srpPlanes(nBits, 64)
    val cand = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        normD(col("embedding")).as("n_nrm"),
        srpCode(col("embedding"), planes).as("bucket"))

    val masks: Seq[Int] =
      (0 until (1 << nBits)).filter(m => Integer.bitCount(m) <= maxProbeHamming)
    val probes = queryVectors(spark, dir)
      .withColumn("code", srpCode(col("q_emb"), planes))
      .withColumn("mask", explode(lit(masks.toArray)))
      .withColumn("bucket", col("code").bitwiseXOR(col("mask")))
      .withColumn("q_nrm", normD(col("q_emb")))
      .select("q_id", "q_emb", "q_nrm", "bucket")

    cand.join(broadcast(probes), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id")))
          .cast("long"))
      .filter(col("rnk") <= K)
      .select("q_id", "n_id", "cosim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** s3: IVF with a DATA-ADAPTIVE coarse quantizer (the FAISS-IVF shape) —
    * cells are nearest-centroid regions instead of s2's fixed random
    * hyperplanes, so cell populations track the data distribution and each
    * probe visits a region that actually contains neighbors. Every corpus
    * vector is assigned to its argmax-cosine cell (one broadcast pass);
    * each query probes its `nProbe` closest cells; candidates re-rank with
    * the exact cosine. The cell id is the only join key, so the fleet
    * shuffles once by cell — candidate volume ≈ nProbe/kCells of the
    * corpus per query, and at 100 TB the seed centroids would first be
    * Lloyd-refined (k3) and kCells raised to keep cells partition-sized.
    * Unlike s2 (whose hyperplane constants are impractical to mirror in
    * SQL), the quantizer here is data-derived, so the full algorithm has
    * an exact DuckDB oracle.
    */
  def annIvfKmeans(spark: SparkSession, dir: String,
                   kCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfRanked(spark, dir, kCells, nProbe)
      .filter(col("rnk") <= K)
      .select("q_id", "n_id", "cosim", "rnk")
      .orderBy("q_id", "rnk")

  /** The IVF ranked-candidate substrate (narrow projection), memo-
    * shared on (dir, kCells, nProbe, substrate) — s3 and i5 both start
    * here, so one harness pass pays the cell-assignment/probe/re-rank
    * chain once: i5 (alphabetically first) owns the build, s3 times
    * its top-k cut.
    */
  private def ivfRanked(spark: SparkSession, dir: String,
                        kCells: Int, nProbe: Int): DataFrame =
    graft.CacheRegistry.memoShared(
      s"s3ranked:${spark.sparkContext.applicationId}:$dir:$kCells:" +
        s"$nProbe:${graft.Tables.substrate(spark)}")(
      ivfKmeansRanked(spark, dir, kCells, nProbe)
        .select("q_id", "q_label", "n_id", "n_label", "cosim", "rnk"))

  /** s3's ranked candidate frame BEFORE the top-k cut and projection,
    * labels carried through (one extra `first` in the assignment
    * aggregate — free) — the form i5 evaluates against the exact
    * ranking. Shared so the cell assignment / probe / re-rank
    * discipline can never diverge between the index and its eval.
    */
  private def ivfKmeansRanked(spark: SparkSession, dir: String,
                              kCells: Int, nProbe: Int): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"),
        normD(col("embedding")).as("nrm"))
    val cents = base.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    // per-row argmax over the one-row centroid table (the round-17
    // shuffle-free assignment — the groupBy(vec_id) form shuffled the
    // whole corpus, full vectors riding along, to pick each row's cell)
    val cand = base
      .crossJoin(broadcast(centroidTableFrame(cents
        .select(col("cell").as("centroid_id"), col("c_emb"), col("c_nrm")))))
      .withColumn("coss", centCosines(col("embedding"), col("nrm"), 6))
      .select(col("vec_id").as("n_id"),
        argmaxCentroidId(col("coss")).as("cell"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
        col("label").as("n_label"))
    val probes = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
      .withColumn("q_nrm", normD(col("q_emb")))
      .crossJoin(broadcast(cents))
      .withColumn("pcos",
        round(cosineWithNorms(dotD(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")), 6))
      .withColumn("prnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("pcos").desc, col("cell"))))
      .filter(col("prnk") <= nProbe)
      .select("q_id", "q_emb", "q_nrm", "q_label", "cell")
    cand.join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id")))
          .cast("long"))
  }

  /** s5: IVF-PQ (the FAISS IVFADC shape) — the ANN variant that actually
    * fits a 100 TB corpus in executor memory. s3 answers probes by
    * re-ranking every candidate against its FULL vector (256 bytes at
    * dim=64 float32); s5 stores each corpus vector as `numSub` one-byte
    * codes — per `subDim`-dim subspace, the nearest of `kCodes`
    * data-derived sub-centroids — and scans candidates with an
    * asymmetric-distance lookup table (ADC): approx distance = sum over
    * subspaces of the PRECOMPUTED query-to-centroid distance for the
    * candidate's stored code. Full vectors are fetched only for the
    * top-`shortlistN` ADC survivors, so the scan path touches `numSub`
    * bytes/vector instead of 256 — 8x compression at the default
    * numSub=32 (measured recall@10 = 0.98 at the default shortlist on
    * sf0.1; the numSub dial trades compression against recall: numSub=8
    * is 32x but recalls only ~0.6 on this corpus, see BASELINE.md §ANN
    * RECALL). That compression decides whether a fleet-scale index fits
    * in RAM at all.
    *
    * Vectors are L2-NORMALIZED before subspace slicing, so the ADC metric
    * (squared L2 on the unit sphere, = 2 - 2*cos) ranks in exactly the
    * cosine order the final re-rank uses — without this, large-norm
    * high-cosine neighbors would be systematically shortlisted out.
    *
    * Plan shape: two corpus passes keyed by vec_id (coarse assignment +
    * PQ encode — in production the encode fuses into the scan with the
    * numSub*kCodes-row codebook broadcast as literals), a candidate join
    * keyed by cell, and an ADC aggregate keyed by (q, n) whose input is
    * `numSub` rows per candidate; the exact re-rank only ever sees
    * `shortlistN` rows per query, joined with the shortlist broadcast.
    * The codebook is TRAINED, not sampled: per-subspace Lloyd k-means
    * (`trainIters` rounds), seeded from the first `kCodes` vectors'
    * normalized subvectors. The rounds run DRIVER-LOCALLY over the one
    * collected training slice (LloydLocal): argmin by rounded squared-L2
    * with code tie-break, then quantized-long per-component means (the
    * k3 trick — components fold to ⌊x·10⁶+0.5⌋ longs so the sum is
    * exact and accumulation-order independent); the numSub·kCodes
    * codebook lives DRIVER-SIDE between rounds (the k-row-centroid
    * pattern). A code that loses all members drops out (standard Lloyd
    * caveat, same as k3). Training reads only
    * the first `trainSample` vectors (FAISS practice: fit the codebook
    * on a bounded slice, touch the fleet only in the encode pass), so
    * training cost is `trainIters` passes over
    * min(n, trainSample)·numSub subvector rows — CONSTANT in the corpus
    * size — and stays deterministic/oracle-replayable because the
    * sample is an id prefix, not a random draw.
    *
    * Every stage is deterministic (coarse seeds = the first `kCells`
    * vectors, codebook seeds = the first `kCodes` vectors' subvectors,
    * Lloyd means on the 1e-6 quantization grid, every distance rounded
    * to 6 decimals before argmin/rank, id tie-breaks throughout), so the
    * full algorithm — train, encode, ADC, shortlist, re-rank — is
    * replayed bit-for-bit by the s5 DuckDB oracle in SparkEntry (the
    * training rounds unrolled as CTEs, the k3 pattern). The per-subspace
    * rounding also makes the ADC sum order-insensitive: a sum of
    * multiples of 1e-6 re-rounded to 6 decimals cannot be perturbed by
    * double-accumulation order, so plain `sum` is safe on both engines.
    *
    * NOTE: training is EAGER — ONE bounded collect of the training slice
    * (min(n, max(trainSample, kCodes))·numSub subvector rows, constant in
    * the corpus size) runs as a Spark job at construction time and the
    * Lloyd rounds themselves execute driver-locally over it (LloydLocal —
    * the codebook is a driver-held model artifact, and so is the sample
    * it is fit on), so this method does real work before the returned
    * frame's first action; the returned scan plan itself is lazy as usual.
    */
  def annIvfPq(spark: SparkSession, dir: String,
               kCells: Int = 16, nProbe: Int = 4,
               numSub: Int = 32, subDim: Int = 2,
               kCodes: Int = 32, shortlistN: Int = 40,
               dim: Int = 64, trainIters: Int = 3,
               trainSample: Int = 4096): DataFrame = {
    require(numSub * subDim == dim,
      s"numSub ($numSub) * subDim ($subDim) must cover the embedding dim ($dim)")
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val cents = base.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))

    // Coarse assignment — identical rule to s3 (argmax rounded cosine,
    // smallest cell wins ties), per-row over the one-row centroid table
    // (the round-17 shuffle-free form; no vec_id exchange).
    val asg = base
      .crossJoin(broadcast(centroidTableFrame(cents
        .select(col("cell").as("centroid_id"), col("c_emb"), col("c_nrm")))))
      .withColumn("coss", centCosines(col("embedding"), col("nrm"), 6))
      .select(col("vec_id").as("n_id"),
        argmaxCentroidId(col("coss")).as("cell"))

    // Subspace decomposition of the UNIT-NORMALIZED vector: one row per
    // (vector, subspace), sv = the subDim-component slice of embedding/nrm.
    // posexplode's 0-based pos is the subspace id. Persisted: training
    // re-reads it trainIters times, then encode + LUT once more.
    val sub = graft.CacheRegistry.persistTracked(base
      .withColumn("ne", transform(col("embedding"),
        x => x.cast("double") / col("nrm")))
      .select(col("vec_id"),
        posexplode(array((0 until numSub).map(m =>
          slice(col("ne"), m * subDim + 1, subDim)): _*)).as(Seq("m", "sv"))))

    // The codebook lives DRIVER-SIDE between rounds — numSub*kCodes tiny
    // (code, components) entries, the k-row-centroid collect pattern —
    // and rides back in as a one-row broadcast frame for the ENCODE/LUT
    // passes. This is the fused-encode production shape the scan path
    // needs anyway (the codebook IS index metadata, like the coarse
    // centroids).
    // cbLocal(m) = (codeId, components) entries sorted by codeId; a code
    // that loses all members drops out (the k3 Lloyd caveat) and its
    // slot is padded so expressions stay uniform: a huge-finite distance
    // and a sentinel id no argmin can pick and the LUT filters away.
    //
    // Training itself runs ON THE DRIVER from ONE bounded collect (the
    // round-17 optimization): the training slice is min(n, max(trainSample,
    // kCodes))·numSub subvector rows — CONSTANT in the corpus size, the
    // same bounded-model-artifact class as the codebook the loop already
    // held driver-side — and feeds both the seeds and every Lloyd round.
    // The previous shape ran each round as a cluster-wide
    // projection+aggregate+collect; at sf0.1 each of those rounds measured
    // 1.93 s of almost pure fixed stage overhead (S5Tune: train3 12.19 s vs
    // train0 6.40 s on 64k subvector rows), and at fleet scale each round
    // was a full scheduling BARRIER over a sample-sized frame. LloydLocal
    // replicates the removed Spark expressions bit-for-bit (see its
    // scaladoc for the op-by-op correspondence; SimilaritySpec pins the
    // round equivalence against a Spark-side reference, and the s5 oracle
    // replays the full run).
    val trainLocal: Array[(Int, Long, Array[Double])] =
      sub.filter(col("vec_id") < math.max(trainSample, kCodes))
        .select(col("m"), col("vec_id"), col("sv")).collect()
        .map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2).toArray))
    var cbLocal: Map[Int, IndexedSeq[(Long, IndexedSeq[Double])]] =
      trainLocal.filter(_._2 < kCodes)
        .map { case (m, id, sv) => (m, id, sv.toIndexedSeq) }
        .groupBy(_._1).map { case (m, rs) =>
          m -> rs.sortBy(_._2).map(t => (t._2, t._3)).toIndexedSeq }
    // an empty / id-gapped corpus would otherwise surface later as an
    // unhelpful NoSuchElementException from cbLocal(m) inside cbFrame
    require((0 until numSub).forall(m => cbLocal.get(m).exists(_.nonEmpty)),
      s"annIvfPq needs at least one vector with vec_id < kCodes ($kCodes) " +
        "per subspace to seed the codebook; the corpus slice supplied none")

    // The codebook travels as a ONE-ROW broadcast frame (ids: m→slot→code,
    // comps: m→slot→components), cross-joined onto sub — binding it as
    // attributes, NOT literals, keeps the codegen'd projection small (a
    // typedlit form embedded the full numSub*kCodes*subDim constant table
    // once PER SLOT expression and compile time swamped the query).
    import spark.implicits._
    def cbFrame: DataFrame = {
      val ids = (0 until numSub).map { m =>
        val e = cbLocal(m)
        e.map(_._1) ++ Seq.fill(kCodes - e.size)(Long.MaxValue)
      }
      val comps = (0 until numSub).map { m =>
        val e = cbLocal(m)
        // large FINITE pad: d2 vs a 1e18 component is ~1e36, never the
        // minimum but safely inside double range (an infinite d2 would
        // ride through round() as a special case the oracle never sees)
        e.map(_._2.toSeq) ++
          Seq.fill(kCodes - e.size)(Seq.fill(subDim)(1e18))
      }
      Seq((ids, comps)).toDF("cb_ids", "cb_comps")
    }
    // Per-row argmin over the kCodes slots on a MATERIALIZED primitive
    // double array: the d2s land in one array column via the native
    // PqL2Distances kernel — slot j is exactly round(l2sq(sv, cvs[j]), 6)
    // (a least()+CASE-chain form duplicated every d2 into every branch
    // and measured catastrophically slower; an array-of-structs +
    // array_min form paid 20M per-row struct builds per round at the 10x
    // slice; the declarative kCodes-slot array(round(l2sq)) form broke
    // whole-stage codegen once constraint inference inlined the argmin
    // cell into the downstream join's predicates — the ENCODE projection,
    // the corpus-sized stage, ran INTERPRETED). Argmin =
    // array_position(d2s, array_min(d2s)): FIRST index of the minimum,
    // and slots are code-ascending by construction (cbLocal sorts by
    // codeId, padding at the end), so first-match IS the previous
    // min(struct(d2, code)) tie-break.
    def cbCols(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(cbFrame))
      .withColumn("cvs", element_at(col("cb_comps"), col("m") + 1))
      .withColumn("cids", element_at(col("cb_ids"), col("m") + 1))
      .withColumn("d2s", pqL2Distances(col("sv"), col("cvs"), 6))
    def bestCode: Column =
      element_at(col("cids"),
        array_position(col("d2s"), array_min(col("d2s"))).cast("int"))

    // One Lloyd round: argmin code, then (m, code) quantized-long component
    // sums (the k3 pattern — exact, aggregation-order free), divided on the
    // driver with the same IEEE op order the oracle's SQL runs (sum→double,
    // /count, /1e6 — bit-deterministic on exact integer inputs). Training
    // reads only the first `trainSample` vectors (deterministic, replayed
    // by a WHERE in the oracle) — the FAISS practice that keeps training
    // cost O(sample) while the corpus grows: at 100 TB the codebook is fit
    // on a bounded slice and only the ENCODE pass touches the fleet. The
    // rounds run in LloydLocal over the collected slice — zero Spark jobs.
    val trainRows =
      if (kCodes <= trainSample) trainLocal
      else trainLocal.filter(_._2 < trainSample)
    for (_ <- 0 until trainIters) {
      cbLocal = LloydLocal.lloydRound(trainRows, cbLocal, subDim)
    }

    // Fused encode: each corpus vector's per-subspace code is a projection
    // over the persisted sub rows — no shuffle (the one-row codebook
    // cross-join is map-side). The ADC LUT explodes ALL slots for the
    // query rows only (NumQueries*numSub*kCodes rows — structs are fine
    // at that row count), dropping padded slots by their sentinel id.
    //
    // The code frame is MATERIALIZED (persistTracked): it is the PQ index
    // itself — numSub small ints per vector, the artifact a fleet stores
    // next to the coarse assignment — and without the barrier, constraint
    // inference pushes the downstream equi-join's inferred predicates
    // (isnotnull(code), the lut filter's code != MaxValue) through the
    // projection, substituting the FULL argmin-over-d2s tree into filters
    // that then re-run the kernel 2-3x per corpus row inside the join
    // stage. Behind the cache boundary the kernel runs exactly once per
    // row and the pushed predicates read the materialized column.
    val codes = graft.CacheRegistry.persistTracked(
      cbCols(sub).select(col("vec_id").as("cn_id"), col("m"),
        bestCode.as("code")))

    val lut = cbCols(sub.filter(col("vec_id") < NumQueries))
      .select(col("vec_id").as("lq"), col("m").as("lm"),
        posexplode(zip_with(col("cids"), col("d2s"),
          (code, d2) => struct(d2.as("d2"), code.as("code")))))
      .select(col("lq"), col("lm"), col("col.code").as("lcode"),
        col("col.d2").as("d2"))
      .filter(col("lcode") =!= Long.MaxValue)

    val probes = queryVectors(spark, dir)
      .withColumn("q_nrm", normD(col("q_emb")))
      .crossJoin(broadcast(cents))
      .withColumn("pcos",
        round(cosineWithNorms(dotD(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")), 6))
      .withColumn("prnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("pcos").desc, col("cell"))))
      .filter(col("prnk") <= nProbe)
      .select("q_id", "cell")

    // ADC scan: candidates from the probed cells, scored purely from codes
    // + the broadcast LUT — no full vectors on this path.
    val pairs = asg.join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
    val adc = pairs
      .join(codes, col("n_id") === col("cn_id"))
      .join(broadcast(lut),
        col("q_id") === col("lq") && col("m") === col("lm") &&
          col("code") === col("lcode"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("d2")), 6).as("approx"))
    val short = adc
      .withColumn("srn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))))
      .filter(col("srn") <= shortlistN)
      .select("q_id", "n_id")

    // Exact re-rank of the shortlist only — the shortlist is at most
    // NumQueries*shortlistN rows but sits behind aggregates/windows where
    // size estimation is opaque, so broadcast it explicitly like every
    // other small side in this file.
    broadcast(short)
      .join(base.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm")), Seq("n_id"))
      .join(broadcast(queryVectors(spark, dir)
        .withColumn("q_nrm", normD(col("q_emb")))), Seq("q_id"))
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id")))
          .cast("long"))
      .filter(col("rnk") <= K)
      .select("q_id", "n_id", "cosim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** s4: hard-negative mining — for each query vector, the top-k most
    * similar embeddings with a DIFFERENT label (the contrastive-training
    * negative sampler: negatives that are hard precisely because they are
    * close). Same plan as s1 — broadcast queries, one fleet pass, partial
    * per-partition top-k — plus one cross-label predicate pushed into the
    * broadcast join, so the mined set never materializes same-label pairs
    * at all. At fleet scale the s2/s3 bucketed variants substitute for the
    * cross scan unchanged; the label predicate rides along.
    */
  /** s6: cosine-radius (range) search — ALL corpus vectors within a cosine
    * threshold of each query, not a fixed top-k (the retrieval API for
    * "give me every candidate above the relevance bar": near-dup audits,
    * retrieval-augmented sampling, recall-bounded mining). Rides s3's
    * data-adaptive IVF machinery unchanged — argmax-cosine cell assignment,
    * nProbe closest cells per query — but the candidate cut is the radius
    * predicate on the exact re-scored cosine instead of a rank window, so
    * the result-set size tracks data density, not k. Per-query hit counts
    * ride along from one extra window pass over the (small) result set.
    * Same fleet posture as s3: one corpus shuffle keyed by cell, probe set
    * broadcast; candidate volume ≈ nProbe/kCells of the corpus per query,
    * and the radius filter prunes BEFORE the window. Probing is the same
    * recall trade as s3 (cells beyond nProbe are unseen) — the oracle
    * replays the probe set, so the contract is exact-under-probes.
    */
  def rangeSearch(spark: SparkSession, dir: String,
                  minCosine: Double = 0.3, kCells: Int = 16,
                  nProbe: Int = 4): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val cents = base.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    // per-row argmax over the one-row centroid table (the round-17
    // shuffle-free assignment; no vec_id exchange)
    val cand = base
      .crossJoin(broadcast(centroidTableFrame(cents
        .select(col("cell").as("centroid_id"), col("c_emb"), col("c_nrm")))))
      .withColumn("coss", centCosines(col("embedding"), col("nrm"), 6))
      .select(col("vec_id").as("n_id"),
        argmaxCentroidId(col("coss")).as("cell"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val probes = queryVectors(spark, dir)
      .withColumn("q_nrm", normD(col("q_emb")))
      .crossJoin(broadcast(cents))
      .withColumn("pcos",
        round(cosineWithNorms(dotD(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")), 6))
      .withColumn("prnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("pcos").desc, col("cell"))))
      .filter(col("prnk") <= nProbe)
      .select("q_id", "q_emb", "q_nrm", "cell")
    cand.join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .filter(col("cosim") >= minCosine)
      .withColumn("n_hits",
        count(lit(1)).over(Window.partitionBy("q_id")))
      .select("q_id", "n_id", "cosim", "n_hits")
      .orderBy(col("q_id"), col("cosim").desc, col("n_id"))
  }

  /** One selected MMR result row. */
  case class MmrPick(q_id: Long, rank: Long, n_id: Long,
                     relevance: Double, mmr_score: Double)

  /** s7: Maximal-Marginal-Relevance re-rank — diversify each query's
    * retrieval: greedily pick k results maximizing
    * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so the second
    * pick is pushed AWAY from the first (the anti-redundancy re-rank a
    * retrieval-augmented sampler or dedup-aware search runs on its top-N).
    * Plan: s1's brute-force scan keeps the top `poolN` candidates per
    * query (WindowGroupLimit), then the greedy selection runs as typed
    * `mapGroups` over the per-query candidate group — the selection is
    * inherently sequential in k, but each group is poolN rows, so the
    * fleet parallelizes across queries and the per-group work is
    * O(k·poolN) dot products. All arithmetic mirrors the oracle exactly:
    * relevance and pair cosines are ascending-index fold dots rounded
    * half-away at 6 (the kernel convention list_cosine_similarity matches
    * at round-6), the MMR score is one double expression rounded at 6,
    * ties break on (score desc, n_id asc). The DuckDB oracle unrolls all
    * k greedy steps as chained MATERIALIZED CTEs.
    */
  def mmrRerank(spark: SparkSession, dir: String, k: Int = 5,
                poolN: Int = 20, lambda: Double = 0.7,
                // the complement is its OWN literal, never computed 1−λ:
                // Scala's IEEE 1.0-0.7 is 0.30000000000000004 while
                // DuckDB's decimal (1.0-0.7) is exactly 0.3 — literal 0.3
                // lands on the same double in both engines (x32's λ lesson,
                // mirror-imaged)
                lambdaComp: Double = 0.3): DataFrame = {
    // the pair is coupled — callers overriding λ must pass its literal
    // complement too, or the MMR weights silently stop summing to 1
    require(math.abs(lambda + lambdaComp - 1.0) < 1e-9,
      s"lambda ($lambda) + lambdaComp ($lambdaComp) must sum to 1 — " +
        "lambdaComp exists only so the complement is a cross-engine " +
        "literal, not a computed 1-lambda")
    import spark.implicits._
    val cand = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        normD(col("embedding")).as("n_nrm"))
      .join(broadcast(queryVectors(spark, dir)
        .withColumn("q_nrm", normD(col("q_emb")))), col("n_id") =!= col("q_id"))
      .withColumn("cosim",
        Doubles.roundZ(cosineWithNorms(dotD(col("q_emb"), col("n_emb")),
          col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id"))))
      .filter(col("rnk") <= poolN)
      .select(col("q_id"), col("n_id"), col("cosim"),
        col("n_emb").cast("array<double>").as("emb"))
      .as[(Long, Long, Double, Seq[Double])]

    def r6(x: Double): Double = {
      // the EXACT-value constructor, not scala.BigDecimal(d) (which goes
      // through Double.toString's shortest representation and rounds
      // 0.7*0.371485 = 0.2600394999999999789… UP off its true side —
      // DuckDB rounds the exact value, and one sf0.01 row sat exactly on
      // that boundary)
      val r = new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r == 0.0) 0.0 else r // normalize -0.0 like Doubles.roundZ
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { // ascending fold: the kernel's summation order
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

    cand.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val pool = it.toArray.sortBy(c => (-c._3, c._2))
        val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Seq[Double])]
        while (picked.length < k && picked.length < pool.length) {
          val chosen = pool.iterator
            .filter(c => !picked.exists(_._1 == c._2))
            .map { c =>
              val maxSim =
                if (picked.isEmpty) 0.0
                else picked.map(p => cos(c._4, p._4)).max
              (c, r6(lambda * c._3 - lambdaComp * maxSim))
            }
            .reduceLeft { (a, b) =>
              if (b._2 > a._2 || (b._2 == a._2 && b._1._2 < a._1._2)) b else a
            }
          picked += ((chosen._1._2, chosen._1._3, chosen._2, chosen._1._4))
        }
        picked.zipWithIndex.map { case ((id, rel, score, _), i) =>
          MmrPick(q, i + 1L, id, rel, score)
        }.iterator
      }
      .toDF()
      .orderBy("q_id", "rank")
  }

  /** i4: retrieval evaluation — the eval table the similarity family
    * reports before trusting an index (the cls3–cls5 discipline applied
    * to retrieval): per query, exact MRR / hit-count / precision@k /
    * recall over s1's brute-force cosine ranking, with label agreement
    * as the relevance judgment (s4's complement — s4 mines the
    * different-label neighbors, i4 scores how well ranking surfaces the
    * same-label ones). Every metric is an exact integer: reciprocal
    * rank, precision and recall in micros by truncating division (the
    * c2/cls4 convention — Spark `div` == DuckDB `//`), zero-relevant
    * queries publish NULL recall exactly like cls4's undefined
    * precision, and a miss (no relevant in the top k) publishes
    * rr = 0 with a NULL first_rel_rank.
    *
    * Scale shape: ONE broadcast of the query set over the candidate
    * scan, ONE rank window per query partition (s1's exact shape), ONE
    * bounded aggregate onto |queries| rows. Against an ANN index the
    * same frame swaps the scored CTE for the index's candidates and
    * the brute-force ranking becomes the ground-truth side — the
    * recall-vs-s1 checks the s2/s3/s5 specs run are this table's
    * index-vs-exact form.
    */
  def retrievalEval(spark: SparkSession, dir: String, k: Int = K): DataFrame =
    rankedNeqId(spark, dir)
      .withColumn("rel", col("n_label") === col("q_label"))
      .groupBy(col("q_id"), col("q_label"))
      .agg(
        sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel_total"),
        sum(when(col("rel") && col("rnk") <= k, 1L).otherwise(0L)).as("hits"),
        min(when(col("rel") && col("rnk") <= k, col("rnk")))
          .as("first_rel_rank"))
      .withColumn("rr_micros",
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)))
      .withColumn("precision_micros", expr(s"hits * 1000000 div $k"))
      .withColumn("recall_micros",
        expr("CASE WHEN n_rel_total > 0 THEN hits * 1000000 div n_rel_total END"))
      .orderBy("q_id")

  /** i5: ANN-INDEX retrieval eval — i4's table with the scored side
    * swapped for s3's IVF candidates and s1's brute-force ranking as
    * the ground truth: per query, the index-vs-exact overlap
    * (recall@k against the EXACT top-k — the standard ANN recall), the
    * label-relevance hit counts on both sides, and both reciprocal
    * ranks with their delta. This is the table that says what the
    * nProbe/kCells dial actually costs in retrieval quality — the
    * index-vs-exact form the s2/s3/s5 recall specs check pointwise,
    * published as a first-class eval frame.
    *
    * rr_delta_micros = exact − index; it can be NEGATIVE — when the
    * probed cells exclude high-ranked irrelevant vectors, a relevant
    * one can sit HIGHER in the index's own top-k than in the exact
    * list. recall_vs_exact divides by least(k, |exact list|), so a
    * corpus smaller than k+1 still reports true overlap fraction.
    *
    * ORACLE-PINNED PARAMETERIZATION: the DuckDB twin hardcodes the
    * DEFAULTS (k=10, kCells=16, nProbe=4, the 5-query cut); calling
    * this API with other values is supported engine behavior but gated
    * only by the s2/s3/s5 recall specs, not the hash oracle.
    *
    * Scale shape: one s1 pass (broadcast queries, rank window) + one
    * s3 pass (one fleet shuffle on cell), BOTH memo-shared substrates
    * (rankedNeqId / ivfRanked — i5 owns whichever build its pass
    * reaches first; s1/s4/i4/s3 read the same frames), cut to
    * |queries|·k rows before the tiny eval joins.
    */
  def indexRetrievalEval(spark: SparkSession, dir: String, k: Int = K,
                         kCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // the memo-shared substrates pay the corpus scans once per pass;
    // the |queries|·k cuts persist ON TOP so the agg + overlap-join
    // consumers below re-read ~50 rows, not the cached pair frames
    val exact = graft.CacheRegistry.persistTracked(
      rankedNeqId(spark, dir)
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("q_label"), col("n_id"),
          (col("n_label") === col("q_label")).as("rel"), col("rnk")))
    val index = graft.CacheRegistry.persistTracked(
      ivfRanked(spark, dir, kCells, nProbe)
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("n_id"),
          (col("n_label") === col("q_label")).as("rel"), col("rnk")))
    val exAgg = exact.groupBy("q_id", "q_label").agg(
      count(lit(1)).as("exact_n"),
      sum(when(col("rel"), 1L).otherwise(0L)).as("exact_hits"),
      min(when(col("rel"), col("rnk"))).as("exact_first"))
    val ixAgg = index.groupBy("q_id").agg(
      sum(when(col("rel"), 1L).otherwise(0L)).as("index_hits"),
      min(when(col("rel"), col("rnk"))).as("index_first"))
    val overlap = exact.select("q_id", "n_id")
      .join(index.select("q_id", "n_id"), Seq("q_id", "n_id"))
      .groupBy("q_id").agg(count(lit(1)).as("n_overlap"))
    // exAgg is the base (exact always has candidates when |corpus| > 1);
    // the index side LEFT-joins so a query whose probed cells yield NO
    // top-k candidates still publishes its row — index_hits 0, rr 0 —
    // instead of vanishing from the eval (which would overstate recall
    // by omitting exactly the worst-served queries)
    exAgg.join(ixAgg, Seq("q_id"), "left")
      .join(overlap, Seq("q_id"), "left")
      .withColumn("index_hits", coalesce(col("index_hits"), lit(0L)))
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      // denominator = what the exact list actually HOLDS, not a blind k:
      // on a corpus smaller than k+1 the exact top-k has fewer than k
      // rows, and dividing by k would under-report true overlap
      .withColumn("recall_vs_exact_micros",
        expr(s"n_overlap * 1000000 div least($k, exact_n)"))
      .withColumn("exact_rr_micros",
        coalesce(expr("1000000 div exact_first"), lit(0L)))
      .withColumn("index_rr_micros",
        coalesce(expr("1000000 div index_first"), lit(0L)))
      .withColumn("rr_delta_micros",
        col("exact_rr_micros") - col("index_rr_micros"))
      .select("q_id", "q_label", "n_overlap", "recall_vs_exact_micros",
        "exact_hits", "index_hits", "exact_rr_micros", "index_rr_micros",
        "rr_delta_micros")
      .orderBy("q_id")
  }

  /** s4 derives from the shared neq-id substrate: filter to the
    * label-mismatch pairs (a strict subset — a vector can never
    * label-mismatch itself) and RE-RANK within the subset under the
    * same (cosim desc, n_id) order, which is exactly the ranking the
    * dedicated label-mismatch scoring pass produced — one cached read
    * instead of a second corpus scan.
    */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    rankedNeqId(spark, dir)
      .filter(col("n_label") =!= col("q_label"))
      .drop("rnk")
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosim").desc, col("n_id")))
          .cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "q_label", "n_id", "n_label", "cosim", "rnk")
      .orderBy("q_id", "rnk")
}

/** Driver-local replica of one s5 Lloyd training round, bit-for-bit
  * equal to the Spark plan it replaced (the cluster ran it as
  * cbCols(trainSub) → (m, code) aggregate → collect). The op-by-op
  * correspondence, each pinned by SimilaritySpec against a Spark-side
  * reference round:
  *
  *  - d2 = Spark `round(l2sq(sv, cv), 6)`: the unrolled left-to-right
  *    double accumulation of component squares (reduceLeft == sequential
  *    `+=`), then RoundBase's DoubleType eval — NaN/Inf pass through,
  *    else `BigDecimal(d).setScale(6, HALF_UP).toDouble`.
  *  - argmin = `array_position(d2s, array_min(d2s))`: the FIRST slot of
  *    the minimum in code-ascending slot order. Pad slots (1e18
  *    components) can never win the min, so scanning only the real
  *    entries with a strict `<` keeps the identical first-match winner.
  *  - mean update: per-component exact long sums of Spark
  *    `floor(sv_i * 1e6 + 0.5)` (Floor on double = math.floor + d2l,
  *    verified against the catalyst bytecode), count per (m, code), then
  *    the SAME driver-side division chain `sum.toDouble / n / 1e6`.
  *    Long sums are order-free, so local accumulation order is
  *    irrelevant. A (m, code) group that loses all members produces no
  *    accumulator row and drops out, exactly like the aggregate.
  */
private[graft] object LloydLocal {

  private[graft] def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else scala.math.BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  private def l2sq(a: Array[Double], b: IndexedSeq[Double], subDim: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < subDim) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private final class Acc(subDim: Int) {
    var n: Long = 0L
    val s: Array[Long] = new Array[Long](subDim)
  }

  private def accumulate(rows: Array[(Int, Long, Array[Double])],
                         cb: Map[Int, IndexedSeq[(Long, IndexedSeq[Double])]],
                         subDim: Int)
      : scala.collection.mutable.HashMap[(Int, Long), Acc] = {
    val acc = scala.collection.mutable.HashMap.empty[(Int, Long), Acc]
    rows.foreach { case (m, _, sv) =>
      val slots = cb(m)
      var bestIdx = 0
      var bestD = round6(l2sq(sv, slots(0)._2, subDim))
      var j = 1
      while (j < slots.size) {
        val d = round6(l2sq(sv, slots(j)._2, subDim))
        if (d < bestD) { bestD = d; bestIdx = j }
        j += 1
      }
      val a = acc.getOrElseUpdate((m, slots(bestIdx)._1), new Acc(subDim))
      a.n += 1
      var i = 0
      while (i < subDim) {
        a.s(i) += math.floor(sv(i) * 1e6 + 0.5).toLong
        i += 1
      }
    }
    acc
  }

  def lloydRound(rows: Array[(Int, Long, Array[Double])],
                 cb: Map[Int, IndexedSeq[(Long, IndexedSeq[Double])]],
                 subDim: Int): Map[Int, IndexedSeq[(Long, IndexedSeq[Double])]] = {
    // The per-row work is independent and the per-(m, code) accumulators
    // are exact long sums (commutative, associative), so the scan splits
    // across driver threads and the partial maps merge in any order with
    // a bit-identical result. The BigDecimal HALF_UP rounding inside the
    // argmin is the hot op (~0.9 s/round single-threaded at sf0.1's 64k
    // rows — measured via S5Tune) and parallelizes embarrassingly.
    val nThreads = math.min(math.max(1,
      Runtime.getRuntime.availableProcessors()), math.max(1, rows.length))
    val chunkSize = math.max(1, (rows.length + nThreads - 1) / nThreads)
    val chunks = rows.grouped(chunkSize).toArray
    val partials =
      new Array[scala.collection.mutable.HashMap[(Int, Long), Acc]](chunks.length)
    val threads = chunks.zipWithIndex.map { case (chunk, i) =>
      new Thread(() => partials(i) = accumulate(chunk, cb, subDim))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val acc = partials.reduceLeft { (a, b) =>
      b.foreach { case (k, pb) =>
        a.get(k) match {
          case Some(pa) =>
            pa.n += pb.n
            var i = 0
            while (i < subDim) { pa.s(i) += pb.s(i); i += 1 }
          case None => a.update(k, pb)
        }
      }
      a
    }
    acc.iterator.map { case ((m, code), a) =>
      (m, code,
        (0 until subDim).map(i => a.s(i).toDouble / a.n / 1e6).toIndexedSeq)
    }.toArray
      .groupBy(_._1).map { case (m, rs) =>
        m -> rs.sortBy(_._2).map(t => (t._2, t._3)).toIndexedSeq }
  }
}
