package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Sketches, VectorFunctions}

/** Deduplication family over the `documents` / `embeddings` tables — the
  * operators a large-scale training-data pipeline runs before anything else.
  *
  * Scale posture: the only quadratic-looking step anywhere is a self-join,
  * and every self-join here is *blocked* — by LSH band bucket (d2), simhash
  * band (d3), source (d4), or label (d5) — so shuffle volume is proportional
  * to candidate pairs, not to n². At 100 TB the blocked joins shuffle on
  * their block key once; nothing is ever collected to the driver.
  */
object Dedup {

  /** d1: exact dedup — group identical texts, keep the smallest doc_id.
    * One hash shuffle on the text (at scale: on a 128-bit text digest).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // --- MinHash machinery (d2) -----------------------------------------

  /** Word shingles of size `k` as an array column (k=1 → word set). */
  private def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    if (k == 1) array_distinct(toks)
    else array_distinct(
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** k=`numHashes` MinHash signature — the native codegen'd kernel (one
    * string hash per shingle + k cheap long mixes; see
    * graftbridge.MinHashSignature).
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    Sketches.minHashSignature(shingleCol, numHashes)

  /** d2: MinHash + LSH near-dup candidates. Signature: 32 hashes; banding:
    * 8 bands x 4 rows. Docs sharing any band bucket become a candidate pair;
    * pairs are scored by signature agreement (the MinHash estimate of
    * Jaccard) and kept at est >= the threshold.
    *
    * Join discipline for scale: the band join carries ONLY (bucket, doc_id)
    * — signatures rejoin after the candidate pairs are deduplicated, so the
    * wide arrays are shuffled once per *distinct* pair, not once per band
    * collision. Candidate volume tracks true collisions, never n².
    */
  def minhashLsh(spark: SparkSession, dir: String,
                 shingleSize: Int = 1, numHashes: Int = 32, bands: Int = 8,
                 minEstJaccard: Double = 0.8, maxBucketSize: Int = 2000): DataFrame = {
    val rows = numHashes / bands
    // The signature is the expensive kernel and is reused by three branches
    // (banding + both sides of the pair rejoin) — persist it once. At fleet
    // scale this is a MEMORY_AND_DISK cache of (id, 32 longs), a tiny
    // fraction of the corpus it replaces recomputing.
    val docs = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= shingleSize)
      .select(col("doc_id"),
        minHashSignature(shingles(col("text"), shingleSize), numHashes).as("sig"))
      .persist()

    val banded = docs.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .persist()

    // Standard LSH hygiene: cap bucket size. An over-full bucket means the
    // band carries no discriminating information there (stop-shingle
    // territory) but would cost O(size²) pairs — the worst-case skew killer
    // at fleet scale. Recall is preserved by the other bands. The handful of
    // over-cap buckets is found with a partial-aggregable count and removed
    // with a broadcast anti-join — no sort-based window over every row.
    val overfull = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bkt_n"))
      .filter(col("bkt_n") > maxBucketSize)
      .select("band", "bucket")
    val bounded = banded.join(broadcast(overfull), Seq("band", "bucket"), "left_anti")

    val pairs = bounded.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      .join(bounded.select(col("band"), col("bucket"), col("doc_id").as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()

    pairs
      .join(docs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .select(col("a_id"), col("b_id"),
        (Sketches.equalCount(col("a_sig"), col("b_sig")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .orderBy("a_id", "b_id")
  }

  // --- SimHash machinery (d3) -----------------------------------------

  /** 64-bit SimHash of a token array — the native codegen'd kernel (one
    * xxhash64 per token, bit votes read from that hash; see
    * graftbridge.SimHash64).
    */
  def simHash64(tokens: Column): Column = Sketches.simHash64(tokens)

  /** d3: SimHash near-dup pairs. Candidates share one of four 16-bit bands
    * (guaranteed to catch every pair at hamming <= 3, by pigeonhole);
    * candidates are verified with the true hamming distance.
    */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simHash64(split(col("text"), " ")).as("fp"))

    val banded = docs.select(col("doc_id"), col("fp"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("fp"), b * 16).bitwiseAND(0xFFFFL).as("bits"))))
        .as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.band"), col("bb.bits"))
      .persist() // both self-join sides read this; hash the corpus once

    val a = banded.select(col("band"), col("bits"),
      col("doc_id").as("a_id"), col("fp").as("a_fp"))
    val b = banded.select(col("band"), col("bits"),
      col("doc_id").as("b_id"), col("fp").as("b_fp"))

    a.join(b, Seq("band", "bits"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long").as("hamming"))
      // verify-then-dedup: the hamming filter runs inside the join stage and
      // shrinks the distinct's shuffle to true near-dups only
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** d4: exact word-set Jaccard >= 0.8 within each source. Token-level
    * self-join blocked on (source, word) — the SQL-oracle-checkable exact
    * counterpart of d2.
    */
  def ngramJaccard(spark: SparkSession, dir: String,
                   minJaccard: Double = 0.8): DataFrame = {
    val docsWithSets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        array_distinct(split(col("text"), " ")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
    // both sides of the blocked self-join read this — persist so the
    // tokenize+explode pass over the corpus runs once
    val tok = docsWithSets
      .select(col("doc_id"), col("source"), col("n"), explode(col("ws")).as("w"))
      .persist()

    // Size bound: J >= t forces |B| within [t*|A|, |A|/t] (J <= min/max), so
    // impossible pairs are pruned inside the token join, before the pair
    // shuffle — the standard prefix/size filter from set-similarity joins.
    val a = tok.select(col("source"), col("w"),
      col("doc_id").as("a_id"), col("n").as("na"))
    val b = tok.select(col("source"), col("w"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    val inter = a.join(b,
        col("a_id") < col("b_id") &&
          a("source") === b("source") && a("w") === b("w") &&
          col("nb") >= ceil(col("na") * minJaccard) &&
          col("nb") <= floor(col("na") / minJaccard))
      .groupBy("a_id", "b_id", "na", "nb")
      .agg(count(lit(1)).as("c"))

    inter
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** d6: transitive dedup groups — connected components over the d4
    * near-dup pairs, so A~B and B~C land in one group even when A~C was
    * never scored. Pregel-style min-label propagation: each superstep joins
    * labels to the edge list and takes the neighborhood minimum, until a
    * superstep changes nothing. Per-step work is two shuffles proportional
    * to |edges|; the only driver-side value is the scalar convergence count
    * (loop control, not data). Components here are near-cliques, so the
    * iteration count tracks component diameter (small), not corpus size.
    */
  def dedupGroups(spark: SparkSession, dir: String,
                  minJaccard: Double = 0.8, maxIters: Int = 20): DataFrame = {
    val pairs = ngramJaccard(spark, dir, minJaccard).select("a_id", "b_id")
    val edges = pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .persist()
    // localCheckpoint (not persist) per superstep: iterative plans grow
    // superlinearly in lineage otherwise — planning alone dominated after a
    // few supersteps. On a cluster this would be a reliable checkpoint dir.
    var labels = Tables.documents(spark, dir)
      .select(col("doc_id"), col("doc_id").as("group_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels, edges("b_id") === labels("doc_id"))
        .groupBy(edges("a_id").as("n_id"))
        .agg(min(col("group_id")).as("nmin"))
      val propagated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("n_id"), "left")
        .select(col("doc_id"),
          least(col("group_id"), coalesce(col("nmin"), col("group_id")))
            .as("group_id"))
      // pointer-doubling shortcut (group_id := label of my label) turns
      // linear chain propagation into logarithmic convergence
      val updated = propagated.as("x")
        .join(propagated.select(col("doc_id").as("g_id"), col("group_id").as("g_gid")),
          col("x.group_id") === col("g_id"), "left")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.group_id"), coalesce(col("g_gid"), col("x.group_id")))
            .as("group_id"))
        .localCheckpoint()
      // scalar superstep convergence check (the Pregel vote-to-halt);
      // aliased projections avoid self-join lineage ambiguity
      converged = updated.select(col("doc_id"), col("group_id").as("new_gid"))
        .join(labels.select(col("doc_id"), col("group_id").as("old_gid")), "doc_id")
        .filter(col("new_gid") < col("old_gid"))
        .limit(1).count() == 0L
      labels = updated
      iter += 1
    }
    edges.unpersist(blocking = false)
    labels.orderBy("doc_id")
  }

  /** d5: embedding-cosine near-dup pairs, blocked by label (the coarse
    * cluster id); cosine computed in double so it hash-matches the DuckDB
    * oracle after round(6). At 100 TB the block key becomes an LSH/IVF
    * bucket (see Similarity.annIvf) instead of a given label.
    */
  def embeddingNearDup(spark: SparkSession, dir: String,
                       minCosine: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"),
        VectorFunctions.normD(col("embedding")).as("nrm"))
    val a = e.select(col("label"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("label"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosim",
        round(VectorFunctions.cosineWithNorms(
          VectorFunctions.dotD(col("a_emb"), col("b_emb")),
          col("a_nrm"), col("b_nrm")), 6))
      .filter(col("cosim") >= minCosine)
      .select("a_id", "b_id", "cosim")
      .orderBy("a_id", "b_id")
  }
}
