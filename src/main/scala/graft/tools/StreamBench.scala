package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Streaming throughput benchmark: drives the Structured Streaming operators
  * end-to-end (file source → operator → noop sink) over the driver's events
  * table split into micro-batch files, and reports sustained events/sec per
  * operator — the number to hold against the reference's single-node Flink
  * throughput. The events table is replicated (disjoint event_id ranges) so
  * per-micro-batch launch overhead amortizes into a sustained rate.
  * Usage: runMain graft.tools.StreamBench [sfDir] [chunks] [replicas] [names...]
  * (extra args = only run ops whose name is listed — the BenchSome pattern)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    // Shuffle partitions = state-store instances for stateful streams; size
    // them to state volume, not core count — every extra partition is an
    // extra store snapshot+commit per micro-batch (2-3x throughput at 8 vs
    // 32 here). Scan parallelism still uses all cores via file splits.
    val stateParts = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", stateParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Stage the stream input: the events table as `chunks` parquet files,
    // each one micro-batch (maxFilesPerTrigger=1).
    val in = "/tmp/graft_stream_in"
    val base = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // Replica ids offset by max(event_id)+1, not the row count: with sparse
    // ids a count-based offset would collide replicas and stateful ops
    // would silently drop rows, deflating the reported throughput.
    val Array(baseN, idSpan) = base
      .agg(count(lit(1)), max(col("event_id")) + 1).as[(Long, Long)]
      .first() match { case (c, s) => Array(c, s) }
    val events = spark.range(replicas).toDF("rep").crossJoin(base)
      .select((col("event_id") + col("rep") * idSpan).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"))
    val n = baseN * replicas
    events.repartition(chunks).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema

    def stream(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)

    def run(name: String, out: DataFrame): (String, Double) = {
      val ckpt = s"/tmp/graft_stream_ckpt/$name-${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = out.writeStream.format("noop")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      name -> n / sec
    }

    // best of 2 runs per op (see Bench.scala on sandbox thread freezes)
    def best(name: String, mk: () => DataFrame): Option[(String, Double)] = {
      if (only.nonEmpty && !only(name)) return None
      val r = Seq(run(name, mk()), run(name, mk())).maxBy(_._2)
      println(f"[stream-bench] $name: ${r._2}%.0f events/sec")
      Some(r)
    }

    val results = Seq(
      best("radar_stateless", () => StreamOps.speedRadar(stream())),
      best("daily_window", () => StreamOps.congestionDaily(stream())),
      best("session_window", () => StreamOps.sessionWindows(stream())),
      best("dedup_watermark", () => StreamOps.dedupStream(stream())),
      best("accident_runs_fmgws", () =>
        StreamOps.accidentRuns(spark,
          stream().as[StreamOps.Event], emitPerReport = false).toDF()),
      best("interval_join", () => {
        val s = stream()
        StreamOps.purchaseAttribution(s, stream())
      }),
      best("interval_join_outer", () => {
        val s = stream()
        StreamOps.purchaseAttributionOuter(s, stream())
      }),
      best("psi_drift_window", () => StreamOps.psiDriftStream(stream(),
        StreamOps.referenceHistogram(base))),
      best("ks_drift_window", () => StreamOps.ksDriftStream(stream(),
        StreamOps.referenceHistogram(base))),
      best("chi2_drift_window", () => StreamOps.chi2DriftStream(stream(),
        StreamOps.referenceHistogram(base))))

    // cdc2 twin: orders-shaped events through the foreachBatch MERGE loop;
    // the measured rate pays the full per-batch apply INCLUDING the state
    // localCheckpoint, i.e. the upsert write amplification a daily-ingest
    // dimension actually sustains. scd2ApplyStream returns a writer (it
    // owns the foreachBatch sink), so it can't go through run()'s noop.
    val scd2 = if (only.nonEmpty && !only("scd2_apply_fb")) None else Some {
      def once(): (String, Double) = {
        val state = new StreamOps.Scd2State(spark)
        val ckpt = s"/tmp/graft_stream_ckpt/scd2-${System.nanoTime()}"
        val t0 = System.nanoTime()
        val q = StreamOps.scd2ApplyStream(
          stream().select(col("event_id").as("o_orderkey"),
            col("user_id").as("o_custkey"), col("value").as("o_totalprice"),
            col("ts").as("o_orderdate")), state)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        q.awaitTermination()
        "scd2_apply_fb" -> n / ((System.nanoTime() - t0) / 1e9)
      }
      val r = Seq(once(), once()).maxBy(_._2)
      println(f"[stream-bench] ${r._1}: ${r._2}%.0f events/sec")
      r
    }

    // The 9-token synthetic doc shape shared by every text-twin bench row
    // (contamination guard, quality score, Pareto gate): one definition so
    // a tweak can never make the rows silently measure different inputs.
    def textify(df: DataFrame) = df.select(
      col("event_id").as("doc_id"), col("ts"),
      concat_ws(" ", col("event_type"),
        concat(lit("u"), pmod(col("user_id"), lit(50000))),
        concat(lit("g"), pmod(col("event_id"), lit(5000))),
        concat(lit("v"), floor(col("value")).cast("long")),
        concat(lit("a"), pmod(col("user_id"), lit(7))),
        concat(lit("b"), pmod(col("event_id"), lit(13))),
        concat(lit("c"), pmod(col("event_id"), lit(17))),
        concat(lit("d"), pmod(col("user_id"), lit(3))),
        lit("zz")).as("text"))

    // c1 twin: events re-shaped into 9-token synthetic docs; the benchmark
    // side is the shingle set of every 10th doc (a ~10% true-hit rate), a
    // static frame materialized ONCE and broadcast into each micro-batch's
    // stateless join — the measured rate pays the full per-batch verdict
    // (shingle kernel + broadcast join + per-doc rollup + noop write).
    val guard = if (only.nonEmpty && !only("contamination_guard_fb")) None else Some {
      val bench = textify(base.withColumn("event_id", col("event_id")))
        .filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(explode(array_distinct(
          graft.functions.Sketches.shingleHash64(col("text"), 8))).as("h"))
        .distinct().localCheckpoint()
      def once(): (String, Double) = {
        val ckpt = s"/tmp/graft_stream_ckpt/guard-${System.nanoTime()}"
        val t0 = System.nanoTime()
        val q = StreamOps.contaminationGuardStream(textify(stream()), bench) {
          (verdicts, _) =>
            verdicts.write.format("noop").mode("overwrite").save()
        }.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        q.awaitTermination()
        "contamination_guard_fb" -> n / ((System.nanoTime() - t0) / 1e9)
      }
      val r = Seq(once(), once()).maxBy(_._2)
      println(f"[stream-bench] ${r._1}: ${r._2}%.0f events/sec")
      r
    }

    // cls1 twin: the trained-classifier scoring projection over the same
    // 9-token synthetic docs — stateless per-row codegen work (64-term
    // quantized dot + verdict), the ingest-time quality gate's rate. The
    // weight values don't affect the per-row cost, so a deterministic
    // synthetic vector stands in for a trained one.
    val qualityRow = {
      val wq = Array.tabulate(65)(j => ((j * 2654435761L) % 2000001L) - 1000000L)
      best("quality_score_stateless", () =>
        StreamOps.qualityScoreStream(textify(stream()), wq))
    }

    // the ingest-time Pareto acceptance gate: the same scoring projection
    // plus the LUT verdict — measures the marginal cost of the acceptance
    // rule over plain scoring
    val paretoRow = {
      val wq = Array.tabulate(65)(j => ((j * 2654435761L) % 2000001L) - 1000000L)
      best("pareto_filter_stateless", () =>
        StreamOps.paretoFilterStream(textify(stream()), wq))
    }

    // x41's ingest twin: page synthesis + the full tag-walk audit per
    // event — the parse dominates, which is the honest rate for an
    // extraction-at-ingest stage
    val htmlRow = best("html_extract_stateless", () =>
      StreamOps.htmlExtractStream(spark,
        textify(stream()).as[(Long, java.sql.Timestamp, String)]
          .map { case (id, ts, text) =>
            StreamOps.HtmlPage(id, ts, graft.operators.Html.buildHtml(id, text))
          }))

    // x43's frontier twin: canonicalize + first-arrival dedup on the
    // canonical key (watermark-bounded state, one row per live resource);
    // synthetic URLs reuse the x43 identity/variance split so real dedup
    // state builds up (one canonical resource per 100-id bucket)
    val frontierRow = best("url_frontier_dedup", () =>
      StreamOps.urlFrontierStream(spark,
        stream().select(col("event_id"), col("ts"))
          .as[(Long, java.sql.Timestamp)]
          .map { case (id, ts) =>
            StreamOps.UrlEvent(id, ts, graft.operators.Urls.buildUrl(id))
          }))

    // x42's ingest twin: one stateless codegen projection per batch
    val blockRow = best("blocklist_stateless", () =>
      StreamOps.blocklistFilterStream(
        textify(stream()).withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20))))))

    // p2's ingest face: canonicalize + REP verdict + page parse +
    // extraction-yield + blocklist per fetch event — the composed
    // per-page gate; page synthesis reuses x41's, URLs x43's, so the
    // rate carries the full parse AND the frontier kernels
    val ingestRow = best("web_ingest_gate_stateless", () =>
      StreamOps.webIngestGateStream(spark,
        textify(stream()).as[(Long, java.sql.Timestamp, String)]
          .map { case (id, ts, text) =>
            StreamOps.FetchEvent(id, ts, graft.operators.Urls.buildUrl(id),
              s"src${id % 20}", graft.operators.Html.buildHtml(id, text))
          }))

    // p2's FULL-funnel streaming face: containers land as files, each
    // closed container gates through the verdict funnel and the verdict
    // table is maintained (Update semantics). The rate is docs/sec
    // admitted through the COMPLETE verdict funnel (frontier kernel +
    // keepers + content gates + contamination + the memo-shared trained
    // cls gate). Containers are staged in the CRAWL-QUEUE geometry: a
    // fetcher fleet partitions its frontier per host/queue
    // (politeness), so every fetch of one canonical URL — host and
    // path are PART of the URL — lands in one queue's containers; the
    // synthesized URL keyspace keys on doc_id%100, so the 20-bucket
    // staging below is exactly that geometry. THREE row families:
    // `web_funnel_fb` is the INCREMENTAL default (per batch, only the
    // batch-touched canon/norm groups recompute and MERGE),
    // `web_funnel_fb_full` the full per-batch recompute over
    // everything seen so far (the equality reference; O(corpus) per
    // landing batch), and `web_funnel_fb_striped` the incremental mode
    // under ADVERSARIAL doc_id-striped staging, where every container
    // holds a slice of every URL group. The CLAIM "per-batch cost
    // tracks batch-touched groups, not corpus size" is about the
    // corpus-proportional term, and at bench corpus sizes wall-clock
    // cannot see it (fixed per-batch stage count dominates row work —
    // both modes measure ~flat seconds, and the incremental closure's
    // extra stages make its ABSOLUTE rate the lower one here; the
    // crossover needs frontiers orders of magnitude past a bench
    // slice). So each family also publishes the DETERMINISTIC
    // `..._gaterows_lastfirst_pct` row: rows the gate composition ran
    // over in the last 3 batches over the first 3, in percent — the
    // work-size the wall-clock converges to as the frontier outgrows
    // fixed stage cost. Full recompute grows with the frontier (~20
    // equal landings -> ~950%); incremental under queue staging stays
    // at batch-touched-group size (~100%) however much corpus has
    // accumulated; incremental under striped staging honestly reads
    // ~950% too — every batch TOUCHES every group, the closure is the
    // cost, and the instrument says so rather than flattering the
    // default.
    val nShards = 20
    def stageFunnel(tag: String, shardIdExpr: Option[String]): (String, Long) = {
      val warcDir = s"/tmp/graft_stream_warc_funnel_$tag"
      // fresh staging per run: the file stream dedups by PATH, so a
      // stale staging from a different corpus must never leak in
      val hPath = new org.apache.hadoop.fs.Path(warcDir)
      val hFs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (hFs.exists(hPath)) hFs.delete(hPath, true)
      val nDocs = graft.Tables.documents(spark, sfDir).count()
      graft.sources.Warc.writeWarcFiles(spark, sfDir, warcDir,
        shardSize = math.max(1L, nDocs / nShards).toInt,
        shardIdExpr = shardIdExpr)
      (warcDir, nDocs)
    }
    def funnelRowFor(name: String, incremental: Boolean,
                     shardIdExpr: Option[String], runs: Int)
        : Option[Seq[(String, Double)]] =
      if (only.nonEmpty && !only(name)) None else Some {
        val (warcDir, nDocs) = stageFunnel(name, shardIdExpr)
        def once(): ((String, Double), (String, Double)) = {
          val state = new StreamOps.WebFunnelState(spark, sfDir,
            incremental = incremental)
          val ckpt = s"/tmp/graft_stream_ckpt/funnel-${System.nanoTime()}"
          val t0 = System.nanoTime()
          val q = StreamOps.webPipelineVerdictStream(
              graft.sources.Warc.warcRecordFileStream(spark, warcDir), state)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt).start()
          q.awaitTermination()
          val got = state.verdicts.count()
          require(got == nDocs, s"funnel stream gated $got of $nDocs docs")
          val gateRows = state.batchGateRows.toSeq
          require(gateRows.length >= 6, s"need >=6 batches for the slope, " +
            s"got ${gateRows.length}")
          val lastFirst = 100.0 * gateRows.takeRight(3).sum.toDouble /
            gateRows.take(3).sum
          ((name -> nDocs / ((System.nanoTime() - t0) / 1e9)),
            (s"${name}_gaterows_lastfirst_pct" -> lastFirst))
        }
        // rate: best of N (the stall-band discipline); the gate-rows
        // slope is a function of the landed data, not the run — repeat
        // runs must agree, and the require makes drift loud
        val all = Seq.fill(runs)(once())
        require(all.map(_._2).distinct.size == 1,
          s"gate-rows slope must be deterministic: ${all.map(_._2)}")
        val r = all.map(_._1).maxBy(_._2)
        println(f"[stream-bench] ${r._1}: ${r._2}%.0f docs/sec " +
          f"($nDocs docs); ${all.head._2._1}: ${all.head._2._2}%.0f%%")
        Seq(r, all.head._2)
      }
    // the crawl-queue bucket: URL keyspace (doc_id%100) split across
    // the landing containers
    val queueExpr = Some(s"(doc_id % 100) div ${math.max(1, 100 / nShards)}")
    val funnelRows = Seq(
      funnelRowFor("web_funnel_fb", incremental = true, queueExpr, runs = 2),
      funnelRowFor("web_funnel_fb_full", incremental = false, queueExpr,
        runs = 2),
      // adversarial geometry: one run — only its deterministic
      // gate-rows row is the point; its rate pays closure + full-size
      // recompute and is strictly dominated
      funnelRowFor("web_funnel_fb_striped", incremental = true, None,
        runs = 1))
      .flatten.flatten

    // transformWithState ops require the RocksDB provider. firstSeenTws is
    // excluded: its ProcessingTime time mode keeps shouldRunAnotherBatch
    // true forever, so an AvailableNow run never terminates.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val twsResults = Seq(
      best("accident_runs_tws", () =>
        StreamOps.accidentRunsTws(spark, stream().as[StreamOps.Event]).toDF()),
      best("sessionize_tws_timers", () =>
        StreamOps.sessionizeTws(spark, stream().as[StreamOps.Event]).toDF()),
      best("windowed_counts_tws", () =>
        StreamOps.windowedCountsTws(spark, stream().as[StreamOps.Event]).toDF()),
      best("heavy_hitters_tws", () =>
        StreamOps.heavyHittersStream(spark, stream().as[StreamOps.Event]).toDF()),
      best("pack_sequences_tws", () =>
        StreamOps.packSequencesStream(spark,
          stream().select(col("event_id").as("doc_id"), col("ts"),
            col("event_type").as("source"),
            (pmod(col("user_id"), lit(96)) + 5).as("n_tokens"))
            .as[StreamOps.Doc]).toDF()),
      // d2 twin: events re-shaped into small synthetic docs (mostly-unique
      // token tuples, occasional collisions -> real pair emissions); TTL
      // ZERO selects the EventTime/no-TTL mode AvailableNow can terminate
      best("minhash_lsh_tws", () =>
        StreamOps.minhashLshDedupStream(spark,
          stream().select(col("event_id").as("doc_id"), col("ts"),
            concat_ws(" ", col("event_type"),
              concat(lit("u"), pmod(col("user_id"), lit(50000))),
              concat(lit("g"), pmod(col("event_id"), lit(5000))),
              concat(lit("v"), floor(col("value")).cast("long"))).as("text"))
            .as[StreamOps.TextDoc],
          maxBucketSize = 64,
          ttl = java.time.Duration.ZERO).toDF()),
      // d8 twin: same synthetic docs with a 10%-new split — the standing
      // 90% seeds state without pairing, the 10% feed probes it, so the
      // measured rate is the production ingest shape (state writes
      // dominated by seeds, scoring work by feed bucket occupancy)
      best("incremental_dedup_tws", () =>
        StreamOps.incrementalDedupStream(spark,
          stream().select(col("event_id").as("doc_id"), col("ts"),
            concat_ws(" ", col("event_type"),
              concat(lit("u"), pmod(col("user_id"), lit(50000))),
              concat(lit("g"), pmod(col("event_id"), lit(5000))),
              concat(lit("v"), floor(col("value")).cast("long"))).as("text"),
            (pmod(col("event_id"), lit(10)) === 0).as("is_new"))
            .as[StreamOps.SeedableDoc],
          maxBucketSize = 64,
          ttl = java.time.Duration.ZERO).toDF()),
      // m9 twin: events wrapped in REAL id-derived BMP containers so the
      // measured rate pays the full ingest path — decode + aHash + band
      // fan-out + standing-index compare — with the same 10%-new split
      // and bucket cap as the d8 row (tiny near-flat images collide
      // heavily, so the cap is load-bearing here too)
      best("media_neardup_tws", () =>
        StreamOps.mediaNearDupStream(spark,
          stream().select(col("event_id"), col("ts"), col("user_id"),
              col("value"), (pmod(col("event_id"), lit(10)) === 0).as("is_new"))
            .as[(Long, java.sql.Timestamp, Long, Double, Boolean)]
            .map { case (id, ts, uid, v, isNew) =>
              StreamOps.SeedableMediaEvent(id, ts, "image",
                graft.operators.Multimodal.buildBmp(
                  1 + (id % 31).toInt, 1 + (id % 17).toInt,
                  s"u${uid % 50000} v${v.toLong}".getBytes("UTF-8")),
                isNew)
            },
          maxBucketSize = 64,
          ttl = java.time.Duration.ZERO).toDF()))

    // Shared staging for the two WARC-chunk rows: REAL containers
    // (documents sharded 50/container, the batch builder) split into
    // 32 KiB chunks with arbitrary boundaries, one part file per bucket
    // of WHOLE containers with chunk order intact — the file source's
    // cross-file processing order is unspecified, and the reassembler's
    // per-container in-order contract (the Kafka-partition-per-transfer
    // shape) must hold however files interleave.
    val warcChunkSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("container_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    val stagedWarcCache =
      scala.collection.mutable.Map.empty[(Int, Boolean), (String, Long)]
    def stagedWarcChunks(chunkBytes: Int,
                         gz: Boolean = false): (String, Long) =
      stagedWarcCache.getOrElseUpdate((chunkBytes, gz), {
        import org.apache.spark.sql.Row
        val baseDocs = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().sortBy(_._1)
        // replicate like the events rows (disjoint id ranges) so per-batch
        // launch + state-commit overhead amortizes into a sustained rate
        val docSpan = baseDocs.map(_._1).max + 1
        val docs = (0 until replicas).flatMap(r =>
          baseDocs.map { case (id, t) => (id + r * docSpan, t) })
        val nRecs = docs.length.toLong
        val perContainer: Seq[Seq[Row]] =
          docs.grouped(50).zipWithIndex.map { case (g, ci) =>
            val container =
              if (gz) graft.sources.Warc.buildGzContainer(g)
              else graft.sources.Warc.buildContainer(g)
            container.grouped(chunkBytes).zipWithIndex.map { case (b, i) =>
              Row(ci.toLong, new java.sql.Timestamp(0L), i.toLong, b)
            }.toSeq
          }.toSeq
        val buckets = perContainer.zipWithIndex
          .groupBy(_._2 % chunks).toSeq.sortBy(_._1)
          .map(_._2.flatMap(_._1))
        val warcIn =
          s"/tmp/graft_stream_warc_in_$chunkBytes${if (gz) "_gz" else ""}"
        spark.createDataFrame(
            spark.sparkContext.parallelize(buckets, buckets.length)
              .flatMap(identity),
            warcChunkSchema)
          .write.mode("overwrite").parquet(warcIn)
        (warcIn, nRecs)
      })
    def warcChunkStream(path: String) =
      spark.readStream.schema(warcChunkSchema)
        .option("maxFilesPerTrigger", 1).parquet(path)
        .as[StreamOps.WarcChunk]

    def warcReassembleRow(name: String, chunkBytes: Int): Option[(String, Double)] =
      if (only.nonEmpty && !only(name)) None else Some {
        val (warcIn, nRecs) = stagedWarcChunks(chunkBytes)
        def once(): (String, Double) = {
          val ckpt = s"/tmp/graft_stream_ckpt/$name-${System.nanoTime()}"
          val t0 = System.nanoTime()
          val q = StreamOps.warcRecordStream(spark, warcChunkStream(warcIn))
            .toDF()
            .writeStream.format("noop").trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt).start()
          q.awaitTermination()
          name -> nRecs / ((System.nanoTime() - t0) / 1e9)
        }
        val r = Seq(once(), once()).maxBy(_._2)
        println(f"[stream-bench] ${r._1}: ${r._2}%.0f records/sec ($nRecs records)")
        r
      }
    // w1 twin: the measured rate pays reassembly + record framing +
    // HTTP parse + body CRC per record. Reported per RECORD, not chunk.
    val warcRow = warcReassembleRow("warc_reassemble_tws", 32 * 1024)
    // the SMALL-CHUNK stress: 1 KiB chunks mean ~75 chunks straddle a
    // typical container record instead of ~2 — the row that would
    // collapse quadratically if reassembly re-parsed the pending prefix
    // per chunk (it holds the per-record rate within a small constant
    // of the 32 KiB row because of the recordNeed resume hint)
    val warcSmallRow = warcReassembleRow("warc_reassemble_1k_tws", 1024)

    // w4 twin: the same record stream over the .warc.gz TRANSPORT —
    // per-record gzip members split into 32 KiB chunks; the rate pays
    // member-completion detection (one inflate attempt per batch per
    // container), the verified inflate, and then the identical plain
    // framing + HTTP parse + digest verify + body CRC per record.
    val warcGzRow = if (only.nonEmpty && !only("warc_gz_reassemble_tws")) None
      else Some {
        val (warcIn, nRecs) = stagedWarcChunks(32 * 1024, gz = true)
        def once(): (String, Double) = {
          val ckpt = s"/tmp/graft_stream_ckpt/warcgz-${System.nanoTime()}"
          val t0 = System.nanoTime()
          val q = StreamOps.warcGzRecordStream(spark, warcChunkStream(warcIn))
            .toDF()
            .writeStream.format("noop").trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt).start()
          q.awaitTermination()
          "warc_gz_reassemble_tws" -> nRecs / ((System.nanoTime() - t0) / 1e9)
        }
        val r = Seq(once(), once()).maxBy(_._2)
        println(f"[stream-bench] ${r._1}: ${r._2}%.0f records/sec ($nRecs records)")
        r
      }

    // w2 twin: the same chunk stream through the WET-conversion
    // processor — reassembly + framing + HTTP parse + x41 extraction +
    // WET re-frame + re-parse + payload CRC per record: the full
    // archive-conversion job as one stateful stream.
    val wetRow = if (only.nonEmpty && !only("wet_convert_tws")) None else Some {
      val (warcIn, nRecs) = stagedWarcChunks(32 * 1024)
      def once(): (String, Double) = {
        val ckpt = s"/tmp/graft_stream_ckpt/wet-${System.nanoTime()}"
        val t0 = System.nanoTime()
        val q = StreamOps.wetRecordStream(spark, warcChunkStream(warcIn))
          .toDF()
          .writeStream.format("noop").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt).start()
        q.awaitTermination()
        "wet_convert_tws" -> nRecs / ((System.nanoTime() - t0) / 1e9)
      }
      val r = Seq(once(), once()).maxBy(_._2)
      println(f"[stream-bench] ${r._1}: ${r._2}%.0f records/sec ($nRecs records)")
      r
    }
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    val qs = (results.flatten ++
      Seq(scd2, guard, qualityRow, paretoRow, htmlRow, blockRow,
        frontierRow, ingestRow, warcRow,
        warcSmallRow, warcGzRow, wetRow).flatten ++ funnelRows ++
      twsResults.flatten).map { case (k, v) => "\"" + k + "\":" + f"$v%.0f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_events_per_sec","rows":$n,"ops":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
