package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time a subset of SparkEntry queries (default: all), N iterations each —
  * the fast inner loop for performance work, forked with the same JVM flags
  * as the full bench. Usage: runMain graft.tools.BenchSome <sfDir> <iters> [names...]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(1)
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs: SPARK_GRAFT_CONF="k1=v1,k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(',')).map(_.split('=')).collect {
        case Array(k, v) => builder.config(k.trim, v.trim)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }

    // Bucketed-substrate mode (SPARK_GRAFT_BUCKETED=<db>): build
    // writeBucketedFacts' catalog tables in THIS session (the in-memory
    // catalog does not survive JVMs) and flip the Tables override, so the
    // timed queries read order-key/user-bucketed tables instead of parquet.
    // The build itself is excluded from every timing below — it is the
    // substrate a real deployment amortizes across thousands of queries.
    sys.env.get("SPARK_GRAFT_BUCKETED").foreach { db =>
      // The wipe below is recursive — an env value containing '/' or '..'
      // would walk outside the warehouse. Require a bare identifier before
      // constructing any path (Tables' databaseExists guard would only
      // catch a typo after the wipe already ran).
      require(db.matches("[A-Za-z0-9_]+"),
        s"SPARK_GRAFT_BUCKETED must be a bare database identifier " +
          s"([A-Za-z0-9_]+), got '$db'")
      // the warehouse DIRECTORY outlives the in-memory catalog, so a
      // fresh JVM's "overwrite" is really a CREATE that dies on the stale
      // LOCATION — wipe the db dir first (PlanAudit's idempotency fix).
      // Spark stores unquoted db names LOWERCASED, so the on-disk dir is
      // <warehouse>/<lowercase>.db whatever the env var's case.
      val wh = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"${db.toLowerCase(java.util.Locale.ROOT)}.db")
      if (java.nio.file.Files.exists(wh)) {
        val walk = java.nio.file.Files.walk(wh)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
      }
      graft.sinks.Sinks.writeBucketedFacts(spark, sfDir, db)
      spark.conf.set("spark.graft.bucketedDb", db)
      println(s"[bench-some] bucketed substrate '$db' built and active")
    }

    // Pass-structured like graft.Bench (iteration = one pass over the
    // query set) with the same cache discipline: per-query releaseAll,
    // per-pass releaseShared — so cross-query shared memos (d4 pairs /
    // d6 labels) help within a pass but every pass pays the build once
    // and per-pass minima stay honest.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
    (1 to iters).foreach { i =>
      selected.foreach { case (name, fn) =>
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        val watchdog = new Thread(() => {
          Thread.sleep(20000)
          if (!done.get()) dumpStacks(s"$name#$i")
        })
        watchdog.setDaemon(true)
        watchdog.start()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench-some] $name failed: ${e.getMessage}")
        } finally graft.CacheRegistry.releaseAll()
        done.set(true)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIMING $name#$i $sec%.2f s gc=${(gcMillis() - gc0) / 1000.0}%.2f s end=${System.currentTimeMillis()}")
      }
      graft.CacheRegistry.releaseShared()
    }
    spark.stop()
  }

  private def dumpStacks(tag: String): Unit = {
    import scala.jdk.CollectionConverters._
    val sb = new StringBuilder(s"==== WATCHDOG $tag ====\n")
    Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
      if (st.nonEmpty) {
        sb.append(s"-- ${t.getName} [${t.getState}]\n")
        st.take(16).foreach(f => sb.append(s"   at $f\n"))
      }
    }
    Seq("/proc/net/tcp", "/proc/net/tcp6").foreach { f =>
      try {
        sb.append(s"---- $f ----\n")
        sb.append(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f))))
      } catch { case _: Throwable => () }
    }
    sb.append(s"==== WATCHDOG $tag end ====\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/watchdog_${tag.replace('#', '_')}.txt"),
      sb.toString)
    System.err.println(s"WATCHDOG wrote /tmp/watchdog_${tag.replace('#', '_')}.txt")
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
}
