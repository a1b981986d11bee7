package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc w-family kernel timing (round-17 optimization work): the raw
  * single-threaded CPU cost of each container-pipeline stage outside any
  * Spark plan, so the operator timings decompose into kernel CPU vs
  * scheduling/shuffle/disk. Not part of the surface.
  */
object WProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val shards = docs.grouped(50).toArray
    shards.take(5).foreach(s => graft.sources.Warc.buildContainer(s))
    (1 to 2).foreach { round =>
      val containers = t(s"r$round build_plain_${shards.length}shards") {
        shards.map(s => graft.sources.Warc.buildContainer(s))
      }
      println("WPROBE total_bytes " + containers.map(_.length.toLong).sum)
      val gz = t(s"r$round build_gz") {
        shards.map(s => graft.sources.Warc.buildGzContainerWithCdx(s)._1)
      }
      t(s"r$round inflate") { gz.map(g => graft.sources.Warc.gunzipMembers(g)) }
      val recs = t(s"r$round parse_plain") {
        containers.map(c => graft.sources.Warc.parseWarc(c))
      }
      t(s"r$round http_split_verify") {
        recs.foreach(_.foreach { r =>
          graft.sources.Warc.parseHttpVerified(r)
        })
      }
    }
    // Spark-side decomposition of w4: staging write vs read-back, 32 cores
    val spark32 = {
      spark.stop()
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    spark32.sparkContext.setLogLevel("WARN")
    spark32.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"WSTAGE id=${si.stageId} tasks=${si.numTasks} " +
            f"dur=${dur.getOrElse(-1L)}%d ms name=${si.name.take(60)}")
        }
      })
    spark32.read.parquet(s"$dir/documents.parquet").count()
    (1 to 3).foreach { round =>
      val out = java.nio.file.Files.createTempDirectory("wprobe-").toString
      t(s"r$round stage_gz_write") {
        graft.sources.Warc.writeWarcFiles(spark32, dir, out, 50, gz = true)
      }
      t(s"r$round read_ingest_noop") {
        graft.sources.Warc.warcFileIngest(spark32, out)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"r$round read_ingest_sorted_noop") {
        graft.sources.Warc.warcFileIngest(spark32, out).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      val outPlain = java.nio.file.Files.createTempDirectory("wprobe-p-").toString
      t(s"r$round stage_plain_write") {
        graft.sources.Warc.writeWarcFiles(spark32, dir, outPlain, 50, gz = false)
      }
      val shm = new java.io.File("/dev/shm/wprobe-" + round)
      shm.mkdirs()
      t(s"r$round stage_gz_write_tmpfs") {
        graft.sources.Warc.writeWarcFiles(spark32, dir, shm.toString, 50, gz = true)
      }
    }
    // FS micro-bench: what does one staged-file commit cost on the Hadoop
    // local FS — create+write+close vs rename vs the checksum sidecar?
    locally {
      val bytes = Array.fill(250 * 1024)(42.toByte)
      val out = java.nio.file.Files.createTempDirectory("wprobe-fs-").toString
      val root0 = new org.apache.hadoop.fs.Path(out)
      val fs = root0.getFileSystem(spark32.sparkContext.hadoopConfiguration)
      val root = fs.makeQualified(root0)
      (1 to 2).foreach { round =>
        t(s"r$round fs_create_write_100") {
          (0 until 100).foreach { i =>
            val p = new org.apache.hadoop.fs.Path(root, s"probe-$round-$i.tmp")
            val os = fs.create(p, true)
            os.write(bytes); os.close()
          }
        }
        t(s"r$round fs_rename_100") {
          (0 until 100).foreach { i =>
            fs.rename(new org.apache.hadoop.fs.Path(root, s"probe-$round-$i.tmp"),
              new org.apache.hadoop.fs.Path(root, s"probe-$round-$i.dat"))
          }
        }
        val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
        raw.initialize(root.toUri, spark32.sparkContext.hadoopConfiguration)
        t(s"r$round raw_create_write_100") {
          (0 until 100).foreach { i =>
            val p = new org.apache.hadoop.fs.Path(root, s"raw-$round-$i.tmp")
            val os = raw.create(p, true)
            os.write(bytes); os.close()
          }
        }
        t(s"r$round raw_rename_100") {
          (0 until 100).foreach { i =>
            raw.rename(new org.apache.hadoop.fs.Path(root, s"raw-$round-$i.tmp"),
              new org.apache.hadoop.fs.Path(root, s"raw-$round-$i.dat"))
          }
        }
      }
    }
    spark32.stop()
  }
}
