package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input hygiene — at corpus scale some fraction of every JSON
  * feed is broken, and the pipeline must quarantine it without failing the
  * job or silently dropping rows. Pins Spark's PERMISSIVE-mode contract at
  * both layers the engine uses: the JSONL file source (corrupt line →
  * `_corrupt_record`, good fields null) and the column-level `from_json`
  * (corrupt payload → null struct), so a filter on the corrupt marker
  * cleanly splits quarantine from parsed rows.
  */
class JsonRobustnessSpec extends SparkSpec {

  test("file source quarantines corrupt JSONL lines without losing good rows") {
    val dir = tempSfDir()
    Files.writeString(Paths.get(s"$dir/docs.jsonl"),
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2, "text": "unterminated
        |{"doc_id": 3, "text": "another good row"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/docs.jsonl")
      .cache() // SPARK-21610: corrupt-record column needs full-row parse
    try {
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2)
      assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      assert(bad.count() == 2, "both broken lines quarantined, none dropped")
      // quarantined rows keep the raw line for replay/debugging
      assert(bad.select("_corrupt_record").collect()
        .exists(_.getString(0).contains("not json at all")))
    } finally df.unpersist()
  }

  test("from_json yields null structs for corrupt payloads, parsed structs otherwise") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    val rows = Seq(
      (1L, """{"k": 7}"""),
      (2L, """{"k": broken"""),
      (3L, """{"k": 9}"""))
      .toDF("id", "payload")
      .withColumn("parsed", from_json(col("payload"), schema))
    val ok = rows.filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
    assert(ok.select("parsed.k").collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 9L))
    assert(rows.filter(col("parsed").isNull || col("parsed.k").isNull).count() == 1)
  }
}
