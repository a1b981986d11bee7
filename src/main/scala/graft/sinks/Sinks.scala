package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sinks, batch and streaming — the counterpart of the reference's
  * `writeAsCsv(..., WriteMode.OVERWRITE).setParallelism(1)` and print sinks.
  */
object Sinks {

  /** Single-file CSV, like the reference's parallelism-1 CSV sink. The
    * coalesce(1) is the *sink's* constraint, applied after the computation
    * — upstream stages keep full parallelism, only the final write funnels
    * to one file. For cluster-scale outputs use `writeCsv` (one file per
    * partition) instead.
    */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").csv(path)

  /** Partitioned CSV output at full parallelism. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").csv(path)

  /** Append-mode streaming CSV sink with checkpointing — the unbounded twin
    * of the reference's CSV output.
    */
  def streamToCsv(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("csv")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** The reference's PrintSinkFunction analog. */
  def streamToConsole(df: DataFrame): StreamingQuery =
    df.writeStream.format("console").outputMode("append").start()

  /** Hive-style partitioned parquet: one directory per partition-column
    * value (`day=2024-01-01/...`). At fleet scale this IS the table layout —
    * readers with a partition-column predicate scan only matching
    * directories (partition pruning; see SinksSpec for the plan proof) and
    * backfills overwrite single partitions, not the table.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Streaming twin: partitioned parquet from an unbounded frame. */
  def streamToPartitionedParquet(df: DataFrame, path: String,
                                 checkpoint: String,
                                 partitionCols: Seq[String]): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append")
      .start()
}
