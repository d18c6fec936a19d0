package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once output adapters.
  *
  * The built-in file sink is exactly-once via its manifest log, but it only
  * appends. For sinks that need overwrite/upsert shapes (or non-file targets
  * fronted by a table format), the standard Spark recipe is `foreachBatch` +
  * an IDEMPOTENT write keyed by `batchId`: Structured Streaming replays a
  * batch with the SAME id after a failure between sink write and commit, so
  * a write that lands each batch in its own `batch_id` partition with
  * dynamic partition overwrite converts the at-least-once `foreachBatch`
  * contract into exactly-once output (the replay overwrites its own
  * partition instead of appending duplicates).
  *
  * This is also the Iceberg deployment shape: swap the parquet write for
  * `df.writeTo(table).overwritePartitions()` — identical idempotence
  * reasoning, no plan changes (the sandbox has no Iceberg jar; see
  * SURVEY.md §7.5).
  */
object Sinks {

  /** `stream.writeStream.foreachBatch(Sinks.idempotentParquet(dir)).start()`
    * — exactly-once parquet output under batch replays.
    */
  def idempotentParquet(outDir: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.withColumn("batch_id", lit(batchId))
        .write
        .mode("overwrite")
        // scoped to this write: only the partitions present in the batch are
        // replaced — i.e. exactly this batch's own partition
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outDir)
}
