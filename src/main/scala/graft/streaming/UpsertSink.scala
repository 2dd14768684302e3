package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MergeUpsert

/** Streaming MERGE sink: maintain a keyed parquet snapshot from a stream
  * of upserts via `foreachBatch` — the pattern that turns an append-only
  * event stream into a continuously-current table without a lakehouse
  * format (the reference's closest analog is its full-refresh JDBC
  * overwrite per run, reference `include/scripts/to_bronze.py:41-50`;
  * this is the incremental version).
  *
  * Each micro-batch is deduplicated on the merge keys (at-least-once
  * sources redeliver; callers needing last-wins ORDER within a batch
  * should pre-sort/sequence upstream, see `MergeUpsert.applyChanges`) and
  * full-outer-merged into the snapshot. The merged result is eagerly
  * `localCheckpoint`ed BEFORE the overwrite so reading and rewriting the
  * same path is safe, then the blocks are released.
  *
  * == Scale design ==
  * foreachBatch is exactly-once per epoch (checkpointed offsets + the
  * overwrite is idempotent for the same batch). At 100 TB the snapshot
  * rewrite becomes the bottleneck — partition the snapshot and rewrite
  * only partitions the batch touches (merge-on-read); the full-overwrite
  * here is the bounded-snapshot form.
  */
object UpsertSink {

  def start(stream: DataFrame, targetPath: String, keys: Seq[String],
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, targetPath, keys)
      }
      .start()

  /** One micro-batch merge (factored out for direct spec coverage). */
  def applyBatch(batch: Dataset[Row], targetPath: String,
      keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(keys)
    val target =
      try Some(spark.read.parquet(targetPath))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val merged = target match {
      case Some(t) => MergeUpsert.upsert(t, deduped, keys)
      case None => deduped
    }
    // materialize before overwriting the files the plan reads from
    val out = merged.localCheckpoint(true)
    out.write.mode(SaveMode.Overwrite).parquet(targetPath)
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(out)
  }
}
