package graft.streaming

import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING CDC UPSERT — the merge-on-read twin of batch q116
  * ([[Sources.upsert]] applied continuously): a stream of change rows
  * (key columns, payload, monotone version, tombstone flag) maintains
  * a queryable latest-wins table as bucket-partitioned parquet.
  *
  * Design for scale (the reason this is not "read table, union batch,
  * rewrite table"):
  *
  *  - The snapshot is hash-bucketed on the merge key
  *    (`__bucket = pmod(hash(keys), buckets)`) and stored as a
  *    partitioned parquet table. Each micro-batch computes the
  *    buckets its keys touch, reads ONLY those partitions (partition
  *    pruning — the scan never opens untouched buckets), merges with
  *    the same map-side `max_by` aggregate as the batch upsert, and
  *    rewrites only those partitions (dynamic partition overwrite).
  *    Per-batch work is O(touched buckets), not O(table): a 0.1 %
  *    change batch against a 100 TB table moves ~0.1 % of the bytes.
  *
  *  - TOMBSTONES ARE RETAINED in the stored snapshot (the upsert runs
  *    WITHOUT the tombstone filter); [[snapshot]] filters them at
  *    read — merge-on-read. Dropping them physically would let an
  *    at-least-once source resurrect a deleted key by redelivering an
  *    older version; against a retained tombstone the late row loses
  *    the max_by and the delete stays won. Tombstone GC is a
  *    compaction-time policy (drop tombstones older than the source's
  *    redelivery horizon), same as any log-structured store.
  *
  *  - RECOVERY = REPLAY + IDEMPOTENT MERGE, not sink-side batch
  *    skipping: re-merging the same change rows is a no-op (max_by
  *    over duplicated rows picks the same winner), so a batch replayed
  *    after a crash — even against buckets it already half-updated —
  *    converges to the same table. The foreachBatch sink needs no
  *    commit coordination with the checkpoint.
  *
  * Reference behavior mirrored: the upsert consumers in the
  * reference's mongo pipelines (infrastructure/mongodb/init-db.js
  * upsert writes) applied continuously rather than per-collection
  * batch jobs.
  */
object UpsertStream {

  val BucketCol = "__bucket"

  private def bucketOf(keys: Seq[String], buckets: Int) =
    pmod(hash(keys.map(col): _*), lit(buckets))

  /** Merge one change batch into the bucketed table at `tableDir`.
    * Public so a crashed batch can be re-driven (and specs can prove
    * idempotence) without a streaming harness. */
  def applyBatch(batch: DataFrame, tableDir: String, keys: Seq[String],
      versionCol: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.withColumn(BucketCol, bucketOf(keys, buckets)).persist()
    try {
      if (!b.isEmpty) { // idle triggers and replayed empties are no-ops
        val touched = b.select(BucketCol).distinct().collect().map(_.getInt(0))
        val existing =
          if (new java.io.File(tableDir).exists())
            spark.read.parquet(tableDir)
              // partition pruning: only the touched buckets are read
              .filter(col(BucketCol).isin(touched.map(Integer.valueOf).toSeq: _*))
          else b.limit(0)
        val merged = Sources.upsert(
          existing.unionByName(b), keys, versionCol, tombstoneCol = None)
          // sever the lineage from tableDir before writing INTO
          // tableDir (Spark rejects overwriting a path its plan reads);
          // materializes only the touched buckets' winners — O(batch)
          .localCheckpoint(false)
        merged.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(BucketCol)
          .parquet(tableDir)
      }
    } finally { b.unpersist(); () }
  }

  /** Start the continuous upsert: every micro-batch of `changes`
    * merges into `tableDir`. */
  def start(changes: DataFrame, tableDir: String, checkpoint: String,
      keys: Seq[String], versionCol: String, buckets: Int = 64): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, tableDir, keys, versionCol, buckets)
      }
      .start()

  /** The queryable latest-wins view: winners minus tombstones — what
    * batch q116 emits in one shot. */
  def snapshot(spark: SparkSession, tableDir: String, tombstoneCol: String): DataFrame =
    spark.read.parquet(tableDir)
      .filter(!coalesce(col(tombstoneCol), lit(false)))
      .drop(tombstoneCol, BucketCol)
}
