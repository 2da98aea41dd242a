package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

/** Exact-dedup's UNBOUNDED-horizon streaming twin — the state shape
  * `dropDuplicatesWithinWatermark` cannot give: watermark dedup holds
  * per-key state and only within the lateness horizon, so a duplicate
  * arriving a day after its original sails through, and widening the
  * horizon grows state with the key cardinality. This fold instead
  * holds ONE fixed-size Bloom filter over everything ever seen — state
  * is `bits` forever, however long the stream runs and however many
  * distinct documents pass (the streaming counterpart of d35's
  * Bloom-prune strategy, and the same `spark.util.sketch.BloomFilter`).
  *
  * Scale shape per micro-batch: survivors are selected by broadcasting
  * the CURRENT filter and testing `mightContain` DISTRIBUTED (a map
  * filter — rows never collect); the batch's own fingerprints then fold
  * into the filter via `DataFrame.stat.bloomFilter`, a distributed
  * mergeable aggregate — only the fixed-size per-partition filters ride
  * to the driver, never the fingerprints (the MisraGries/MgStreamFold
  * discipline applied to set membership). Within-batch duplicates are
  * collapsed by a batch-local `dropDuplicates` BEFORE the filter test,
  * so the op is exact within a batch and Bloom-approximate across
  * batches.
  *
  * Approximation contract (the Bloom guarantee, inverted by the use):
  * a TRUE duplicate is ALWAYS dropped (no false negatives in
  * `mightContain`), while a genuinely-new document is spuriously
  * dropped with probability ≤ fpp — the right trade for training-data
  * dedup, where a duplicate shipped poisons the corpus but a clean doc
  * dropped at 1e-4 merely shrinks it.
  *
  * Restart note: like [[MgStreamFold]], the filter is driver state
  * outside the streaming checkpoint; recovery is one distributed
  * `bloomFilter` aggregate over the landed (already-deduped) corpus —
  * order-independent by mergeability, pinned ≡ continuous in
  * StreamingSpec.
  */
class BloomStreamDedup(expectedItems: Long, fpp: Double) extends Serializable {
  private var filter: BloomFilter = BloomFilter.create(expectedItems, fpp)

  /** Fold one micro-batch: return the (materialized) survivors whose
    * `key` column has never been seen — batch-locally exact,
    * cross-batch Bloom-approximate — and absorb their fingerprints into
    * the running filter. The foreachBatch body, also directly
    * unit-testable on static frames. Returns a frame, never collected
    * rows: survivors flow to a distributed sink, not the driver. */
  def foldBatch(batch: DataFrame, key: String): DataFrame = {
    val f = synchronized(filter)
    val bc = batch.sparkSession.sparkContext.broadcast(f)
    val mightContain =
      udf((k: String) => k != null && bc.value.mightContainString(k))
    // Eager localCheckpoint: the survivor set is consumed twice (filter
    // build + sink) and must be decided against ONE filter snapshot.
    val fresh = batch.dropDuplicates(key).filter(!mightContain(col(key)))
      .localCheckpoint(true)
    val batchFilter = fresh.stat.bloomFilter(key, expectedItems, fpp)
    synchronized { filter.mergeInPlace(batchFilter) }
    fresh
  }

  /** Current membership probe — exposed for specs and serving. */
  def seen(key: String): Boolean = synchronized(filter.mightContainString(key))

  /** Rebuild the filter from the landed corpus (the restart recipe):
    * one distributed aggregate, no driver-side row traffic. */
  def rebuildFrom(landed: DataFrame, key: String): Unit = synchronized {
    filter = landed.stat.bloomFilter(key, expectedItems, fpp)
  }

  /** Wire a streaming frame into the fold, landing survivors via the
    * supplied sink callback (typically a parquet append — the S5
    * micro-batch sink discipline). */
  def start(docs: DataFrame, key: String, checkpoint: String)
           (sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(foldBatch(batch.toDF(), key))
      }
      .start()
}
