package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** D33' — streaming CDC apply: the snapshot MERGE verb run continuously.
  * Each micro-batch is a changeset (op ∈ upsert/delete, the d33 wire
  * shape) applied to the maintained snapshot through the SAME
  * [[graft.ext.Snapshot.mergeSnapshot]] kernel the batch query uses —
  * the d18'/w6'/w8' discipline: one merge definition, two execution
  * modes, parity pinned on the same rows.
  *
  * Sequencing semantics are CDC's: batches apply IN ORDER, so a later
  * batch's upsert of an id wins over an earlier one — which is exactly
  * what distinguishes this from one bulk merge of the concatenated
  * deltas (where same-id conflicts would collapse by content
  * fingerprint instead of arrival order). mergeSnapshot is idempotent
  * under replay of the SAME changeset, but a re-delivered foreachBatch
  * id must still not re-apply — an upsert replayed AFTER a later
  * delete of the same id would resurrect the row — so the body carries
  * the batchId guard (the QuantileStreamFold device).
  *
  * Scale shape per batch: unchanged from d33 — the touched-id set
  * broadcasts into a left-anti over the base, the snapshot never
  * shuffles, cost O(base scan + |delta|). Here the base materializes
  * per batch via localCheckpoint (truncating the merge lineage, which
  * would otherwise deepen by one plan per batch until analysis cost
  * dominates); a production deployment writes a bucketed table behind
  * s17's write-audit-publish rename instead — same kernel, durable
  * base. */
class CdcApplySink(initial: DataFrame) extends Serializable {

  @volatile private var current: DataFrame = initial.localCheckpoint(true)
  private var lastBatchId = -1L

  /** The maintained snapshot after every changeset applied so far. */
  def snapshot: DataFrame = current

  /** The foreachBatch body: apply unless this batchId already applied. */
  def onBatch(delta: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= lastBatchId) return
    if (!delta.isEmpty)
      current = graft.ext.Snapshot.mergeSnapshot(current, delta)
        .localCheckpoint(true)
    lastBatchId = batchId
  }

  /** Wire a changeset stream into the sink. */
  def start(deltas: DataFrame, checkpoint: String): StreamingQuery =
    deltas.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
}
