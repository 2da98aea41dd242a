package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.TextStats

/** T24′ — live hashed-LM training, the streaming twin of t24: the
  * bucketed count tables maintained as fold state while the corpus
  * streams in. Two properties make this the RIGHT op to run live
  * where the exact LM (t22) could never be:
  *
  *  - the state is BOUNDED BY CONSTRUCTION — Bu + Bb longs (the d20
  *    device), the same footprint after ten documents or ten trillion;
  *    an exact-vocabulary fold would grow without bound, which is the
  *    very wall t24 removed from the batch tier;
  *  - bucket counts are an ADDITIVE MONOID over disjoint batches, so
  *    per-batch counts (computed by the SAME frame-level kernel the
  *    batch op uses, [[TextStats.hashedLmCountsOf]]) fold into the
  *    running tables order-free and EXACTLY: fold ≡ batch train at
  *    every point in the stream — no approximation, no decay.
  *
  * [[serve]] scores any docs frame against the CURRENT model through
  * the shared report tail ([[TextStats.hashedLmReport]]) — the model
  * is the state; scoring is stateless. The daily-crawl loop this
  * implements: documents land continuously, the quality-filter LM is
  * always current, and no serving pass ever pays a training scan.
  *
  * foreachBatch re-delivery drops by batchId (the QuantileStreamFold
  * device); a used checkpoint with an empty fold refuses or rebuilds
  * via [[FoldRestart.guard]] like every fold here. */
class HashedLmFold(uniBuckets: Int = TextStats.T24UniBuckets,
                   biBuckets: Int = TextStats.T24BiBuckets)
    extends Serializable {

  private val uniC = new Array[Long](uniBuckets)
  private val biC = new Array[Long](biBuckets)
  private var lastBatchId = -1L
  private val instanceId = HashedLmFold.ids.incrementAndGet()

  /** The foreachBatch body: fold unless this batchId already folded. */
  def onBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= lastBatchId) return
    if (!batch.isEmpty) {
      val (u, b) = TextStats.hashedLmCountsOf(batch, uniBuckets, biBuckets)
      var i = 0
      while (i < u.length) { uniC(i) += u(i); i += 1 }
      i = 0
      while (i < b.length) { biC(i) += b(i); i += 1 }
    }
    lastBatchId = batchId
  }

  /** Score `docs` under the model as trained SO FAR — identical to
    * batch t24 trained on everything folded to this point. The scorer
    * registers under a per-(instance, state-version) name: the tables
    * snapshot (clone) rides the registration, so a later batch cannot
    * rebind an earlier, still-unexecuted served frame. */
  def serve(spark: SparkSession, docs: DataFrame): DataFrame =
    synchronized {
      TextStats.hashedLmReport(spark, docs, uniC.clone(), biC.clone(),
        s"t24fold_${instanceId}_b$lastBatchId")
    }

  /** Rebuild from a landed corpus in one shot (the restart recipe —
    * exact, because the fold IS the batch kernel's sum). */
  def rebuildFrom(docs: DataFrame): Unit = synchronized {
    java.util.Arrays.fill(uniC, 0L)
    java.util.Arrays.fill(biC, 0L)
    lastBatchId = -1L
    onBatch(docs, 0L)
  }

  def start(docs: DataFrame, checkpoint: String,
            landed: Option[DataFrame] = None): StreamingQuery = {
    FoldRestart.guard(checkpoint, lastBatchId >= 0,
      landed.map(df => () => rebuildFrom(df)))
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .start()
  }
}

object HashedLmFold {
  private val ids = new AtomicLong(0L)
}
