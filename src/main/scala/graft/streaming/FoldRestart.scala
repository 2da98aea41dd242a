package graft.streaming

/** Restart-safety guard for the JVM-state fold family (advisor r12).
  *
  * Every fold in this package wires `foreachBatch` under a Structured
  * Streaming checkpoint, but its STATE lives in the JVM (a driver map
  * or a session-pinned frame), not in the checkpoint. On a restart
  * with the same checkpoint dir, the source resumes PAST the committed
  * batches — correct only if the fold's state already contains them.
  * A fresh fold object pointed at a used checkpoint would silently
  * undercount, and nothing enforced the documented rebuildFrom recipe
  * until now. This guard makes the recipe an API-boundary invariant:
  * at start(), a checkpoint with committed batches + an EMPTY fold is
  * either rebuilt from the caller-supplied landed corpus or refused
  * loudly — never resumed blind. */
object FoldRestart {

  /** True iff the checkpoint dir records at least one committed batch
    * (the `offsets/` write-ahead log is the first thing a micro-batch
    * commit creates, so its non-emptiness is the resume marker). */
  private[streaming] def hasCommittedBatches(checkpoint: String): Boolean = {
    val offsets = new java.io.File(checkpoint, "offsets")
    offsets.isDirectory &&
      Option(offsets.listFiles()).exists(_.nonEmpty)
  }

  /** Call at the top of a fold's start(). `hasState` = does THIS fold
    * object already hold folded state (the live-continuation case,
    * which may resume); `rebuild` = the rebuildFrom closure over the
    * caller's landed corpus, invoked iff the checkpoint shows progress
    * the empty fold does not have. No landed corpus supplied → throw
    * rather than undercount.
    *
    * CONTRACT on `landed` (advisor r16): it must reflect only
    * MARKER-COMMITTED batches — rebuildFrom resets the fold's batch-id
    * guard, so the stream's re-delivery of its last UNcommitted batch
    * folds again on top of the rebuilt state. That is correct exactly
    * when the re-delivered rows are absent from `landed`, which is
    * what an exactly-once sink gives for free: reading the landed
    * corpus through its `_spark_metadata` commit log (how Spark reads
    * a streaming file sink) exposes committed files only. Feeding a
    * raw directory listing (or any at-least-once sink) here double
    * counts the re-delivered tail — for a SUM-shaped fold that is a
    * silently narrowed/shifted readout, not an error. */
  def guard(checkpoint: String, hasState: Boolean,
            rebuild: Option[() => Unit]): Unit =
    if (hasCommittedBatches(checkpoint) && !hasState)
      rebuild match {
        case Some(r) => r()
        case None => throw new IllegalStateException(
          s"checkpoint '$checkpoint' has committed batches but this " +
            "fold holds no state — resuming would silently skip those " +
            "batches. Pass the landed corpus (start(events, checkpoint, " +
            "landed = Some(df))) to rebuild, or use a fresh checkpoint " +
            "dir.")
      }
}
