package graft

import org.apache.spark.sql.SparkSession

/** Pre-run schema-contract gate shared by [[Bench]] and [[Verify]] —
  * the r10 drift incident (a regenerated `events.ts` encoding broke 40
  * queries, every one surfacing as its own cryptic failure) promoted to
  * a guard: p11's metadata-only audit runs BEFORE the first query, and
  * a breaking contract violation aborts the run with the drifted column
  * named in one line. Cost is O(columns) footer reads — noise next to
  * either main's own work.
  *
  * Escape hatch: `SPARK_GRAFT_SKIP_GATE=1` runs anyway (for the session
  * where the contract ITSELF is being updated to follow intentional
  * drift — the gate names the rows it would have blocked, then
  * proceeds).
  */
object Gate {
  def schemaContract(spark: SparkSession, sfDir: String): Unit = {
    val drift =
      try etl.Projections.contractViolations(spark, sfDir)
      catch { case e: Throwable =>
        // the gate must never be the thing that breaks a run on its own
        System.err.println(s"[gate] schema audit itself failed (continuing): ${e.getMessage}")
        Seq.empty
      }
    if (drift.nonEmpty) {
      val skip = sys.env.contains("SPARK_GRAFT_SKIP_GATE")
      val verdict = if (skip) "SKIP_GATE set — continuing anyway"
                    else "aborting before any query runs"
      System.err.println(s"[gate] schema contract violated at $sfDir — $verdict:")
      drift.foreach(d => System.err.println(s"[gate]   $d"))
      if (!skip) {
        spark.stop()
        sys.exit(2)
      }
    }
  }
}
