package graft

import org.apache.spark.sql.SparkSession

/** Session construction with the engine's standard configs in ONE place.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` must be set when the session is
  * BUILT: the events table stores TIMESTAMP(NANOS) parquet, which Spark's
  * microsecond TimestampType cannot scan without it, and mutating session
  * config inside a table loader mid-query is a race against concurrent
  * queries on the same session. Shuffle partitions are sized to the core
  * count (local mode) — on a real cluster you'd size them to data volume
  * (~128 MB per partition) and let AQE coalesce.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write timestamps as TIMESTAMP(MICROS), not the deprecated INT96
      // default: INT96 chunks carry NO min/max statistics, so every
      // timestamp-clustered layout the engine writes would be
      // footer-unprunable (s19's audit found this — a by-ts layout
      // whose files cannot be pruned BY ts); micros also matches the
      // driver testdata's own encoding
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Managed (e.g. bucketed) tables land in tmp, not the launch cwd;
      // pid-suffixed so concurrent JVMs (Verify ∥ Bench) never collide.
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")
      // The generated-code cache (source → compiled class) defaults to
      // 100 entries — a ~260-query workload has thousands of distinct
      // codegen units, so with the default every re-planned query
      // re-runs janino compilation (pure DRIVER-side latency, paid
      // again at every scale; r21 A/B at sf0.1: suite total-min
      // 121.3 s → 100.6 s, median per-query ratio 0.889, identical
      // results). Static conf: must be set at session build.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false")
}

/** Locale-proof float rendering for probe/bench JSON artifacts: the
  * f-interpolator honors the DEFAULT locale, so a comma-decimal host
  * would emit 0,123 and invalidate the JSON (advisor r13). */
object J {
  def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
}
