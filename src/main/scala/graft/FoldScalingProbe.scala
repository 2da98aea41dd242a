package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling receipts for the LARGEST-STATE streaming folds (r12 verdict
  * ask #8): a31' (per-(path, user) counts + 2-row/user carry), a30'
  * (per-user last-touch carry) and w13' (per-(series, hour) partials +
  * per-series pending carry). The batch ops they twin all carry 10×
  * alpha receipts; this probe closes the gap for the folds themselves.
  *
  * Shape: the corpus splits into 4 event_id-range batches (the folds'
  * per-user monotone-arrival contract), batches 1–3 fold to build up
  * REAL state, then the probe times (a) the LAST batch's fold — the
  * steady-state per-batch cost, paid against the largest state — and
  * (b) a serve. alpha = log10(tbig/tbase)/log10(ratio) per phase; the
  * fold-state designs are users- or series-bounded unions, so the
  * design target is alpha ≈ 1 for fold (batch and state both grow
  * ~linearly in the replica corpora) and ≤ 1 for serve. Batches are
  * localCheckpoint-pinned before the clock so scan cost never rides a
  * fold timing. */
object FoldScalingProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/sfx10"
    val ratio = if (args.length > 2) args(2).toDouble else 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def batchesOf(dir: String): Seq[DataFrame] = {
      val ev = Tables.events(spark, dir).select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val r = ev.agg(min(col("event_id")), max(col("event_id"))).head()
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      val step = (mx - mn) / 4 + 1
      (0 until 4).map(i =>
        ev.filter(col("event_id") >= mn + i * step &&
          col("event_id") < mn + (i + 1) * step).localCheckpoint(true))
    }

    def docBatchesOf(dir: String): Seq[DataFrame] = {
      val docs = Tables.documents(spark, dir).select(col("doc_id"),
        col("lang"), col("source"), col("n_chars"))
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      val step = (mx - mn) / 4 + 1
      (0 until 4).map(i =>
        docs.filter(col("doc_id") >= mn + i * step &&
          col("doc_id") < mn + (i + 1) * step).localCheckpoint(true))
    }

    /** The a35 fold's configured experiment start for a dir — the same
      * midpoint the batch op derives (the replica corpora duplicate
      * rows in time, so base and big agree on the day span). */
    def splitOf(dir: String): Long =
      Tables.events(spark, dir).agg(expr(
        "(min(unix_timestamp(ts) div 86400)" +
          " + max(unix_timestamp(ts) div 86400) + 1) div 2"))
        .head().getLong(0)

    // each entry: name -> (events|docs source, fresh fold as
    // (foldBatch, serveCount))
    def folds(split: Long): Seq[(String, String, (DataFrame => Unit, () => Long))] = Seq(
      ("a31_path_fold", "events", {
        val f = new streaming.PathStreamFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      ("a30_attribution_fold", "events", {
        val f = new streaming.AttributionStreamFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      ("w13_twap_fold", "events", {
        val f = new streaming.TwapStreamFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      // the r13 folds carry receipts from day one: w17' state is
      // users-bounded (compacted funnel frontier), d41' k-bounded
      ("w17_convlat_fold", "events", {
        val f = new streaming.ConversionLatencyFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve().count())
      }),
      ("d41_reservoir_fold", "docs", {
        val f = new streaming.ReservoirStreamFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      // the r14 folds: a35' state is users-bounded (pre/post cents
      // pairs), a36' is (users × metrics)-bounded counts
      ("a35_cuped_fold", "events", {
        val f = new streaming.CupedFold(split)
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      ("a36_panel_fold", "events", {
        val f = new streaming.MetricPanelFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serve(spark).count())
      }),
      // the SECONDARY serves off shared fold state (r14 verdict ask
      // #8): a34 serves KS off a33's per-user-cents state, a37 the
      // power/MDE card off a36's panel moments, a38 SRM off a32's
      // journeys — the folds' receipts above cover the state build;
      // these rows price the extra readout each shared state funds
      ("a34_ks_serve", "events", {
        val f = new streaming.MannWhitneyFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serveKs(spark).count())
      }),
      ("a37_mde_serve", "events", {
        val f = new streaming.MetricPanelFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serveMde(spark).count())
      }),
      ("a38_srm_serve", "events", {
        val f = new streaming.SeqAbStreamFold
        ((b: DataFrame) => f.foldBatch(b), () => f.serveSrm().count())
      }))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warmup: one full fold+serve cycle at base (codegen/JIT)
    locally {
      val bs = batchesOf(base); val ds = docBatchesOf(base)
      folds(splitOf(base)).foreach { case (_, src, (fold, serve)) =>
        (if (src == "docs") ds else bs).foreach(fold); serve()
      }
    }

    def measure(dir: String): Map[String, (Double, Double)] = {
      val bs = batchesOf(dir)
      val ds = docBatchesOf(dir)
      folds(splitOf(dir)).map { case (name, src, (fold, serve)) =>
        val batches = if (src == "docs") ds else bs
        batches.dropRight(1).foreach(fold)
        val tFold = timed(fold(batches.last))
        val tServe = timed(serve())
        name -> (tFold, tServe)
      }.toMap
    }

    val atBase = measure(base)
    val atBig = measure(big)
    val rows = folds(0L).map(_._1).map { n =>
      val (f1, s1) = atBase(n)
      val (fB, sB) = atBig(n)
      val aF = math.log10(fB / f1) / math.log10(ratio)
      val aS = math.log10(sB / s1) / math.log10(ratio)
      s"""{"fold":"$n","fold_t1x":${J.f3(f1)},"fold_tbig":${J.f3(fB)},"fold_alpha":${J.f2(aF)},"serve_t1x":${J.f3(s1)},"serve_tbig":${J.f3(sB)},"serve_alpha":${J.f2(aS)}}"""
    }
    println(rows.mkString("[", ",", "]"))
    spark.stop()
  }
}
