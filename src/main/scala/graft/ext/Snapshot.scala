package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus snapshot diff — the audit op between two crawl versions: which
  * documents were added, removed, changed, or untouched since the last
  * snapshot. Production runs it before every incremental ingest (d18's
  * batch IS "added ∪ changed") and after every re-crawl, because a
  * curator signs off on a dataset VERSION, and the sign-off question is
  * always "what moved since v(n-1)?".
  *
  * 100 TB shape: document CONTENT never shuffles — each side reduces to
  * (doc_id, source, fp) with a 16-hex md5 prefix fingerprint at the scan
  * (the d2 device), and the single wide movement is the full-outer
  * doc_id join of two fingerprint frames, which AQE can skew-split and
  * which becomes zero-Exchange when both snapshots are stored bucketed
  * by doc_id (sources/Sources.writeBucketed — the layout an ingest
  * pipeline would persist anyway for d18).
  */
object Snapshot {

  /** 16-hex md5 prefix of the text — collision odds ~1e-10 at 10^9 docs
    * per the birthday bound on 64 bits, and a collision only mislabels
    * one `changed` doc `unchanged`; same prefix width as d2/d19/d21. */
  private def fp(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"),
      substring(md5(col("text").cast("binary")), 1, 16).as("fp"))

  /** Per-document diff status between two (doc_id, source, text)
    * snapshots: one row per doc_id present in EITHER side, with status
    * `added` (new only), `removed` (old only), `changed` (both, text
    * fingerprint differs) or `unchanged`. `source` comes from the side
    * that still has the doc (new wins when both do — a doc can change
    * source between crawls, and the current snapshot is the truth). */
  def diffStatus(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    fp(oldDocs).as("o")
      .join(fp(newDocs).as("n"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n.source"), col("o.source")).as("source"),
        when(col("o.fp").isNull, "added")
          .when(col("n.fp").isNull, "removed")
          .when(col("o.fp") =!= col("n.fp"), "changed")
          .otherwise("unchanged").as("status"))

  /** The report a curator reads: per (source, status) doc counts. */
  def diffReport(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    diffStatus(oldDocs, newDocs)
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("status"))

  /** Constants shared with the oracle SQL: the deterministic slices that
    * simulate two crawl versions of the one testdata corpus. Docs with
    * id ≡ OldDrop (mod Mod) are missing from the OLD snapshot (→ added),
    * id ≡ NewDrop are missing from the NEW (→ removed), and id ≡ 0
    * (mod ChangeMod) carry edited text in the new snapshot (→ changed). */
  private[ext] val Mod = 5
  private[ext] val OldDrop = 4
  private[ext] val NewDrop = 3
  private[ext] val ChangeMod = 11

  /** D26 — registered snapshot diff over the simulated crawl pair. */
  def d26SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % Mod =!= OldDrop)
    val neu = docs.filter(col("doc_id") % Mod =!= NewDrop)
      .withColumn("text",
        when(col("doc_id") % ChangeMod === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    diffReport(old, neu)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d26_snapshot_diff" -> d26SnapshotDiff
  )

  val oracle: Map[String, String] = Map(
    "d26_snapshot_diff" ->
      s"""WITH o AS (
        |  SELECT doc_id, source, substr(md5(text), 1, 16) AS fp
        |  FROM documents WHERE doc_id % $Mod != $OldDrop),
        |n AS (
        |  SELECT doc_id, source,
        |    substr(md5(CASE WHEN doc_id % $ChangeMod = 0
        |                    THEN text || ' v2' ELSE text END), 1, 16) AS fp
        |  FROM documents WHERE doc_id % $Mod != $NewDrop),
        |d AS (
        |  SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
        |    coalesce(n.source, o.source) AS source,
        |    CASE WHEN o.fp IS NULL THEN 'added'
        |         WHEN n.fp IS NULL THEN 'removed'
        |         WHEN o.fp != n.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n USING (doc_id))
        |SELECT source, status, count(*) AS n_docs
        |FROM d GROUP BY source, status ORDER BY source, status""".stripMargin
  )
}
