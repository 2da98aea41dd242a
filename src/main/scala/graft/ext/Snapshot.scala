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

  /** D44 — moved-content detection between snapshots: documents whose
    * TEXT survives a re-crawl under a DIFFERENT doc_id (URL churn, site
    * migrations, mirror swaps). d26 joins by doc_id and calls such a
    * pair "removed + added"; joining by content FINGERPRINT instead
    * classifies it "moved" — the distinction matters because moved
    * content should keep its dedup/quality verdicts and its training
    * history, while genuinely-new content re-enters the pipeline from
    * the start. Per fingerprint present in either side: `moved` (in
    * both, id sets differ), `stable` (in both, same id set), `gone` /
    * `new` (one side only).
    *
    * 100 TB shape: the d26 discipline on a different key — each side
    * reduces at the scan to (fp, id-set checksum, count) via map-side-
    * combined aggregates (text never shuffles; the per-fp buffer is a
    * sum/count, not an id list), and the single wide op is the fp
    * equi-join of two fingerprint-keyed aggregate frames, AQE-
    * splittable like any skewed equi-join (a boilerplate fp shared by
    * millions of docs is one aggregate row per side, not a join
    * blowup). */
  def movedContentDf(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def byFp(df: DataFrame) = df
      .select(substring(md5(col("text").cast("binary")), 1, 16).as("fp"),
        col("doc_id"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    byFp(oldDocs).as("o").join(byFp(newDocs).as("n"), Seq("fp"), "full_outer")
      .select(col("fp"),
        when(col("o.n").isNull, "new")
          .when(col("n.n").isNull, "gone")
          .when(col("o.n") === col("n.n") &&
            col("o.id_sum") === col("n.id_sum") &&
            col("o.min_id") === col("n.min_id") &&
            col("o.max_id") === col("n.max_id"), "stable")
          .otherwise("moved").as("status"))
  }

  /** Registered d44 — the simulated crawl pair (the d26 slices, plus an
    * id-shift band that REHOMES surviving docs: ids ≡ MoveTag (mod
    * MoveMod) keep their text under doc_id + MoveOffset), reported as
    * per-status fingerprint counts. */
  private[ext] val MoveMod = 7
  private[ext] val MoveTag = 2
  private[ext] val MoveOffset = 40000000L

  def d44MovedContent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % Mod =!= OldDrop)
    val neu = docs.filter(col("doc_id") % Mod =!= NewDrop)
      .withColumn("doc_id",
        when(col("doc_id") % MoveMod === MoveTag,
          col("doc_id") + lit(MoveOffset)).otherwise(col("doc_id")))
    movedContentDf(old, neu)
      .groupBy(col("status")).agg(count(lit(1)).as("n_fps"))
      .orderBy(col("status"))
  }

  /** MERGE a changeset into a corpus snapshot — the WRITE verb beside
    * d26's audit: `delta` rows carry op = 'upsert' (insert-or-replace by
    * doc_id) or 'delete' (tombstone; its non-key columns may be null).
    * An id appearing as both resolves to the upsert — the tombstone only
    * suppresses the BASE row, which makes the op idempotent under delta
    * replay.
    *
    * 100 TB shape: the realistic delta (a daily incremental crawl) is
    * orders of magnitude smaller than the snapshot, so the touched-id
    * set BROADCASTS and the base side is one scan + per-row anti filter —
    * the snapshot never shuffles, text moves only inside the delta
    * union. Cost O(|base| scan + |delta|), the MERGE INTO shape a table
    * format executes; drop the broadcast hint if a delta ever reaches
    * corpus scale and AQE plans the anti join as a shuffle. */
  def mergeSnapshot(base: DataFrame, delta: DataFrame): DataFrame = {
    val touched = delta.select(col("doc_id")).distinct()
    // A delta carrying TWO upserts for one id (two fetches of one URL in
    // a single changeset) must not leave duplicate keys in the snapshot
    // — SQL MERGE errors on multiple source matches; here the collision
    // resolves deterministically to the greatest content fingerprint
    // (arbitrary but stable — a real pipeline orders by a version
    // column instead). The fingerprint alone ties when both texts are
    // NULL or byte-identical while other columns differ, so the
    // remaining columns break the tie — without them row_number()==1
    // is partition-order-dependent across runs. The window runs over
    // the DELTA only.
    val one = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(md5(col("text").cast("binary")).desc_nulls_last,
        col("n_chars").desc_nulls_last,
        col("lang").asc_nulls_last, col("source").asc_nulls_last)
    val upserts = delta.filter(col("op") === "upsert").drop("op")
      .withColumn("rn", row_number().over(one))
      .filter(col("rn") === 1).drop("rn")
    base.join(broadcast(touched), Seq("doc_id"), "left_anti")
      .unionByName(upserts)
  }

  /** Constants shared with the d33 oracle: upserts re-text docs ≡ UpMod,
    * inserts clone docs ≡ InsMod under +InsOffset ids, deletes tombstone
    * docs ≡ DelMod. */
  private[ext] val UpMod = 7
  private[ext] val InsMod = 13
  private[ext] val DelMod = 9
  private[ext] val InsOffset = 10000000L

  /** D33 — registered merge: the simulated changeset applied to the
    * corpus, reported per source (counts + chars + id/text checksums, so
    * the oracle proves the merged MEMBERSHIP and CONTENT, not just
    * totals). */
  def d33MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val upserts = docs.filter(col("doc_id") % UpMod === 1)
      .withColumn("text", concat(col("text"), lit(" merged")))
      .withColumn("n_chars", col("n_chars") + lit(7L))
    val inserts = docs.filter(col("doc_id") % InsMod === 0)
      .withColumn("doc_id", col("doc_id") + lit(InsOffset))
    val deletes = docs.filter(col("doc_id") % DelMod === 2)
      .select(col("doc_id"),
        lit(null).cast("string").as("text"), lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("source"), lit(null).cast("long").as("n_chars"))
    val delta = upserts.withColumn("op", lit("upsert"))
      .unionByName(inserts.withColumn("op", lit("upsert")))
      .unionByName(deletes.withColumn("op", lit("delete")))
    mergeSnapshot(docs, delta)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("doc_id")).as("id_checksum"),
        min(substring(md5(col("text").cast("binary")), 1, 16)).as("min_fp"))
      .orderBy(col("source"))
  }

  /** Attribute fingerprint for SCD no-op suppression: md5 over the
    * tracked columns with an unprintable separator so ("ab","c") can't
    * collide with ("a","bc"); nulls coalesce to '' (the wsTokens
    * discipline) so a null attribute hashes identically on both
    * engines. */
  private def scdAttrFp: org.apache.spark.sql.Column =
    md5(concat_ws("\u0001",
      coalesce(col("lang"), lit("")), coalesce(col("source"), lit("")),
      coalesce(col("n_chars").cast("string"), lit(""))))

  /** Slowly-changing-dimension Type 2 maintenance — the versioned twin
    * of d33's overwrite MERGE: instead of replacing a row, an attribute
    * change EXPIRES the current version (valid_to=version,
    * is_current=false) and appends a new open one, so every historical
    * state stays queryable ("what was this doc's metadata when we
    * trained v3?"). `changes` carries op ∈ {upsert, delete}; an upsert
    * whose tracked attributes equal the current row's is suppressed
    * (no spurious version), which also makes changeset REPLAY
    * idempotent — the property SnapshotSpec pins.
    *
    * 100 TB shape: the daily changeset is orders of magnitude smaller
    * than the dimension, so every wide op here is DELTA-sized — the
    * dimension itself never shuffles. Pass 1 classifies each current
    * row by one broadcast hash join against the keyed changeset
    * (expire / pass through). Pass 2 decides inserts: the current
    * rows' fingerprints for CHANGED keys only (a broadcast left-semi
    * prune of the dimension — delta-sized output) join back to the
    * upserts, keeping those that are new keys or real attribute
    * changes. History rows pass through untouched. Cost: two narrow
    * dimension scans + delta-sized joins, the same budget d33 pays. */
  def scdApply(dim: DataFrame, changes: DataFrame, version: Long): DataFrame = {
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val ch = changes.withColumn("ch_fp", scdAttrFp)
    val chKeyed = ch.select(col("doc_id").as("ch_id"), col("op"), col("ch_fp"))
    val expire = col("op").isNotNull &&
      (col("op") === "delete" || col("ch_fp") =!= scdAttrFp)
    val curOut = cur.join(broadcast(chKeyed), col("doc_id") === col("ch_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("valid_from"),
        when(expire, lit(version)).otherwise(col("valid_to")).as("valid_to"),
        (!expire).as("is_current"))
    val curTouchedFp = cur
      .join(broadcast(chKeyed.filter(col("op") === "upsert").select(col("ch_id"))),
        col("doc_id") === col("ch_id"), "left_semi")
      .select(col("doc_id").as("cur_id"), scdAttrFp.as("cur_fp"))
    val inserts = ch.filter(col("op") === "upsert")
      .join(broadcast(curTouchedFp), col("doc_id") === col("cur_id"), "left")
      .filter(col("cur_fp").isNull || col("cur_fp") =!= col("ch_fp"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        lit(version).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    hist.unionByName(curOut).unionByName(inserts)
  }

  /** Constants shared with the d39 oracle: attribute changes hit ids
    * ≡ ScdChTag (mod ScdUpMod), no-op upserts ≡ ScdNoopTag, deletes
    * ≡ ScdDelTag (mod ScdDelMod, excluded from the upsert sets so the
    * changeset keys are unique), inserts clone ids ≡ ScdInsTag (mod
    * ScdInsMod) under +ScdInsOffset. */
  private[ext] val ScdUpMod = 7
  private[ext] val ScdChTag = 3
  private[ext] val ScdNoopTag = 5
  private[ext] val ScdDelMod = 9
  private[ext] val ScdDelTag = 4
  private[ext] val ScdInsMod = 13
  private[ext] val ScdInsTag = 6
  private[ext] val ScdInsOffset = 20000000L

  /** D39 — registered SCD2 run: documents as the version-1 dimension
    * (tracked attrs lang/source/n_chars), the simulated changeset
    * applied at version 2, reported per (source, is_current) with id /
    * valid_from / valid_to / chars checksums so the oracle proves
    * membership, content, and version stamps — including that no-op
    * upserts minted NO new version. */
  def d39Scd2(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val dim = docs
      .withColumn("valid_from", lit(1L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val deletes = docs.filter(col("doc_id") % ScdDelMod === ScdDelTag)
      .select(col("doc_id"),
        lit(null).cast("string").as("lang"), lit(null).cast("string").as("source"),
        lit(null).cast("long").as("n_chars"), lit("delete").as("op"))
    val changed = docs
      .filter(col("doc_id") % ScdDelMod =!= ScdDelTag &&
        col("doc_id") % ScdUpMod === ScdChTag)
      .withColumn("n_chars", col("n_chars") + lit(100L))
      .withColumn("op", lit("upsert"))
    val noops = docs
      .filter(col("doc_id") % ScdDelMod =!= ScdDelTag &&
        col("doc_id") % ScdUpMod === ScdNoopTag)
      .withColumn("op", lit("upsert"))
    val inserts = docs.filter(col("doc_id") % ScdInsMod === ScdInsTag)
      .withColumn("doc_id", col("doc_id") + lit(ScdInsOffset))
      .withColumn("op", lit("upsert"))
    val changeset = deletes.unionByName(changed).unionByName(noops)
      .unionByName(inserts)
    scdApply(dim, changeset, 2L)
      .groupBy(col("source"), col("is_current"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_sum"),
        sum(col("valid_from")).as("vf_sum"),
        sum(coalesce(col("valid_to"), lit(0L))).as("vt_sum"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy(col("source"), col("is_current"))
  }

  /** D40 — order-independent table checksum, the RECONCILIATION verb:
    * "are these two copies of a 100 TB table identical?" answered by
    * exchanging O(|sources|) rows instead of either copy. Each row
    * collapses to a 60-bit md5-prefix fingerprint at the scan (text
    * never moves — the d2/d26 discipline), then per source three
    * commutative aggregates: count, XOR of fingerprints, and a
    * mod-prime fingerprint sum. XOR alone is blind to an even number
    * of repeats of the same row; the additive mod-sum alone wraps —
    * together a mismatch of either count, multiset, or content flips
    * at least one. All three are map-side-combinable and
    * ORDER-INDEPENDENT, so the checksum is invariant to partitioning,
    * row order, and engine — which is the whole point: the DuckDB
    * oracle replaying the same arithmetic over the same parquet IS a
    * cross-engine reconciliation run. The fingerprint sum stays
    * mod 1e9+7 so ~2^33 rows fit a BIGINT without overflow (ANSI-mode
    * Spark would throw on a raw 60-bit sum; wrap semantics would be
    * engine-specific).
    *
    * Row string: every column coalesced to '' (both engines would
    * otherwise SKIP a null in concat_ws, silently aligning "null lang"
    * with "empty lang") with an unprintable separator so adjacent
    * fields can't collide. */
  def d40TableChecksum(spark: SparkSession, dir: String): DataFrame =
    tableChecksum(Tables.documents(spark, dir))

  /** The checksum kernel over a caller-supplied documents-shaped frame
    * — split out so partition/order invariance and single-character
    * sensitivity pin on planted rows in SnapshotSpec. */
  def tableChecksum(docs: DataFrame): DataFrame = {
    val rowStr = concat_ws("\u0001",
      col("doc_id").cast("string"), coalesce(col("text"), lit("")),
      coalesce(col("lang"), lit("")), coalesce(col("source"), lit("")),
      coalesce(col("n_chars").cast("string"), lit("")))
    docs
      .withColumn("fp", conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(fp)").as("xor_fp"),
        sum(col("fp") % lit(1000000007L)).as("sum_fp_mod"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d26_snapshot_diff" -> d26SnapshotDiff,
    "d33_merge_upsert" -> d33MergeUpsert,
    "d39_scd2" -> d39Scd2,
    "d40_table_checksum" -> d40TableChecksum,
    "d44_moved_content" -> d44MovedContent
  )

  val oracle: Map[String, String] = Map(
    "d33_merge_upsert" ->
      s"""WITH touched AS (
        |  SELECT doc_id FROM documents WHERE doc_id % $UpMod = 1
        |  UNION SELECT doc_id + $InsOffset FROM documents WHERE doc_id % $InsMod = 0
        |  UNION SELECT doc_id FROM documents WHERE doc_id % $DelMod = 2),
        |kept AS (
        |  SELECT doc_id, text, source, n_chars FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM touched)),
        |ups AS (
        |  SELECT doc_id, text || ' merged' AS text, source,
        |    n_chars + 7 AS n_chars
        |  FROM documents WHERE doc_id % $UpMod = 1
        |  UNION ALL
        |  SELECT doc_id + $InsOffset, text, source, n_chars
        |  FROM documents WHERE doc_id % $InsMod = 0),
        |m AS (SELECT * FROM kept UNION ALL SELECT * FROM ups)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  min(substr(md5(text), 1, 16)) AS min_fp
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "d44_moved_content" ->
      s"""WITH o AS (
        |  SELECT substr(md5(text), 1, 16) AS fp,
        |    count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |    min(doc_id) AS min_id, max(doc_id) AS max_id
        |  FROM documents WHERE doc_id % $Mod != $OldDrop
        |  GROUP BY 1),
        |nw AS (
        |  SELECT substr(md5(text), 1, 16) AS fp,
        |    count(*) AS n,
        |    CAST(sum(CASE WHEN doc_id % $MoveMod = $MoveTag
        |                  THEN doc_id + $MoveOffset ELSE doc_id END)
        |         AS BIGINT) AS id_sum,
        |    min(CASE WHEN doc_id % $MoveMod = $MoveTag
        |             THEN doc_id + $MoveOffset ELSE doc_id END) AS min_id,
        |    max(CASE WHEN doc_id % $MoveMod = $MoveTag
        |             THEN doc_id + $MoveOffset ELSE doc_id END) AS max_id
        |  FROM documents WHERE doc_id % $Mod != $NewDrop
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(o.fp, nw.fp) AS fp,
        |    CASE WHEN o.n IS NULL THEN 'new'
        |         WHEN nw.n IS NULL THEN 'gone'
        |         WHEN o.n = nw.n AND o.id_sum = nw.id_sum
        |              AND o.min_id = nw.min_id AND o.max_id = nw.max_id
        |           THEN 'stable'
        |         ELSE 'moved' END AS status
        |  FROM o FULL OUTER JOIN nw ON o.fp = nw.fp)
        |SELECT status, count(*) AS n_fps
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    "d40_table_checksum" ->
      """WITH f AS (
        |  SELECT source,
        |    CAST(('0x' || substr(md5(
        |      concat_ws(chr(1),
        |        CAST(doc_id AS VARCHAR), coalesce(text, ''),
        |        coalesce(lang, ''), coalesce(source, ''),
        |        coalesce(CAST(n_chars AS VARCHAR), ''))
        |    ), 1, 15)) AS BIGINT) AS fp
        |  FROM documents)
        |SELECT source, count(*) AS n_rows,
        |  bit_xor(fp) AS xor_fp,
        |  CAST(sum(fp % 1000000007) AS BIGINT) AS sum_fp_mod
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "d39_scd2" ->
      s"""WITH survivors AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
        |    TRUE AS is_current
        |  FROM documents
        |  WHERE NOT (doc_id % $ScdDelMod = $ScdDelTag)
        |    AND NOT (doc_id % $ScdUpMod = $ScdChTag)),
        |expired AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(1 AS BIGINT), CAST(2 AS BIGINT), FALSE
        |  FROM documents
        |  WHERE doc_id % $ScdDelMod = $ScdDelTag
        |     OR (doc_id % $ScdUpMod = $ScdChTag
        |         AND doc_id % $ScdDelMod != $ScdDelTag)),
        |reversioned AS (
        |  SELECT doc_id, source, n_chars + 100,
        |    CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
        |  FROM documents
        |  WHERE doc_id % $ScdUpMod = $ScdChTag
        |    AND doc_id % $ScdDelMod != $ScdDelTag),
        |inserted AS (
        |  SELECT doc_id + $ScdInsOffset, source, n_chars,
        |    CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
        |  FROM documents WHERE doc_id % $ScdInsMod = $ScdInsTag),
        |dim AS (
        |  SELECT * FROM survivors UNION ALL SELECT * FROM expired
        |  UNION ALL SELECT * FROM reversioned UNION ALL SELECT * FROM inserted)
        |SELECT source, is_current, count(*) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(valid_from) AS BIGINT) AS vf_sum,
        |  CAST(sum(coalesce(valid_to, 0)) AS BIGINT) AS vt_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM dim GROUP BY source, is_current
        |ORDER BY source, is_current""".stripMargin,
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
