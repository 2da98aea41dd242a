package graft.ext

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-SESSION persistence for trained ANN index artifacts — the
  * j11/d18 ingest/serve split applied to the quantization family
  * (r12 verdict ask #3). The per-session memos in [[Similarity]] stop a
  * session from retraining an index per QUERY; this store stops a new
  * session (a new JVM: tomorrow's bench round, a fresh notebook, the
  * driver's Verify run after the Bench run) from retraining per
  * SESSION. At 100 TB the difference is the whole point of a lakehouse
  * index: k-means coarse training + a corpus-wide encode are a
  * scheduled ingest job, and every serving session from then on pays
  * one parquet scan.
  *
  * Layout: `<root>/<dirTag>_<fingerprint>/<artifact>/<part>/…parquet`.
  *
  *  - `root` defaults to `java.io.tmpdir/graft_index_store`; override
  *    with system property `graft.index.store` (specs point it at a
  *    scratch dir so store state can be controlled per test).
  *  - `fingerprint` hashes every (name, size, mtime) under the source
  *    table's path. The driver regenerates testdata between rounds;
  *    with the fingerprint in the KEY, a stale index is simply
  *    unreachable — there is no "is it fresh?" check to forget, the
  *    same device as content-addressed build caches.
  *  - publish is atomic: artifacts build in a `.tmp<pid>` sibling and
  *    a single directory rename makes them visible, so a concurrent
  *    builder in another process either wins the rename or discards
  *    its copy and reads the winner's — never a half-written index.
  *
  * [[builds]] records every actual training run; the IndexStoreSpec
  * "fresh session serves with zero training" pin reads it, which keeps
  * the no-retrain claim a TESTED property rather than a comment. */
object IndexStore {

  private def root: File = new File(
    sys.props.getOrElse("graft.index.store",
      sys.env.getOrElse("SPARK_GRAFT_INDEX_STORE",
        System.getProperty("java.io.tmpdir") + "/graft_index_store")))

  /** Marker written LAST inside the tmp dir, so after the rename its
    * presence proves every artifact under the published dir is
    * complete (parquet's own _SUCCESS only covers one frame). */
  private val OkMarker = "_GRAFT_OK"

  /** Training-run event log (artifact@dir). Appended ONLY when a build
    * closure actually executes — the observable the zero-retrain spec
    * pins. Bounded: one entry per (artifact, dataset fingerprint) per
    * process lifetime. */
  val builds = new java.util.concurrent.CopyOnWriteArrayList[String]()

  private def walk(f: File): Seq[File] =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .toSeq.sortBy(_.getName).flatMap(walk)
    else Seq(f)

  /** Content fingerprint of `<dir>/<table>.parquet` from file metadata
    * (names, sizes, mtimes) — cheap (one listing, no data read) and
    * changes whenever the driver rewrites the table. */
  private[graft] def fingerprint(dir: String, table: String): String = {
    val base = new File(dir, table + ".parquet")
    val sig = walk(base)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    f"${scala.util.hashing.MurmurHash3.stringHash(sig) & 0xffffffffL}%08x"
  }

  private def datasetRoot(dir: String, table: String): File =
    new File(root, Similarity.dirTag(dir) + "_" + fingerprint(dir, table))

  /** Serve the named artifact set for (dir, table): load it if a
    * complete publish exists, otherwise run `build` (the training
    * job), publish atomically, and load the published copy. Returns
    * sub-artifact name → DataFrame read FROM THE STORE — even the
    * builder session serves off the published files, so the serve
    * lineage is identical for builder and reader sessions (no
    * builder-only fast path to hide a broken store). */
  def loadOrBuild(spark: SparkSession, dir: String, table: String,
                  name: String)(build: => Seq[(String, DataFrame)])
      : Map[String, DataFrame] = {
    val path = new File(datasetRoot(dir, table), name)
    if (!new File(path, OkMarker).isFile) {
      builds.add(s"$name@$dir")
      val parts = build
      val tmp = new File(path.getParentFile,
        path.getName + ".tmp" + ProcessHandle.current().pid())
      parts.foreach { case (sub, df) =>
        df.write.mode("overwrite").parquet(new File(tmp, sub).getPath)
      }
      new java.io.FileOutputStream(new File(tmp, OkMarker)).close()
      path.getParentFile.mkdirs()
      if (!tmp.renameTo(path)) {
        // Lost the publish race (or a concurrent publish landed between
        // the check and here): the winner's copy is complete — discard
        // ours and serve theirs.
        deleteRecursively(tmp)
        if (!new File(path, OkMarker).isFile)
          sys.error(s"index publish failed for ${path.getPath}")
      }
    }
    val subs = Option(path.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory)
    subs.map(f => f.getName -> spark.read.parquet(f.getPath)).toMap
  }

  /** Drop every published index for (dir, table) — the store-side
    * companion of [[Similarity.invalidateCaches]] for callers that
    * rewrote a served dir in place (same mtime/size, e.g. a test
    * fixture) and need the fingerprint shortcut overridden. */
  def invalidate(dir: String, table: String): Unit =
    deleteRecursively(datasetRoot(dir, table))

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }
}
