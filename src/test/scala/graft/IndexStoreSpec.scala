package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{IndexStore, Similarity}

/** The cross-session index lifecycle (r12 verdict ask #3): training is
  * an INGEST job that runs once per dataset, and a fresh session — the
  * stand-in for tomorrow's JVM — serves from the published store with
  * ZERO training jobs. The detector is [[IndexStore.builds]], which
  * appends only when a training closure actually executes; a serve
  * path that silently retrains grows it and fails here. */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // Point the store at a scratch root owned by this test JVM, wiped at
  // class-load: every assertion below starts from a KNOWN-cold store
  // instead of whatever a previous run published to the default root.
  private val scratch = new File(
    System.getProperty("java.io.tmpdir"),
    s"graft_index_store_test_${ProcessHandle.current().pid()}")
  locally {
    def rm(f: File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete(): Unit
    }
    rm(scratch)
    sys.props("graft.index.store") = scratch.getPath
  }

  /** Each ANN family: session A trains + publishes; fresh session B
    * (new catalog, empty per-session memo) must produce the identical
    * result WITHOUT appending a build event. */
  private val served = Seq(
    "sim4_ivf_ann", "sim7_pq_ann", "sim16_ivfpq_ann", "sim21_int8_ann")

  served.foreach { q =>
    test(s"$q: fresh session serves from the store with zero training") {
      val sA = spark.newSession()
      val before = IndexStore.builds.size
      val r1 = Similarity.queries(q)(sA, dir).collect().toSeq
      assert(IndexStore.builds.size > before,
        s"$q: cold store did not trigger a training run")
      val sB = spark.newSession()
      val mid = IndexStore.builds.size
      val r2 = Similarity.queries(q)(sB, dir).collect().toSeq
      assert(IndexStore.builds.size == mid,
        s"$q: a FRESH session retrained instead of loading the store — " +
          IndexStore.builds.toArray.drop(mid).mkString(", "))
      assert(r1 == r2,
        s"$q: stored-index serve diverged from the training session")
    }
  }

  test("publish is complete-or-invisible: the OK marker gates loading") {
    // after the serves above, each artifact dir carries the marker
    val dsRoots = Option(scratch.listFiles()).getOrElse(Array.empty[File])
    assert(dsRoots.nonEmpty, "no dataset root published")
    val artifacts = dsRoots.flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty[File]))
      .filter(_.isDirectory)
    assert(artifacts.nonEmpty)
    artifacts.foreach { a =>
      assert(new File(a, "_GRAFT_OK").isFile,
        s"published artifact ${a.getName} lacks the completeness marker")
      assert(!a.getName.contains(".tmp"),
        s"tmp build dir leaked into the store: ${a.getName}")
    }
  }

  test("dataset fingerprint tracks the table's files — a rewritten " +
    "dataset gets a NEW key instead of a stale index") {
    // a private copy of the table whose mtime this test may mutate
    val dataDir = new File(scratch, "fp_probe_data")
    val tbl = new File(dataDir, "embeddings.parquet")
    tbl.mkdirs()
    val src = new File(dir, "embeddings.parquet")
    val srcFile = if (src.isFile) src
      else src.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(srcFile.toPath,
      new File(tbl, "part-0.parquet").toPath)
    val fp1 = IndexStore.fingerprint(spark, dataDir.getPath, "embeddings")
    assert(new File(tbl, "part-0.parquet")
      .setLastModified(System.currentTimeMillis() + 123456))
    val fp2 = IndexStore.fingerprint(spark, dataDir.getPath, "embeddings")
    assert(fp1 != fp2, "fingerprint ignored an mtime change")
  }

  test("publish race: when another publisher wins between check and " +
    "rename, the winner's copy is served and the loser's is discarded") {
    import org.apache.spark.sql.DataFrame
    // the build closure itself publishes the SAME artifact first — a
    // deterministic stand-in for a concurrent process winning the race
    // in the check→build→rename window
    val out: Map[String, DataFrame] =
      IndexStore.loadOrBuild(spark, dir, "embeddings", "race_probe") {
        IndexStore.loadOrBuild(spark, dir, "embeddings", "race_probe") {
          Seq("x" -> spark.range(5).toDF("v")) // the winner's content
        }
        Seq("x" -> spark.range(99).toDF("v")) // the loser's content
      }
    // losing the rename must mean SERVING THE WINNER — not an error,
    // and never the loser's divergent copy
    assert(out("x").count() == 5,
      "race loser's copy leaked into the store")
    // the loser's tmp build dir must not linger beside the artifact
    val dsRoots = Option(scratch.listFiles()).getOrElse(Array.empty[File])
    val leftovers = dsRoots.flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty[File]))
      .filter(_.getName.contains(".tmp"))
    assert(leftovers.isEmpty,
      s"tmp dirs leaked: ${leftovers.map(_.getName).mkString(", ")}")
  }

  test("sim23: an appended batch delta-encodes into the published " +
    "store — no retraining on a warm base, and the maintained index " +
    "verifies against the full frozen-centroid encode") {
    val sA = spark.newSession()
    // warm the base index (published by the earlier sim4 test or here)
    Similarity.queries("sim4_ivf_ann")(sA, dir).collect()
    val before = IndexStore.builds.size
    val r1 = Similarity.queries("sim23_incremental_ivf")(sA, dir)
      .collect().toSeq
    val newEntries = IndexStore.builds.toArray.drop(before).map(_.toString)
    assert(newEntries.forall(_.contains("delta")),
      s"maintenance ran a NON-delta build: ${newEntries.mkString(", ")}")
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getBoolean(3), "encode_match false: incremental ≠ full encode")
      assert(r.getBoolean(4), "serve_match false: maintained index serves differently")
    }
    // a FRESH session serves base + delta with zero builds of any kind
    val sB = spark.newSession()
    val mid = IndexStore.builds.size
    val r2 = Similarity.queries("sim23_incremental_ivf")(sB, dir)
      .collect().toSeq
    assert(IndexStore.builds.size == mid,
      "a fresh session rebuilt instead of loading base + delta: " +
        IndexStore.builds.toArray.drop(mid).mkString(", "))
    assert(r1 == r2, "store-served maintenance card diverged")
  }

  test("sim23/PQ: an appended batch delta-encodes against the " +
    "PUBLISHED codebooks — zero retraining, union ≡ full re-encode") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    val idx = Similarity.pqIndexFor(s, dir) // store-served books
    val before = IndexStore.builds.size
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    // the sim23 planted-append device: tail re-keyed, dims rolled
    val batch = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"),
        concat(expr("slice(embedding, 2, size(embedding) - 1)"),
          expr("slice(embedding, 1, 1)")).as("embedding"))
    val delta = Similarity.pqEncode(
      Similarity.pqNormalize(batch), idx.codebooks)
    val union = idx.codes.select(col("vec_id"), col("code"))
      .unionByName(delta.select(col("vec_id"), col("code")))
    val full = Similarity.pqEncode(
      Similarity.pqNormalize(emb.unionByName(batch)), idx.codebooks)
    def codeMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(codeMap(union) == codeMap(full),
      "delta-encoded codes diverge from a full re-encode on frozen books")
    assert(IndexStore.builds.size == before,
      "the PQ delta path ran a store build: " +
        IndexStore.builds.toArray.drop(before).mkString(", "))
  }

  test("sim23: an index maintained by delta-appends serves at " +
    "scorecard grade — recall@10 vs brute force over the full corpus") {
    import org.apache.spark.sql.functions._
    // sf0.1 — the SF the sim20 serving bar is defined at (probed: at
    // sf0.01's 200-vector/16-cell regime even the FULL-trained index
    // serves 0.4 at nProbe 3; the bar is a serving-scale property)
    val d01 = "/root/testdata/sf0.1"
    val raw = graft.Tables.embeddings(spark, d01)
    val emb = raw.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId * 4 / 5
    // quantizer trained on the first 80% ONLY; the last 20% arrives as
    // an append and is encoded against the frozen centroids — the
    // sim20 discipline then demands the maintained index still serve
    val baseIdx = Similarity.ivfIndex(
      raw.filter(col("vec_id") <= cut), Similarity.Sim4K)
    val delta = Similarity.ivfAssign(
      emb.filter(col("vec_id") > cut), baseIdx.centers)
    val maintained = Similarity.IvfIndex(
      baseIdx.assigned.select(col("vec_id"), col("emb"), col("cell"))
        .unionByName(delta.select(col("vec_id"), col("emb"), col("cell"))),
      baseIdx.centers)
    val got = Similarity.ivfServe(spark, maintained, queryVecId = 0L,
      nProbe = 3).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val brute = Similarity.queries("sim1_cosine_topk")(spark, d01)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.6,
      s"maintained-index recall@10 $recall below the sim20 serving bar")
  }

  test("sim24: the forget set publishes as a tombstone artifact — no " +
    "retraining on a warm base, a fresh session serves the tombstoned " +
    "index with zero builds, and the card's flags verify") {
    val sA = spark.newSession()
    Similarity.queries("sim4_ivf_ann")(sA, dir).collect() // warm base
    val before = IndexStore.builds.size
    val r1 = Similarity.queries("sim24_ann_forget")(sA, dir)
      .collect().toSeq
    val newEntries = IndexStore.builds.toArray.drop(before).map(_.toString)
    assert(newEntries.forall(_.contains("tombstones")),
      s"the forget path ran a NON-tombstone build: ${newEntries.mkString(", ")}")
    assert(r1.nonEmpty, "empty forget card — the mod-101 set missed")
    r1.foreach { r =>
      assert(r.getBoolean(4), "conservation false: after ≠ base − tombstoned")
      assert(r.getBoolean(5), "purge_clean false: a forgotten id is still serveable")
    }
    // a FRESH session (tomorrow's JVM) anti-joins the published
    // tombstones with zero builds of any kind — the compliance
    // deadline is a parquet read, not a training job
    val sB = spark.newSession()
    val mid = IndexStore.builds.size
    val r2 = Similarity.queries("sim24_ann_forget")(sB, dir)
      .collect().toSeq
    assert(IndexStore.builds.size == mid,
      "a fresh session rebuilt instead of loading base + tombstones: " +
        IndexStore.builds.toArray.drop(mid).mkString(", "))
    assert(r1 == r2, "store-served forget card diverged")
  }

  test("sim25: compaction is the ONLY build on a warm lifecycle " +
    "(base + delta + tombstones already published), a fresh session " +
    "serves the compacted generation with zero builds, flags verify") {
    val sA = spark.newSession()
    // warm the full lifecycle the compaction folds: base index, the
    // sim23 delta, the sim24 tombstones
    Similarity.queries("sim23_incremental_ivf")(sA, dir).collect()
    Similarity.queries("sim24_ann_forget")(sA, dir).collect()
    val before = IndexStore.builds.size
    val r1 = Similarity.queries("sim25_index_compaction")(sA, dir)
      .collect().toSeq
    val newEntries = IndexStore.builds.toArray.drop(before).map(_.toString)
    assert(newEntries.forall(_.contains("compacted")),
      s"compaction ran a NON-compaction build: ${newEntries.mkString(", ")}")
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getBoolean(5), "conservation false")
      assert(r.getBoolean(6), "compact_match false: generation ≠ composed view")
      assert(r.getBoolean(7), "serve_match false: one-scan serve diverged")
    }
    // tomorrow's JVM reads the generation; no union, no anti-join, no
    // build of any kind
    val sB = spark.newSession()
    val mid = IndexStore.builds.size
    val r2 = Similarity.queries("sim25_index_compaction")(sB, dir)
      .collect().toSeq
    assert(IndexStore.builds.size == mid,
      "a fresh session rebuilt instead of loading the compacted " +
        "generation: " + IndexStore.builds.toArray.drop(mid).mkString(", "))
    assert(r1 == r2, "store-served compaction card diverged")
  }

  test("store speaks Hadoop FileSystem, not java.io.File: a non-file: " +
    "scheme root publishes, gates on the marker, and serves retrain-free") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftProbeFileSystem].getName)
    val backing = new File(scratch.getPath + "_scheme")
    val saved = sys.props("graft.index.store")
    sys.props("graft.index.store") = "graftfs://" + backing.getPath
    try {
      val sA = spark.newSession()
      val before = IndexStore.builds.size
      val r1 = Similarity.queries("sim7_pq_ann")(sA, dir).collect().toSeq
      assert(IndexStore.builds.size > before,
        "cold scheme store did not trigger a training run")
      val sB = spark.newSession()
      val mid = IndexStore.builds.size
      val r2 = Similarity.queries("sim7_pq_ann")(sB, dir).collect().toSeq
      assert(IndexStore.builds.size == mid,
        "a fresh session retrained instead of loading the scheme store")
      assert(r1 == r2,
        "scheme-store serve diverged from the training session")
      // the publish really went through the registered FS: its backing
      // dir exists, carries the marker, and no tmp dir leaked
      assert(backing.isDirectory, "scheme store published nothing")
      val artifacts = Option(backing.listFiles()).getOrElse(Array.empty)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[File]))
        .filter(_.isDirectory)
      assert(artifacts.nonEmpty)
      artifacts.foreach { a =>
        assert(new File(a, "_GRAFT_OK").isFile,
          s"scheme-published ${a.getName} lacks the completeness marker")
        assert(!a.getName.contains(".tmp"),
          s"tmp build dir leaked into the scheme store: ${a.getName}")
      }
    } finally sys.props("graft.index.store") = saved
  }

  test("invalidate() drops the published set and the next serve retrains") {
    IndexStore.invalidate(spark, dir, "embeddings")
    val s = spark.newSession()
    val before = IndexStore.builds.size
    Similarity.queries("sim21_int8_ann")(s, dir).collect()
    assert(IndexStore.builds.size > before,
      "invalidate() did not force a rebuild")
  }

  test("a stray .tmp child inside a published artifact (a pre-sweep " +
    "binary's lost race, advisor r14) is not read as a sub-artifact") {
    IndexStore.loadOrBuild(spark, dir, "embeddings", "tmp_probe") {
      Seq("x" -> spark.range(4).toDF("v"))
    }
    // plant the advisor's debris: an empty tmp dir beside the real
    // sub-artifact, inside the PUBLISHED path
    val published = Option(scratch.listFiles()).get
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[File]))
      .filter(_.getName.startsWith("tmp_probe_v"))
    assert(published.nonEmpty, "tmp_probe not published")
    published.foreach(p => assert(new File(p, "tmp_probe_v2.tmp999").mkdirs()))
    val s = spark.newSession()
    val out = IndexStore.loadOrBuild(s, dir, "embeddings", "tmp_probe") {
      sys.error("stray tmp child forced a rebuild")
    }
    assert(out.keySet == Set("x"),
      s"stray tmp child surfaced as a sub-artifact: ${out.keySet}")
    assert(out("x").count() == 4)
  }

  test("fingerprint on a missing table is a benign constant, and " +
    "invalidate on it is a no-op (advisor r14) — not a throw") {
    assert(IndexStore.fingerprint(spark, scratch.getPath, "no_such_table")
      == "absent00")
    IndexStore.invalidate(spark, scratch.getPath, "no_such_table")
  }

  test("d49 card persists cross-session (r14 ask #2): a fresh session " +
    "serves the scorecard from the store with ZERO builds") {
    val sA = spark.newSession()
    val before = IndexStore.builds.size
    val r1 = graft.ext.Dedup.queries("d49_dedup_scorecard")(sA, dir)
      .collect().toSeq
    assert(IndexStore.builds.toArray.drop(before)
      .exists(_.toString.startsWith("d49card@")),
      "cold store did not build+publish the card")
    val sB = spark.newSession()
    val mid = IndexStore.builds.size
    val r2 = graft.ext.Dedup.queries("d49_dedup_scorecard")(sB, dir)
      .collect().toSeq
    assert(IndexStore.builds.size == mid,
      "a fresh session re-ran the brute-truth build instead of " +
        "loading the published card: " +
        IndexStore.builds.toArray.drop(mid).mkString(", "))
    assert(r1 == r2, "store-served card diverged from the build session")
  }

  // ---- sim31 retrain COMMIT (r17 verdict ask #1) ----------------------
  // A private store root, shared by the two tests below (the second
  // consumes the committed state the first publishes) and restored
  // after each so no other suite inherits a committed generation.
  private val commitStore = new File(scratch.getPath + "_commit")
  locally {
    def rm(f: File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete(): Unit
    }
    rm(commitStore)
  }

  private def inCommitStore[A](body: => A): A = {
    val saved = sys.props("graft.index.store")
    sys.props("graft.index.store") = commitStore.getPath
    try body finally sys.props("graft.index.store") = saved
  }

  test("sim31: the retrain COMMIT promotes the priced what-if " +
    "generation to the served index — reusing the what-if artifact " +
    "(the ONLY build is the generation publish), sweeping exactly the " +
    "declared superseded set, cutting the serve path over atomically, " +
    "idempotent on re-run, and a fresh session serves gen2 with zero " +
    "builds") {
    inCommitStore {
      val sA = spark.newSession()
      // warm the FULL pre-commit lifecycle the commit retires: base
      // index, sim23 delta, sim24 tombstones, sim25 compacted
      // generation, and the sim30-priced what-if candidate
      graft.ext.Similarity.queries("sim23_incremental_ivf")(sA, dir).collect()
      graft.ext.Similarity.queries("sim24_ann_forget")(sA, dir).collect()
      graft.ext.Similarity.queries("sim25_index_compaction")(sA, dir).collect()
      graft.ext.Similarity.queries("sim30_retrain_whatif")(sA, dir).collect()
      // plant a NON-DEFAULT-PARAMETER maintenance artifact (r18 verdict
      // ask #3): a delta published with a batch size no registered verb
      // uses — the commit derives its superseded set from the store
      // LISTING by generation prefix, so this must be retired too (the
      // old hardcoded suffix list would have orphaned it)
      IndexStore.loadOrBuild(sA, dir, "embeddings", "ivf_k16_delta_b7") {
        import sA.implicits._
        Seq("assigned" -> Seq((0L, 0)).toDF("vec_id", "cell"))
      }
      // ...and one named with an OLD k (advisor r19): if the corpus
      // grew between generations so cellsFor changed, gen1 artifacts
      // keyed on the old k are just as superseded — the commit's
      // derived filter matches ANY ivf_k<digits> name, not only the
      // current k's
      IndexStore.loadOrBuild(sA, dir, "embeddings", "ivf_k9_delta_b3") {
        import sA.implicits._
        Seq("assigned" -> Seq((0L, 0)).toDF("vec_id", "cell"))
      }
      val before = IndexStore.builds.size
      val r1 = graft.ext.Similarity.queries("sim31_retrain_commit")(sA, dir)
        .collect().toSeq
      val newBuilds = IndexStore.builds.toArray.drop(before).map(_.toString)
      // the commit priced as a RENAME: the what-if training is reused,
      // so the only builds are the gate's persisted verdict row (r19
      // ask #3 — the one sketch pass, published so no later session
      // repeats it), the committed-generation publish, and the
      // transition receipt (the audit artifact — no training in any)
      assert(newBuilds.toSeq ==
        Seq(s"spectrum_verdict@$dir", s"ivf_g2_k16@$dir",
          s"ivf_g2_k16_receipt@$dir"),
        s"commit ran more than the verdict+generation+receipt publish: ${newBuilds.mkString(", ")}")
      // flags ride every census row:
      // (cell, n_total, n_reused, n_reencoded, first_commit,
      //  whatif_reused, swept_now, superseded_gone, priced_match,
      //  serve_match, spectrum_top1_share, spectrum_pr)
      val f = r1.head
      assert(f.getBoolean(4), "first_commit false on a cold commit")
      assert(f.getBoolean(5),
        "whatif_reused false — the commit retrained what sim30 priced")
      assert(f.getInt(6) == 6,
        "expected exactly base+delta_b5+delta_b7(planted)+" +
          "delta_b3(planted old-k)+tombstones+compacted swept, " +
          s"got ${f.getInt(6)}")
      assert(f.getBoolean(7), "superseded artifacts still present after gc")
      assert(f.getBoolean(8),
        "priced_match false: committed current-half ≠ the what-if sim30 scored")
      assert(f.getBoolean(9), "serve_match false: session still serves the old generation")
      // the sim32 gate's measured geometry rides into the receipt: a
      // healthy corpus reads a sub-collapse share and PR past d/8
      assert(f.getDouble(10) > 0.0 && f.getDouble(10) < 0.5,
        s"gate top1_share out of healthy band: ${f.getDouble(10)}")
      assert(f.getDouble(11) > 8.0,
        s"gate participation_ratio reads collapsed: ${f.getDouble(11)}")
      // census conservation: cells partition the corpus; reused +
      // re-encoded = total per cell
      r1.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
      assert(r1.map(_.getLong(1)).sum ==
        graft.ext.Similarity.corpusSize(sA, dir))
      // the store now holds EXACTLY the committed generation + the
      // reused what-if — the retired set is gone, nothing else was
      // collateral damage
      val dsRoot = Option(commitStore.listFiles()).get.filter(_.isDirectory)
      assert(dsRoot.length == 1)
      val artifacts = dsRoot.head.listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      assert(artifacts == Set("ivf_g2_k16_v2", "ivf_whatif_g2_k16_v2",
        "ivf_g2_k16_receipt_v2", "spectrum_verdict_v2"),
        s"unexpected store contents after commit: $artifacts")
      // tomorrow's JVM serves the committed generation with ZERO builds
      val sB = spark.newSession()
      val mid = IndexStore.builds.size
      val idx = graft.ext.Similarity.ivfIndexFor(sB, dir, 16)
      assert(idx.assigned.count() == graft.ext.Similarity.corpusSize(sB, dir))
      assert(IndexStore.builds.size == mid,
        "a fresh session rebuilt instead of serving the committed " +
          "generation: " + IndexStore.builds.toArray.drop(mid).mkString(", "))
      // ...and what it serves IS the committed artifact, row for row
      val committed = IndexStore.loadIfPublished(sB, dir, "embeddings",
        "ivf_g2_k16").get
      def idsOf(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cell")
      assert(idsOf(idx.assigned).except(idsOf(committed("assigned"))).isEmpty &&
        idsOf(committed("assigned")).except(idsOf(idx.assigned)).isEmpty,
        "fresh-session serve diverged from the committed artifact")
      // idempotent re-run: zero builds, nothing swept, census identical
      val r2 = graft.ext.Similarity.queries("sim31_retrain_commit")(sB, dir)
        .collect().toSeq
      assert(IndexStore.builds.size == mid,
        "a re-run commit rebuilt something: " +
          IndexStore.builds.toArray.drop(mid).mkString(", "))
      val f2 = r2.head
      assert(!f2.getBoolean(4) && f2.getBoolean(5) && f2.getInt(6) == 0 &&
        f2.getBoolean(7) && f2.getBoolean(8) && f2.getBoolean(9),
        s"re-run flags drifted: $f2")
      def census(rows: Seq[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(census(r1) == census(r2), "commit census not idempotent")
      // census budget (the PlanSpec device, kept here so the commit's
      // store side effects stay inside this private root): the SERVED
      // card is one map-side-combined occupancy agg + the broadcast
      // flag row + the output order — 3 shuffle exchanges at most
      val served = graft.ext.Similarity.queries("sim31_retrain_commit")(sB, dir)
      served.collect()
      // final AQE section only (the printed tree appends the pre-AQE
      // "Initial Plan", which would double-count every exchange)
      val plan = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange ") && !l.contains("BroadcastExchange"))
      assert(exchanges <= 3, s"sim31 card plan widened ($exchanges):\n$plan")
      // AUDIT AT PUBLISH, SERVE THE RECEIPT (r18 verdict ask #1): once
      // a session has read the transition receipt, warm CONSTRUCTION
      // of the card runs ZERO spark jobs — occupancy rides the
      // memoized gen2 view and the flags ride the session memo,
      // validated by one job-free marker probe. The old serve path ran
      // four bidirectional excepts over the full assignment plus the
      // split agg and footer reads (17 jobs measured); pin near zero.
      val jobCount = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(): Unit
        }
      }
      sB.sparkContext.addSparkListener(listener)
      try {
        graft.ext.Similarity.queries("sim31_retrain_commit")(sB, dir)
        // the listener bus is async: wait until the count is stable
        // across two consecutive polls (bounded at ~5 s)
        var last = -1
        var stable = 0
        var waited = 0
        while (stable < 2 && waited < 50) {
          Thread.sleep(100)
          waited += 1
          val now = jobCount.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally sB.sparkContext.removeSparkListener(listener)
      assert(jobCount.get() <= 2,
        s"warm sim31 construction ran ${jobCount.get()} jobs — the " +
          "commit-time audits or the receipt re-read are back on the " +
          "serve path (expected 0: memoized view + memoized flags)")
      // CRASH-WINDOW RE-ATTEMPT (r18 advisor, medium): a crash between
      // the committed publish and the sweep leaves the receipt
      // unpublished — simulate it by deleting the receipt and planting
      // a leftover gen1 artifact. The next run must RE-ATTEMPT the
      // audit + sweep (not report superseded_gone vacuously), collect
      // the leftover, and republish the receipt.
      def rmrf(fl: File): Unit = {
        if (fl.isDirectory)
          Option(fl.listFiles()).getOrElse(Array.empty[File]).foreach(rmrf)
        fl.delete(): Unit
      }
      rmrf(new File(dsRoot.head, "ivf_g2_k16_receipt_v2"))
      IndexStore.loadOrBuild(sB, dir, "embeddings", "ivf_k16_delta_b9") {
        import sB.implicits._
        Seq("assigned" -> Seq((0L, 0)).toDF("vec_id", "cell"))
      }
      val sC = spark.newSession()
      val r3 = graft.ext.Similarity.queries("sim31_retrain_commit")(sC, dir)
        .collect().toSeq
      val f3 = r3.head
      assert(!f3.getBoolean(4), "re-attempt misread as a first commit")
      assert(f3.getInt(6) == 1,
        s"re-attempt swept ${f3.getInt(6)} artifacts, expected exactly " +
          "the planted leftover")
      assert(f3.getBoolean(7), "re-attempt did not verify the sweep")
      assert(IndexStore.loadIfPublished(sC, dir, "embeddings",
        "ivf_k16_delta_b9").isEmpty,
        "the leftover gen1 artifact survived the re-attempted sweep")
      assert(new File(new File(dsRoot.head, "ivf_g2_k16_receipt_v2"),
        "_GRAFT_OK").isFile,
        "the re-attempt did not republish the transition receipt")
      assert(census(r1) == census(r3),
        "re-attempt census diverged from the original commit")
      // WARM-MEMO VALIDITY vs the COMMITTED marker (advisor r19): the
      // fast path's memo was validated only against the RECEIPT's
      // marker — deleting ivf_g2_k16 out-of-band while the receipt
      // survived would make ivfIndexFor silently rebuild and serve the
      // BASE index under receipt-verified flags (serve_match=true)
      // that no longer describe the served artifact. The memo probe
      // now checks BOTH markers: the call below must fall through to
      // the slow path and re-publish the committed generation.
      rmrf(new File(dsRoot.head, "ivf_g2_k16_v2"))
      val r4 = graft.ext.Similarity.queries("sim31_retrain_commit")(sC, dir)
        .collect().toSeq
      assert(IndexStore.isPublished(sC, dir, "embeddings", "ivf_g2_k16"),
        "the warm path served its memo over a deleted committed " +
          "generation instead of re-publishing it")
      assert(census(r1) == census(r4),
        "the re-published generation's census diverged")
    }
  }

  test("sim31: every frozen-cell consumer rides the COMMITTED " +
    "generation — maintenance verbs re-derive their artifacts as " +
    "frozen-centroid ENCODES (never a retrain), each card's own " +
    "invariants hold on gen2, and sim30 reads zero gain after the act") {
    inCommitStore {
      val s = spark.newSession()
      val mid = IndexStore.builds.size
      // maintenance family: artifacts were declared superseded by the
      // commit, so each re-derives against gen2 — cheap encodes only
      val r23 = graft.ext.Similarity.queries("sim23_incremental_ivf")(s, dir)
        .collect()
      assert(r23.nonEmpty)
      r23.foreach(r => assert(r.getBoolean(3) && r.getBoolean(4),
        s"sim23 flags false on gen2: $r"))
      val r24 = graft.ext.Similarity.queries("sim24_ann_forget")(s, dir)
        .collect()
      assert(r24.nonEmpty)
      r24.foreach(r => assert(r.getBoolean(4) && r.getBoolean(5),
        s"sim24 flags false on gen2: $r"))
      val r25 = graft.ext.Similarity.queries("sim25_index_compaction")(s, dir)
        .collect()
      assert(r25.nonEmpty)
      r25.foreach(r => assert(r.getBoolean(5) && r.getBoolean(6) &&
        r.getBoolean(7), s"sim25 flags false on gen2: $r"))
      val newBuilds = IndexStore.builds.toArray.drop(mid).map(_.toString)
      assert(newBuilds.forall(b => b.contains("delta") ||
        b.contains("tombstones") || b.contains("compacted")),
        s"a gen2 consumer RETRAINED: ${newBuilds.mkString(", ")}")
      // graph / drift / cartography consumers
      assert(graft.ext.Similarity.queries("sim27_knn_graph")(s, dir)
        .count() > 0)
      val r28 = graft.ext.Similarity.queries("sim28_cell_drift")(s, dir)
        .collect()
      assert(r28.length == 1 && r28.head.getLong(2) == 16 &&
        !r28.head.getDouble(3).isNaN, s"sim28 degenerate on gen2: ${r28.toSeq}")
      val r29 = graft.ext.Similarity.queries("sim29_knn_cartography")(s, dir)
        .collect()
      assert(r29.nonEmpty && r29.forall(r =>
        Set("dense_swamp", "sparse_frontier", "mid").contains(r.getString(5))),
        "sim29 regions degenerate on gen2")
      // the lifecycle closes: AFTER the commit, the what-if IS the
      // served quantizer, so the pricing verb reads nothing to gain
      val r30 = graft.ext.Similarity.queries("sim30_retrain_whatif")(s, dir)
        .collect().head
      assert(!r30.getBoolean(r30.length - 1),
        s"sim30 still recommends retraining AFTER the commit: $r30")
      // dedup consumers: cards well-formed, kernel self-consistent
      val d51 = graft.ext.Dedup.queries("d51_incremental_semdedup")(s, dir)
        .collect()
      assert(d51.nonEmpty)
      d51.foreach { r =>
        val rate = r.getDouble(5)
        assert(rate >= 0.0 && rate <= 1.0 && r.getLong(3) >= r.getLong(4),
          s"d51 census inconsistent on gen2: $r")
      }
      val d55 = graft.ext.Dedup.queries("d55_sem_decontaminate")(s, dir)
        .collect()
      assert(d55.nonEmpty)
      // rowwise flag ≡ (max_train_cos ≥ τ, null → clean) — the d55
      // kernel contract, generation-independent
      d55.foreach { r =>
        val expected = !r.isNullAt(3) && r.getDouble(3) >= 0.95
        assert(r.getBoolean(4) == expected,
          s"d55 contaminated flag inconsistent on gen2: $r")
      }
      // the planted paraphrases are scaled copies of co-celled sources
      // — still caught under the committed cells
      val planted = d55.filter(_.getBoolean(2))
      assert(planted.nonEmpty && planted.forall(_.getBoolean(4)),
        "a planted paraphrase escaped decontamination on gen2")
      // the sweep is gated on the TRANSITION: the maintenance verbs
      // above re-derived delta/tombstone/compacted artifacts under the
      // superseded NAMES but against the committed centroids — a
      // sim31 re-run now must NOT collect those (it would thrash the
      // consumers), and the re-derived artifacts stay published
      val again = graft.ext.Similarity.queries("sim31_retrain_commit")(s, dir)
        .collect().head
      assert(!again.getBoolean(4) && again.getInt(6) == 0,
        s"a post-consumer re-run swept gen2-consistent artifacts: $again")
      val k = graft.ext.Similarity.cellsFor(
        graft.ext.Similarity.corpusSize(s, dir))
      Seq(s"ivf_k${k}_delta_b5", s"ivf_k${k}_tombstones_m101",
        s"ivf_k${k}_compacted_g1").foreach { n =>
        assert(IndexStore.loadIfPublished(s, dir, "embeddings", n).nonEmpty,
          s"re-derived $n was collected by the idempotent re-run")
      }
    }
  }

  test("sim31: the sim32 collapse gate VETOES a commit on rank-1 " +
    "geometry, leaving the store untouched (r18 verdict ask #7)") {
    inCommitStore {
      val s = spark.newSession()
      import s.implicits._
      // rank-1 corpus: every embedding a scalar multiple of e0 —
      // top1_share = 1.0, participation_ratio = 1.0 ⇒ collapse_major
      val dataDir = new File(System.getProperty("java.io.tmpdir"),
        s"graft_collapse_data_${ProcessHandle.current().pid()}")
      (0L until 64L).map { i =>
        (i, Seq.tabulate(64)(d =>
          if (d == 0) (i % 7 + 1).toFloat else 0f), (i % 3).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite")
        .parquet(new File(dataDir, "embeddings.parquet").getPath)
      val ex = intercept[IllegalStateException] {
        graft.ext.Similarity.queries("sim31_retrain_commit")(
          s, dataDir.getPath).collect()
      }
      assert(ex.getMessage.contains("collapse_major vetoes"),
        s"unexpected veto message: ${ex.getMessage}")
      // the vetoed commit published NO index artifact — the gate runs
      // before any generation build. The gate's own persisted verdict
      // row (r19 ask #3) is the ONLY record, and it is exactly what
      // lets every later session veto this corpus without re-paying
      // the sketch pass.
      assert(IndexStore.listArtifacts(s, dataDir.getPath, "embeddings")
        == Seq("spectrum_verdict"),
        "a vetoed commit left index artifacts behind")
    }
  }

  test("sim34 (r19 verdict ask #1): a GO corpus publishes the " +
    "projected+whitened index ONCE and serves reduced ANN that matches " +
    "the full-dim brute truth exactly; a fresh session serves with ZERO " +
    "builds (zero re-projection); a no-go corpus reads a structured " +
    "refusal, publishes NO index, and the serving kernel VETOES") {
    val s = spark.newSession()
    import s.implicits._
    // GO corpus: the sim33 geometry-preservation fan lifted to d=64 —
    // mean-zero, entirely in the (e0, e5) plane, so variance_captured
    // at r=16 is exactly 1.0 and projected cosine ≡ full cosine. Query
    // vec_id 0 along e0; fan angles 5°..75° give strictly-decreasing
    // cosines, so the brute top-10 is exactly ids 1..10 in order.
    val fan = (1 to 15).map { j =>
      val th = math.toRadians(j * 5.0)
      val sc = 1.0 + (j % 3)
      (j.toLong, Seq.tabulate(64)(d =>
        if (d == 0) sc * math.cos(th) else if (d == 5) sc * math.sin(th)
        else 0.0))
    }
    val q0 = (0L, Seq.tabulate(64)(d => if (d == 0) 1.0 else 0.0))
    val all = (Seq(q0) ++ fan) ++
      (Seq(q0) ++ fan).map { case (id, v) => (id + 16L, v.map(-_)) }
    val goDir = new File(System.getProperty("java.io.tmpdir"),
      s"graft_pca_go_${ProcessHandle.current().pid()}")
    all.toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(new File(goDir, "embeddings.parquet").getPath)
    val before = IndexStore.builds.size
    val r1 = Similarity.queries("sim34_reduced_ann_serve")(s, goDir.getPath)
      .collect().toSeq
    val built = IndexStore.builds.toArray.drop(before).map(_.toString)
    assert(built.toSeq == Seq(s"pca_r16_decision@${goDir.getPath}",
      s"pca_r16_index@${goDir.getPath}"),
      s"GO serve built: ${built.mkString(", ")}")
    assert(r1.length == 10, s"expected 10 served neighbors, got ${r1.length}")
    r1.foreach { r =>
      assert(r.getBoolean(0), "go flag false on the GO corpus")
      assert(r.getDouble(1) == 1.0, s"variance_captured ${r.getDouble(1)}")
      assert(r.getDouble(2) == 1.0, s"recall_at_10 ${r.getDouble(2)}")
    }
    // served ranking == the full-dim brute truth, row for row
    assert(r1.map(_.getInt(4)) == (1 to 10),
      s"rank column broken: ${r1.map(_.getInt(4))}")
    assert(r1.map(_.getLong(5)) == (1L to 10L),
      s"reduced serve diverged from brute truth: ${r1.map(_.getLong(5))}")
    // cosines decrease along the fan
    val cs = r1.map(_.getDouble(6))
    assert(cs == cs.sorted.reverse && cs.head <= 1.0 && cs.last > 0.0,
      s"served cosines not descending: $cs")
    // the published index carries BOTH representations at width r
    val idx = IndexStore.loadIfPublished(s, goDir.getPath, "embeddings",
      "pca_r16_index").get("projected")
    assert(idx.count() == 32)
    val w0 = idx.filter(org.apache.spark.sql.functions.col("vec_id") === 1L)
      .collect().head
    assert(w0.getSeq[Double](1).length == 16 &&
      w0.getSeq[Double](2).length == 16,
      "published vectors are not r-dim")
    // tomorrow's JVM: same serve, ZERO builds, ZERO re-projection
    val s2 = spark.newSession()
    val mid = IndexStore.builds.size
    val r2 = Similarity.queries("sim34_reduced_ann_serve")(s2, goDir.getPath)
      .collect().toSeq
    assert(IndexStore.builds.size == mid,
      "a warm serve re-projected or re-decided: " +
        IndexStore.builds.toArray.drop(mid).mkString(", "))
    assert(r1 == r2, "fresh-session serve diverged")
    // NO-GO: the murmur grid is sim32-HEALTHY but isotropic —
    // variance_captured ≈ r/d ⇒ the reduction must refuse
    val noDir = new File(System.getProperty("java.io.tmpdir"),
      s"graft_pca_nogo_${ProcessHandle.current().pid()}")
    (0L until 64L).map { i =>
      (i, Seq.tabulate(64)(d =>
        (scala.util.hashing.MurmurHash3.productHash((i, d)) % 13).toDouble))
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite")
      .parquet(new File(noDir, "embeddings.parquet").getPath)
    val r3 = Similarity.queries("sim34_reduced_ann_serve")(s2, noDir.getPath)
      .collect().toSeq
    assert(r3.length == 1 && !r3.head.getBoolean(0),
      s"no-go corpus did not read a refusal: $r3")
    assert(r3.head.isNullAt(4) && r3.head.isNullAt(5) && r3.head.isNullAt(6),
      s"refusal row carries serve columns: ${r3.head}")
    assert(r3.head.getDouble(1) < Similarity.PcaGoVarCap,
      s"isotropic corpus read variance_captured ${r3.head.getDouble(1)}")
    assert(IndexStore.listArtifacts(s2, noDir.getPath, "embeddings")
      == Seq("pca_r16_decision"),
      "a refused reduction published an index artifact")
    val ex = intercept[IllegalStateException] {
      Similarity.reducedIndexFor(s2, noDir.getPath, 64, 16)
    }
    assert(ex.getMessage.contains("no-go vetoes reduced ANN serving"),
      s"kernel veto message: ${ex.getMessage}")
  }

  test("sim32 gate verdict PERSISTS keyed by the corpus fingerprint " +
    "(r19 verdict ask #3): a fresh session reads the published verdict " +
    "with ZERO sketch builds, and a rewritten corpus RECOMPUTES — a " +
    "long-lived session never trusts a stale verdict") {
    val s = spark.newSession()
    import s.implicits._
    val dataDir = new File(System.getProperty("java.io.tmpdir"),
      s"graft_gate_persist_${ProcessHandle.current().pid()}")
    def write(rank1: Boolean): Unit =
      (0L until 64L).map { i =>
        (i, Seq.tabulate(64) { d =>
          if (rank1) { if (d == 0) (i % 7 + 1).toDouble else 0.0 }
          // healthy: murmur-mixed deterministic grid — per-(row, dim)
          // hashes decorrelate the dims, so variance spreads over all
          // 64 (PR far past d/8, top1_share far below 0.5); a linear
          // congruential grid here read PR 4.7 = collapsed
          else (scala.util.hashing.MurmurHash3
            .productHash((i, d)) % 13).toDouble
        }, (i % 3).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite")
        .parquet(new File(dataDir, "embeddings.parquet").getPath)
    write(rank1 = false)
    val before = IndexStore.builds.size
    val v1 = Similarity.spectrumGateCached(s, dataDir.getPath)
    assert(!v1._3, s"healthy hash grid read collapsed: $v1")
    val built = IndexStore.builds.toArray.drop(before).map(_.toString)
    assert(built.toSeq == Seq(s"spectrum_verdict@${dataDir.getPath}"),
      s"first gate read built: ${built.mkString(", ")}")
    // tomorrow's JVM: the verdict serves from the store — no sketch
    // pass, no build (the builds-log device)
    val s2 = spark.newSession()
    val mid = IndexStore.builds.size
    val v2 = Similarity.spectrumGateCached(s2, dataDir.getPath)
    assert(v2 == v1, "fresh-session verdict diverged from the published one")
    assert(IndexStore.builds.size == mid,
      "a fresh session re-sketched instead of reading the published " +
        "verdict: " + IndexStore.builds.toArray.drop(mid).mkString(", "))
    // the corpus is REWRITTEN under the long-lived sessions: the memo
    // keys on the fingerprint (one listing, no jobs), so BOTH sessions
    // recompute — the verdict flips to collapse and republishes under
    // the new fingerprint's root
    write(rank1 = true)
    val v3 = Similarity.spectrumGateCached(s2, dataDir.getPath)
    assert(v3._3 && v3._1 == 1.0,
      s"rewritten rank-1 corpus still reads the stale verdict: $v3")
    assert(IndexStore.builds.size == mid + 1,
      "the stale-fingerprint recompute did not republish")
    // ...and the OTHER long-lived session sees the flip through the
    // store without a second sketch pass
    val v4 = Similarity.spectrumGateCached(s, dataDir.getPath)
    assert(v4 == v3, s"session A kept the stale verdict: $v4")
    assert(IndexStore.builds.size == mid + 1,
      "session A re-sketched a verdict session B already published")
  }

  test("gcStore (r14 ask #7): sweeps stale-fingerprint roots, " +
    "non-current versions, tmp debris, and caller-declared superseded " +
    "generations — while served indexes survive and a fresh session " +
    "still serves with zero builds") {
    IndexStore.loadOrBuild(spark, dir, "embeddings", "gc_keep") {
      Seq("x" -> spark.range(7).toDF("v"))
    }
    IndexStore.loadOrBuild(spark, dir, "embeddings", "gc_folded") {
      Seq("x" -> spark.range(9).toDF("v"))
    }
    val tag = Similarity.dirTag(dir)
    val liveRoot = Option(scratch.listFiles()).get
      .filter(f => f.getName.startsWith(tag + "_") &&
        new File(f, "_GRAFT_TABLES").isFile &&
        Option(f.listFiles()).get.exists(_.getName.startsWith("gc_keep")))
      .head
    // plant: (a) a stale root — right shape, recorded tables, but a
    // fingerprint no rewrite can ever produce again
    val staleRoot = new File(scratch, s"${tag}_0000dead")
    new File(staleRoot, "stale_art_v2").mkdirs()
    java.nio.file.Files.write(
      new File(staleRoot, "_GRAFT_TABLES").toPath,
      "embeddings".getBytes("UTF-8"))
    // (b) a previous-FormatVersion artifact and tmp debris in the live
    // root. The crashed debris is AGED past the gc threshold; the fresh
    // .tmp beside it models a CONCURRENT publish mid-stage (advisor
    // r15) and must SURVIVE the sweep.
    new File(liveRoot, "gc_old_v1").mkdirs()
    val deadTmp = new File(liveRoot, "gc_keep_v2.tmp777")
    deadTmp.mkdirs()
    deadTmp.setLastModified(System.currentTimeMillis() - 7200000L)
    new File(liveRoot, "gc_live_v2.tmp888").mkdirs()
    // (c) root-level clock-probe debris (advisor r17): a prior sweep's
    // probe whose delete failed. The AGED one must be collected; the
    // FRESH one models a concurrent gcStore mid-stat and must survive.
    val staleProbe = new File(scratch, ".gc_probe_1.tmp.probe")
    java.nio.file.Files.write(staleProbe.toPath, Array.empty[Byte])
    staleProbe.setLastModified(System.currentTimeMillis() - 7200000L)
    val freshProbe = new File(scratch, ".gc_probe_2.tmp.probe")
    java.nio.file.Files.write(freshProbe.toPath, Array.empty[Byte])
    val deleted = IndexStore.gcStore(spark, Seq(dir),
      superseded = Seq("gc_folded"))
    def deletedName(n: String) = deleted.exists(_.endsWith(n))
    assert(deletedName(".gc_probe_1.tmp.probe") && !staleProbe.exists(),
      s"stale root probe survived: $deleted")
    assert(!deletedName(".gc_probe_2.tmp.probe") && freshProbe.exists(),
      "GC swept a FRESH probe — a concurrent sweep's clock file")
    freshProbe.delete()
    assert(deletedName(s"${tag}_0000dead"), s"stale root survived: $deleted")
    assert(deletedName("gc_old_v1"), s"stale version survived: $deleted")
    assert(deletedName("gc_keep_v2.tmp777"), s"tmp debris survived: $deleted")
    assert(!deletedName("gc_live_v2.tmp888") &&
      new File(liveRoot, "gc_live_v2.tmp888").isDirectory,
      "GC swept a YOUNG .tmp — a concurrent publish's staging dir")
    assert(deletedName("gc_folded_v2"), s"superseded artifact survived: $deleted")
    assert(!staleRoot.exists() && !new File(liveRoot, "gc_old_v1").exists())
    // the served artifact and its siblings survive...
    assert(new File(liveRoot, "gc_keep_v2").isDirectory,
      "GC deleted a served artifact")
    // ...and a fresh session still serves it with zero builds
    val s = spark.newSession()
    val before = IndexStore.builds.size
    val out = IndexStore.loadOrBuild(s, dir, "embeddings", "gc_keep") {
      sys.error("GC broke the published artifact — rebuild forced")
    }
    assert(out("x").count() == 7)
    assert(IndexStore.builds.size == before)
  }
}
