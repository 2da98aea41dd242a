package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Batch source/sink round-trips (S2, S7, S9, S10, S11, S13, S14). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("S2 flatten of nested API payload with 0-defaults for missing pollutants") {
    val nested = spark.read.json(Seq(
      """{"location":{"name":"London","region":"City","country":"UK",
        |"localtime":"2024-01-01 10:00"},
        |"current":{"temp_c":12.5,"humidity":80,
        |"condition":{"text":"Sunny"},
        |"air_quality":{"co":1.1,"pm2_5":22.0}},
        |"timestamp":"2024-01-01T10:00:00"}""".stripMargin.replaceAll("\n", "")
    ).toDS())
    val flat = Sources.flattenApiPayload(nested)
    val r = flat.head()
    assert(r.getAs[String]("location") == "London")
    assert(r.getAs[String]("condition") == "Sunny")
    // present pollutant kept, missing ones defaulted to 0 (producer.py:83-88)
    assert(r.getAs[Double]("pm2_5") == 22.0)
    assert(r.getAs[Double]("no2") == 0.0)
    assert(r.getAs[Double]("pm10") == 0.0)
  }

  test("S7 schema'd JSON scan reads what the wire format writes") {
    val dir = tmp("s7json")
    val obs = Seq(
      ("London", 15.5f, "2024-01-01T10:00:00", 20.0f),
      ("Paris", 18.0f, "2024-01-01T11:00:00", 35.5f)
    ).toDF("location", "temp_c", "timestamp", "pm2_5")
    obs.write.mode("overwrite").json(dir)
    val back = Sources.readAirQualityJson(spark, dir)
    assert(back.count() == 2)
    assert(back.schema.fieldNames.contains("kafka_offset")) // full declared schema
    assert(back.filter(col("location") === "London")
      .select("pm2_5").as[Float].head() == 20.0f)
  }

  test("S9 fallback read: parquet missing → JSON inference") {
    val dir = tmp("s9fb")
    Seq((1L, "x")).toDF("id", "s").write.mode("overwrite").json(s"$dir/json")
    val df = Sources.readWithFallback(spark, s"$dir/nonexistent_parquet", s"$dir/json")
    assert(df.count() == 1)
  }

  test("S10 partitioned parquet sink round-trips and prunes partitions") {
    val dir = tmp("s10pq")
    val df = Seq(
      ("London", 2024, 1, 10.0), ("London", 2024, 2, 20.0),
      ("Paris", 2024, 1, 30.0)
    ).toDF("location", "year", "month", "value")
    Sources.writePartitioned(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val pruned = back.filter(col("location") === "London" && col("month") === 1)
    assert(pruned.count() == 1)
    // hive layout on disk → readers prune directories, not files
    assert(new java.io.File(s"$dir/location=London/year=2024/month=1").exists())
  }

  test("S11 summary CSV is a single file with header") {
    val dir = tmp("s11csv")
    val summary = Seq(("London", "Good", 5L)).toDF("location", "aqi", "n")
    Sources.writeSummaryCsv(summary, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == Seq("location", "aqi", "n"))
    assert(back.count() == 1)
  }

  test("S14 ORC round-trip is lossless row-for-row") {
    val dir = tmp("orc_rt")
    val df = Seq((1L, "alpha", 3.5), (2L, "béta", -0.25), (3L, null, 0.0))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // file scans widen primitives to nullable — names/types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("S16 compaction bin-packs small files and is lossless") {
    val dir = tmp("s16c")
    val df = spark.range(2000)
      .selectExpr("id", "concat('row_', id) AS payload", "id % 7 AS grp")
    df.repartition(40).write.mode("overwrite").parquet(s"$dir/small")
    val smallCount = new java.io.File(s"$dir/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallCount == 40, s"pathology not manufactured: $smallCount files")
    val planned = Sources.compactParquet(spark, s"$dir/small", s"$dir/big",
      targetBytes = 64L * 1024)
    val bigFiles = new java.io.File(s"$dir/big").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the count contract: ceil(bytes/target) planned, write honors it
    assert(bigFiles <= planned, s"$bigFiles files vs planned $planned")
    assert(bigFiles < smallCount, "compaction did not reduce file count")
    // lossless row-for-row
    val back = spark.read.parquet(s"$dir/big")
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // the rewrite must be a NARROW plan — coalesce, never a shuffle
    val plan = spark.read.parquet(s"$dir/small").coalesce(planned)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction shuffles:\n$plan")
  }

  test("S16 compaction sizes from a RECURSIVE listing on partitioned input") {
    val dir = tmp("s16p")
    val df = spark.range(4000)
      .selectExpr("id", "concat('payload_', id) AS body", "id % 3 AS part")
    df.write.mode("overwrite").partitionBy("part").parquet(s"$dir/small")
    // files live under part=*/ subdirs — a shallow listing would see 0
    // bytes and plan coalesce(1) regardless of size; the recursive
    // listing must produce the same count a flat layout would
    val planned = Sources.compactParquet(spark, s"$dir/small", s"$dir/big",
      targetBytes = 16L * 1024)
    assert(planned > 1, s"partitioned input mis-sized: planned=$planned")
    val back = spark.read.parquet(s"$dir/big")
    // partition-column values survive as data columns; row content intact
    assert(back.selectExpr("id", "body", "part").collect().map(_.toSeq).toSet
      == df.collect().map(_.toSeq).toSet)
    // empty input errors instead of silently "compacting"
    val err = intercept[IllegalArgumentException] {
      new java.io.File(s"$dir/none").mkdirs()
      Sources.compactParquet(spark, s"$dir/none", s"$dir/out", 1024L)
    }
    assert(err.getMessage.contains("nothing to compact"))
  }

  test("S17 WAP: a failed audit never publishes; a passing one does") {
    val dir = tmp("s17w")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // failing audit: publish path must not come into existence
    val err = intercept[IllegalStateException] {
      Sources.wapPublish(spark, df, s"$dir/stage1", s"$dir/pub1")(_ => false)
    }
    assert(err.getMessage.contains("audit failed"))
    assert(!new java.io.File(s"$dir/pub1").exists(),
      "a rejected dataset became visible")
    // passing audit: published, readable, staging gone (renamed away)
    Sources.wapPublish(spark, df, s"$dir/stage2", s"$dir/pub2")(
      staged => staged.count() == 2)
    assert(spark.read.parquet(s"$dir/pub2").count() == 2)
    assert(!new java.io.File(s"$dir/stage2").exists())
  }

  test("S18 z-order layout: a 2-dim filter touches a fraction of the " +
    "z-ordered files but every file of a hash layout") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"), col("l_quantity"))
    val withZ = Sources.withZKey(li,
      floor(col("l_extendedprice") / 100).cast("long"),
      floor(col("l_quantity")).cast("long"))
    val zPath = tmp("s18z"); val hPath = tmp("s18h")
    Sources.zorderWrite(withZ, zPath, 8)
    withZ.repartition(8).write.mode("overwrite").parquet(hPath)
    // the reader's filter is on RAW columns — bottom quartile of both
    // dims (~1/16 of rows under equal-depth fences): the whole point of
    // the layout is that a reader who knows nothing about z still
    // benefits, because locality lives in the files
    val Array(p25) = li.stat.approxQuantile("l_extendedprice",
      Array(0.25), 0.0)
    val Array(q25) = li.stat.approxQuantile("l_quantity", Array(0.25), 0.0)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_extendedprice") < p25 && col("l_quantity") < q25)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(zPath)
    val hFiles = filesTouched(hPath)
    // those rows interleave to z < 16 (both bucket ids < 4 use only the
    // low 4 bits), i.e. 1/16 of the z space → 1-2 of 8 range files;
    // a hash layout spreads every stratum into every file
    assert(zFiles <= 2, s"z-ordered layout touched $zFiles of 8 files")
    assert(hFiles >= 7, s"hash layout touched only $hFiles of 8 files")
    // and the z column is exactly reproducible from the profile oracle
    // path (same fences, same interleave): every z is in [0, 255]
    val mm = withZ.agg(min(col("z")), max(col("z"))).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 255)
  }

  test("S13 cache keeps the plan reusable (spark_processor.py:255)") {
    val df = spark.range(100).toDF("id").cache()
    assert(df.count() == 100)
    assert(df.storageLevel.useMemory)
    df.unpersist()
  }

  test("layout audit: each clustering prunes its own column, z-order both (S19)") {
    val out = sources.Sources
      .s19LayoutAudit(spark, "/root/testdata/sf0.001", nFiles = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val n = out(("by_ts", "ts"))._2
    // every layout writes the same rows
    assert(out.values.forall(_._2 == n) && n > 0)
    val allPairs = {
      val f = out(("by_ts", "user_id"))._1
      f * (f - 1) / 2
    }
    // range-clustering on a column makes its file ranges disjoint...
    assert(out(("by_ts", "ts"))._3 == 0L)
    assert(out(("by_user", "user_id"))._3 == 0L)
    // ...and leaves the OTHER column fully unprunable
    assert(out(("by_ts", "user_id"))._3 == allPairs)
    assert(out(("by_user", "ts"))._3 == allPairs)
    // z-order: strictly better than the worst case on BOTH dimensions
    assert(out(("zorder", "ts"))._3 < allPairs)
    assert(out(("zorder", "user_id"))._3 < allPairs)
  }

  test("incremental sync processes ONLY new files; idle sync is a no-op; merge equals recompute (S21)") {
    import graft.sources.Sources
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ev(ids: Range, day: Int, t: String, v: Double) = ids.map(i =>
      (i.toLong, ts(f"2024-01-$day%02d 10:00:00"), i.toLong % 7, t, v))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("s21test").toString
    try {
      // wave 1: two files, day 1
      ev(0 until 40, 1, "a", 1.5).repartition(2)
        .write.mode("overwrite").parquet(s"$root/landing")
      val (s1, new1) = Sources.incrementalSync(
        spark, s"$root/landing", s"$root/state")
      assert(new1.size == 2)
      assert(s1.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet ==
        Set(("a", "2024-01-01", 40L, 6000L)))
      // idle sync: nothing new, state unchanged, no new version write
      val (s1b, new1b) = Sources.incrementalSync(
        spark, s"$root/landing", s"$root/state")
      assert(new1b.isEmpty && s1b.collect().length == 1)
      // wave 2: one more file, day 2 — the sync must name ONLY it
      val before = new java.io.File(s"$root/landing")
        .listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
      ev(100 until 120, 2, "a", 2.0).coalesce(1)
        .write.mode("append").parquet(s"$root/landing")
      val (s2, new2) = Sources.incrementalSync(
        spark, s"$root/landing", s"$root/state")
      assert(new2.size == 1 &&
        !before.contains(new2.head.split("/").last),
        s"wave-2 sync must read only the appended file, got $new2")
      // merged state ≡ full recompute over both waves
      val got = s2.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(("a", "2024-01-01", 40L, 6000L),
        ("a", "2024-01-02", 20L, 4000L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("time travel: an old version stays readable and BYTE-stable " +
    "after a newer publish; as-of-k sees exactly waves 1..k (S22)") {
    import graft.sources.Sources
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ev(ids: Range, day: Int, t: String, v: Double) = ids.map(i =>
      (i.toLong, ts(f"2024-01-$day%02d 10:00:00"), i.toLong % 7, t, v))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("s22test").toString
    try {
      ev(0 until 40, 1, "a", 1.5).repartition(2)
        .write.mode("overwrite").parquet(s"$root/landing")
      Sources.incrementalSync(spark, s"$root/landing", s"$root/state")
      ev(100 until 120, 2, "a", 2.0).coalesce(1)
        .write.mode("append").parquet(s"$root/landing")
      Sources.incrementalSync(spark, s"$root/landing", s"$root/state")
      // snapshot v1's raw BYTES (not just its rows) before wave 3 lands
      def bytesOf(version: Int): Seq[(String, Long, Seq[Byte])] = {
        val d = new java.io.File(s"$root/state/versions/v$version")
        d.listFiles().filter(_.isFile).sortBy(_.getName).toSeq.map(f =>
          (f.getName, f.length,
            java.nio.file.Files.readAllBytes(f.toPath).toSeq))
      }
      val v1Before = bytesOf(1)
      ev(200 until 230, 3, "b", 1.0).coalesce(1)
        .write.mode("append").parquet(s"$root/landing")
      Sources.incrementalSync(spark, s"$root/landing", s"$root/state")
      assert(bytesOf(1) == v1Before,
        "v1 bytes changed after the v3 publish — versions must be immutable")
      // as-of semantics: v1 sees wave 1 only; v2 waves 1-2; v3 all three
      def rows(v: Int) = Sources.readStateVersion(spark, s"$root/state", v)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(rows(1) == Set(("a", "2024-01-01", 40L, 6000L)))
      assert(rows(2) == Set(("a", "2024-01-01", 40L, 6000L),
        ("a", "2024-01-02", 20L, 4000L)))
      assert(rows(3) == Set(("a", "2024-01-01", 40L, 6000L),
        ("a", "2024-01-02", 20L, 4000L), ("b", "2024-01-03", 30L, 3000L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("Bloom sidecar prunes files for time-local keys; lookup equals full scan (S20)") {
    import spark.implicits._
    import graft.functions.FileBloom
    // user u is active ONLY in hour u — range-clustering by ts gives
    // each of the 8 files a disjoint user subset, the layout where a
    // Bloom sidecar prunes hard while min/max on user_id prunes nothing
    val rows = for (u <- 0 until 8; i <- 0 until 50) yield
      (u * 50L + i, java.sql.Timestamp.valueOf(f"2024-01-01 $u%02d:00:${i % 60}%02d"),
        u.toLong, "t", 1.0)
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("s20test").toString
    try {
      ev.repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(s"$root/by_ts")
      val index = FileBloom.buildIndex(spark, s"$root/by_ts", "user_id",
        expectedPerFile = 1000L)
      assert(index.size == 8, s"expected 8 files, got ${index.size}")
      // a time-local key prunes to a strict subset of files (typically
      // 1; boundary rows may straddle 2)
      val cand = FileBloom.candidateFiles(index, Seq(3L))
      assert(cand.nonEmpty && cand.size <= 2,
        s"expected 1-2 candidate files, got ${cand.size}")
      // the composed lookup equals the plain filter row-for-row
      val viaIndex = FileBloom.lookup(spark, s"$root/by_ts", index,
        "user_id", Seq(3L, 5L)).select(col("event_id")).collect()
        .map(_.getLong(0)).sorted.toSeq
      val full = ev.filter(col("user_id").isin(3L, 5L))
        .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(viaIndex == full)
      // an absent key prunes EVERY file (Bloom "no" is definitive) and
      // the lookup short-circuits to empty with the layout's schema
      assert(FileBloom.candidateFiles(index, Seq(999L)).isEmpty)
      val empty = FileBloom.lookup(spark, s"$root/by_ts", index,
        "user_id", Seq(999L))
      assert(empty.count() == 0)
      assert(empty.columns.contains("event_id"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
