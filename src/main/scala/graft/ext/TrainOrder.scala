package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic training-order assignment — the "epoch shuffle" step of
  * a training-data pipeline (the reference pipeline ends at curated
  * tables; a trainer consumes them in a randomized but REPRODUCIBLE
  * order, cf. spark_processor.py:231-270's ordered hand-off to the
  * dashboard tier). Every document gets a dense global position
  * 0..N−1 for a given epoch seed: position = rank of
  * md5(doc_id ":" seed). Re-running with the same seed reproduces the
  * exact order (resumable training); a new epoch = a new seed = an
  * independent permutation. No RNG state anywhere — the order is a pure
  * function of (doc_id, seed), so it survives retries, re-partitioning,
  * and speculative execution.
  *
  * 100 TB shape: a global ROW_NUMBER is the textbook driver-bottleneck
  * op — a single-partition window serializes the whole corpus through
  * one reducer. Instead, the classic two-phase global index:
  * (1) range-partition + sort the slim (doc_id, key) frame — Spark's
  * distributed sort, the same machinery as any orderBy; (2) count each
  * partition (P rows to the driver, never data) and add the exclusive
  * prefix-sum offset to each partition-local position via one
  * mapPartitions pass — per-partition imperative logic, the documented
  * narrow exception. Document text never enters the pipeline; the
  * trainer re-joins positions by doc_id (or zips at read time).
  */
object TrainOrder {

  /** Registered epoch seed — interpolated into the oracle so both sides
    * move together. */
  private[ext] val D22Seed = 42L

  /** The shuffle key: md5 over "id:seed" — reproducible everywhere
    * (DuckDB, Python, Spark) so external tooling can re-derive the
    * order of any shard independently. */
  private[graft] def shuffleKey(id: Column, seed: Long): Column =
    md5(concat(id.cast("string"), lit(s":$seed")).cast("binary"))

  /** (doc_id, position) for every row of `docs`; dense 0..N−1, ordered
    * by the seeded hash with doc_id as the (practically unreachable)
    * tie-break. `partitions` sizes the range sort; 0 = the session's
    * shuffle parallelism. The output order is partition-count-invariant
    * (asserted in OrderSpec). */
  def epochOrder(docs: DataFrame, seed: Long = D22Seed,
                 partitions: Int = 0): DataFrame =
    globalRank(docs.select(col("doc_id").cast("long").as("doc_id"),
      shuffleKey(col("doc_id"), seed).as("skey")), partitions)

  /** Curriculum ordering: like [[epochOrder]] but documents sort by a
    * caller-supplied priority FIRST (e.g. quality score or length,
    * descending — the "easy/clean examples early" schedule), with the
    * seeded hash shuffling only WITHIN equal-priority ties. The same
    * two-phase machinery: nothing about the global-index trick cares
    * what the sort key is. */
  def curriculumOrder(docs: DataFrame, priority: Column,
                      seed: Long = D22Seed, partitions: Int = 0): DataFrame =
    globalRank(docs.select(col("doc_id").cast("long").as("doc_id"),
      priority.as("prio"), shuffleKey(col("doc_id"), seed).as("skey")),
      partitions, Seq(col("prio").desc))

  /** The two-phase global-rank kernel shared by epoch and curriculum
    * ordering: range-sort by (prefix sort keys, skey, doc_id), count
    * partitions, add broadcast prefix-sum offsets per partition. The
    * input frame must carry `doc_id` (long) and `skey`. */
  private def globalRank(keyed: DataFrame, partitions: Int,
                         prefix: Seq[Column] = Nil): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sortCols = prefix ++ Seq(col("skey").asc, col("doc_id").asc)
    // localCheckpoint pins the range boundaries: RangePartitioner samples
    // its input, and the count job and the position job MUST see the same
    // partitioning — over a checkpoint they provably do (and the slim
    // keyed frame is cheap to hold).
    val sorted = keyed
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // P (pid, count) rows — driver traffic is O(partitions), not O(rows)
    val counts = sorted.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("position",
            org.apache.spark.sql.types.LongType))))
    val maxPid = counts.keys.max
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    (0 to maxPid).foreach { i => offsets(i) = acc; acc += counts.getOrElse(i, 0L) }
    val offB = spark.sparkContext.broadcast(offsets)
    // One pass per partition: rows arrive sorted, the partition's global
    // offset comes off the broadcast, position = offset + local index.
    sorted.select(col("doc_id"), col("pid")).as[(Long, Int)]
      .mapPartitions { it =>
        var i = 0L
        it.map { case (id, pid) =>
          val pos = offB.value(pid) + i; i += 1; (id, pos)
        }
      }.toDF("doc_id", "position")
  }

  /** D22 — registered epoch order at the fixed seed, presented by
    * position. Fully deterministic → real value-level oracle (DuckDB
    * replays the md5 rank as a window). */
  def d22EpochOrder(spark: SparkSession, dir: String): DataFrame =
    epochOrder(Tables.documents(spark, dir)).orderBy(col("position"))

  /** D25 — registered curriculum order: longest documents first (the
    * "most substance early" schedule), hash-shuffled within ties. */
  def d25CurriculumOrder(spark: SparkSession, dir: String): DataFrame =
    curriculumOrder(Tables.documents(spark, dir), col("n_chars"))
      .orderBy(col("position"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_epoch_order" -> d22EpochOrder,
    "d25_curriculum_order" -> d25CurriculumOrder
  )

  val oracle: Map[String, String] = Map(
    "d22_epoch_order" ->
      s"""SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$D22Seed'), doc_id) - 1
        |    AS BIGINT) AS position
        |FROM documents ORDER BY position""".stripMargin,
    "d25_curriculum_order" ->
      s"""SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY n_chars DESC,
        |      md5(CAST(doc_id AS VARCHAR) || ':$D22Seed'), doc_id) - 1
        |    AS BIGINT) AS position
        |FROM documents ORDER BY position""".stripMargin
  )
}
