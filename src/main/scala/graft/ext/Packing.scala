package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing — the training-batch construction step that follows
  * dedup/filter in an LLM data pipeline: pack documents into fixed
  * token-budget bins (context windows) so padding waste is bounded.
  *
  * Distributed design: docs hash-partition by id, each partition packs
  * LOCALLY with first-fit-decreasing over its size-sorted docs
  * (`mapPartitions` — the genuinely imperative per-partition step the
  * DataFrame algebra can't express), and bin ids are made globally
  * unique by fusing the partition id into the high bits. No document
  * text ever shuffles: packing consumes only (doc_id, n_tokens), and
  * the assignment joins back by doc_id if the payload is needed. This
  * is how production packers scale — global FFD is inherently
  * sequential, per-partition FFD keeps the same waste bound (FFD ≤
  * 11/9·OPT + O(1) per partition) with zero coordination. The first-fit
  * scan is O(docs × bins) PER PARTITION, so `partitions` must grow with
  * the corpus (docs-per-partition is corpus/partitions, NOT bounded by
  * any scan setting) — size it so a partition holds at most a few
  * hundred thousand docs, exactly like sizing shuffle partitions to
  * data volume.
  */
object Packing {

  /** Pack (doc_id, n_tokens) rows into bins of `budget` tokens.
    * Returns one row per bin: (bin_id, n_docs, fill). Docs larger than
    * the budget must be filtered (or chunked) by the caller — packing
    * them is unsatisfiable and throws rather than silently dropping.
    * `partitions` sizes the packing parallelism (see object doc);
    * None inherits `spark.sql.shuffle.partitions`. */
  def packBins(docs: DataFrame, budget: Long,
               partitions: Option[Int] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
    partitions.map(n => keyed.repartition(n, col("doc_id")))
      .getOrElse(keyed.repartition(col("doc_id")))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
        it.foreach { case (id, n) =>
          if (n > budget)
            throw new IllegalArgumentException(
              s"doc $id has $n tokens > budget $budget — filter or chunk first")
          var i = 0
          while (i < fills.length && fills(i) + n > budget) i += 1
          if (i == fills.length) { fills += n; counts += 1 }
          else { fills(i) += n; counts(i) += 1 }
        }
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        fills.indices.iterator.map(i => (pid << 32 | i.toLong, counts(i), fills(i)))
      }
      .toDF("bin_id", "n_docs", "fill")
  }

  /** D9 — pack the corpus into 512-token bins and report the packing
    * efficiency summary a pipeline dashboards (bins, docs packed, fill
    * ratio, worst bin). Rows-only for the driver: bin composition is a
    * function of the partition layout (any valid packing is correct);
    * the packing INVARIANTS — no bin over budget, every doc packed
    * exactly once, FFD exactness on a single pinned partition — are
    * asserted in PackingSpec. */
  def d9SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 512L
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextStats.wsTokens(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0 && col("n_tokens") <= budget)
    packBins(docs, budget).agg(
      count(lit(1)).as("n_bins"),
      sum(col("n_docs")).as("n_docs_packed"),
      sum(col("fill")).as("total_tokens"),
      round(avg(col("fill").cast("double") / budget), 4).as("avg_fill_ratio"),
      max(col("fill")).as("max_fill"))
  }

  /** Registered d31 geometry — interpolated into the oracle so both
    * sides move together. */
  private[ext] val D31W = 32 // window: words per chunk
  private[ext] val D31S = 24 // stride: overlap = W − S words

  /** Context-window chunking — the answer to [[packBins]]'s "docs larger
    * than the budget must be filtered (or chunked) by the caller": split
    * each doc into fixed-size word windows every `stride` words (the
    * overlapping-window preprocessing every context-bounded trainer
    * runs), so no chunk exceeds `window` and consecutive chunks share
    * window − stride words of context. Chunk membership is a pure
    * function of (doc_id, position) — reproducible across engines and
    * retries, like every selection op here.
    *
    * 100 TB shape: one per-row HOF expansion — no shuffle AT ALL; output
    * volume is ≈ window/stride × input by construction (the overlap
    * factor), and chunks feed [[packBins]] as (chunk, n_words) rows
    * without the text ever moving. The tail chunk starts at most
    * window−1 words before the end (stride ≤ window), so no empty
    * chunks exist to filter. */
  def chunkWindows(docs: DataFrame, window: Int = D31W,
                   stride: Int = D31S): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs.filter(col("text").isNotNull)
      .withColumn("words", split(col("text"), " "))
      // chunk count = 1 + ceil(max(0, n − window) / stride), as pure
      // integer arithmetic ((x + s − 1) div s) so the engine cannot
      // drift from the oracle's integer division on a double boundary
      .withColumn("chunks", expr(
        s"""transform(
           |  sequence(0, (greatest(0, size(words) - $window) + ${stride - 1})
           |    div $stride),
           |  i -> slice(words, i * $stride + 1, $window))""".stripMargin))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("cw")).as("n_words"),
        array_join(col("cw"), " ").as("chunk_text"))
  }

  /** D31 — registered chunking detail for the first 20 docs (bounded
    * presentation, d21's convention; the chunk rule itself is computed
    * doc-local so the bound is display-only). Fully deterministic →
    * value-level oracle. */
  def d31ContextChunks(spark: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(spark, dir).filter(col("doc_id") < 20))
      .orderBy(col("doc_id"), col("chunk_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_sequence_pack" -> d9SequencePack,
    "d31_context_chunks" -> d31ContextChunks
  )

  /** d9 is engine-specific (partition-local packing) — no SQL oracle;
    * see PackingSpec for the invariant checks. d31 is deterministic and
    * value-oracled. */
  val oracle: Map[String, String] = Map(
    "d31_context_chunks" ->
      s"""WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words
        |  FROM documents WHERE doc_id < 20 AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, i, words[i*$D31S+1 : i*$D31S+$D31W] AS cw
        |  FROM w, LATERAL (SELECT unnest(range(
        |    1 + (greatest(0, len(words) - $D31W) + ${D31S - 1}) // $D31S)) AS i))
        |SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  CAST(len(cw) AS INT) AS n_words,
        |  array_to_string(cw, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  )
}
