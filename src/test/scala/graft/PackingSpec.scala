package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Packing

/** Sequence-packing invariants: validity (no bin over budget, every doc
  * packed exactly once) on any partition layout, FFD exactness where the
  * layout is pinned to one partition, and the unsatisfiable-doc guard. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single-partition FFD packs the textbook case exactly") {
    // budget 10, sizes 7,5,4,3,2,1 → FFD: [7,3], [5,4,1], [2] = 3 bins.
    // partitions = Some(1) pins the whole input into ONE pack task, so
    // this asserts the actual first-fit-decreasing result — a degenerate
    // bin-per-doc packer fails here on bin count and fills.
    val docs = Seq((1L, 7L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L), (6L, 1L))
      .toDF("doc_id", "n_tokens")
    val bins = Packing.packBins(docs, 10L, partitions = Some(1)).collect()
    assert(bins.length == 3, bins.mkString(", "))
    assert(bins.map(_.getLong(2)).sorted.toSeq == Seq(2L, 10L, 10L))
    assert(bins.map(_.getInt(1)).sum == 6)
  }

  test("packing is valid on the real corpus at any partition count") {
    val budget = 512L
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        ext.TextStats.wsTokens(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0 && col("n_tokens") <= budget)
    val nDocs = docs.count()
    val totalTokens = docs.agg(sum("n_tokens")).head().getLong(0)
    val bins = Packing.packBins(docs, budget)
    val agg = bins.agg(
      max(col("fill")).as("mx"),
      sum(col("n_docs")).as("nd"),
      sum(col("fill")).as("tt"),
      count(lit(1)).as("nb")).head()
    assert(agg.getLong(0) <= budget)            // no bin over budget
    assert(agg.getLong(1) == nDocs)             // every doc packed once
    assert(agg.getLong(2) == totalTokens)       // token mass conserved
    // lower bound: can't beat ceil(total/budget) bins; FFD per partition
    // should stay within a small constant of it on this corpus
    val optLb = (totalTokens + budget - 1) / budget
    assert(agg.getLong(3) >= optLb)
  }

  test("a doc over the budget fails fast instead of silently dropping") {
    val docs = Seq((1L, 600L), (2L, 10L)).toDF("doc_id", "n_tokens")
    intercept[org.apache.spark.SparkException] {
      Packing.packBins(docs, 512L).collect()
    }
  }

  test("bin ids are globally unique across partitions") {
    val docs = (1L to 500L).map(i => (i, 1L + i % 40)).toDF("doc_id", "n_tokens")
    val ids = Packing.packBins(docs, 64L).select("bin_id").as[Long].collect()
    assert(ids.length == ids.distinct.length)
  }

  test("chunking: windows overlap by window-stride and cover every word in order") {
    // 50 words, window 32, stride 24 → chunks at 0 (32 words) and 24 (26)
    val words = (1 to 50).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = Packing.chunkWindows(docs, window = 32, stride = 24)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(chunks.length == 2)
    assert(chunks(0) == ((0, 32, words.take(32).mkString(" "))))
    assert(chunks(1) == ((1, 26, words.drop(24).mkString(" "))))
    // overlap: chunk 0's last 8 words == chunk 1's first 8
    assert(chunks(0)._3.split(" ").takeRight(8).toSeq ==
      chunks(1)._3.split(" ").take(8).toSeq)
  }

  test("a doc at or under the window is exactly one chunk equal to itself") {
    val docs = Seq((1L, "a b c"), (2L, (1 to 32).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.chunkWindows(docs, window = 32, stride = 24).collect()
    assert(got.length == 2)
    assert(got.forall(_.getInt(1) == 0))
  }

  test("chunked docs always fit the packer's budget (the d31 -> d9 contract)") {
    val long = (1 to 200).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, long)).toDF("doc_id", "text")
    val chunks = Packing.chunkWindows(docs, window = 32, stride = 24)
    assert(chunks.agg(max(col("n_words"))).head().getInt(0) <= 32)
    // every word position is covered: union of [i*24, i*24+32) spans 0..200
    val n = chunks.select(col("chunk_id"), col("n_words")).collect()
      .map(r => r.getInt(0) * 24 + r.getInt(1)).max
    assert(n == 200)
    // and they pack without the over-budget guard firing
    val packed = Packing.packBins(
      chunks.select((col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
        col("n_words").cast("long").as("n_tokens")), budget = 32L)
    assert(packed.agg(sum(col("n_docs"))).head().getLong(0) == chunks.count())
  }

  test("mm7 shard manifest conserves payload bytes against mm1's totals") {
    val dir = "/root/testdata/sf0.001"
    val m = graft.ext.Multimodal.mm7ShardManifest(spark, dir).head()
    val mm1Total = graft.ext.TextStats.mm1BinaryMeta(spark, dir)
      .agg(sum(col("total_bytes")), sum(col("n_payloads")))
      .head()
    // every payload fits the 16 KiB budget in this corpus → counts and
    // bytes must agree exactly with the independent mm1 aggregation
    assert(m.getLong(1) == mm1Total.getLong(1), "payload count drifted")
    assert(m.getLong(2) == mm1Total.getLong(0), "byte mass not conserved")
    assert(m.getLong(4) <= graft.ext.Multimodal.Mm7ShardBytes)
  }
}
