package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TrainOrder

/** The epoch-shuffle contract: a dense, reproducible, seed-keyed
  * permutation — computed by the two-phase (range sort + offset) path,
  * pinned against the naive single-window formulation it replaces. */
class OrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  private def positions(n: Int, seed: Long, parts: Int): Map[Long, Long] =
    TrainOrder.epochOrder(docs(n), seed, parts)
      .as[(Long, Long)].collect().toMap

  test("positions are a dense permutation 0..N-1") {
    val pos = positions(257, seed = 7L, parts = 5)
    assert(pos.size == 257)
    assert(pos.values.toSet == (0L until 257L).toSet)
  }

  test("two-phase order equals the single-window reference") {
    // the naive formulation — correct but driver-bottlenecked: one
    // global window. The scalable path must produce byte-identical
    // positions.
    val naive = docs(300)
      .withColumn("skey", TrainOrder.shuffleKey(col("doc_id"), 7L))
      .withColumn("position",
        (row_number().over(Window.orderBy(col("skey"), col("doc_id"))) - 1)
          .cast("long"))
      .select(col("doc_id"), col("position"))
      .as[(Long, Long)].collect().toMap
    assert(positions(300, seed = 7L, parts = 6) == naive)
  }

  test("order is partition-count-invariant and rerun-deterministic") {
    val a = positions(200, seed = 3L, parts = 4)
    val b = positions(200, seed = 3L, parts = 9)
    val c = positions(200, seed = 3L, parts = 4)
    assert(a == b)
    assert(a == c)
  }

  test("a new seed is an (effectively) independent permutation") {
    val a = positions(200, seed = 1L, parts = 4)
    val b = positions(200, seed = 2L, parts = 4)
    assert(a != b)
    // not a shifted/reflected copy either: most fixed points move
    val moved = a.count { case (id, p) => b(id) != p }
    assert(moved > 150, s"only $moved of 200 docs moved between seeds")
  }

  test("curriculum order: strict priority bands, hash-shuffled within ties") {
    val docs = (0 until 100).map(i => (i.toLong, (i % 4).toLong))
      .toDF("doc_id", "prio")
    val pos = TrainOrder.curriculumOrder(docs, col("prio"),
        seed = 5L, partitions = 4)
      .as[(Long, Long)].collect().toMap
    assert(pos.size == 100 && pos.values.toSet == (0L until 100L).toSet)
    // 25 docs per priority; descending priority → band of positions
    for ((id, p) <- pos) {
      val band = 3 - (id % 4)
      assert(p >= band * 25 && p < (band + 1) * 25,
        s"doc $id (prio ${id % 4}) landed at $p")
    }
    // within a band the seeded hash shuffles — not id order
    val topBand = pos.filter(_._1 % 4 == 3).toSeq.sortBy(_._2).map(_._1)
    assert(topBand != topBand.sorted)
  }

  test("empty input yields an empty frame with the contract schema") {
    val out = TrainOrder.epochOrder(Seq.empty[Long].toDF("doc_id"), 1L, 4)
    assert(out.columns.toSeq == Seq("doc_id", "position"))
    assert(out.count() == 0)
  }
}
