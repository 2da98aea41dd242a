package graft

import org.apache.spark.sql.functions._

/** The d12 bench-floor probe (r17 verdict ask #2 / watch-list item):
  * d12's 10× scaling read α = 0.80 with the dedup components build
  * checkpointing EVERY round; this probe measures whether that
  * per-round localCheckpoint is the floor, by timing the identical
  * SemDeDup kept-set build at checkpoint cadences 1 (current), 2 and 5
  * and verifying the KEPT SETS are byte-identical across cadences
  * before any number is believed — the r13 graph-cadence rule
  * (BENCH_LOCAL_r13_graph_cadence.json precedent). Unlike the graph
  * tier's fixed 10-round recurrences, the components iteration
  * converges in a data-dependent number of rounds and its convergence
  * SUM must still run per round, so an un-pinned round trades a
  * materialization job for lineage re-execution inside the next sum —
  * whether that trades UP is exactly what this probe decides.
  *
  * Scope: the timed region is d12's serving shape minus the final
  * label accounting — within-cell pair kernel → components →
  * anti-join → count — over the warm (ingest-time) IVF assignment.
  *
  * Prints one JSON line: per (dir, cadence) the min/median of N reps
  * plus an `identical` flag vs cadence 1. */
object D12CadenceProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sfx10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new StringBuilder("{")
    var first = true
    dirs.foreach { dir =>
      val tag = dir.split("/").filter(_.nonEmpty).last
      val k = ext.Similarity.cellsFor(ext.Similarity.corpusSize(spark, dir))
      // the IVF assignment is an ingest artifact — warm it so the
      // timed region is the dedup build, not k-means training
      val assigned = ext.Similarity.ivfIndexFor(spark, dir, k).assigned
      val docs = Tables.embeddings(spark, dir)
        .withColumnRenamed("vec_id", "doc_id")

      def keptIds(cadence: Int): Seq[Long] =
        ext.Dedup.dedupedCorpusCadence(docs,
            ext.Curate.cellNearDupPairs(assigned, 0.25), cadence)
          .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq

      keptIds(1) // JIT/codegen warm pass, untimed
      val baseline = keptIds(1)
      Seq(1, 2, 5).foreach { cadence =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val r = keptIds(cadence)
          ((System.nanoTime() - t0) / 1e9, r == baseline)
        }
        val ts = times.map(_._1).sorted
        val same = times.forall(_._2)
        if (!first) out.append(",")
        first = false
        out.append(
          s""""${tag}_c$cadence":{"median":${ts((ts.size - 1) / 2)},"min":${ts.head},"identical":$same}""")
        System.err.println(
          s"[d12-cadence] $tag c=$cadence median=${ts((ts.size - 1) / 2)} min=${ts.head} identical=$same")
      }
    }
    out.append(s""","reps":$reps}""")
    println(out.toString)
    spark.stop()
  }
}
