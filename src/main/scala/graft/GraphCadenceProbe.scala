package graft

import org.apache.spark.sql.functions._

/** The graph-tier bench-floor probe (r12 verdict ask #6): g1+g8 cost
  * ~7.5 s of the 73.5 s bench total, each running 10 fixed rounds with
  * an eager `localCheckpoint` materialization per round. This probe
  * measures whether that per-round materialization IS the floor, by
  * timing the identical recurrences at checkpoint cadences 1 (current),
  * 2, 5 and 10 (one pin at the end), and verifying the SERVED RESULTS
  * are byte-identical across cadences before any number is believed —
  * the adopt-only-if-identical rule from the ask.
  *
  * Prints one JSON line: per (algo, cadence) the min/median of N reps
  * plus an `identical` flag vs cadence 1. */
object GraphCadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nodes, edgesRaw) = ext.Graph.graphFor(spark, sfDir)
    val prEdges = edgesRaw
      .select(col("user_a").as("src"), col("user_b").as("dst"))
      .localCheckpoint(true)
    val lpaPairs = edgesRaw
      .select(col("user_a").as("id_a"), col("user_b").as("id_b"))
      .localCheckpoint(true)

    def served(algo: String, cadence: Int): Seq[String] = (algo match {
      case "g1" => ext.Graph.pageRank(prEdges, checkpointEvery = cadence)
        .orderBy(col("rank").desc, col("node")).limit(20)
      case _ => ext.Graph.lpaCommunities(nodes, lpaPairs,
        checkpointEvery = cadence)
    }).collect().map(_.toString).toSeq

    // warm both paths once so codegen/JIT never lands in a timed rep
    served("g1", 1); served("g8", 1)

    val out = new StringBuilder("{")
    var first = true
    Seq("g1", "g8").foreach { algo =>
      val baseline = served(algo, 1)
      Seq(1, 2, 5, 10).foreach { cadence =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val r = served(algo, cadence)
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, r == baseline)
        }
        val ts = times.map(_._1).sorted
        val same = times.forall(_._2)
        if (!first) out.append(",")
        first = false
        out.append(
          s""""${algo}_c$cadence":{"median":${ts((ts.size - 1) / 2)},"min":${ts.head},"identical":$same}""")
        System.err.println(s"[cadence] $algo c=$cadence median=${ts((ts.size - 1) / 2)} min=${ts.head} identical=$same")
      }
    }
    out.append(s""","sf":"$sfDir","reps":$reps}""")
    println(out.toString)
    spark.stop()
  }
}
