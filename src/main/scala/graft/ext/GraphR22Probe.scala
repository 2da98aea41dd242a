package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r21-verdict ask-#8 re-probe: g5's pinned-components route and
  * g8's fused changed-probe were measured "slower / wash" at sf0.1 and
  * reverted; the structural argument says both should win once fixed
  * per-job costs stop dominating. This probe re-runs both A/Bs at
  * sf0.1 AND at the 3x time-disjoint graph corpus
  * (scripts/make_sfx3graph.py — three disjoint copies of the base
  * co-presence graph; the sfx10 replica corpus is unusable for graph
  * ops, r11 postmortem), verifying the SERVED rows identical before
  * timing (the cadence-probe rule).
  *
  * Variants:
  *  - g5 reg: componentCensus (connectedComponents → pairs checkpoint)
  *  - g5 pinned: connectedComponentsPinned on the un-checkpointed pair
  *    projection off the pinned co-presence view (the r21 alternative)
  *  - g8 reg: lpaCommunities(earlyExit = true) — the registered shape
  *    (changed-probe = a separate limit-1 join job per round)
  *  - g8 fused: the changed-probe join fused INTO the per-round
  *    checkpoint (prev label carried in the pinned frame; the probe is
  *    then a scan of the materialized frame)
  *
  * Prints one JSON line with per-(algo, variant) min/median of N reps
  * + identical flags. */
object GraphR22Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nodes, edgesRaw) = Graph.graphFor(spark, sfDir)
    val pairs = edgesRaw
      .select(col("user_a").as("id_a"), col("user_b").as("id_b"))

    def census(labels: DataFrame): DataFrame =
      labels.groupBy(col("label").as("component_id"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("component_id"))

    // g8 fused variant: identical joins/votes; the only change is that
    // each round's checkpoint carries the previous label so the
    // early-exit probe reads the pinned frame instead of running its
    // own join job.
    def lpaFused(rounds: Int = 10): DataFrame = {
      val edges = pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"),
          col("id_a").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true)
      var labels = nodes
        .select(col("node"), col("node").as("label"))
        .localCheckpoint(true)
      var i = 1
      var done = false
      while (i <= rounds && !done) {
        val votes = edges
          .join(labels.select(col("node"), col("label")),
            col("dst") === col("node"))
          .select(col("src"), col("label"))
          .unionByName(labels.select(col("node").as("src"), col("label")))
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        val next = votes
          .groupBy(col("src"))
          .agg(max_by(col("label"),
            struct(col("cnt"), (col("label") * -1).as("neg"))).as("label"))
          .select(col("src").as("node"), col("label"))
        val pinned = next
          .join(labels.select(col("node"), col("label").as("prev")),
            Seq("node"))
          .localCheckpoint(true)
        if (pinned.filter(col("label") =!= col("prev")).limit(1).isEmpty)
          done = true
        labels = pinned.select(col("node"), col("label"))
        i += 1
      }
      labels.groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community"))
        .limit(20)
    }

    val variants: Seq[(String, String, () => Seq[String])] = Seq(
      ("g5", "reg", () => Graph.componentCensus(nodes, pairs)
        .collect().map(_.toString).toSeq),
      ("g5", "pinned", () => census(
        Dedup.connectedComponentsPinned(nodes, pairs))
        .collect().map(_.toString).toSeq),
      ("g8", "reg", () => Graph.lpaCommunities(nodes, pairs,
        earlyExit = true).collect().map(_.toString).toSeq),
      ("g8", "fused", () => lpaFused()
        .collect().map(_.toString).toSeq))

    val baseline = scala.collection.mutable.Map[String, Seq[String]]()
    val out = variants.map { case (algo, variant, run) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = run()
        val sec = (System.nanoTime() - t0) / 1e9
        if (variant == "reg") baseline(algo) = rows
        (sec, rows)
      }
      val identical = times.forall(_._2 == baseline(algo))
      val ts = times.map(_._1).sorted
      f""""${algo}_$variant":{"min":${ts.head}%.3f,"median":${
        ts((ts.size - 1) / 2)}%.3f,"identical":$identical}"""
    }
    println(s"""{"sf":"$sfDir","reps":$reps,${out.mkString(",")}}""")
    spark.stop()
  }
}
