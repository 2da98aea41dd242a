package graft

import org.apache.spark.sql.functions._

/** r19 verdict "what's wrong" #1 receipt: sim33's projection was a
  * typed mapPartitions scan (each row round-trips through the Dataset
  * codec); with sim34 the projection gained a corpus-sized consumer,
  * so the house discipline asks for the fused codegen Expression form
  * ([[graft.functions.VecProject]]) and a measured receipt before
  * adopting. This probe times BOTH forms over the embeddings table at
  * a given dir (consumed through the same agg so neither can prune the
  * work away), verifies the outputs BIT-IDENTICAL first, and prints
  * one JSON line. The embeddings replicas in /tmp/sfx10|sfx100 are
  * safe for this probe (no pair/graph blowup — one scan). */
object ProjectionExprProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dim = 64
    val r = ext.Similarity.Sim33R
    val (_, mu, _, vecs) = ext.Similarity.pcaBasis(
      Tables.embeddings(spark, sfDir), dim)
    val basis = vecs.take(r)
    val corpus = Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))

    // the PRE-adoption control, inlined verbatim (pcaProjectFrame now
    // IS the Expression form — the probe must keep comparing against
    // the typed-mapPartitions original to stay reproducible)
    def viaMapPartitions() = {
      val bc = spark.sparkContext.broadcast((mu, basis))
      corpus.select(col("vec_id").cast("long"), col("emb"))
        .as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val (m, b) = bc.value
          it.map { case (id, emb) =>
            val v = emb.toArray
            val y = new Array[Double](r)
            var j = 0
            while (j < r) {
              val bj = b(j)
              var acc = 0.0
              var i = 0
              while (i < dim) { acc += (v(i) - m(i)) * bj(i); i += 1 }
              y(j) = acc
              j += 1
            }
            (id, y.toIndexedSeq)
          }
        }.toDF("vec_id", "proj")
    }
    def viaExpression() = corpus.select(col("vec_id"),
      graft.functions.VectorOps.vecProject(spark, col("emb"),
        typedlit(mu.toIndexedSeq), typedlit(basis.map(_.toIndexedSeq).toIndexedSeq))
        .as("proj"))

    // bit-identity gate: both forms, full compare, before any timing
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(rw => rw.getLong(0) -> rw.getSeq[Double](1)).sortBy(_._1).toSeq
    val same = rows(viaMapPartitions()) == rows(viaExpression())

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f().agg(sum(element_at(col("proj"), 1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    // warm both paths
    time(viaMapPartitions); time(viaExpression)
    val tMp = time(viaMapPartitions)
    val tEx = time(viaExpression)
    println(s"""{"sf":"$sfDir","reps":$reps,"identical":$same,""" +
      s""""map_partitions_min":$tMp,"expression_min":$tEx,""" +
      s""""speedup":${tMp / tEx}}""")
    spark.stop()
  }
}
