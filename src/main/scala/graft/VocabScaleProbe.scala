package graft

import org.apache.spark.sql.functions._

/** One-off receipt for t24's scale claim (r13 verdict ask #1): at a
  * base corpus and at the 10×-replica corpus (whose per-replica word
  * prefixes multiply the VOCABULARY 10× — the axis the exact LM's
  * count tables grow along), print the exact model's table sizes
  * beside the hashed model's — which must stay at Bu+Bb rows — and
  * the timed scoring passes of both. The r13 round measured the exact
  * path approaching its 65k cap along exactly this axis; this artifact
  * is the "flat table where the cap was approaching" receipt.
  * Usage: VocabScaleProbe [baseDir bigDir] → one JSON line. */
object VocabScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/sfx10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def toks(dir: String) = Tables.documents(spark, dir)
      .select(filter(split(lower(col("text")), " "), w => w =!= "")
        .as("toks"))
    def measure(dir: String): String = {
      val uniV = toks(dir).select(explode(col("toks")).as("t"))
        .distinct().count()
      val biV = toks(dir).filter(size(col("toks")) >= 2)
        .select(explode(transform(sequence(lit(2), size(col("toks"))),
          i => concat(element_at(col("toks"), i - 1), lit(" "),
            element_at(col("toks"), i)))).as("bg")).distinct().count()
      // warm both trained artifacts (ingest, untimed), then time the
      // scoring PASS (best of 2 — the serve line, t22 vs t24)
      def timed(q: String): Double = {
        ext.TextStats.queries(q)(spark, dir).count()
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          ext.TextStats.queries(q)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val t22 = timed("t22_bigram_logprob")
      val t24 = timed("t24_hashed_lm")
      s""""$dir":{"exact_uni_rows":$uniV,"exact_bi_rows":$biV,""" +
        s""""hashed_uni_rows":${ext.TextStats.T24UniBuckets},""" +
        s""""hashed_bi_rows":${ext.TextStats.T24BiBuckets},""" +
        s""""t22_pass_sec":${J.f3(t22)},"t24_pass_sec":${J.f3(t24)}}"""
    }
    println("{" + measure(base) + "," + measure(big) + "}")
    spark.stop()
  }
}
