package graft

/** Dev tool: time named queries at a given SF and optionally dump the
  * formatted physical plan. Usage:
  *   sbt "runMain graft.Profile sf0.1 d5_ngram_jaccard [--explain]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.01")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val explain = args.contains("--explain")
    val dir = s"/root/testdata/$sf"
    val spark = Sessions.builder("local[32]", 32)
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    // session warmup so the first target doesn't absorb codegen/JIT cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, dir).explain("formatted")
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name run$run: $dt%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
