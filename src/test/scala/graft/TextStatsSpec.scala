package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TextStats

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write a planted frame as `documents.parquet` under a temp dir,
    * run the body against the dir, clean up — the scaffold every
    * planted-corpus test here shares. */
  private def withDocsDir[A](docs: DataFrame)(body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("tstest")
    try {
      docs.write.mode("overwrite").parquet(s"$root/documents.parquet")
      body(root.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("quality PSI: a total bin shift reads the hand-computed 1.8503; " +
    "a stable source reads exactly 0 with null-text docs in the -1 bin " +
    "on both sides (T26)") {
    // global doc_id span 0..7 → midpoint split 4 (ref = 0..3).
    // source s: every ref doc stop_ratio 0.25 (bin 2), every cur doc
    // 0.0 (bin 0) — total mass shift. With n=4 per half and 11
    // smoothed bins (denominator 9.5): both nonzero terms are
    // (4/9.5)·ln(9) = 0.925147 → PSI 1.8503, a major drift.
    // source t: identical halves incl. ONE null-text doc each (the −1
    // bin) → every term 0 → PSI exactly 0.0.
    val docs = (
      (0L to 3L).map(i => (i, "the b c d", "s")) ++
        (4L to 7L).map(i => (i, "b c d e", "s")) ++
        (0L to 2L).map(i => (i, "the b c d", "t")) ++ Seq((3L, null, "t")) ++
        (4L to 6L).map(i => (i, "the b c d", "t")) ++ Seq((7L, null, "t"))
      ).toDF("doc_id", "text", "source")
    val out = TextStats.qualityPsi(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("s", 4L, 4L, 1.8503, true),
      ("t", 4L, 4L, 0.0, false)), s"got $out")
  }

  test("unigram logprob matches hand-computed scores; null text is skipped") {
    val docs = Seq(
      (0L, "a a b", "en", "s", 5L),
      (1L, "b b", "fr", "s", 3L),
      (2L, null.asInstanceOf[String], "fr", "s", 0L) // no tokens → skipped
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t9UnigramLogprob(spark, dir).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      // corpus freqs: a=2, b=3 of 5 → p(a)=.4, p(b)=.6
      val (la, lb) = (math.log10(0.4), math.log10(0.6))
      assert(out("en")._1 == 1L)
      assert(math.abs(out("en")._2 - BigDecimal((2 * la + lb) / 3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(out("fr") == ((1L, // null-text doc contributes no row
        BigDecimal(lb).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }
  }

  test("unigram logprob fails fast (not OOM) when the vocab exceeds the cap") {
    val docs = Seq(
      (0L, "one two three four five", "en", "s", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val e = intercept[IllegalArgumentException] {
        TextStats.t9UnigramLogprob(spark, dir, maxVocab = 3)
      }
      assert(e.getMessage.contains("vocabulary exceeds 3"))
    }
  }

  test("bigram logprob matches hand-computed Laplace scores; short docs skip (T22)") {
    val docs = Seq(
      (0L, "a b a c", "en", "s", 7L),
      (1L, "a b", "fr", "s", 3L),
      (2L, "c", "fr", "s", 1L) // one token → no bigram → skipped
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t22BigramLogprob(spark, dir).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      // uni: a=3 b=2 c=1, V=3; bi: "a b"=2 "b a"=1 "a c"=1
      // d0: (log10(3/6) + log10(2/5) + log10(2/6)) / 3 ; d1: log10(3/6)
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val d0 = (math.log10(3.0 / 6) + math.log10(2.0 / 5) +
        math.log10(2.0 / 6)) / 3
      assert(out("en")._1 == 1L)
      assert(math.abs(out("en")._2 - r4(d0)) < 1e-9)
      assert(out("fr") == ((1L, r4(math.log10(3.0 / 6)))))
    }
  }

  test("bigram logprob separates word salad the unigram filter cannot see (T22)") {
    // natural docs repeat one sentence; the salad doc is the SAME
    // multiset of words scrambled so its bigrams are corpus-unique.
    // t9 (unigram) scores identical multisets identically — the salad
    // is invisible to it; t22's conditional model is the separator.
    val nat = (0 until 10).map(i =>
      (i.toLong, "the cat sat on the mat", "nat", "s", 22L))
    val sal = Seq((10L, "mat the on sat cat the", "sal", "s", 22L))
    val docs = (nat ++ sal).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val t22 = TextStats.t22BigramLogprob(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(t22("nat") > t22("sal") + 0.2,
        s"bigram model should separate: nat=${t22("nat")} sal=${t22("sal")}")
      val t9 = TextStats.t9UnigramLogprob(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(math.abs(t9("nat") - t9("sal")) < 1e-9,
        "unigram scores identical multisets identically — the blind spot")
    }
  }

  test("bigram logprob fails fast when the bigram table exceeds its cap (T22)") {
    val docs = Seq(
      (0L, "one two three four five", "en", "s", 23L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val e = intercept[IllegalArgumentException] {
        TextStats.t22BigramLogprob(spark, dir, maxBigrams = 3)
      }
      assert(e.getMessage.contains("bigram table exceeds 3"))
    }
  }

  test("TokenHash bucketJvm ≡ bucket Column over every corpus token " +
    "and bigram — the three-spelling pin behind T24") {
    import graft.functions.TokenHash
    val dir = "/root/testdata/sf0.001"
    val toks = graft.Tables.documents(spark, dir)
      .select(explode(filter(split(lower(col("text")), " "),
        w => w =!= "")).as("tok")).distinct()
    val uniRows = toks
      .withColumn("b", TokenHash.bucket(col("tok"), TextStats.T24UniBuckets))
      .collect()
    assert(uniRows.nonEmpty)
    uniRows.foreach { r =>
      assert(TokenHash.bucketJvm(r.getString(0), TextStats.T24UniBuckets)
        == r.getInt(1), s"jvm/column bucket drift on token '${r.getString(0)}'")
    }
    val bgRows = graft.Tables.documents(spark, dir)
      .select(filter(split(lower(col("text")), " "), w => w =!= "").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("ts"))),
        i => concat(element_at(col("ts"), i - 1), lit(" "),
          element_at(col("ts"), i)))).as("bg")).distinct()
      .withColumn("b", TokenHash.bucket(col("bg"), TextStats.T24BiBuckets))
      .collect()
    assert(bgRows.nonEmpty)
    bgRows.foreach { r =>
      assert(TokenHash.bucketJvm(r.getString(0), TextStats.T24BiBuckets)
        == r.getInt(1), s"jvm/column bucket drift on bigram '${r.getString(0)}'")
    }
  }

  test("hashed LM matches a driver-side bucket-Laplace walk on a " +
    "planted corpus — tiny bucket domains, so collisions are LIVE (T24)") {
    import graft.functions.TokenHash
    val docs = Seq(
      (0L, "a b a c", "en", "s", 7L),
      (1L, "b a b", "en", "s", 5L),
      (2L, "c c a", "fr", "s", 5L),
      (3L, "solo", "fr", "s", 4L) // <2 tokens → NULL score, filtered
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val (bu, bb) = (7, 11) // tiny ON PURPOSE: force bucket collisions
    withDocsDir(docs) { dir =>
      // independent reimplementation: count by bucketJvm, walk each doc.
      // "solo" scores no bigram but still counts in the UNIGRAM table —
      // exactly as the corpus-wide pass-1 aggregate sees it.
      val corpus = Seq(
        Seq("a", "b", "a", "c"), Seq("b", "a", "b"), Seq("c", "c", "a"))
      val uniC = new Array[Long](bu)
      (corpus.flatten :+ "solo").foreach(t =>
        uniC(TokenHash.bucketJvm(t, bu)) += 1)
      val biC = new Array[Long](bb)
      corpus.foreach(ts => ts.sliding(2).foreach(p =>
        biC(TokenHash.bucketJvm(p.mkString(" "), bb)) += 1))
      def docScore(ts: Seq[String]): Double =
        ts.sliding(2).map { p =>
          math.log10((biC(TokenHash.bucketJvm(p.mkString(" "), bb)) + 1.0) /
            (uniC(TokenHash.bucketJvm(p.head, bu)) + bu))
        }.sum / (ts.length - 1)
      val expEn = Seq(docScore(corpus(0)), docScore(corpus(1)))
      val expFr = Seq(docScore(corpus(2)))
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val out = TextStats.t24HashedLm(spark, dir, bu, bb).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      assert(out("en") == ((2L, r4(expEn.sum / 2), r4(expEn.min), r4(expEn.max))))
      assert(out("fr") == ((1L, r4(expFr.head), r4(expFr.head), r4(expFr.head))))
    }
  }

  test("hashed LM brackets the exact LM: collision-free corpus scores " +
    "sit within [exact − log10(Bu/V), exact] (T24 vs T22)") {
    import graft.functions.TokenHash
    val dir = "/root/testdata/sf0.001"
    // Bu at the registered operating point (the bound below involves
    // only Bu); Bb raised to 2²² for THIS test — at the registered 2¹⁶
    // the sf0.001 corpus already carries a handful of birthday-expected
    // bigram collisions (916 bigrams → 911 buckets measured), which the
    // estimator absorbs by design but which would make the exact
    // bracket below unsound.
    val (bu, bb) = (TextStats.T24UniBuckets, 1 << 22)
    // precondition: no bucket collisions at the registered operating
    // point on this corpus — the bracket below is exact only then
    val toks = graft.Tables.documents(spark, dir)
      .select(explode(filter(split(lower(col("text")), " "),
        w => w =!= "")).as("tok"))
    val v = toks.distinct().count()
    val uniBuckets = toks.distinct()
      .select(TokenHash.bucket(col("tok"), bu)).distinct().count()
    assert(uniBuckets == v, "unigram bucket collision — bracket not exact")
    val bgs = graft.Tables.documents(spark, dir)
      .select(filter(split(lower(col("text")), " "), w => w =!= "").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("ts"))),
        i => concat(element_at(col("ts"), i - 1), lit(" "),
          element_at(col("ts"), i)))).as("bg")).distinct()
    assert(bgs.select(TokenHash.bucket(col("bg"), bb)).distinct().count()
      == bgs.count(), "bigram bucket collision — bracket not exact")
    // per-position: lp_hashed − lp_exact = log10((cUni+V)/(cUni+Bu)),
    // which lies in (−log10(Bu/V), 0] for Bu ≥ V — and so does every
    // average of such terms, including the per-lang report columns
    val bound = math.log10(bu.toDouble / v) + 1e-6
    val exact = TextStats.t22BigramLogprob(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val hashed = TextStats.t24HashedLm(spark, dir, bu, bb).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(hashed.keySet == exact.keySet)
    hashed.foreach { case (lang, (avg, mn, mx)) =>
      val (eAvg, eMn, eMx) = exact(lang)
      // ±1e-4 absorbs the report columns' own round(4)
      Seq((avg, eAvg, "avg"), (mn, eMn, "min"), (mx, eMx, "max")).foreach {
        case (h, e, w) =>
          assert(h <= e + 1e-4 && h >= e - bound - 1e-4,
            s"$lang $w: hashed $h outside [${e - bound}, $e]")
      }
    }
  }

  test("compression ratio separates repetitive from varied text") {
    val rnd = new scala.util.Random(5)
    val varied = (0 until 300).map(_ =>
      rnd.alphanumeric.take(8).mkString).mkString(" ")
    val docs = Seq(
      (0L, "spam " * 400, "rep", 2000L),     // near-pure repetition
      (1L, varied, "var", 2700L),            // high-entropy word soup
      (2L, null.asInstanceOf[String], "rep", 0L), // null text must not crash
      (3L, "", "var", 0L)                    // empty text filtered (n_bytes=0)
    ).toDF("doc_id", "text", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t7CompressionRatio(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap // source -> avg_ratio
      assert(out("rep") < 0.1, s"repetitive text should compress hard: $out")
      assert(out("var") > 0.4, s"varied text should resist compression: $out")
      // null text produced n_bytes=0 and was filtered — rep counts only doc 0
    }
  }

  test("repetition ratio separates looping text from unique text (T8)") {
    val docs = Seq(
      (0L, ("spam ham " * 50).trim, "rep", 450L),    // one bigram repeated
      (1L, (0 until 100).map(i => s"w$i").mkString(" "), "uniq", 400L),
      (2L, "solo", "uniq", 4L)                       // <2 words: filtered
    ).toDF("doc_id", "text", "lang", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t8Repetition(spark, dir).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(4)))).toMap
      val (nRep, repRatio, nFlagged) = out("rep")
      assert(nRep == 1L && repRatio > 0.9 && nFlagged == 1L)
      val (nU, uRatio, uFlagged) = out("uniq")
      assert(nU == 1L && uRatio == 0.0 && uFlagged == 0L) // doc 2 dropped
    }
  }

  test("hash sample keeps a stable ~10% fraction, deterministically") {
    val a = TextStats.d8HashSample(spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_sampled"))).head().getLong(0)
    val b = TextStats.d8HashSample(spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_sampled"))).head().getLong(0)
    assert(a == b) // pure function of ids — identical across runs
    val total = Tables.documents(spark, "/root/testdata/sf0.001").count()
    val frac = a.toDouble / total
    assert(frac > 0.04 && frac < 0.2, s"expected ~10% sample, got $frac")
  }

  test("char stats: hand-computed entropy, digit/space fractions, empty-text drop") {
    // "aabb" → p = {a:.5, b:.5} → entropy exactly 1 bit; digits 0.
    // "0011" → entropy 1, digit_frac 1. "a b" → 3 chars {a,' ',b}
    // uniform → entropy log2(3) ≈ 1.585, space_frac 1/3. "" → no row.
    val docs = Seq(
      (0L, "aabb"), (1L, "0011"), (2L, "a b"), (3L, "")
    ).toDF("doc_id", "text")
    withDocsDir(docs) { dir =>
      val out = TextStats.t13CharStats(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      assert(out(0L) == ((4, 1.0, 0.0, 0.0)))
      assert(out(1L) == ((4, 1.0, 1.0, 0.0)))
      assert(out(2L) == ((3, 1.585, 0.0, 0.3333)))
      assert(!out.contains(3L))
    }
  }

  test("corpus manifest: cell + subtotal + grand-total arithmetic agrees") {
    val docs = Seq(
      (0L, "a b", "en", "s1", 3L),
      (1L, "c", "en", "s2", 1L),
      (2L, "d e f", "zh", "s1", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val rows = TextStats.t14CorpusManifest(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(rows(("ALL", "ALL")) == ((3L, 6L, 9L)))   // grand total
      assert(rows(("en", "ALL")) == ((2L, 3L, 4L)))    // lang subtotal
      assert(rows(("ALL", "s1")) == ((2L, 5L, 8L)))    // source subtotal
      assert(rows(("zh", "s1")) == ((1L, 3L, 5L)))     // cell
      assert(rows.size == 3 + 2 + 2 + 1)               // cells+langs+sources+total
    }
  }

  test("bottom-k overlap sketch is EXACT when vocabularies fit inside k (D42)") {
    // vocab sizes 6 and 5, intersection 3 → Jaccard = 3/8 = 0.375;
    // both vocabularies ≤ 256 so the sketches hold every hash and the
    // bottom-k estimator degenerates to the exact computation
    val docs = Seq(
      (1L, "a b c d e f", "en", "s1", 11L),
      (2L, "d e f g h", "en", "s2", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextStats.sourceOverlapSketchDf(spark, docs,
      graft.functions.KMinHash.jaccardEstimate).collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getString(1),
      out.head.getDouble(2)) == (("s1", "s2", 0.375)))
  }

  test("overlap sketch tracks t21's exact Jaccard within estimator error (D42)") {
    val dir = "/root/testdata/sf0.001"
    val exact = TextStats.t21SourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = TextStats.d42SourceOverlapSketch(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, e) =>
      assert(math.abs(e - exact(pair)) <= 0.1, // se ~1/sqrt(256) = 0.0625
        s"$pair: sketch $e vs exact ${exact(pair)}")
    }
  }

  test("overlap sketch is invariant to partitioning (mergeable, order-immune) (D42)") {
    val docs = (1L to 100L).map(i =>
      (i, (1 to 30).map(j => s"w${(i * 7 + j * 13) % 160}").mkString(" "),
        "en", s"s${i % 3}", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = TextStats.sourceOverlapSketchDf(spark, docs,
      graft.functions.KMinHash.jaccardEstimate).collect().map(_.toSeq).toSeq
    val b = TextStats.sourceOverlapSketchDf(spark,
      docs.orderBy($"doc_id".desc).repartition(13),
      graft.functions.KMinHash.jaccardEstimate).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("BM25: hand-computed scores, ranking, and zero-hit/null-text drop (T19)") {
    val docs = Seq(
      (0L, Some("spark spark vector"), "en", "s", 18L),
      (1L, Some("spark table"), "en", "s", 11L),
      (2L, Some("table join"), "en", "s", 10L),       // no query term → dropped
      (3L, None: Option[String], "en", "s", 0L)       // null text → dropped
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextStats.bm25Scores(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))))
      .toMap
    // N=4 docs, dl = 3,2,2,1 → avgdl = 8/4 = 2.0; df: spark=2, vector=1,
    // stream=0. Replay the Okapi arithmetic exactly.
    def idf(df: Int) = math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Int, df: Int, dl: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
    def score(tfS: Int, tfV: Int, tfT: Int, dl: Int) =
      BigDecimal(term(tfS, 2, dl) + term(tfV, 1, dl) + term(tfT, 0, dl))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(0L, 1L))                  // 2 and 3 dropped
    assert(out(0L) == ((3, 2, 1, 0, score(2, 1, 0, 3))))
    assert(out(1L) == ((2, 1, 0, 0, score(1, 0, 0, 2))))
    assert(out(0L)._5 > out(1L)._5)                    // more hits rank higher
  }

  test("phrase search: adjacency in order, never bag-of-words (T20)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", "s"),  // two matches of "alpha beta"
      (1L, "beta alpha beta gamma", "s"),        // one match (not the reversed pair)
      (2L, "alpha gamma beta", "s"),             // both words, NOT adjacent → no row
      (3L, "beta alpha", "s"),                   // reversed only → no row
      (4L, "nothing here", "s")
    ).toDF("doc_id", "text", "source")
    val out = ext.TextStats.phraseSearch(docs, "alpha beta").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L), s"got $out")
    // a 3-token phrase chains a second positional join
    val tri = ext.TextStats.phraseSearch(docs, "alpha beta gamma").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tri == Map(0L -> 1L, 1L -> 1L), s"got $tri")
  }

  test("perplexity gate keeps the highest-logprob half, hand-computed (T23)") {
    // uni: a=3 b=3 c=2 d=2, V=4; bi: "a b"=3 "b a"=1 "c d"=1 "d c"=1.
    // d0 = (2·lg(4/7)+lg(2/7))/3 ≈ −0.3434, d1 = lg(4/7) ≈ −0.2430,
    // d2 = d3 = lg(2/6) ≈ −0.4771. frac 0.5 over 4 docs → target 2 →
    // threshold −0.3434 → exactly the two web docs survive.
    val docs = Seq(
      (0L, "a b a b", "en", "web", 7L),
      (1L, "a b", "en", "web", 3L),
      (2L, "c d", "en", "spam", 3L),
      (3L, "d c", "en", "spam", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t23PerplexityFilter(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val thr = r4((2 * math.log10(4.0 / 7) + math.log10(2.0 / 7)) / 3)
      assert(out("web") == ((2L, 2L, thr)), s"got $out")
      assert(out("spam") == ((2L, 0L, thr)), s"got $out")
    }
  }

  test("perplexity gate is tie-inclusive at the boundary (T23)") {
    // Four identical-score docs at the top: uni a=5 b=5 V=2, "a b"=4
    // "b a"=1 → the 'a b' docs all score lg(5/7) ≈ −0.1461, 'b a'
    // scores lg(2/7) ≈ −0.5441. frac 0.4 over 5 docs → target 2, but
    // the boundary score has 4 members — ALL four kept (the member
    // set must be a pure function of the corpus, never an arbitrary
    // tie cut), so each source keeps its 2 'a b' docs.
    val docs = Seq(
      (0L, "a b", "en", "web", 3L),
      (1L, "a b", "en", "web", 3L),
      (2L, "a b", "en", "spam", 3L),
      (3L, "a b", "en", "spam", 3L),
      (4L, "b a", "en", "spam", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocsDir(docs) { dir =>
      val out = TextStats.t23PerplexityFilter(spark, dir, frac = 0.4)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out == Map("web" -> ((2L, 2L)), "spam" -> ((3L, 2L))),
        s"got $out")
    }
  }
}
