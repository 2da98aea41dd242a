package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{FakeDecoder, Media, Multimodal}

/** The multimodal plumbing must be deterministic, agree with the built-in
  * md5 on identical bytes, sample the right frame count, and be invariant
  * to partition layout (no per-partition state leaks between records). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    Media(0L, "web", "a small image payload".getBytes("UTF-8")),    // len 21 → image
    Media(1L, "web", "an audio-length payload!".getBytes("UTF-8")), // len 24 → image
    Media(2L, "pdf", "x".getBytes("UTF-8")),                        // len 1 → audio
    Media(3L, "pdf", ("y" * 50).getBytes("UTF-8"))                  // len 50 → video
  ).toDS()

  test("fake decode is deterministic arithmetic on byte length") {
    val (t1, w1, h1, f1) = FakeDecoder.decode(Array.fill(21)('a'.toByte))
    assert(t1 == "image" && w1 == 16 + 21 && h1 == 16 + 147 && f1 == 1)
    val (t2, _, _, f2) = FakeDecoder.decode(Array.fill(50)('a'.toByte))
    assert(t2 == "video" && f2 == 1 + 50 % 24)
    assert(FakeDecoder.decode(Array.fill(1)('z'.toByte))._1 == "audio")
  }

  test("decode fingerprint matches the built-in md5 on the same bytes") {
    val decoded = Multimodal.decodeMeta(media)
      .select(col("doc_id"), col("fingerprint"))
    val builtin = media.select(col("doc_id"), md5(col("payload")).as("ref_fp"))
    val joined = decoded.join(builtin, "doc_id")
      .filter(col("fingerprint") =!= col("ref_fp"))
    assert(joined.isEmpty)
  }

  test("frame sampling emits every stride-th frame with a derived pointer") {
    val meta = Multimodal.decodeMeta(media)
    val frames = Multimodal.sampleFrames(meta, stride = 4).collect()
    val byDoc = frames.groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted)
    // video doc 3: n_frames = 1 + 50%24 = 3 → frames 0 only at stride 4
    assert(byDoc(3L).toSeq == Seq(0))
    // image docs sample exactly frame 0
    assert(byDoc(0L).toSeq == Seq(0) && byDoc(1L).toSeq == Seq(0))
    // pointers are unique per (doc, frame)
    assert(frames.map(f => (f.doc_id, f.frame_idx)).distinct.length == frames.length)
  }

  test("decode results are invariant to partition layout") {
    val one = Multimodal.decodeMeta(media.repartition(1)).collect().toSet
    val many = Multimodal.decodeMeta(media.repartition(5)).collect().toSet
    assert(one == many)
  }

  test("resize aspect-fits into the bound, never upscales, re-fingerprints") {
    val meta = Multimodal.decodeMeta(media)
    val resized = Multimodal.resizeMeta(meta, maxDim = 32).collect()
      .map(m => m.doc_id -> m).toMap
    val orig = meta.collect().map(m => m.doc_id -> m).toMap
    resized.values.foreach { m =>
      assert(m.width <= 32 && m.height <= 32)
      val o = orig(m.doc_id)
      if (o.width <= 32 && o.height <= 32) {
        // already inside the bound → untouched dims
        assert(m.width == o.width && m.height == o.height)
      } else {
        // aspect preserved within rounding
        val ratioBefore = o.width.toDouble / o.height
        val ratioAfter = m.width.toDouble / m.height
        assert(math.abs(ratioBefore - ratioAfter) / ratioBefore < 0.1)
      }
      assert(m.fingerprint != o.fingerprint) // new cache key
      assert(m.byte_len == o.byte_len)       // source bytes untouched
    }
  }

  test("mm4 alignment funnel: keeps aligned docs, drops anti-aligned, skips zero-norm") {
    val docs = Seq(
      (1L, "sA"), (2L, "sA"), (3L, "sB"), (4L, "sB")
    ).toDF("doc_id", "source")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos +1 vs ref → kept
      (2L, Array(-1.0f, 0.0f)),  // cos −1 → counted, not kept
      (3L, Array(0.0f, 1.0f)),   // cos 0 → kept (>= 0)
      (4L, Array(0.0f, 0.0f))    // zero norm → NaN → excluded entirely
    ).toDF("doc_id", "embedding")
    val ref = Seq((0L, Array(1.0f, 0.0f))).toDF("doc_id", "embedding")
    val out = Multimodal.mm4AlignmentFilterDf(docs, emb, ref)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("sA") == ((2L, 1L, 0.0)))  // (+1 + −1)/2 = 0
    assert(out("sB") == ((1L, 1L, 0.0)))  // NaN doc 4 never enters the funnel
  }

  test("perceptual hash: identical payloads collide, a small edit stays close, " +
    "unrelated bytes diverge") {
    val base = ("the same long media payload with plenty of structure " * 4)
      .getBytes("UTF-8")
    val edited = base.clone(); edited(10) = 'X'.toByte
    val rnd = new scala.util.Random(5)
    val other = Array.fill(base.length)(rnd.nextInt(256).toByte)
    val ds = Seq(
      Media(0L, "s", base), Media(1L, "s", base),
      Media(2L, "s", edited), Media(3L, "s", other),
      Media(4L, "s", null), Media(5L, "s", Array.emptyByteArray) // dropped
    ).toDS()
    val h = Multimodal.perceptualHash(ds)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h.keySet == Set(0L, 1L, 2L, 3L))
    assert(h(0L) == h(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(2L)) <= 3, s"edit moved ${ham(h(0L), h(2L))} bits")
    assert(ham(h(0L), h(3L)) > 3, s"unrelated only ${ham(h(0L), h(3L))} bits")
  }

  test("planted PNGs take the real ImageIO path: header dims equal the " +
    "planted arithmetic, aHash is the raster hash, not the byte stripe") {
    import graft.ext.ImageIoDecoder
    val id = 150L // ≡ 0 (mod PngMod) — a row mm2/mm5 would plant
    val png = Multimodal.plantedPng(id)
    // dims must be the doc_id arithmetic the mm2 oracle replays — this
    // equality is what makes oracle green a PROOF the real decoder ran
    assert(ImageIoDecoder.decode(png) ==
      ("image", (16 + id % 64).toInt, (16 + id * 3 % 48).toInt, 1))
    val cells = ImageIoDecoder.gray64(png).get
    val mean = cells.sum / 64.0
    var expected = 0L
    cells.zipWithIndex.foreach { case (c, i) =>
      if (c > mean) expected |= (1L << i)
    }
    val ds = Seq(Media(id, "web", png)).toDS()
    val real = Multimodal.perceptualHash(ds, ImageIoDecoder)
      .collect().head.getLong(2)
    val stripe = Multimodal.perceptualHash(ds, FakeDecoder)
      .collect().head.getLong(2)
    assert(real == expected, "perceptualHash did not use the decoded raster")
    assert(real != stripe, "raster hash degenerated to the byte stripe")
    // and the swap-in only touches the planted cadence
    val swapped = Multimodal.mediaWithPlantedPng(spark, "/root/testdata/sf0.001")
      .filter((m: Media) => m.doc_id < 60)
      .collect().map(m => m.doc_id -> m.payload).toMap
    assert(swapped.keys.filter(_ % 50 == 0).forall(i =>
      java.util.Arrays.equals(swapped(i), Multimodal.plantedPng(i))))
  }

  test("real decoder: imageio reads true dims; re-encoded image hashes near, " +
    "different image far, non-image falls back") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import graft.ext.ImageIoDecoder
    // a structured raster: horizontal gradient + a dark block, so the
    // aHash has real signal (a flat image hashes to noise-sensitive ~0)
    def paint(flip: Boolean): BufferedImage = {
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val g = if (flip) 255 - x * 4 else x * 4
        img.setRGB(x, y, new java.awt.Color(g, g, g).getRGB)
      }
      for (y <- 8 until 24; x <- 8 until 24) img.setRGB(x, y, 0)
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val jpeg = enc(paint(false), "jpg")
    val png = enc(paint(false), "png")        // same raster, different codec
    val flipped = enc(paint(true), "jpg")     // different raster
    // header-only metadata decode reports the true dimensions
    assert(ImageIoDecoder.decode(jpeg) == ("image", 64, 48, 1))
    assert(ImageIoDecoder.decode(png) == ("image", 64, 48, 1))
    val ds = Seq(Media(0L, "s", jpeg), Media(1L, "s", png),
      Media(2L, "s", flipped), Media(3L, "s", "not an image".getBytes("UTF-8"))
    ).toDS()
    val h = Multimodal.perceptualHash(ds, ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the re-encode (JPEG lossy vs PNG lossless of ONE raster) survives —
    // exactly the copy exact-md5 dedup misses and perceptual dedup exists for
    assert(ham(h(0L), h(1L)) <= 3, s"re-encode moved ${ham(h(0L), h(1L))} bits")
    assert(ham(h(0L), h(2L)) > 3, s"different image only ${ham(h(0L), h(2L))} bits apart")
    // a non-image payload flows through the byte-striping fallback,
    // byte-identical to what the stub decoder produces for it
    val fallback = Multimodal.perceptualHash(
      Seq(Media(3L, "s", "not an image".getBytes("UTF-8"))).toDS(), FakeDecoder)
      .collect().head.getLong(2)
    assert(h(3L) == fallback)
  }

  test("pixel resize: aspect-fit downscale, no upscale, non-image untouched") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int): Array[Byte] = {
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        b.setRGB(x, y, ((x * 31 + y * 17) % 255) << 8)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(b, "png", bos); bos.toByteArray
    }
    val small = img(10, 8)
    val textBytes = "plain text payload".getBytes("UTF-8")
    val ds = Seq(
      Media(0L, "s", img(64, 48)),   // downscales to 16x12
      Media(1L, "s", img(30, 60)),   // portrait: 8x16
      Media(2L, "s", small),         // already fits: byte-identical
      Media(3L, "s", textBytes)      // not an image: untouched
    ).toDS()
    val out = Multimodal.resizePixels(ds, maxDim = 16)
      .collect().map(m => m.doc_id -> m.payload).toMap
    def dims(b: Array[Byte]) = {
      val i = ImageIO.read(new java.io.ByteArrayInputStream(b))
      (i.getWidth, i.getHeight)
    }
    assert(dims(out(0L)) == (16, 12))
    assert(dims(out(1L)) == (8, 16))
    assert(out(2L).sameElements(small))
    assert(out(3L).sameElements(textBytes))
  }

  test("mm9 pHash survives a brightness-gradient re-grade that aHash " +
    "misses; different raster stays far; LSH ≡ brute over DCT hashes") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import graft.ext.ImageIoDecoder
    // a textured base raster: pseudorandom block levels + a column
    // profile with STRONG odd harmonics, so the base's row-0 DCT
    // coefficients dwarf the ramp's higher harmonics (the ramp can
    // then flip at most the v=1 neighborhood — the pHash robustness
    // being planted), while plenty of cells still sit near aHash's
    // global mean (the aHash fragility being planted). Constants were
    // fixed by an offline grid search over non-clipping configs:
    // pHash moves 2 bits under the ramp, aHash moves 8.
    def paint(ramp: Boolean, seedShift: Int = 0): BufferedImage = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      def harm(c: Int, v: Int) = math.cos((2 * c + 1) * v * math.Pi / 16.0)
      for (y <- 0 until 64; x <- 0 until 64) {
        val block = (y / 8) * 8 + (x / 8)
        val c = x / 8
        val base = 60.0 + ((block * 37 + seedShift) % 11) * 8 +
          -30 * harm(c, 1) + 20 * harm(c, 3) + 15 * harm(c, 5) +
          10 * harm(c, 7)
        // the edited copy adds a left-to-right brightness ramp — the
        // vignette/re-grade class: smooth, additive, column-separable
        val g = math.round(base).toInt + (if (ramp) x else 0)
        assert(g >= 0 && g <= 255, s"painter clipped: $g")
        img.setRGB(x, y, new java.awt.Color(g, g, g).getRGB)
      }
      img
    }
    def enc(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val ds = Seq(
      Media(0L, "s", enc(paint(ramp = false))),
      Media(1L, "s", enc(paint(ramp = true))),        // re-graded duplicate
      Media(2L, "s", enc(paint(ramp = false, seedShift = 5)))) // other image
      .toDS()
    def hashesOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val p = hashesOf(Multimodal.dctPerceptualHash(ds, ImageIoDecoder))
    val a = hashesOf(Multimodal.perceptualHash(ds, ImageIoDecoder))
    // the planted discriminator: pHash catches the re-grade, aHash loses it
    assert(ham(p(0L), p(1L)) <= 3,
      s"pHash lost the gradient duplicate: ${ham(p(0L), p(1L))} bits")
    assert(ham(a(0L), a(1L)) > 3,
      s"aHash unexpectedly survived the gradient: ${ham(a(0L), a(1L))} bits")
    // and pHash still separates genuinely different rasters
    assert(ham(p(0L), p(2L)) > 3,
      s"pHash collapsed distinct rasters: ${ham(p(0L), p(2L))} bits")
    // LSH ≡ brute parity on the DCT hashes (the d4 kernel, unchanged)
    val hashes = Multimodal.dctPerceptualHash(ds, ImageIoDecoder)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(2))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val lsh = graft.ext.Dedup.hammingPairs(hashes, "phash", 4, 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"LSH ${lsh.size} pairs vs brute ${brute.size}")
  }

  test("mm5 pairs equal brute-force Hamming pairs over the same hashes, any b") {
    val rnd = new scala.util.Random(9)
    val payloads = (0L until 30L).map { i =>
      // clustered payloads: 3 families of near-identical bytes + noise
      val fam = ("family " + (i % 3) + " payload body with stable words " * 3)
        .getBytes("UTF-8").clone()
      if (i >= 3) fam(rnd.nextInt(fam.length)) = rnd.nextInt(256).toByte
      Media(i, "s", fam)
    }
    val hashes = Multimodal.perceptualHash(payloads.toDS())
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(2))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    for (b <- Seq(4, 6)) {
      val lsh = graft.ext.Dedup.hammingPairs(hashes, "phash", b, 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh == brute, s"b=$b: LSH ${lsh.size} pairs vs brute ${brute.size}")
    }
  }

  test("header probe reads IHDR dims off the bytes; non-PNG payloads count only (MM8)") {
    import spark.implicits._
    // planted PNG for doc 100: w = 16 + 100%64 = 52, h = 16 + 300%48 = 28
    val media = Seq(
      Media(100L, "s", ext.Multimodal.plantedPng(100L)),
      Media(1L, "s", "plain text bytes".getBytes("UTF-8")),
      Media(2L, "t", Array[Byte](0x42, 0x4d, 0x00))  // BMP-ish magic, not PNG
    ).toDF()
    val out = ext.Multimodal.headerProbe(media).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out("s") == ((2L, 1L, 52L, 28L, 52L, 28L)))
    assert(out("t") == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }
}
