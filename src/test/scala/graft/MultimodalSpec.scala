package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism and batch shape of the
  * binary-payload pipeline (decode kernel itself is a stub — see
  * Multimodal.decodeFeatures). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"), (1L, ""), (2L, "hello world"), (3L, "xyz")
  ).toDF("doc_id", "text")

  test("attachFakeMedia produces binary payload + typed metadata") {
    val m = Multimodal.attachFakeMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = m.where(col("doc_id") === 0).select("meta.format", "meta.n_bytes")
      .as[(String, Long)].head()
    assert(meta == ("raw", 11L))
  }

  test("decodeFeatures: deterministic, fixed-width, equal inputs → equal features") {
    val feats = Multimodal.mediaFeatureTable(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("checksum"),
          r.getAs[scala.collection.Seq[Float]]("features").toSeq)).toMap
    assert(feats.size == 4)
    assert(feats(0L)._2.size == 8) // fixed feature width
    assert(feats(0L) == feats(2L)) // identical payloads → identical features
    assert(feats(0L) != feats(3L))
    assert(feats(1L)._1 == 0L) // empty payload checksum
    // Determinism across runs:
    val again = Multimodal.mediaFeatureTable(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    assert(again(3L) == feats(3L)._1)
  }

  test("imageio lane: real PNG bytes decode back to the closed-form pixels") {
    // The payload must be a REAL PNG (magic header + actual compression),
    // not a stub: ImageIO must parse it and every pixel must match the
    // generator's closed form.
    val png = Multimodal.syntheticPng(7L)
    assert(png.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A),
      "payload must carry the PNG signature")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == (8 + 7 % 5) && img.getHeight == (6 + 7 % 4))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == 7 % 200 + x)
      assert(((rgb >> 8) & 0xFF) == 7 % 150 + y)
      assert((rgb & 0xFF) == 7 % 97)
    }
    // End-to-end through Spark: encode on executors, decode on
    // executors, features match the closed forms for every doc.
    val ids = Seq(0L, 1L, 3L, 97L, 199L, 200L, 1234567L)
    val feats = Multimodal.imageFeatureTable(
        ids.map(i => (i, s"doc $i")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(feats.size == ids.size)
    ids.foreach { d =>
      val (w, h) = (8 + d % 5, 6 + d % 4)
      val (rb, gb, bb) = (d % 200, d % 150, d % 97)
      assert(feats(d) == ((w, h,
        h * (w * rb + w * (w - 1) / 2),
        w * (h * gb + h * (h - 1) / 2),
        w * h * bb)), s"doc $d features diverge from the closed form")
    }
  }

  test("wav lane: real RIFF/WAVE bytes decode back to the closed-form samples") {
    val wav = Multimodal.syntheticWav(13L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "payload must carry the RIFF/WAVE container signature")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val raw = ais.readAllBytes()
    val n = (64 + 13 % 32).toInt
    assert(raw.length == n * 2)
    val (a, k) = (13 % 1000 + 1, 13 % 7 + 1)
    (0 until n).foreach { i =>
      val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort.toInt
      assert(s == (i * k) % (2 * a) - a, s"sample $i diverges")
    }
    // End-to-end through Spark for a spread of ids.
    val ids = Seq(0L, 1L, 999L, 1000L, 31L, 7654321L)
    val feats = Multimodal.audioFeatureTable(
        ids.map(i => (i, s"doc $i")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ids.foreach { d =>
      val nn = (64 + d % 32).toInt
      val (aa, kk) = ((d % 1000 + 1).toInt, (d % 7 + 1).toInt)
      val smp = (0 until nn).map(i => (i * kk) % (2 * aa) - aa)
      assert(feats(d) == ((nn.toLong, smp.map(_.toLong).sum,
        smp.map(x => x.toLong * x).sum)), s"doc $d features diverge")
    }
  }

  test("frameSample keeps every stride-th byte") {
    val sampled = Multimodal.attachFakeMedia(docs)
      .where(col("doc_id") === 0)
      .select(Multimodal.frameSample(col("media"), 4).as("frames"))
      .as[Seq[Array[Byte]]].head()
    // "hello world" bytes at offsets 0,4,8 -> h, o, r
    assert(sampled.map(b => new String(b)) == Seq("h", "o", "r"))
  }

  test("resizeStub: nearest-neighbor resample to fixed size, empty-safe") {
    val out = Multimodal.attachFakeMedia(docs)
      .select(col("doc_id"), Multimodal.resizeStub(col("media"), 4).as("r"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("r")).toMap
    // "hello world" (11 bytes) -> positions floor(i*11/4) = 0,2,5,8 -> h,l,space,r
    assert(new String(out(0L)) == "hl r")
    assert(out(0L).length == 4)
    assert(out(1L).length == 0) // empty stays empty
    // Upsampling "xyz" (3 bytes) to 4: floor(i*3/4) = 0,0,1,2 -> x,x,y,z
    assert(new String(out(3L)) == "xxyz")
  }

  test("frameSample of an empty payload is an empty array") {
    val sampled = Multimodal.attachFakeMedia(docs)
      .where(col("doc_id") === 1) // text = ""
      .select(Multimodal.frameSample(col("media"), 4).as("frames"))
      .as[Seq[Array[Byte]]].head()
    assert(sampled.isEmpty)
  }

  test("gif lane: every frame of the real multi-frame decode is pixel-exact") {
    // PER-FRAME ROUND-TRIP PIN: encode the synthetic animation, decode
    // it back with the JDK reader, and compare every pixel of every
    // frame against the closed form — the bit-exactness claim the
    // mm12 oracle relies on, checked at pixel granularity (the spec's
    // sums could mask compensating errors; this cannot).
    (0L until 24L).foreach { d =>
      val gif = Multimodal.syntheticGif(d)
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif)))
      val n = reader.getNumImages(true)
      assert(n == (3 + d % 4).toInt, s"doc $d: frame count")
      val (w, h) = ((8 + d % 3).toInt, (6 + d % 2).toInt)
      val (base, k) = ((d % 100).toInt, (d % 9).toInt + 1)
      (0 until n).foreach { f =>
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h,
          s"doc $d frame $f: ${img.getWidth}x${img.getHeight}")
        val vf = base + (f * f * k) % 50
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            val got = img.getRGB(x, y) & 0xFF
            assert(got == vf + x + y,
              s"doc $d frame $f pixel ($x,$y): got $got, want ${vf + x + y}")
          }
        }
      }
      reader.dispose()
    }
    // And the table-level decode agrees with the closed-form sums.
    val row = Multimodal.gifFrameTable(docs.where(col("doc_id") === 3))
      .head()
    val (w3, h3) = (8 + 3 % 3, 6 + 3 % 2)
    val expect = (0 until (3 + 3 % 4)).map { f =>
      w3.toLong * h3 * (3 % 100 + (f * f * (3 % 9 + 1)) % 50) +
        h3.toLong * (w3 * (w3 - 1) / 2) + w3.toLong * (h3 * (h3 - 1) / 2)
    }
    assert(row.getSeq[Long](row.fieldIndex("frame_sums")).toSeq == expect)
  }
}
