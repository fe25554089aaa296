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
}
