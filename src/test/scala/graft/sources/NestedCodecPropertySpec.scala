package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-level net for the round-14 nested codec surgery: arbitrary
  * two-level struct values — control characters, quotes, backslashes,
  * JSON-structural characters, multi-byte text, nulls at every level,
  * extreme numerics including NaN/Infinity — rendered by the REAL
  * writer renderer must re-parse identically through BOTH tokenizers
  * (String and byte-level) and convert back to the identical Catalyst
  * value; and structurally SKIPPING a nested value must never disturb
  * the keys after it. */
object NestedCodecProps extends Properties("NestedCodec") {

  private val geo = StructType(Seq(
    StructField("lat", DoubleType), StructField("n", LongType)))
  private val user = StructType(Seq(
    StructField("name", StringType), StructField("geo", geo),
    StructField("ok", BooleanType)))

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '\u0001', '{', '}',
      '[', ']', ',', ':', 'é', '中'))).map(_.mkString)
  private val genGeo: Gen[Any] = Gen.option(for {
    lat <- Gen.oneOf(Gen.choose(-1e9, 1e9), Gen.oneOf(
      Double.NaN, Double.PositiveInfinity, Double.MinPositiveValue))
    n <- Gen.choose(Long.MinValue, Long.MaxValue)
    nullLat <- Gen.prob(0.2)
    nullN <- Gen.prob(0.2)
  } yield new GenericInternalRow(Array[Any](
    if (nullLat) null else lat, if (nullN) null else n))).map(_.orNull)
  private val genUser: Gen[Any] = Gen.option(for {
    name <- Gen.option(genText)
    g <- genGeo
    ok <- Gen.option(Gen.oneOf(true, false))
  } yield new GenericInternalRow(Array[Any](
    name.map(UTF8String.fromString).orNull, g,
    ok.map(Boolean.box).orNull))).map(_.orNull)

  private def deepEq(a: Any, b: Any, dt: DataType): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) =>
      java.lang.Double.compare(x, y) == 0 // NaN == NaN here
    case _ => dt match {
      case st: StructType =>
        val ra = a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val rb = b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        st.fields.zipWithIndex.forall { case (f, i) =>
          deepEq(if (ra.isNullAt(i)) null else ra.get(i, f.dataType),
            if (rb.isNullAt(i)) null else rb.get(i, f.dataType), f.dataType)
        }
      case _ => a == b
    }
  }

  property("render -> parse (both tokenizers) -> convert == identity") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue), genUser) {
      (id: Long, u: Any) =>
        val uTok = if (u == null) "null" else NdjsonCodec.renderer(user)(u)
        val line = s"""{"id":$id,"u":$uTok}"""
        val viaString = NdjsonCodec.parseLine(line)
        val viaBytes =
          NdjsonCodec.parseBytesSelect(line.getBytes("UTF-8"), null)
        val conv = NdjsonCodec.converter(user)
        def back(m: collection.Map[String, NdjsonCodec.JsonVal]): Any =
          m.get("u") match {
            case Some(NdjsonCodec.JsonNull) | None => null
            case Some(v) => conv(v)
          }
        viaString == viaBytes &&
          deepEq(back(viaString), u, user) &&
          deepEq(back(viaBytes), u, user)
    }

  property("projection skip of a nested value never disturbs later keys") =
    Prop.forAll(Gen.choose(0L, 1000L), genUser) { (id: Long, u: Any) =>
      val uTok = if (u == null) "null" else NdjsonCodec.renderer(user)(u)
      val line = s"""{"u":$uTok,"tail":$id}"""
      val sel = NdjsonCodec.parseBytesSelect(line.getBytes("UTF-8"),
        new NdjsonCodec.NeededKeys(Seq("tail")))
      sel.get("tail").contains(NdjsonCodec.JsonTok(id.toString))
    }
}
