package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ARRAY and MAP payloads in the manifest format (round 15): a training
  * corpus's natural columns — token lists, embeddings
  * (`ArrayType(FloatType)`, the embeddings table's own shape), tag
  * maps — land through the committer, round-trip exactly through the
  * structural tokenizers, and compose with row identity, codecs, and
  * schema inference. Stats/pruning/bloom stay scalar-only
  * (statOrdering(array/map) = None — nothing claims a bound over one);
  * map KEYS are restricted to scalar types. */
class ArrayMapPayloadSpec extends AnyFunSuite with SparkSpec {

  private var n = 0
  private def catalog(): (String, String) = {
    n += 1
    val cat = s"gam$n"
    val wh = Files.createTempDirectory(s"graft_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    (cat, wh)
  }

  test("array<double> + array<string> round trip: values, null elements, " +
      "empty arrays, null arrays, escaping") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, vec ARRAY<DOUBLE>,
      toks ARRAY<STRING>)""")
    spark.sql(s"""INSERT INTO $cat.t VALUES
      (1, array(1.5, -2.25, 0.0), array('a', 'b "q"\nc', '')),
      (2, array(CAST(NULL AS DOUBLE), 3.5), array(CAST(NULL AS STRING))),
      (3, array(), array()),
      (4, CAST(NULL AS ARRAY<DOUBLE>), CAST(NULL AS ARRAY<STRING>))""")
    val rows = spark.sql(s"SELECT * FROM $cat.t ORDER BY id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(1.5, -2.25, 0.0))
    assert(rows(0).getSeq[String](2) == Seq("a", "b \"q\"\nc", ""))
    assert(rows(1).getSeq[Any](1) == Seq(null, 3.5))
    assert(rows(1).getSeq[Any](2) == Seq(null))
    assert(rows(2).getSeq[Any](1).isEmpty && rows(2).getSeq[Any](2).isEmpty)
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))
    // The payload really is a JSON array, one line per row.
    val txt = Files.list(java.nio.file.Paths.get(wh, "t")).toArray
      .map(_.toString).filter(_.contains("part-"))
      .map(p => new String(Files.readAllBytes(java.nio.file.Paths.get(p))))
      .mkString("\n")
    assert(txt.contains("\"vec\":[1.5,-2.25,0.0]"), txt.take(400))
    // No bound is ever claimed over an array; null counts still track.
    val e = ManifestSink.committedEntries(s"$wh/t")
    assert(e.flatMap(_.stats).map(_.col).toSet == Set("id"))
    assert(e.map(_.nullCounts("vec")).sum == 1L)
  }

  test("map<string,long> and map<bigint,string> round trip; scalar keys " +
      "re-parse under the declared key type") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, tags MAP<STRING, BIGINT>,
      names MAP<BIGINT, STRING>)""")
    spark.sql(s"""INSERT INTO $cat.t VALUES
      (1, map('a', 1L, 'k "q"', 2L), map(42L, 'x', -7L, 'y\nz')),
      (2, map('only', CAST(NULL AS BIGINT)), map()),
      (3, CAST(NULL AS MAP<STRING, BIGINT>), CAST(NULL AS MAP<BIGINT, STRING>))""")
    val rows = spark.sql(s"SELECT * FROM $cat.t ORDER BY id").collect()
    assert(rows(0).getMap[String, Any](1).toMap ==
      Map("a" -> 1L, "k \"q\"" -> 2L))
    assert(rows(0).getMap[Long, String](2).toMap ==
      Map(42L -> "x", -7L -> "y\nz"))
    assert(rows(1).getMap[String, Any](1).toMap == Map("only" -> null))
    assert(rows(1).getMap[Long, String](2).isEmpty)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("nesting composes: array<struct>, struct<array>, map<string," +
      "array<double>>, array<array<bigint>>") {
    val (cat, _) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT,
      pts ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,
      u STRUCT<name: STRING, scores: ARRAY<BIGINT>>,
      m MAP<STRING, ARRAY<DOUBLE>>,
      aa ARRAY<ARRAY<BIGINT>>)""")
    spark.sql(s"""INSERT INTO $cat.t VALUES
      (1, array(named_struct('x', 1.0, 'y', 2.0),
                named_struct('x', -0.5, 'y', CAST(NULL AS DOUBLE))),
          named_struct('name', 'n1', 'scores', array(7L, 8L)),
          map('v', array(1.0, 2.0)),
          array(array(1L), array(), array(2L, 3L)))""")
    val r = spark.table(s"$cat.t").head()
    val pts = r.getSeq[Row](1)
    assert(pts(0).getDouble(0) == 1.0 && pts(0).getDouble(1) == 2.0)
    assert(pts(1).getDouble(0) == -0.5 && pts(1).isNullAt(1))
    assert(r.getStruct(2).getString(0) == "n1")
    assert(r.getStruct(2).getSeq[Long](1) == Seq(7L, 8L))
    assert(r.getMap[String, scala.collection.Seq[Double]](3)("v").toSeq ==
      Seq(1.0, 2.0))
    assert(r.getSeq[scala.collection.Seq[Long]](4).map(_.toSeq) ==
      Seq(Seq(1L), Seq(), Seq(2L, 3L)))
  }

  test("arrays/maps compose with DVs, equality deletes on scalar keys, " +
      "codecs, and time travel") {
    val (cat, wh) = catalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, vec ARRAY<DOUBLE>)
      TBLPROPERTIES ('codec'='zstd', 'retainhistory'='true')""")
    spark.sql(s"""INSERT INTO $cat.t
      SELECT id, array(id * 1.0, id * 2.0) FROM range(100)""")
    spark.sql(s"DELETE FROM $cat.t WHERE id % 10 = 3") // DV path
    assert(spark.table(s"$cat.t").count() == 90)
    val kept = spark.sql(s"SELECT vec[1] FROM $cat.t WHERE id = 42").head()
    assert(kept.getDouble(0) == 84.0)
    // Time travel back to the pre-delete generation sees all rows.
    val gens = spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 1")
    assert(gens.head().getLong(0) == 100L)
  }

  test("schema inference types homogeneous arrays; heterogeneous " +
      "elements widen to STRING, always-empty arrays defer to raw") {
    val dir = Files.createTempDirectory("gam_infer")
    spark.range(1).selectExpr("CAST(id AS BIGINT) AS id",
        "array(1.5, 2.5) AS v", "array('a', 'b') AS s")
      .write.format("graft.sources.ManifestSink")
      .option("path", dir.toString).mode("append").save()
    val read = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir.toString).load()
    assert(read.schema("v").dataType == ArrayType(DoubleType))
    assert(read.schema("s").dataType == ArrayType(StringType))
    assert(read.selectExpr("v[0]").head().getDouble(0) == 1.5)
    // Foreign heterogeneous array: the array shape survives, each
    // element surfaces as its string spelling.
    val dir2 = Files.createTempDirectory("gam_infer2")
    Files.write(dir2.resolve("f.ndjson"),
      "{\"id\":1,\"x\":[1,\"two\"]}\n".getBytes("UTF-8"))
    Files.write(dir2.resolve(ManifestSink.ManifestName),
      "{\"files\":[{\"name\":\"f.ndjson\",\"rows\":1}]}".getBytes("UTF-8"))
    val read2 = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir2.toString).load()
    assert(read2.schema("x").dataType == ArrayType(StringType))
    assert(read2.select("x").head().getSeq[String](0) == Seq("1", "two"))
  }

  test("codec unit round trip: renderer -> parse -> converter identity " +
      "for arrays and maps; map keys restricted to scalars") {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    def rt(dt: DataType, v: Any): Any = {
      val rendered = NdjsonCodec.renderer(dt)(v)
      NdjsonCodec.converter(dt)(
        NdjsonCodec.parseLine(s"""{"v":$rendered}""")("v"))
    }
    val arr = new GenericArrayData(Array[Any](1.5, null, -2.5))
    val back = rt(ArrayType(DoubleType), arr)
      .asInstanceOf[GenericArrayData]
    assert(back.array.toSeq == Seq(1.5, null, -2.5))
    val sArr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a\nb"), UTF8String.fromString("[{,]}")))
    assert(rt(ArrayType(StringType), sArr).asInstanceOf[GenericArrayData]
      .array.toSeq.map(_.toString) == Seq("a\nb", "[{,]}"))
    val m = new ArrayBasedMapData(
      new GenericArrayData(Array[Any](7L, -1L)),
      new GenericArrayData(Array[Any](UTF8String.fromString("x"), null)))
    val mBack = rt(MapType(LongType, StringType), m)
      .asInstanceOf[ArrayBasedMapData]
    assert(mBack.keyArray.asInstanceOf[GenericArrayData].array.toSeq ==
      Seq(7L, -1L))
    assert(!NdjsonCodec.supported(MapType(ArrayType(LongType), StringType)))
    assert(NdjsonCodec.supported(MapType(DateType, ArrayType(DoubleType))))
  }
}
