package graft

import graft.operators.Flatten
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Flatten (SURVEY §2.B P2) — key-concatenation semantics must match the
  * reference's recursive flattener (`dags/utils/utils.py:1-20`): parent
  * key + sep + key, default sep "_", top-level keys unprefixed. */
class FlattenSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("flattens nested structs with underscore-joined keys") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("address", StructType(Seq(
        StructField("city", StringType),
        StructField("geo", StructType(Seq(
          StructField("lat", StringType),
          StructField("lng", StringType)))))))))
    val out = Flatten.flatten(df(schema, Row(1L, Row("x", Row("1.5", "2.5")))))
    assert(out.columns.toSeq ==
      Seq("id", "address_city", "address_geo_lat", "address_geo_lng"))
    assert(out.collect().head == Row(1L, "x", "1.5", "2.5"))
  }

  test("idempotent on flat input and preserves column order") {
    val schema = StructType(Seq(
      StructField("b", StringType), StructField("a", LongType)))
    val out = Flatten.flatten(df(schema, Row("v", 2L)))
    assert(out.columns.toSeq == Seq("b", "a"))
    assert(Flatten.flatten(out).columns.toSeq == Seq("b", "a"))
  }

  test("custom separator") {
    val schema = StructType(Seq(
      StructField("s", StructType(Seq(StructField("x", LongType))))))
    val out = Flatten.flatten(df(schema, Row(Row(7L))), sep = ".")
    assert(out.columns.toSeq == Seq("s.x"))
  }

  test("leaf count is preserved") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("b", StructType(Seq(
          StructField("c", LongType), StructField("d", LongType)))),
        StructField("e", StringType)))),
      StructField("f", DoubleType)))
    assert(Flatten.flatColumns(schema).size == 4)
  }
}
