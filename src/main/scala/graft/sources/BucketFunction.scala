package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Partition TRANSFORM specs a manifest table supports: identity (one
  * file per VALUE — pruning + SPJ for low-cardinality columns) and
  * `bucket(n, col)` (one file per HASH BUCKET — SPJ on high-cardinality
  * join keys, the Iceberg bucket-join shape, where identity would
  * explode into a file per key). Persisted and optioned as strings
  * (`"lang"`, `"bucket(8,doc_id)"`). */
private[sources] sealed trait PartSpec {
  def col: String
  /** Persisted name — the manifest entry's `part.<name>` key. */
  def name: String
}
private[sources] final case class IdentityPart(col: String) extends PartSpec {
  def name: String = col
}
private[sources] final case class BucketPart(n: Int, col: String) extends PartSpec {
  def name: String = s"bucket($n,$col)"
}

private[sources] object PartSpec {
  private val Bucket = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r

  def parse(s: String): PartSpec = s.trim match {
    case Bucket(n, col) =>
      require(n.toInt > 0, s"bucket count must be positive in '$s'")
      BucketPart(n.toInt, col)
    case col => IdentityPart(col)
  }

  def parseAll(specs: Seq[String]): Seq[PartSpec] = specs.map(parse)

  /** Split a comma-separated spec list, respecting transform parens:
    * `"lang, bucket(8,doc_id)"` → `["lang", "bucket(8,doc_id)"]`. */
  def splitList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.setLength(0)
      case c =>
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }
}

/** The bucket hash: Catalyst Murmur3 over the column's Catalyst value,
  * floor-mod the bucket count. Any deterministic function works — only
  * this writer ever computes it, and storage-partitioned joins match
  * bucket IDs across tables written by the same code — but Murmur3
  * gives well-mixed buckets for free. Nulls all land in bucket 0. */
private[sources] object GraftBucket {
  val Seed = 42L

  def bucket(n: Int, value: Any, dt: DataType): Int =
    if (value == null) 0
    else {
      val h = Murmur3HashFunction.hash(value, dt, Seed)
      ((h % n + n) % n).toInt
    }
}

/** The V2 function the catalog serves as `bucket` — what lets Spark's
  * storage-partitioned-join machinery RESOLVE a `bucket(n, col)`
  * transform reported by the scan (V2ExpressionUtils loads it from the
  * table's FunctionCatalog, Iceberg's SystemFunctions pattern). The
  * bound form also evaluates: same Murmur3 the writer used, so any
  * engine-side evaluation agrees with the layout. */
private[sources] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): Murmur3 hash bucket of col, in [0, n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, value), got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument must be INT, got ${inputType.fields(0).dataType}")
    BoundBucket(inputType.fields(1).dataType)
  }
}

private[sources] final case class BoundBucket(valueType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // Canonical identity is what SPJ compares across the join's two
  // sides — type-qualified so bucket(8, BIGINT) never claims
  // compatibility with bucket(8, STRING).
  override def canonicalName(): String =
    s"graft.bucket(${valueType.catalogString})"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.bucket(input.getInt(0),
      if (input.isNullAt(1)) null else input.get(1, valueType), valueType)
}
