package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{CosineSimilarity, JaroWinkler, MinHashBandBuckets, MinHashSignature, ShingleHashes, SimHash64}

/** SQL front-door registration for the engine's custom expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works next to the
  * DataFrame API.
  *
  * Two entry points:
  *  - cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applied at session build, the standard extensions hook);
  *  - existing session (tests, notebooks): `GraftExtensions.register(spark)`.
  *
  * No custom `Rule`/`SparkStrategy` is injected — SURVEY §4.3 records
  * that decision: every operator plans correctly on built-in strategies.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every SQL-exposed custom expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "cosine_similarity(arrA, arrB)")
        CosineSimilarity(es.head, es(1))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "simhash64(tokenHashArray)")
        SimHash64(es.head)
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "shingle_hashes(str, k)")
        ShingleHashes(es.head, intArg(es(1), "k"))
      }),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "jaro_winkler(strA, strB)")
        JaroWinkler(es.head, es(1))
      }),
    ("minhash_band_buckets",
      new ExpressionInfo(classOf[MinHashBandBuckets].getName, "minhash_band_buckets"),
      (es: Seq[Expression]) => {
        require(es.length == 3, "minhash_band_buckets(hashArray, bands, rowsPerBand)")
        MinHashBandBuckets(es.head, intArg(es(1), "bands"), intArg(es(2), "rowsPerBand"))
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "minhash_signature(hashArray, numHashes)")
        MinHashSignature(es.head, intArg(es(1), "numHashes"))
      }))

  /** Register into an already-built session (extensions only apply at
    * build time; this covers shared test sessions and notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, builder)
    }
}
