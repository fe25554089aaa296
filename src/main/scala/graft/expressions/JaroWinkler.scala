package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native expression — the
  * fuzzy-name comparator the entity-resolution stack (er1–er5) uses
  * beside banded Levenshtein. Spark ships `levenshtein` and `soundex`
  * but no Jaro–Winkler; implementing it as an expression keeps the
  * blocked-pair scoring loop inside whole-stage codegen instead of a
  * boxed Scala UDF (the §4.3 escalation rule).
  *
  * Semantics are the textbook Jaro–Winkler that DuckDB's
  * `jaro_winkler_similarity` also implements — verified value-for-value
  * by the er5 oracle: match window `max(l1,l2)/2 - 1` (floor 0),
  * transpositions = mismatched matched-sequence positions / 2 with
  * INTEGER halving (the jellyfish/rapidfuzz convention), Winkler
  * prefix boost `+ min(prefix,4) · 0.1 · (1 − jaro)` applied only when
  * jaro exceeds the 0.7 boost threshold, and 0.0 when either input is
  * empty (both-empty included, matching DuckDB). Comparison is per
  * UTF-16 code unit; identical to byte/codepoint comparison on the
  * ASCII identifiers ER runs on.
  *
  * The kernel is a static method invoked from both interpreted eval and
  * generated code (the `levenshtein` pattern — the call stays inside the
  * codegen'd row loop; the O(l1·l2)-window scan dominates, not the call).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires string inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Winkler boost applies only above this Jaro similarity. */
  private final val BoostThreshold = 0.7
  private final val PrefixScale = 0.1
  private final val MaxPrefix = 4

  /** Static kernel shared by interpreted eval and generated code. */
  def score(a: UTF8String, b: UTF8String): Double =
    score(a.toString, b.toString)

  def score(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: walk both matched sequences in order, count
    // positions whose characters differ, halve.
    var mismatch = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) mismatch += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // INTEGER halving, matching DuckDB/jellyfish/rapidfuzz: 3 mismatched
    // positions count as 1 transposition, not 1.5 (measured on
    // 'Customer#000000036' vs 'Customer#000000360' — tail 036/360
    // mismatches at 3 positions; fractional halving scores 0.9833 where
    // DuckDB scores 0.9889).
    val t = (mismatch / 2).toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= BoostThreshold) return jaro
    var prefix = 0
    while (prefix < math.min(math.min(l1, l2), MaxPrefix) &&
      s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * PrefixScale * (1.0 - jaro)
  }
}
