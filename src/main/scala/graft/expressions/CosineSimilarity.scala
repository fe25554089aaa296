package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric array columns.
  *
  * The declarative formulation (`zip_with` + `aggregate` higher-order
  * functions, see [[graft.operators.Similarity.cosine]]) is interpreted
  * per element — measured as the dominant cost of brute-force similarity
  * at sf0.1. This expression is the SURVEY §4.3 escalation path taken:
  * one fused loop accumulating dot product and both norms, generated
  * into whole-stage codegen (no boxing, no lambda dispatch), with an
  * identical interpreted fallback.
  *
  * Semantics (bit-identical to the HOF formulation on well-formed input,
  * so DuckDB oracles keep matching): elements are widened to double
  * before multiplying; accumulation is sequential in index order; result
  * is 0.0 when either norm is 0. NULL when either input is NULL, when
  * the lengths differ (ragged data must surface, not silently rank by a
  * prefix cosine), or when any element is NULL — all three match the
  * HOF reference's NULL propagation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // Can return NULL for ragged/null-element inputs even when the inputs
  // themselves are non-nullable.
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // EVERY local must be freshName'd: two instances of this expression
      // in one projection share a generated scope, and bare names would
      // collide (Janino "Redefinition of local variable" → silent
      // interpreted fallback).
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val lGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val rGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $x = $lGet;
         |  double $y = $rGet;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
