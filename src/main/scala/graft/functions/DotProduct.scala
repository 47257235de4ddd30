package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression for the dot product of two
  * `array&lt;double&gt;` columns — the pair-time half of the similarity
  * kernel once norms are precomputed per vector.
  *
  * Why it exists (optimization round 20, guide §1.2 "per-task work"):
  * [[CosineSimilarity]] accumulates dot + BOTH norms in its per-pair
  * loop, so a block-pair join over n vectors recomputes each vector's
  * norm n times — two thirds of the kernel FLOPs for work that is
  * O(n·dim) once. Splitting the kernel lets operators compute
  * `nrm = sqrt(dot(v,v))` once per vector and pay only the dot per
  * pair: `cosine = dot(a,b) / (nrm_a · nrm_b)`.
  *
  * Bit-exactness contract: the accumulation is the SAME strict left
  * fold as [[CosineSimilarity]] (and `Similarity.dot`), `dot(v,v)`
  * produces exactly the `na` of the fused loop, and
  * `sqrt(na) * sqrt(nb)` is exactly the fused denominator — so the
  * recomposed cosine is bit-identical to the fused expression
  * (DotProductSpec pins this against CosineSimilarity on random and
  * adversarial vectors). Null semantics likewise compose identically:
  * length mismatch or any touched null element → null here, which
  * nulls the recomposed cosine exactly where the fused kernel does,
  * and a zero norm is the caller's nullif-on-zero-denominator.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double> inputs, got $l and $r")
    }

  /** Length-mismatched inputs and null elements yield null even for
    * non-null children (mirrors [[CosineSimilarity]]).
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Column surface: `dot_product(a, b)` over numeric-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(build(Seq(Bridge.expression(a), Bridge.expression(b))))

  /** Builder with a proper arity error; same unconditional upcast story
    * as [[CosineSimilarity.build]].
    */
  private[graft] def build(exprs: Seq[Expression]): DotProduct = {
    require(exprs.length == 2,
      s"dot_product expects 2 arguments, got ${exprs.length}")
    DotProduct(Cast(exprs(0), ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))
  }

  /** SQL surface registration (e.g. `SELECT dot_product(v1, v2) FROM …`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", build, "built-in")
}
