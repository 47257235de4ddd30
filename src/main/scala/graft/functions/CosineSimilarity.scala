package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression for cosine similarity over two
  * `array&lt;double&gt;` columns.
  *
  * Why an `Expression` and not a UDF: inside whole-stage codegen this emits
  * a primitive loop directly over Tungsten `ArrayData` — no UDF
  * serialization boundary, no per-row `Seq` materialization, and it keeps
  * the surrounding stage fused. (SURVEY.md §7.3 — custom Catalyst code only
  * where it buys something; this is the per-pair hot loop of similarity
  * search.)
  *
  * Semantics: dot(a,b) / (‖a‖·‖b‖) with strict left-fold accumulation —
  * bit-identical to `Similarity.dot`/`l2Norm`. Null or length-mismatched
  * inputs → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Reject anything but array&lt;double&gt; at analysis (reading e.g. float
    * slots as doubles at runtime yields garbage); the `build`/`cosineSim`
    * constructors insert the cast for numeric arrays, so SQL users can pass
    * array&lt;float&gt; embeddings directly.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<double> inputs, got $l and $r")
    }

  /** Length-mismatched inputs, null elements, and zero-norm vectors yield
    * null even for non-null children (an undefined similarity must never
    * leak out as a plausible-looking number).
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val anyNull = ctx.freshName("anyNull")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($anyNull || $denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Column surface: `cosine_sim(a, b)` over numeric-array columns. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(build(Seq(Bridge.expression(a), Bridge.expression(b))))

  /** Builder with a proper arity error instead of IndexOutOfBounds.
    * Inputs are wrapped in a cast to array&lt;double&gt; unconditionally —
    * the builder runs before resolution so input types can't be inspected;
    * the cast is a no-op for array&lt;double&gt;, upcasts float/int arrays
    * (so SQL users can pass raw embeddings), and fails analysis with a
    * clear cast error for non-array inputs.
    */
  private[graft] def build(exprs: Seq[Expression]): CosineSimilarity = {
    require(exprs.length == 2,
      s"cosine_sim expects 2 arguments, got ${exprs.length}")
    CosineSimilarity(Cast(exprs(0), ArrayType(DoubleType)),
      Cast(exprs(1), ArrayType(DoubleType)))
  }

  /** SQL surface registration (e.g. `SELECT cosine_sim(v1, v2) FROM …`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", build, "built-in")
}
