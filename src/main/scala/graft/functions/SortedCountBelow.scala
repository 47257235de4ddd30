package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: how many elements of a SORTED numeric
  * array are strictly below a value — the per-row band assignment under
  * the Prefix/CorpusBudget family ([[graft.operators.Prefix.bandByScore]]
  * computes `band = count of percentile cuts strictly below the score`
  * for every input row).
  *
  * Why native: the declarative form `size(filter(cuts, c -> score > c))`
  * runs Spark's INTERPRETED higher-order filter — a closure call per
  * element plus a materialized output array per row, and a
  * whole-stage-codegen break. On a banding pass over a 100 TB corpus
  * that is B comparisons and an allocation per row of the table. This
  * expression binary-searches the sorted cuts (log2 B comparisons, zero
  * allocation) and fuses into the generated stage.
  *
  * CONTRACT: the array must be sorted ascending — it is in this family
  * by construction (`percentile_approx` emits nondecreasing quantiles);
  * an unsorted array gives an unspecified count, exactly as a binary
  * search would. Comparison semantics mirror Spark's numeric `>`
  * (nan-safe: NaN is greater than every non-NaN, equal to itself;
  * -0.0 == 0.0), so the result is bit-identical to the filter form —
  * spec-asserted on randomized arrays including ties, NaN, and
  * boundary values. Null handling is the family's: null array or null
  * value → null (callers coalesce to band 0, the same result the
  * filter form gives for a null score); arrays with NULLABLE ELEMENTS
  * are rejected at analysis time (the filter form drops null elements —
  * a binary search can't — and percentile_approx output is
  * containsNull=false, so the family never sees them).
  *
  * Supported element types: int, bigint, float, double — integrals
  * compare as long (exact), fractionals as double (float→double is
  * exact). The value must be the SAME type as the elements (it is in
  * the family: the cuts aggregate the very column being banded).
  */
case class SortedCountBelow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // containsNull arrays are rejected at analysis: a null element would
    // make the primitive getters read garbage (0) and silently diverge
    // from the documented bit-equality with size(filter(...)), which
    // DROPS null-predicate elements. The family is unaffected —
    // percentile_approx emits containsNull=false — but this is a public
    // Column surface.
    case ArrayType(et, false)
      if et == right.dataType &&
        Seq[DataType](IntegerType, LongType, FloatType, DoubleType)
          .contains(et) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "sorted_count_below requires (array<T> with non-null elements, T) " +
        s"with T in {int, bigint, float, double}; got ($other, " +
        s"${right.dataType})")
  }

  @transient private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    elemType match {
      case IntegerType =>
        SortedCountBelow.countBelowInt(a, v.asInstanceOf[Int])
      case LongType =>
        SortedCountBelow.countBelowLong(a, v.asInstanceOf[Long])
      case FloatType =>
        SortedCountBelow.countBelowFloat(a, v.asInstanceOf[Float])
      case DoubleType =>
        SortedCountBelow.countBelowDouble(a, v.asInstanceOf[Double])
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = elemType match {
      case IntegerType => "countBelowInt"
      case LongType => "countBelowLong"
      case FloatType => "countBelowFloat"
      case DoubleType => "countBelowDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, v) =>
      s"${ev.value} = graft.functions.SortedCountBelow.$fn($a, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedCountBelow {

  /** Column surface: elements of sorted `arr` strictly below `value`. */
  def sortedCountBelow(arr: Column, value: Column): Column =
    Bridge.column(
      SortedCountBelow(Bridge.expression(arr), Bridge.expression(value)))

  // Spark's nan-safe double ordering (NaN greatest, NaN == NaN,
  // -0.0 == 0.0) — the semantics of `score > cut` in the filter form.
  private def nanSafeLt(x: Double, y: Double): Boolean =
    if (x < y) true
    else if (x > y || x == y) false
    else !java.lang.Double.isNaN(x) // x or y is NaN; x < y iff y is NaN alone

  /** Smallest index whose element is NOT below v == count strictly below. */
  def countBelowDouble(a: ArrayData, v: Double): Int = {
    var lo = 0; var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (nanSafeLt(a.getDouble(mid), v)) lo = mid + 1 else hi = mid
    }
    lo
  }

  def countBelowFloat(a: ArrayData, v: Float): Int = {
    var lo = 0; var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (nanSafeLt(a.getFloat(mid).toDouble, v.toDouble)) lo = mid + 1
      else hi = mid
    }
    lo
  }

  def countBelowLong(a: ArrayData, v: Long): Int = {
    var lo = 0; var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def countBelowInt(a: ArrayData, v: Int): Int = {
    var lo = 0; var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getInt(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
