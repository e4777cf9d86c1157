package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Random-hyperplane LSH signature of an array<double> vector as one
  * codegen kernel — the native twin of
  * `VectorFunctions.hyperplaneSignature`'s HOF chain (custom-operator
  * preference (b)): per bit j, the HOF builds a zip_with array, evaluates
  * an interpreted lambda per element (Murmur3 parity pick ±x), and folds
  * an interpreted aggregate — nBits allocations and O(nBits × dim) boxed
  * lambda calls per ROW, the per-row cost LSH bucketing pays over the
  * whole corpus. Here: one primitive loop, no allocation.
  *
  * Bit-parity contract (pinned by SimilaritySpec against the HOF form):
  *  - plane weights are the SAME Murmur3 parity Spark's `hash(i, j)`
  *    computes — hashInt(j, hashInt(i, 42)) — the constants the q53
  *    oracle bakes into its literal DOUBLE[] planes;
  *  - per-plane scores accumulate sequentially in index order (±x adds),
  *    bit-identical to the aggregate() fold and to DuckDB's
  *    list_dot_product against a ±1.0 plane;
  *  - a NULL element nulls every plane score (null poisons the fold), and
  *    `when(score >= 0, bit)` then takes the otherwise-branch — so such
  *    vectors land in bucket 0, exactly like the HOF;
  *  - an EMPTY array also lands in bucket 0 — in the HOF,
  *    `sequence(0, size(v)-1)` is `sequence(0, -1)` = [0, -1] (Spark
  *    infers step -1 when start > stop), so zip_with null-pads and the
  *    scores go null, same as the null-element case. Degenerate vectors
  *    collapsing into one bucket is also the behavior you want.
  */
case class HyperplaneSig(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HyperplaneSig requires array<double> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig.compute($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** +1 for even Murmur3 parity of (i, j) under Spark's hash() fold
    * (seed 42), -1 otherwise — evaluated identically at oracle-build time
    * (Extensions.planeSql) and inside [[compute]].
    */
  def planeSign(i: Int, j: Int): Double = {
    val h = Murmur3_x86_32.hashInt(j, Murmur3_x86_32.hashInt(i, 42))
    if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
  }

  def compute(a: ArrayData, nBits: Int): Long = {
    val n = a.numElements()
    if (n == 0) return 0L // HOF parity: empty zips against [0, -1] -> null scores
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (hasNull) return 0L // every plane score is null -> no bit set
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      i = 0
      while (i < n) {
        acc += planeSign(i, j) * a.getDouble(i)
        i += 1
      }
      if (acc >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  def signature(v: Column, nBits: Int): Column =
    GraftColumnBridge.column(HyperplaneSig(GraftColumnBridge.expression(v), nBits))
}
