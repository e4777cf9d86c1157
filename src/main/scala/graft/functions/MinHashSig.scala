package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a pre-hashed shingle array in ONE pass: for each
  * of numHashes permutations h_j(x) = a_j * x + b_j (mod 2^64 wraparound),
  * the minimum over the input.
  *
  * The HOF formulation (`array(array_min(transform(xh, ...)) * numHashes)`)
  * walks the shingle array numHashes times through interpreted lambdas; this
  * kernel walks it once with primitive arithmetic. Coefficients come from
  * the same deterministic splitmix64 table (Dedup.MinhashCoeffs), so
  * signatures are bit-identical to the HOF version.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 128,
    s"MinHashSig supports 1..128 hashes, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null on empty input (below), independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSig requires array<bigint> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  def compute(xh: ArrayData, numHashes: Int): ArrayData = {
    val n = xh.numElements()
    // No signature exists for an empty set: an all-MaxValue sentinel would
    // collide every pair of empty docs in every LSH band, and the HOF
    // formulation (array_min over empty) yields nulls too. Callers that
    // tokenize via shingles() never hit this (whole-text fallback).
    if (n == 0) return null
    val coeffs = graft.operators.Dedup.minhashCoeffArrays
    val as = coeffs._1; val bs = coeffs._2
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xh.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = as(j) * x + bs(j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  def minhashSig(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numHashes))
}
