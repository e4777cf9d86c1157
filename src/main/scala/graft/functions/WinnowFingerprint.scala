package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (the MOSS rolling-hash scheme,
  * Schleimer/Wilkerson/Aiken SIGMOD'03): FNV-hash each whitespace token,
  * take polynomial rolling hashes of every k consecutive token hashes, then
  * keep the minimum hash of each sliding window of w grams,
  * de-duplicated and sorted. Guarantees: any shared token run of length >= k + w - 1
  * contributes at least one common fingerprint, so near-duplicate documents
  * share fingerprints while the set stays ~|tokens|/w sized.
  *
  * Custom Catalyst expression (map-only, codegen'd): the per-token loop with
  * 64-bit wraparound arithmetic is not expressible in HOFs without building
  * k-wide arrays per gram, and is engine-deterministic (pure FNV + fixed
  * base, no JVM hashCode).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"WinnowFingerprint needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"WinnowFingerprint requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprint.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  private final val Base = 1315423911L // odd multiplier for the polynomial

  def compute(text: String, k: Int, w: Int): ArrayData = {
    val th = SimHash64.tokenHashes(text)
    val t = th.length
    if (t == 0) return ArrayData.toArrayData(Array.empty[Long])
    // k-gram polynomial hashes (whole doc if shorter than k)
    val nGrams = math.max(t - k + 1, 1)
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var j = 0
      val kk = math.min(k, t)
      while (j < kk) { h = h * Base + th(g + j); j += 1 }
      grams(g) = h
      g += 1
    }
    // winnow: min of each window of w grams. The output is a de-duplicated
    // sorted set, so only the min VALUE matters (a tied min position would
    // select the same value) — no positional tie-break machinery needed.
    val mins = new Array[Long](math.max(nGrams - w + 1, 1))
    val nWin = mins.length
    var s = 0
    while (s < nWin) {
      val end = math.min(s + w, nGrams)
      var mn = grams(s)
      var j = s + 1
      while (j < end) {
        if (grams(j) < mn) mn = grams(j)
        j += 1
      }
      mins(s) = mn
      s += 1
    }
    // primitive sort + unique copy (no boxing)
    java.util.Arrays.sort(mins)
    var unique = 1
    var i = 1
    while (i < nWin) { if (mins(i) != mins(i - 1)) unique += 1; i += 1 }
    val out = new Array[Long](unique)
    out(0) = mins(0)
    var o = 1; i = 1
    while (i < nWin) {
      if (mins(i) != mins(i - 1)) { out(o) = mins(i); o += 1 }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def winnow(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftColumnBridge.column(WinnowFingerprint(GraftColumnBridge.expression(c), k, w))
}
