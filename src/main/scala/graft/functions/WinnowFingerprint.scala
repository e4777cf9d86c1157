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
  * keep the minimum hash of each sliding window of w grams (rightmost min),
  * de-duplicated. Guarantees: any shared token run of length >= k + w - 1
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
    // tokenize on single spaces without allocation-heavy split
    val tokenHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) tokenHashes += SimHash64.fnv1a(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val t = tokenHashes.length
    if (t == 0) return ArrayData.toArrayData(Array.empty[Long])
    // k-gram polynomial hashes (whole doc if shorter than k)
    val nGrams = math.max(t - k + 1, 1)
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var j = 0
      val kk = math.min(k, t)
      while (j < kk) { h = h * Base + tokenHashes(g + j); j += 1 }
      grams(g) = h
      g += 1
    }
    // winnow: min of each window of w grams (rightmost on ties), dedup
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    val nWin = math.max(nGrams - w + 1, 1)
    var s = 0
    while (s < nWin) {
      val end = math.min(s + w, nGrams)
      var mn = grams(s); var mi = s
      var j = s + 1
      while (j < end) {
        if (grams(j) <= mn) { mn = grams(j); mi = j }
        j += 1
      }
      out += grams(mi)
      s += 1
    }
    ArrayData.toArrayData(out.toArray.sorted)
  }

  def winnow(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftColumnBridge.column(WinnowFingerprint(GraftColumnBridge.expression(c), k, w))
}
