package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values (seed 42 — Spark's own) of a string's
  * word n-grams, as one codegen kernel (custom-operator preference order
  * (b): the HOF chain `array_sort(array_distinct(transform(shingles(c, n),
  * xxhash64)))` is interpreted, gets no common-subexpression elimination,
  * and allocates a token array + n-gram strings per row — measured ~600 us
  * per fixture doc, the single hottest stage of q24/q25/q38).
  *
  * Bit-parity with the HOF form comes from a byte-range identity: tokens
  * are `split(text, " ")`, and any n consecutive tokens re-joined with a
  * single space are EXACTLY the original text's bytes between the first
  * token's start and the last token's end (empty tokens from doubled
  * spaces included). So each gram is hashed in place with Spark's XXH64
  * over [start, end) of the UTF8String — zero string allocation, one pass
  * for boundaries, one XXH64 per gram. Fallback matches shingles(): fewer
  * than n tokens hashes the whole text as the single gram. Asserted
  * bit-identical to the HOF formulation in WordGramHashesSpec, which keeps
  * MinHash signatures (and therefore q25's emitted pairs) unchanged.
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"WordGramHashes requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

object WordGramHashes {
  private final val Seed = 42L // spark.sql.functions.xxhash64's fixed seed

  def compute(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // 0x20 never occurs inside a UTF-8 multibyte sequence, so a byte scan
    // finds exactly the split(" ") boundaries.
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val numTokens = spaces + 1
    if (numTokens < n) { // short doc: whole text is the single gram
      return ArrayData.toArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, Seed)))
    }
    // starts(k) = byte index where token k begins; sentinel lets gram ends
    // be computed uniformly as starts(g + n) - 1 (the byte before the
    // space after the gram's last token; = len for the final gram).
    val starts = new Array[Int](numTokens + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(numTokens) = len + 1
    val m = numTokens - n + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val b = starts(g)
      val e = starts(g + n) - 1
      out(g) = XXH64.hashUnsafeBytes(base, off + b, e - b, Seed)
      g += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 1
    while (r < m) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    val sz = w + 1
    ArrayData.toArrayData(if (sz == m) out else java.util.Arrays.copyOf(out, sz))
  }

  /** Column-level API (classic-session bridge from Catalyst Expression). */
  def wordGramHashes(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordGramHashes(GraftColumnBridge.expression(c), n))
  }
}
