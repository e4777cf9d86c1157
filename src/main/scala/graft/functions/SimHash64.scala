package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text as a native Catalyst
  * expression (SURVEY.md §7.4 / custom-operator preference order (b): a
  * scalar kernel Spark lacks, too hot for a HOF chain — a
  * transform/aggregate formulation would build a 64-wide array per token).
  *
  * Algorithm: FNV-1a 64-bit hash per token; each of the 64 bits votes
  * +1/-1 weighted by token frequency 1; the sign vector is the simhash.
  * Near-duplicate docs differ in few bits (Hamming distance), so banding
  * the 64 bits into 4x16-bit keys finds candidates with 1 shuffle.
  *
  * Deterministic and engine-independent: FNV-1a is fully specified, no JVM
  * hashCode. Codegen: falls back to interpreted eval per-row via
  * `nullSafeEval` (the loop is token-bound, not expression-bound, so
  * interpretation overhead is amortized); doGenCode emits a static call.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes — stable across JVMs and engines. */
  def fnv1a(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** FNV hash of each single-space-separated token — the shared tokenizer
    * kernel for both fingerprint families (SimHash64, WinnowFingerprint).
    */
  def tokenHashes(text: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) out += fnv1a(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    out.result()
  }

  def compute(text: String): Long = {
    val votes = new Array[Int](64)
    val hashes = tokenHashes(text)
    var t = 0
    while (t < hashes.length) {
      val h = hashes(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level API (classic-session bridge from Catalyst Expression). */
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))
  }

  /** Hamming distance between two simhashes as a column expression. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
