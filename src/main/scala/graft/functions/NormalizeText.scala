package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup keys as a native Catalyst
  * expression: Unicode NFC composition, ASCII-range lowercasing, and
  * ASCII-whitespace-run collapse to a single space, trimmed. The point is
  * cross-engine determinism — two visually identical strings ("é" composed
  * vs e + combining acute; tab vs double-space) must map to one dedup key,
  * and the mapping must be REPLAYABLE outside the JVM, so every piece is
  * pinned to a published standard:
  *
  *  - NFC per Unicode TR#15 (java.text.Normalizer here, utf8proc's
  *    nfc_normalize in DuckDB — same standard, the oracle proves parity);
  *  - lowercase ONLY A-Z: full Unicode case-folding is locale- and
  *    engine-dependent (final sigma, Turkish I), which would silently fork
  *    dedup keys between engines;
  *  - whitespace = the RE2 `\s` ASCII class {space, \t, \n, \f, \r} —
  *    NOTE: RE2's `\s` does NOT include vertical tab (\x0B), unlike Java's
  *    `\s` — so the oracle's regexp_replace sees the identical class and a
  *    literal \x0B survives into the key on both engines.
  *
  * Codegen: static call, same shape as [[SimHash64]] — the loop is
  * char-bound, one pass, no regex engine on the hot path.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"NormalizeText requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeText.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  // exactly RE2 `\s` ([\t\n\f\r ]): no \u000B -- DuckDB's regex engine
  // (RE2) excludes vertical tab from \s, and cross-engine key parity
  // outranks Java's wider Character.isWhitespace set
  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def compute(text: String): String = {
    val nfc = java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (isAsciiSpace(c)) {
        if (sb.length > 0) pendingSpace = true // leading runs drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
      i += 1
    } // trailing runs drop: pendingSpace never flushed at end
    sb.toString
  }

  /** Column-level API (classic-session bridge from Catalyst Expression). */
  def normalizeText(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NormalizeText(GraftColumnBridge.expression(c)))
  }
}
