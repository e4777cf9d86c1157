package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering the custom codegen kernels as SQL
  * functions, so the raw SQL surface (spark.sql / thrift / notebooks)
  * reaches the same expressions the Column API uses — the standard
  * production wiring: `spark.sql.extensions=graft.GraftExtensions`
  * (GraftSession sets it; any stock SparkSession can too). Each entry is
  * the Catalyst Expression itself — no UDF wrapper, whole-stage codegen
  * intact through SQL text.
  *
  * Int parameters (gram size, signature width) accept any FOLDABLE int
  * expression — `word_gram_hashes(text, 1 + 2)` works like
  * `round(col, 1 + 2)` — and reject columns with a named error. Wrong
  * arity reports the function name and accepted arities rather than
  * leaking a MatchError (Catalyst does not arity-check injected
  * builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case f if f.foldable && f.dataType == IntegerType =>
      f.eval() match {
        case i: java.lang.Integer => i.intValue()
        case other => throw new IllegalArgumentException(
          s"$fn argument ${pos + 1} must fold to an integer literal, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn argument ${pos + 1} must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, usage: String, arities: String)
                (builder: PartialFunction[Seq[Expression], Expression]): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        // 3-arg ExpressionInfo is (className, db, name); the usage string
        // needs the wider constructor or it lands in the name field
        new ExpressionInfo("graft.functions", null, name, usage, ""),
        (args: Seq[Expression]) => builder.applyOrElse(args,
          (bad: Seq[Expression]) => throw new IllegalArgumentException(
            s"$name expects $arities arguments, got ${bad.length}"))))

    register("simhash64",
      "simhash64(text) - 64-bit SimHash fingerprint over space tokens", "1") {
      case Seq(c) => graft.functions.SimHash64(c)
    }
    register("word_gram_hashes",
      "word_gram_hashes(text, n) - sorted distinct xxhash64 values of word n-grams", "2") {
      case Seq(c, n) => graft.functions.WordGramHashes(c, litInt(n, "word_gram_hashes", 1))
    }
    register("winnow_fp",
      "winnow_fp(text, k, w) - MOSS winnowing fingerprints (k-gram rolling hash, window w)",
      "1 or 3") {
      case Seq(c) => graft.functions.WinnowFingerprint(c, 5, 4)
      case Seq(c, k, w) => graft.functions.WinnowFingerprint(c,
        litInt(k, "winnow_fp", 1), litInt(w, "winnow_fp", 2))
    }
    register("dot_product",
      "dot_product(a, b) - IEEE-sequential dot product of two double arrays", "2") {
      case Seq(a, b) => graft.functions.DotProduct(a, b)
    }
    register("hyperplane_sig",
      "hyperplane_sig(v, nBits) - random-hyperplane LSH signature of a double array",
      "2") {
      case Seq(v, n) => graft.functions.HyperplaneSig(v, litInt(n, "hyperplane_sig", 1))
    }
    register("sorted_intersect_count",
      "sorted_intersect_count(a, b) - intersection size of two sorted distinct long arrays",
      "2") {
      case Seq(a, b) => graft.functions.SortedIntersectCount(a, b)
    }
    register("minhash_sig",
      "minhash_sig(hashes, k) - k-permutation MinHash signature over pre-hashed shingles",
      "2") {
      case Seq(c, k) => graft.functions.MinHashSig(c, litInt(k, "minhash_sig", 1))
    }
  }
}
