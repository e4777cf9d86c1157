package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over ArrayType(Float/Double) columns using
  * higher-order functions (zip_with / aggregate) — codegen'd, no UDFs, no
  * driver involvement. Cast to double BEFORE arithmetic so accumulation is
  * IEEE-double and sequentially ordered (index order), which both Spark and
  * the DuckDB oracle produce deterministically.
  */
object VectorFunctions {

  def toDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Native codegen'd kernel (DotProduct); identical sequential summation to
    * the HOF formulation it replaced.
    */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id: sign-bit signature of `nBits`
    * deterministic pseudo-hyperplanes. Instead of materializing random
    * planes, each plane j scores sum_i(v_i * w(i,j)) with
    * w(i,j) = hash-derived ±1 — deterministic, seedable, shuffle-free.
    * Native codegen kernel (HyperplaneSig); bit-identical to the HOF
    * formulation it replaced ([[hyperplaneSignatureHof]], kept as the
    * parity reference SimilaritySpec pins against).
    */
  def hyperplaneSignature(v: Column, nBits: Int): Column =
    HyperplaneSig.signature(v, nBits)

  /** The original interpreted formulation — O(nBits x dim) lambda calls
    * and nBits array allocations per row; retained only as the
    * bit-parity oracle for the kernel. */
  private[graft] def hyperplaneSignatureHof(v: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val score = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => when(pmod(hash(i, lit(j)), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(score >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
