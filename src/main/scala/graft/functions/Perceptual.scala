package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Perceptual image hashing (dHash) over binary payloads — the multimodal
  * analog of the SimHash text near-dup family (q26/q55).
  *
  * dHash (difference hash, public knowledge: resize to 9x8 grayscale,
  * emit one bit per horizontally-adjacent pixel pair, 64 bits total) with
  * the resize realized as NEAREST-NEIGHBOR byte sampling: 72 evenly
  * spaced offsets into the payload BODY (the bytes after the container
  * header — the region a real decoder would hand to the pixel pipeline),
  * laid out as an 8-row x 9-column grid. A real decoder swaps the
  * sampling for decoded luma and keeps every downstream bit identical —
  * the same stub boundary Multimodal.MediaDecoder draws.
  *
  * The hash is exposed as a 64-char '0'/'1' string: transparently
  * portable to the DuckDB oracle (packing into a BIGINT would need
  * overflow-wrapping arithmetic DuckDB refuses), band-sliceable with
  * plain substring, and Hamming-comparable position-wise. A production
  * kernel would pack it into a long inside a codegen Expression (the
  * SimHash64 pattern); the banding and verify shapes are unchanged by
  * the representation.
  *
  * Everything here is codegen'd `functions._` expressions — no UDF.
  */
object Perceptual {

  /** The 72-sample 9x8 grid of `bin`'s body (bytes after `headerLen`) as
    * an array<int> column. Sample k: body byte at floor(k * bodyLen / 72)
    * — repetition when bodyLen < 72 is the nearest-neighbor upscale, same
    * arithmetic on both engines.
    *
    * MATERIALIZE THIS as its own projection before deriving bits:
    * [[dhashBitsFromPx]] reads the array 128 times, and feeding it the
    * sampling expression inline makes Catalyst re-evaluate all 72
    * substring+hex+conv samples per read (CollapseProject keeps separate
    * projections apart precisely because the alias is non-cheap and
    * multiply-referenced — measured 13x on q145 at sf0.1).
    */
  def dhashPx(bin: Column, headerLen: Column): Column = {
    val bodyLen = octet_length(bin) - headerLen
    transform(sequence(lit(0), lit(71)), i =>
      conv(hex(substring(bin,
        (headerLen + floor((i * bodyLen).cast("double") / 72.0).cast("int")
          + 1).cast("int"),
        lit(1))), 16, 10).cast("int"))
  }

  /** Bits from a MATERIALIZED sample grid: bit k (row r = k/8, col
    * c = k%8) is 1 iff grid[r][c] < grid[r][c+1].
    */
  def dhashBitsFromPx(px: Column): Column =
    concat_ws("", transform(sequence(lit(0), lit(63)), k => {
      val idx = (floor(k.cast("double") / 8.0).cast("int") * 9 + k % 8 + 1)
        .cast("int")
      when(element_at(px, idx) < element_at(px, idx + 1), lit("1"))
        .otherwise(lit("0"))
    }))

  /** 64-bit dHash bit-string of `bin`'s body — single-expression
    * composition for small inputs/tests; hot paths should project
    * [[dhashPx]] first and derive bits with [[dhashBitsFromPx]].
    */
  def dhashBits(bin: Column, headerLen: Column): Column =
    dhashBitsFromPx(dhashPx(bin, headerLen))

  /** Position-wise Hamming distance between two equal-length bit strings. */
  def hammingBits(a: Column, b: Column): Column =
    size(filter(sequence(lit(1), lit(64)),
      i => substring(a, i, lit(1)) =!= substring(b, i, lit(1))))

  /** The 4x16 band slices of a 64-bit hash string — exact-match banding:
    * Hamming <= 3 guarantees a shared band by pigeonhole; wider radii are
    * probabilistic exactly as in the SimHash family.
    */
  def bandSlices(bits: Column): Column =
    array((0 until 4).map(b => substring(bits, b * 16 + 1, 16)): _*)
}
