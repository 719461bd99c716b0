package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-column data clustering.
  *
  * Laying a table out in z-value order gives every data file a tight
  * bounding box over ALL cluster columns at once, so min/max footer
  * pruning skips files for predicates on ANY clustered column — the
  * standard lakehouse answer to "I partition by date but also filter by
  * customer". A plain sort clusters only its leading column.
  *
  * The computation is pure column algebra (normalize → interleave bits),
  * codegen-friendly, and deterministic given the normalization bounds.
  */
object ZOrder {

  /** Bit-interleaved z-value of already-normalized long columns (each in
    * `[0, 2^bits)`): bit `i` of column `j` lands at position
    * `i * n + j`. */
  private[graft] def interleave(normed: Seq[Column], bits: Int): Column = {
    val n = normed.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- normed.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Normalize a numeric column into `[0, 2^bits)` given its global min
    * and max (degenerate min==max maps to 0). */
  private[graft] def normalize(c: Column, min: Double, max: Double,
      bits: Int): Column = {
    val span = max - min
    if (span <= 0) lit(0L)
    else least(
      ((c.cast("double") - lit(min)) / lit(span) * lit((1L << bits) - 1)).cast("long"),
      lit((1L << bits) - 1))
  }

  /** Z-value over `cols` with per-column `(min, max)` bounds. `bits` per
    * column defaults to 16 (two columns fill 32 of 64 bits; up to four
    * columns at 16 bits fit a long). */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)],
      bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == bounds.size,
      s"need one (min,max) per column: ${cols.size} vs ${bounds.size}")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits overflow a long")
    interleave(cols.zip(bounds).map { case (c, (mn, mx)) =>
      normalize(c, mn, mx, bits)
    }, bits)
  }
}
