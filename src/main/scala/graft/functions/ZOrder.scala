package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) codes as pure Column expressions.
  *
  * Interleaving the bits of two bucketed dimensions gives a 1-D sort
  * key whose ordering preserves 2-D locality: rows close in BOTH
  * dimensions land in the same files and row groups. A range-partition
  * + local sort on the code therefore turns any 2-D box predicate into
  * file/row-group pruning via parquet min/max stats — the multi-column
  * analog of `partitionBy` on one column, and the layout trick behind
  * every "skip 99% of a 100 TB table" scan. Everything here is plain
  * shift/mask arithmetic on longs, so it stays inside whole-stage
  * codegen (no UDF, no boxing).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i
    * (the standard shift-or-mask bit-dilation ladder). */
  private def spread16(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (c, (sh, m)) =>
        c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(m))
      }

  /** 32-bit Morton code interleaving two 16-bit bucket ids
    * (x in even bits, y in odd bits). */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Spread the low 21 bits of x so bit i lands at position 3i (the
    * stride-3 dilation ladder; 3 × 21 = 63 bits fits a long). */
  private def spread21x3(x: Column): Column =
    Seq((32, 0x1F00000000FFFFL), (16, 0x1F0000FF0000FFL),
        (8, 0x100F00F00F00F00FL), (4, 0x10C30C30C30C30C3L),
        (2, 0x1249249249249249L))
      .foldLeft(x.bitwiseAND(lit(0x1FFFFFL))) { case (c, (sh, m)) =>
        c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(m))
      }

  /** 63-bit Morton code of three 21-bit bucket ids — the 3-D layout
    * key (e.g. time × key × region). Same pruning story as morton2,
    * one more dimension. */
  def morton3(x: Column, y: Column, z: Column): Column =
    spread21x3(x)
      .bitwiseOR(shiftleft(spread21x3(y), 1))
      .bitwiseOR(shiftleft(spread21x3(z), 2))

  /** Scale a value with known bounds to a 21-bit bucket id (for
    * morton3). Same clamp-both-ends / double-arithmetic rationale as
    * [[bucket16]]. */
  def bucket21(v: Column, mn: Long, mx: Long): Column = {
    val span = math.max(1L, mx - mn)
    greatest(lit(0L),
      least(lit(0x1FFFFFL),
        ((v - lit(mn)).cast("double") * 0x1FFFFF.toDouble / span.toDouble).cast("long")))
  }

  /** Scale a value with known bounds [mn, mx] to a 16-bit bucket id.
    * The bounds come from a one-row metadata aggregate (constant-size
    * driver traffic at any table size). */
  def bucket16(v: Column, mn: Long, mx: Long): Column = {
    val span = math.max(1L, mx - mn)
    // double arithmetic: (v - mn) * 65535 in long overflows once the
    // span tops ~1.4e14 (e.g. microsecond epochs years apart) — ANSI
    // mode would kill the job, non-ANSI would silently wrap and
    // degenerate the layout. Doubles can land one bucket off at the
    // rounding edge, which is harmless for a locality code. Clamp
    // BOTH ends: a value outside [mn, mx] (stale bounds, late data)
    // must saturate, not wrap through the bit mask.
    greatest(lit(0L),
      least(lit(65535L),
        ((v - lit(mn)).cast("double") * 65535.0 / span.toDouble).cast("long")))
  }
}
