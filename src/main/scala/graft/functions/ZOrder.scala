package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve for MULTI-DIMENSIONAL data clustering.
 *
 * Why it matters at 100 TB: range-clustering a table by one column
 * gives its zone maps pruning power on that column ONLY — a filter on
 * any other column still scans every part. Interleaving the bits of
 * two columns into one sort key makes parts contiguous in BOTH
 * dimensions, so a predicate on EITHER column (or a 2-D box) prunes
 * on sidecar metadata alone. ClickHouse ships the same idea as
 * `ORDER BY mortonEncode(a, b)` for MergeTree keys; Delta/Iceberg
 * call it Z-ORDER clustering. Here it composes with this library's
 * zone-map sidecars: `df.repartitionByRange(n, zorder(a, b))
 * .sortWithinPartitions(zorder(a, b))` + the native writer yields a
 * layout where [[graft.sources.native.NativeIndex]] prunes both
 * dimensions (pinned in ZOrderSpec).
 *
 * Pure Column composition over shift/mask builtins — whole-stage
 * codegen'd, no UDF anywhere, so the cluster key costs nothing at
 * write time and nothing at read time.
 */
object ZOrder {

  /** Spread the low 16 bits of a non-negative long across the even
    * bit positions (bit i → bit 2i) — the classic magic-mask ladder. */
  private def spread16(v: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    m.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (sh, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /**
   * 32-bit Morton interleave of two columns' low 16 bits
   * (x takes the even positions, y the odd). Inputs must be
   * non-negative and < 2^16; values outside collapse to their low 16
   * bits (the caller scales real domains down first — cluster keys
   * need ORDER, not identity).
   */
  def interleave16(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Collapse the even bit positions of a 32-bit Morton code back to
    * 16 contiguous bits — the inverse mask ladder. */
  private def collapse16(v: Column): Column = {
    val m = Seq(
      (1, 0x33333333L), (2, 0x0F0F0F0FL), (4, 0x00FF00FFL), (8, 0x0000FFFFL))
    m.foldLeft(v.bitwiseAND(lit(0x55555555L))) { case (acc, (sh, mask)) =>
      (acc.bitwiseOR(shiftright(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /** Inverse of [[interleave16]]: recover (x, y) from a Morton code —
    * CH `mortonDecode`. Useful for debugging a z-ordered layout and
    * for range arithmetic over cluster keys. */
  def deinterleave16(z: Column): (Column, Column) =
    (collapse16(z), collapse16(shiftright(z, 1)))

  /** Reference (non-Column) implementation for specs. */
  private[graft] def interleave16Ref(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }
}
