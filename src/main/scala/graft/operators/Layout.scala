package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * data-skipping writes — the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * capability, engine-side. A table range-sorted on ONE column prunes
  * parquet row groups only for predicates on that column; interleaving
  * the bits of two (or more) key columns before the sort gives every
  * written file a small bounding BOX over all keys, so min/max footer
  * stats prune scans on ANY of them (Morton 1966; the standard
  * spatial-locality layout).
  *
  * Scale shape: the z-value is one codegen'd projection (four
  * shift-and-mask steps per dimension — no UDF, no lookup table);
  * the layout itself is `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` — exactly one range exchange, the same
  * cost as the single-column sort a naive writer would pay, with
  * AQE-compatible balanced output files. Nothing here is driver-side.
  *
  * Correctness note: inputs are masked to [[Bits]] bits (values are
  * first rank-compressed or modulo-folded by the caller — interleaving
  * needs bounded domains). The interleave uses the classic
  * parallel-prefix bit spread, which both engines replay with identical
  * int64 shift/mask arithmetic, so layouts are hash-checkable (q152).
  */
object Layout {

  /** Bits kept per dimension: 16 → a 32-bit z-value for 2-D. */
  val Bits = 16
  private val Mask = (1L << Bits) - 1

  /** Spread the low 16 bits of `c` to the even bit positions of an
    * int64 (parallel-prefix: 8-4-2-1 shift/mask). */
  def spread16(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(Mask))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** DuckDB twin of [[spread16]] — the same chain, textually expanded
    * (DuckDB has no common-subexpression binding inside one scalar
    * expression; its optimizer CSEs the repeats). */
  def spread16Sql(e: String): String = {
    val v0 = s"(CAST($e AS BIGINT) & $Mask)"
    val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
    val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
    s"(($v3 | ($v3 << 1)) & 1431655765)"
  }

  /** 2-D Morton code: x at even bits, y at odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  def zValueSql(xE: String, yE: String): String =
    s"((${spread16Sql(xE)}) | ((${spread16Sql(yE)}) << 1))"

  /** Lay `df` out in z-order over `(x, y)`: one range exchange on the
    * z-value, rows sorted within each output partition — write the
    * result and every file's footer carries tight min/max on BOTH
    * dimensions. The z column is dropped (it is layout, not data). */
  def zorder(df: DataFrame, x: Column, y: Column,
             partitions: Int = 0): DataFrame = {
    val z = zValue(x, y).as("__z")
    val withZ = df.withColumn("__z", z)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
