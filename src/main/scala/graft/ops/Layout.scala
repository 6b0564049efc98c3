package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * Z-ORDER (Morton) clustering interleaves the bits of two dimension
  * columns so that sorting by the single interleaved key keeps rows that
  * are close in BOTH dimensions inside the same file/range — the layout
  * trick behind Delta/Iceberg `ZORDER BY`, here as a plain Spark op: a
  * pure-integer key expression plus `repartitionByRange(zkey)` writer
  * input. At 100 TB the payoff is file-level min/max pruning for range
  * predicates on EITHER dimension, where a lexicographic sort prunes only
  * its leading column.
  *
  * The key is built by one Scala loop that emits BOTH the Spark Column and
  * the oracle's SQL string, so engine and mirror share the bit spec by
  * construction.
  */
object Layout {

  /** Morton key of `bits`-bit x and y (x in the odd bit positions):
    * zkey = sum_i ((x>>i)&1) << (2i+1) | ((y>>i)&1) << (2i).
    * Inputs must already be reduced to [0, 2^bits).
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorderKey needs 1 <= bits <= 31, got $bits")
    val xs = x.cast(LongType)
    val ys = y.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same Morton key as a DuckDB SQL expression over `x` / `y`
    * sub-expressions — generated from the same loop as [[zorderKey]]. */
  def zorderSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"zorderSql needs 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i + 1}) | (((($y) >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")
  }

  /** Writer-input layout: rows range-partitioned and sorted by the Morton
    * key of (xCol mod 2^bits, yCol mod 2^bits). Each output file then
    * covers a bounded rectangle in (x, y) — the property the spec asserts
    * via per-bucket bounding boxes.
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   bits: Int, numPartitions: Int): DataFrame = {
    val m = lit(1L << bits)
    val zk = zorderKey(col(xCol).cast(LongType) % m,
      col(yCol).cast(LongType) % m, bits)
    df.withColumn("zkey", zk)
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }
}
