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

  /** Deterministic per-epoch training order: for each epoch e the corpus
    * is globally permuted by md5(salt:e:id) — a rerun-, layout- and
    * engine-stable shuffle (the same md5-permutation trick as the
    * sampling ops), with positions assigned by the distributed rank
    * (range-sort + per-partition offsets), NEVER a single-partition
    * row_number window. One distributed sort per epoch; epochs union
    * cheaply (no barrier between them at execution time).
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   salt: String): DataFrame = {
    require(epochs >= 1, s"epochShuffle needs epochs >= 1, got $epochs")
    (0 until epochs).map { e =>
      val keyed = df.select(col(idCol), lit(e).as("epoch"),
        md5(concat_ws(":", lit(salt), lit(e.toString),
          col(idCol).cast(StringType))).as("__h"))
      Ranks.withGlobalRowNumber(keyed, "pos", col("__h").asc, col(idCol).asc)
        .drop("__h")
    }.reduce(_ unionByName _)
  }

  /** Fair source interleaving — the anti-clumping training order: round
    * r serves every source's r-th document (sources with fewer docs drop
    * out of later rounds), so no contiguous window over-represents one
    * source. Scale shape: the within-source rank comes from ONE global
    * distributed sort by (source, md5-hash, id) minus the per-source
    * offset (`min(globalRank)` per source — a model-sized broadcast
    * frame, NOT a per-source window partition, which would put a whole
    * source's corpus share in one task); the final position is a second
    * distributed rank by (round, source). Two sorts total, both
    * range-partitioned.
    */
  def interleaveBySource(df: DataFrame, idCol: String, srcCol: String,
                         salt: String): DataFrame = {
    val keyed = df.select(col(idCol), col(srcCol),
      md5(concat_ws(":", lit(salt), col(idCol).cast(StringType))).as("__h"))
    val ranked = Ranks.withGlobalRowNumber(keyed, "__g",
      col(srcCol).asc, col("__h").asc, col(idCol).asc)
    val offsets = ranked.groupBy(col(srcCol)).agg(min(col("__g")).as("__min"))
    val inSource = ranked.join(broadcast(offsets), srcCol)
      .withColumn("rnd", col("__g") - col("__min") + lit(1L))
      .drop("__g", "__min", "__h")
    Ranks.withGlobalRowNumber(inSource, "pos",
      col("rnd").asc, col(srcCol).asc)
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
