package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data pipelines: the identifier-level
  * complement of [[TextAnalysis.scrubPii]] (which redacts PII *inside*
  * text). Both are map-side or bounded-shuffle passes — privacy
  * transforms must not become the bottleneck that tempts skipping them.
  */
object Privacy {

  /** Salted-hash pseudonymization: id → first 16 hex of md5(salt || id).
    * Deterministic under a fixed salt, so JOINABILITY SURVIVES — every
    * table pseudonymized with the same salt still joins on the pseudonym,
    * which is the property that lets an analytics pipeline run end-to-end
    * without ever materializing the real id. Not reversible without the
    * salt; rotate the salt to unlink releases. Pure map-side codegen'd
    * projection (no shuffle, no lookup table to secure or replicate —
    * unlike a mapping-table design, there is nothing to leak).
    * 64 pseudonym bits: birthday collisions reach ~1% only past ~6·10^8
    * distinct ids; widen the prefix if the id space is larger.
    */
  def pseudonym(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit("|"), idCol.cast("string"))), 1, 16)

  /** Pseudonymize `idCol` in place. */
  def pseudonymizeColumn(df: DataFrame, idCol: String, salt: String): DataFrame =
    df.withColumn(idCol, pseudonym(col(idCol), salt))

  /** k-anonymity suppression: drop rows whose quasi-identifier
    * combination is shared by fewer than `k` rows — the release gate
    * that stops a rare (zip, age, device) combo from singling a person
    * out. One partial-agg groupBy over the quasi columns (combo counts,
    * usually far smaller than the data) joined back — the quasi frame
    * shuffles, the payload follows once; no window over the full row
    * width.
    */
  def kAnonSuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, s"need quasi columns and k >= 1")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .drop("__n")
    df.join(counts, quasiCols)
  }
}
