package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Payload-JSON filter forms beyond scalar extraction (§2.D): the
  * reference backend's `nested` filter condition — predicates that must
  * hold INSIDE one element of an array-of-objects payload field.
  */
object Json {

  /** True when SOME element of the JSON array at `payloadJson` satisfies
    * `pred` — the nested-object filter semantics: all conditions bind to
    * the SAME element. This differs from matching each condition
    * independently across the whole array (the flat reading, which
    * wrongly admits a row when condition A holds in one element and
    * condition B in another — JsonSpec pins the distinction).
    *
    * One `from_json` parse per row; the quantifier runs inside the scan
    * filter, so at scale this is a map-side predicate like every other
    * payload filter (no explode, no join).
    */
  def nestedExists(payloadJson: Column, elementSchema: StructType,
                   pred: Column => Column): Column =
    exists(from_json(payloadJson, ArrayType(elementSchema)), pred)
}
