package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Json

/** Nested payload filtering: conditions bind to ONE array element. */
class JsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val elem = StructType(Seq(
    StructField("food", StringType), StructField("likes", BooleanType)))

  test("nestedExists binds all conditions to the same element") {
    // r1: matching element {meat, true}. r2: 'meat' and a like exist but
    // in DIFFERENT elements — the flat reading admits it, nested must not.
    val rows = Seq(
      ("r1", """[{"food":"meat","likes":true},{"food":"fish","likes":false}]"""),
      ("r2", """[{"food":"meat","likes":false},{"food":"fish","likes":true}]"""),
      ("r3", """[{"food":"fish","likes":true}]"""),
      ("r4", """[]"""),
      ("r5", null.asInstanceOf[String]))
    val df = rows.toDF("id", "payload")
    val nested = df.filter(Json.nestedExists(col("payload"), elem,
      x => x.getField("food") === "meat" && x.getField("likes")))
      .select("id").as[String].collect().toSeq
    assert(nested === Seq("r1"))
    // the flat reading (each condition matched anywhere in the array)
    // wrongly includes r2 — the distinction the nested form exists for
    val parsed = from_json(col("payload"), ArrayType(elem))
    val flat = df.filter(
      exists(parsed, x => x.getField("food") === "meat") &&
        exists(parsed, x => x.getField("likes")))
      .select("id").as[String].collect().toSeq
    assert(flat === Seq("r1", "r2"))
  }

  test("nestedExists over a derived payload equals the base-column predicate") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val elem2 = StructType(Seq(
      StructField("key", StringType), StructField("even", BooleanType)))
    val withPayload = docs.withColumn("payload", to_json(array(
      struct(col("lang").as("key"), (col("n_chars") % 2 === 0).as("even")),
      struct(col("source").as("key"), (col("n_chars") % 3 === 0).as("even")))))
    val got = withPayload.filter(Json.nestedExists(col("payload"), elem2,
      x => x.getField("key") === "src7" && x.getField("even")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expected = docs.filter(col("source") === "src7" && col("n_chars") % 3 === 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === expected && got.nonEmpty)
  }
}
