package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions deployment path: TestSpark's session is
  * built with `spark.sql.extensions=graft.GraftExtensions`, so every SQL
  * function must resolve WITHOUT any runtime registerAll call.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("injected SQL functions resolve in a fresh derived session") {
    // newSession shares the extensions but has a fresh temp-function
    // registry — anything resolving here came from injection
    val s2 = spark.newSession()
    val dot = s2.sql("SELECT v_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(dot == 11.0)
    val within = s2.sql(
      "SELECT v_within(array(0.0d), array(1.0d), 2.0), fingerprint64('abc')")
      .head()
    assert(within.getBoolean(0))
    assert(s2.sql("SELECT json_get_int('{\"k\": 7}', 'k')").head().getLong(0) == 7L)
    assert(math.abs(s2.sql("SELECT char_entropy('abcd')").head().getDouble(0)
      - math.log(4.0)) < 1e-9)
    assert(s2.sql("SELECT strip_accents(nfc_normalize('café'))")
      .head().getString(0) === "cafe")
  }

  test("ArrowSql rewrite: tight JSON operators map, lambdas and strings survive") {
    import ArrowSql.rewrite
    assert(rewrite("SELECT payload->'category' FROM t") ===
      "SELECT json_get(payload, 'category') FROM t")
    assert(rewrite("SELECT payload->>'category' FROM t") ===
      "SELECT json_as_text(payload, 'category') FROM t")
    // chains fold left-to-right into nested calls (tests.sql:219-224)
    assert(rewrite("SELECT payload->'address'->'city' AS city FROM t") ===
      "SELECT json_get(json_get(payload, 'address'), 'city') AS city FROM t")
    assert(rewrite("WHERE payload->'address'->>'country' = 'USA'") ===
      "WHERE json_as_text(json_get(payload, 'address'), 'country') = 'USA'")
    // inside a function call (tests.sql:210-212)
    assert(rewrite("SELECT match_text(payload->'description', 'ml') FROM t") ===
      "SELECT match_text(json_get(payload, 'description'), 'ml') FROM t")
    // function-call left operand
    assert(rewrite("SELECT coalesce(a, b)->'k' FROM t") ===
      "SELECT json_get(coalesce(a, b), 'k') FROM t")
    // SPACED arrows are Spark lambda syntax — untouched
    val lambda = "SELECT transform(a, x -> x + 1) FROM t"
    assert(rewrite(lambda) === lambda)
    val lambdaLit = "SELECT transform(a, x -> 'c') FROM t"
    assert(rewrite(lambdaLit) === lambdaLit)
    // arrows inside string literals / quoted identifiers / comments stay
    val s1 = "SELECT '->' AS arrow, `a->b` FROM t -- payload->'x'"
    assert(rewrite(s1) === s1)
    val s2 = "SELECT /* payload->'x' */ 1"
    assert(rewrite(s2) === s2)
    // escaped quotes inside the key literal
    assert(rewrite("SELECT payload->'it''s' FROM t") ===
      "SELECT json_get(payload, 'it''s') FROM t")
  }

  test("the -> operators run end-to-end through an injected session") {
    val s2 = spark.newSession()
    val r2 = s2.sql(
      """SELECT payload->'meta'->'label' AS a, payload->>'meta' AS b
        |FROM (SELECT to_json(named_struct('meta',
        |        named_struct('label', 7))) AS payload)""".stripMargin)
      .head()
    assert(r2.getString(0) === "7")
    assert(r2.getString(1) === """{"label":7}""")
  }
}
