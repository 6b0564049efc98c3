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
  }
}
