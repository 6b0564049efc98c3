package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections

/** The reference's SQL corpus shapes (/root/reference/tests/bin/tests.sql)
  * transliterated to pure spark.sql over the registered collection views
  * and function surface — the "a user of the reference could run every
  * query they run today" check, exercised end-to-end through the SQL
  * entry point rather than the DataFrame API.
  */
class CorpusSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val ready: Unit = {
    Collections.registerAll(spark, TestSpark.sfDir)
    graft.functions.registerAll(spark)
  }

  private def sql(q: String) = { ready; spark.sql(q) }

  test("V_SEARCH: similarity top-k (tests.sql:10-13)") {
    val r = sql(
      """SELECT id, v_cosine(vector,
        |         (SELECT vector FROM embeddings_collection WHERE id = '0')) AS score
        |FROM embeddings_collection WHERE id <> '0'
        |ORDER BY score DESC LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.map(_.getDouble(1)).toSeq === r.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("payload filter + search (tests.sql:56-59)") {
    val r = sql(
      """SELECT id FROM embeddings_collection
        |WHERE json_get_int(payload, 'label') IN (1, 2)
        |  AND id <> '1'
        |ORDER BY v_dot(vector, (SELECT vector FROM embeddings_collection WHERE id = '1')) DESC
        |LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
  }

  test("V_WITHIN radius predicate (tests.sql:48-51)") {
    val n = sql(
      """SELECT count(*) FROM embeddings_collection
        |WHERE id <> '0' AND v_within(vector,
        |  (SELECT vector FROM embeddings_collection WHERE id = '0'), 3.0)""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
  }

  test("V_SPARSE_SEARCH on the two-column convention (tests.sql:67-76)") {
    val r = sql(
      """SELECT id, v_sparse_dot(keywords_indices, keywords_values,
        |         (SELECT keywords_indices FROM hetero_collection WHERE id = '0'),
        |         (SELECT keywords_values FROM hetero_collection WHERE id = '0')) AS score
        |FROM hetero_collection
        |WHERE keywords_indices IS NOT NULL AND id <> '0'
        |ORDER BY score DESC LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(!_.isNullAt(1)))
  }

  test("V_COLBERT MaxSim over the multi-vector field (tests.sql:156-168)") {
    val r = sql(
      """SELECT id, v_maxsim(multi_embeddings,
        |         (SELECT multi_embeddings FROM hetero_collection WHERE id = '0')) AS score
        |FROM hetero_collection
        |WHERE multi_embeddings IS NOT NULL AND id <> '0'
        |ORDER BY score DESC, id LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
  }

  test("GROUP BY payload field + HAVING (tests.sql:233-242)") {
    val r = sql(
      """SELECT json_get_int(payload, 'label') AS lbl, count(*) AS n,
        |       max(v_euclid(vector, array(0.0D))) AS max_norm_ish
        |FROM embeddings_collection
        |GROUP BY lbl HAVING count(*) >= 3 ORDER BY lbl""".stripMargin).collect()
    assert(r.nonEmpty)
  }

  test("CASE boost blended into ranking (tests.sql:271-277)") {
    val r = sql(
      """SELECT id,
        |       v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '0'))
        |       + CASE WHEN json_get_int(payload, 'label') IN (1, 2) THEN 0.5 ELSE 0.0 END AS score
        |FROM embeddings_collection WHERE id <> '0'
        |ORDER BY score DESC LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
  }

  test("CTE prefetch -> rerank pipeline (tests.sql:144-154)") {
    val r = sql(
      """WITH q AS (SELECT vector AS qv FROM embeddings_collection WHERE id = '0'),
        |     prefetch AS (
        |       SELECT c.id, c.vector FROM embeddings_collection c, q
        |       WHERE c.id <> '0'
        |       ORDER BY v_cosine(c.vector, q.qv) DESC LIMIT 50)
        |SELECT p.id, v_dot(p.vector, q.qv) AS score
        |FROM prefetch p, q
        |ORDER BY score DESC, p.id LIMIT 10""".stripMargin).collect()
    assert(r.length === 10)
  }

  test("HAS_FIELD / json_get surface (tests.sql:203-207, json pack)") {
    val r = sql(
      """SELECT count(*) FROM embeddings_collection
        |WHERE has_field(payload, 'label') AND NOT has_field(payload, 'nope')""".stripMargin)
      .head().getLong(0)
    assert(r === 500)
  }

  test("MATCH_TEXT as pure SQL (tests.sql:210-214)") {
    ready
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .createOrReplaceTempView("documents_sql")
    val r = sql(
      """SELECT doc_id, match_text(text, 'the and of') AS text_score
        |FROM documents_sql
        |WHERE match_text(text, 'the and of') > 0.0
        |ORDER BY text_score DESC, doc_id LIMIT 10""".stripMargin).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getDouble(1) > 0.0 && x.getDouble(1) <= 1.0))
    // parity with the Scala-side builder on the same rows
    val scalaSide = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.match_text(org.apache.spark.sql.functions.col("text"), "the and of").as("s"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.foreach(x => assert(x.getDouble(1) === scalaSide(x.getLong(0))))
  }

  test("json_length / json_object_keys as pure SQL (json pack, udfs.rs:13-16)") {
    val r = sql(
      """SELECT json_length('[1,2,3]') AS n, json_object_keys(payload) AS ks
        |FROM embeddings_collection LIMIT 1""".stripMargin).head()
    assert(r.getInt(0) === 3)
    assert(r.getSeq[String](1) === Seq("label"))
  }

  test("V_GAUSS_DECAY over V_GEO_DISTANCE as pure SQL (tests.sql:288-300)") {
    val r = sql(
      """SELECT id,
        |       v_gauss_decay(
        |         v_geo_distance(52.504043D, 13.393236D,
        |                        52.504043D + json_get_float(payload, 'label') * 0.01D,
        |                        13.393236D),
        |         5000.0D) AS boost
        |FROM embeddings_collection ORDER BY boost DESC, id LIMIT 20""".stripMargin).collect()
    assert(r.forall(x => x.getDouble(1) > 0.0 && x.getDouble(1) <= 1.0))
    // label 0 -> distance 0 -> boost exactly 1
    assert(r.head.getDouble(1) === 1.0)
    // SQL path is bit-identical to the Scala column builder
    import org.apache.spark.sql.functions._
    val scalaSide = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .select(col("id"), graft.functions.v_gauss_decay(
        graft.functions.v_geo_distance(lit(52.504043), lit(13.393236),
          lit(52.504043) + get_json_object(col("payload"), "$.label").cast("double") * lit(0.01),
          lit(13.393236)),
        lit(5000.0)).as("boost"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.foreach(x => assert(x.getDouble(1) === scalaSide(x.getString(0))))
  }

  test("non-literal metric/query arguments raise a clean AnalysisException") {
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT v_distance(vector, vector, id) FROM embeddings_collection").collect()
    }
    assert(ex.getMessage.contains("literal"))
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT match_text(payload, payload) FROM embeddings_collection").collect()
    }
    assert(ex2.getMessage.contains("literal"))
    // an empty query would otherwise build a division by literal zero
    val ex3 = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT match_text(payload, '   ') FROM embeddings_collection").collect()
    }
    assert(ex3.getMessage.contains("at least one term"))
  }

  test("nested payload access via multi-key json_get (tests.sql:217-222)") {
    val r = sql(
      """SELECT json_get_str(p, 'address', 'city') AS city,
        |       json_get_int(p, 'address', 'zip') AS zip,
        |       json_get_str(p, 'name') AS name,
        |       json_get_str(p, 'address', 'missing') AS absent
        |FROM (SELECT to_json(named_struct(
        |        'name', 'acme',
        |        'address', named_struct('city', 'berlin', 'zip', 10115))) AS p)""".stripMargin)
      .head()
    assert(r.getString(0) === "berlin")
    assert(r.getLong(1) === 10115L)
    assert(r.getString(2) === "acme")
    assert(r.isNullAt(3))
  }

  test("V_DISTANCE metric forms filter and sort (tests.sql:42-45)") {
    val r = sql(
      """SELECT id, v_distance(vector,
        |         (SELECT vector FROM embeddings_collection WHERE id = '0'), 'cosine') AS d
        |FROM embeddings_collection WHERE id <> '0'
        |  AND v_distance(vector,
        |      (SELECT vector FROM embeddings_collection WHERE id = '0'), 'cosine') < 1.5
        |ORDER BY d ASC LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(_.getDouble(1) < 1.5))
  }
}
