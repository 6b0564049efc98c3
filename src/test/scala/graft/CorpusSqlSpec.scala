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
      """SELECT json_length('[1,2,3]') AS n, json_object_keys(payload) AS ks,
        |       json_length(payload) AS nk, json_length('{}') AS nk0,
        |       json_length('42') AS ns
        |FROM embeddings_collection LIMIT 1""".stripMargin).head()
    assert(r.getInt(0) === 3)
    assert(r.getSeq[String](1) === Seq("label"))
    // the reference's json pack counts object KEYS too; scalars are NULL
    assert(r.getInt(2) === 1)
    assert(r.getInt(3) === 0)
    assert(r.isNullAt(4))
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

  test("POINT constructor + two-point V_GEO_DISTANCE, json-pack aliases (tests.sql:295-299)") {
    // literal transliteration of the corpus's POINT call shape
    val d = sql(
      """SELECT v_geo_distance(point(52.504043D, 13.393236D),
        |                      point(52.52D, 13.405D)) AS meters""".stripMargin)
      .head().getDouble(0)
    // same inputs through the 4-scalar form must be bit-identical
    val d4 = sql(
      "SELECT v_geo_distance(52.504043D, 13.393236D, 52.52D, 13.405D) AS m")
      .head().getDouble(0)
    assert(d === d4)
    assert(d > 1000 && d < 3000) // ~1.9 km across Berlin Mitte
    val j = sql(
      """SELECT json_as_text(payload, 'label') AS t,
        |       json_get_json(payload, 'label') AS sub,
        |       json_contains(payload, 'label') AS has,
        |       json_contains(payload, 'nope') AS hasnt
        |FROM embeddings_collection LIMIT 1""".stripMargin).head()
    assert(j.getString(0) === j.getString(1)) // numeric: same rendering
    assert(j.getBoolean(2) && !j.getBoolean(3))
    // json_get_json keeps JSON quoting on STRING scalars (unlike ->>),
    // and json_contains is key EXISTENCE: a JSON-null value still counts
    val edge = sql(
      """SELECT json_get_json(p, 's') AS quoted,
        |       json_as_text(p, 's') AS raw,
        |       json_contains(p, 'n') AS null_key,
        |       json_as_text(p, 'n') IS NOT NULL AS null_key_has_field
        |FROM (SELECT '{"s": "x", "n": null}' AS p)""".stripMargin).head()
    assert(edge.getString(0) === "\"x\"")
    assert(edge.getString(1) === "x")
    assert(edge.getBoolean(2), "existing key with null value must report true")
    assert(!edge.getBoolean(3)) // the ->>-based shape cannot see it
  }

  test("V_GEO_DISTANCE accepts a JSON location object (tests.sql:295-299 exact shape)") {
    val r = sql(
      """SELECT v_geo_distance(json_get_json(p, 'geo', 'location'),
        |                      point(52.52D, 13.405D)) AS meters
        |FROM (SELECT '{"geo": {"location": {"lat": 52.504043, "lon": 13.393236}}}' AS p)""".stripMargin)
      .head().getDouble(0)
    val expected = sql(
      "SELECT v_geo_distance(52.504043D, 13.393236D, 52.52D, 13.405D) AS m")
      .head().getDouble(0)
    assert(r === expected)
    // wrong-typed point argument is a clean analysis error, not a CCE
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT v_geo_distance(1.0D, 2.0D) FROM embeddings_collection").collect()
    }
    assert(ex.getMessage.contains("v_geo_distance expects"))
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

  test("multiple named-field searches blended in one query (tests.sql:27-36)") {
    val r = sql(
      """SELECT id,
        |       v_cosine(text_embedding,
        |         (SELECT text_embedding FROM hetero_collection WHERE id = '0')) AS text_score,
        |       v_dot(image_embedding,
        |         (SELECT image_embedding FROM hetero_collection WHERE id = '2')) AS image_score
        |FROM hetero_collection
        |WHERE text_embedding IS NOT NULL AND image_embedding IS NOT NULL
        |ORDER BY COALESCE(text_score, 0) * 0.7 + COALESCE(image_score, 0) * 0.3 DESC, id
        |LIMIT 20""".stripMargin).collect()
    // only vec_id % 3 == 1 rows carry BOTH named fields
    assert(r.nonEmpty)
    assert(r.forall(x => x.getString(0).toLong % 3 == 1))
  }

  test("discovery as pure SQL: target plus weighted context (tests.sql:120-127)") {
    val r = sql(
      """SELECT id,
        |       v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '0'))
        |       + 0.5 * v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '1'))
        |       - 0.25 * v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '2')) AS score
        |FROM embeddings_collection WHERE id NOT IN ('0', '1', '2')
        |ORDER BY score DESC, id LIMIT 10""".stripMargin).collect()
    assert(r.length === 10)
    // same composition as the DataFrame-API discover gate
    val api = graft.ops.Search.discover(
        graft.collections.Collections.homogeneous(spark, TestSpark.sfDir),
        "vector", targetId = "0", context = Seq(("1", 0.5), ("2", -0.25)), k = 10)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(r.map(_.getString(0)).toSeq === api)
  }

  test("RRF fusion as pure SQL: two ranked branches, reciprocal ranks (tests.sql:174-196)") {
    val r = sql(
      """WITH dense1 AS (
        |  SELECT id, row_number() OVER (ORDER BY v_cosine(vector,
        |    (SELECT vector FROM embeddings_collection WHERE id = '0')) DESC, id) AS rn
        |  FROM embeddings_collection WHERE id <> '0' LIMIT 50),
        |dense2 AS (
        |  SELECT id, row_number() OVER (ORDER BY v_dot(vector,
        |    (SELECT vector FROM embeddings_collection WHERE id = '1')) DESC, id) AS rn
        |  FROM embeddings_collection WHERE id <> '1' LIMIT 50)
        |SELECT COALESCE(d1.id, d2.id) AS id,
        |       COALESCE(1.0D / (60 + d1.rn), 0D) + COALESCE(1.0D / (60 + d2.rn), 0D) AS fused
        |FROM dense1 d1 FULL OUTER JOIN dense2 d2 ON d1.id = d2.id
        |ORDER BY fused DESC, id LIMIT 10""".stripMargin).collect()
    assert(r.length === 10)
    assert(r.map(_.getDouble(1)).toSeq === r.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("V_RANDOM deterministic sampling as pure SQL (tests.sql:309-320)") {
    val a = sql(
      """SELECT id FROM embeddings_collection
        |ORDER BY md5(id || '42'), id LIMIT 10""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    val b = sql(
      """SELECT id FROM embeddings_collection
        |ORDER BY md5(id || '42'), id LIMIT 10""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(a === b) // seeded: same sample on every run, any layout
    // filtered variant (tests.sql:315-320)
    val f = sql(
      """SELECT id FROM embeddings_collection
        |WHERE json_get_int(payload, 'label') = 1
        |ORDER BY md5(id || '42'), id LIMIT 5""".stripMargin).collect()
    assert(f.length === 5)
  }

  test("batch search via CROSS JOIN LATERAL over VALUES queries (tests.sql:326-345)") {
    val r = sql(
      """WITH queries AS (
        |  SELECT q.query_id, e.vector AS qv
        |  FROM VALUES (1, '0'), (2, '1') AS q(query_id, src_id)
        |  JOIN embeddings_collection e ON e.id = q.src_id)
        |SELECT q.query_id, c.id, c.score
        |FROM queries q,
        |LATERAL (SELECT id, round(v_cosine(vector, q.qv), 6) AS score
        |         FROM embeddings_collection
        |         ORDER BY score DESC, id LIMIT 5) c
        |ORDER BY q.query_id, c.score DESC, c.id""".stripMargin).collect()
    assert(r.length === 10)
    assert(r.count(_.getInt(0) == 1) === 5)
  }

  test("edge cases: empty query vector and high-dimension sparse indices (tests.sql:389-403)") {
    // empty vector: cosine has a zero-norm side -> NULL, dot over the
    // empty common prefix -> 0.0; no crash either way
    val e = sql(
      """SELECT v_cosine(vector, CAST(array() AS ARRAY<DOUBLE>)) AS c,
        |       v_dot(vector, CAST(array() AS ARRAY<DOUBLE>)) AS d
        |FROM embeddings_collection LIMIT 1""".stripMargin).head()
    assert(e.isNullAt(0))
    assert(e.getDouble(1) === 0.0)
    // an UNTYPED empty array (array<void>) fails resolution with the
    // kernel's clean type-check message, not a runtime crash
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT v_cosine(vector, array()) FROM embeddings_collection").collect()
    }
    assert(ex.getMessage.contains("expects array<float>/array<double>"))
    // sparse vector with very large indices: sorted-merge just walks past
    val s = sql(
      """SELECT v_sparse_dot(array(1, 999999), array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                    array(999999), array(CAST(3.0 AS FLOAT))) AS x""".stripMargin).head()
    assert(s.getDouble(0) === 6.0)
  }

  test("the FULL transliterated corpus executes in sequence (tests.sql:1-407)") {
    // src/test/resources/tests_transliterated.sql carries every statement
    // of the reference corpus in order; running the whole artifact catches
    // registry/view/dialect drift structurally, not per hand-picked case
    ready
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .createOrReplaceTempView("documents_collection")
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/tests_transliterated.sql"), "UTF-8")
    val text = try src.mkString finally src.close()
    val statements = text.split(";")
      .map(_.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n").trim)
      .filter(_.nonEmpty)
    assert(statements.length === 32, "one statement per reference corpus query")
    statements.zipWithIndex.foreach { case (stmt, i) =>
      val rows = withClue(s"statement ${i + 1}:\n$stmt\n") { spark.sql(stmt).collect() }
      // every non-edge-case statement returns rows on the test corpus; the
      // deliberately-vacuous ones (radius/score gates, empty-vector probe)
      // still executed to get here
      assert(rows != null)
    }
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
