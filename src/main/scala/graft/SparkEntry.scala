package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.collections.Collections
import graft.functions._
import graft.ops.Search

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 re-expressed
  * Spark-first; `oracleSql` holds the DuckDB-equivalent SQL the driver runs
  * on the same parquet for the hash-match correctness gate.
  *
  * Determinism rules used throughout (SURVEY.md §7.3):
  *  - float vectors are cast to array<double> on BOTH sides before scoring,
  *    so both engines do identical double arithmetic;
  *  - similarity scores are rounded (6 dp) BEFORE ranking, with an `id`
  *    tiebreak, so top-k boundaries agree;
  *  - money aggregates go through exact DECIMAL accumulation (order
  *    independent) and only the final value is cast to double;
  *  - every result carries an explicit ORDER BY present in both engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (the reference's README
    * headline shape, /root/reference/README.md:67-72): scan the collection,
    * project id/payload/vector, limit. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Collections.homogeneous(spark, "/root/testdata/sf0.001")
      .select(col("id"), col("payload"), col("vector"))
      .limit(10)

  // -- helpers --------------------------------------------------------------

  private def hom(s: SparkSession, dir: String): DataFrame =
    Collections.homogeneous(s, dir)

  private def dvec(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** homogeneous collection with vector pre-cast to array<double>. */
  private def homD(s: SparkSession, dir: String): DataFrame =
    hom(s, dir).withColumn("vector", dvec(col("vector")))

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  // -- the operator surface -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.A scan / projection / limit over the collection model ----
    "scan_select_star" -> ((s, dir) =>
      homD(s, dir).select(col("id"), col("payload"), col("vector"))
        .orderBy(col("id"))),

    "scan_projection" -> ((s, dir) =>
      hom(s, dir).select(col("id"), col("payload")).orderBy(col("id"))),

    "scan_limit" -> ((s, dir) =>
      homD(s, dir).select(col("id"), col("vector"))
        .orderBy(col("id").cast(LongType)).limit(5)),

    // ---- §1.2 heterogeneous collection: NULL-for-absent-field semantics ----
    "hetero_nulls" -> ((s, dir) =>
      Collections.heterogeneous(s, dir).select(
        col("id"),
        col("payload"),
        dvec(col("text_embedding")).as("text_embedding"),
        dvec(col("audio_embedding")).as("audio_embedding"),
        col("keywords_indices"),
        dvec(col("keywords_values")).as("keywords_values"))
        .orderBy(col("id").cast(LongType))),

    // ---- §2.D JSON payload surface ----
    "json_get" -> ((s, dir) =>
      events(s, dir).select(
        col("event_id"),
        json_get_str(col("props"), "k").as("k_str"),
        json_get_int(col("props"), "k").as("k_int"))
        .orderBy(col("event_id"))),

    "json_filter_agg" -> ((s, dir) =>
      events(s, dir)
        .filter(json_get_int(col("props"), "k") > 50)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy(col("event_type"))),

    "has_field" -> ((s, dir) =>
      events(s, dir).select(
        col("event_id"),
        has_field(col("props"), "k").as("has_k"),
        has_field(col("props"), "missing").as("has_missing"))
        .orderBy(col("event_id"))),

    // ---- §2.C dense vector search (V_SEARCH / V_DISTANCE / V_WITHIN) ----
    "cosine_topk" -> ((s, dir) =>
      Search.topKById(homD(s, dir).select("id", "vector"), "vector", "0", 10)
        .select("id", "score")),

    "dot_topk" -> ((s, dir) =>
      Search.topKById(homD(s, dir).select("id", "vector"), "vector", "1", 10,
        metric = "dot").select("id", "score")),

    "euclid_topk" -> ((s, dir) =>
      Search.topKById(homD(s, dir).select("id", "vector"), "vector", "2", 10,
        metric = "euclid").select("id", "score")),

    "within_radius_agg" -> ((s, dir) => {
      val df = homD(s, dir)
      val q = df.filter(col("id") === "0").select(col("vector").as("__qvec"))
      df.filter(col("id") =!= "0").crossJoin(broadcast(q))
        .withColumn("label", json_get_int(col("payload"), "label"))
        .filter(v_euclid(col("vector"), col("__qvec")) < lit(3.0))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // ---- §2.B relational surface over TPC-H tables ----
    "q1_agg" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "join3_agg" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("revenue"))
        .orderBy(col("n_name"))
    }),

    "having_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("total"))
        .filter(col("n") >= 3)
        .orderBy(col("user_id")))
  )

  /** DuckDB-equivalent SQL per query (same parquet tables, same column
    * names, same ORDER BY). Keys absent here get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(

    "scan_select_star" ->
      """SELECT CAST(vec_id AS VARCHAR) AS id,
        |       to_json({'label': label}) AS payload,
        |       CAST(embedding AS DOUBLE[]) AS vector
        |FROM embeddings ORDER BY id""".stripMargin,

    "scan_projection" ->
      """SELECT CAST(vec_id AS VARCHAR) AS id,
        |       to_json({'label': label}) AS payload
        |FROM embeddings ORDER BY id""".stripMargin,

    "scan_limit" ->
      """SELECT CAST(vec_id AS VARCHAR) AS id,
        |       CAST(embedding AS DOUBLE[]) AS vector
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin,

    "hetero_nulls" ->
      """SELECT CAST(vec_id AS VARCHAR) AS id,
        |       to_json({'label': label}) AS payload,
        |       CASE WHEN vec_id % 3 IN (0, 1) THEN CAST(embedding AS DOUBLE[]) END AS text_embedding,
        |       CASE WHEN vec_id % 3 = 2 THEN CAST(embedding AS DOUBLE[]) END AS audio_embedding,
        |       CASE WHEN vec_id % 3 <> 1 THEN
        |         CAST(list_transform(list_filter(range(1, len(embedding) + 1), i -> embedding[i] > 0), i -> i - 1) AS INTEGER[])
        |       END AS keywords_indices,
        |       CASE WHEN vec_id % 3 <> 1 THEN
        |         CAST(list_filter(embedding, x -> x > 0) AS DOUBLE[])
        |       END AS keywords_values
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "json_get" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    "json_filter_agg" ->
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "has_field" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
        |       json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
        |FROM events ORDER BY event_id""".stripMargin,

    "cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT CAST(e.vec_id AS VARCHAR) AS id,
        |       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,

    "dot_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT CAST(e.vec_id AS VARCHAR) AS id,
        |       ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
        |FROM embeddings e, q WHERE e.vec_id <> 1
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,

    "euclid_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 2)
        |SELECT CAST(e.vec_id AS VARCHAR) AS id,
        |       ROUND(-list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
        |FROM embeddings e, q WHERE e.vec_id <> 2
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,

    "within_radius_agg" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT CAST(e.label AS BIGINT) AS label, COUNT(*) AS n
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0 AND list_distance(CAST(e.embedding AS DOUBLE[]), q.qv) < 3.0
        |GROUP BY e.label ORDER BY label""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "join3_agg" ->
      """SELECT n_name,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "having_agg" ->
      """SELECT user_id, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY user_id HAVING COUNT(*) >= 3
        |ORDER BY user_id""".stripMargin
  )
}
