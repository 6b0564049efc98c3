package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multitenant collection layout: the corpus partitioned by a payload
  * tenant key, searches scoped to one tenant.
  *
  * This re-expresses the reference host's multitenancy guidance (one
  * collection partitioned by a payload `group_id`, every query filtered to
  * the caller's tenant) in Spark's storage model: `partitionBy(tenant)`
  * makes the tenant predicate a STATIC partition filter, so a tenant's
  * query reads only that tenant's files — per-tenant cost is proportional
  * to the tenant's data, not the collection, which is the whole point at
  * 100 TB with thousands of tenants. The literal-predicate pruning is the
  * same mechanism as the IVF cluster store ([[Ann.searchIvfStored]]);
  * pruning is asserted in BucketingSpec.
  */
object Tenant {

  /** Ingest: write the corpus partitioned by `tenantCol`. Tenants skewed
    * enough to need more files split naturally — parquet writers roll
    * files per partition directory, and AQE handles read-side skew.
    */
  def writeLayout(df: DataFrame, tenantCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(tenantCol).parquet(path)

  def readLayout(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Top-k within one tenant's slice of the layout. The `===` on the
    * partition column is a literal predicate — planning-time pruning, no
    * runtime filtering machinery — and the score/top-k shape is the
    * standard map-side [[Search.topK]] plan over the surviving files.
    */
  def searchTenant(layout: DataFrame, tenantCol: String, tenant: String,
                   idCol: String, vecCol: String, query: Column, k: Int,
                   metric: String = "cosine", roundTo: Int = 6): DataFrame =
    layout.filter(col(tenantCol) === tenant)
      .select(col(idCol).as("id"),
        round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)

  /** Per-tenant point counts — the admin view of the layout: one
    * partial-aggregating pass, one row per tenant.
    */
  def tenantStats(layout: DataFrame, tenantCol: String): DataFrame =
    layout.groupBy(col(tenantCol))
      .agg(count(lit(1)).as("n_points"))
      .orderBy(col(tenantCol))
}
