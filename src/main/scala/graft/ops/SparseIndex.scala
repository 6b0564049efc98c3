package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inverted sparse-vector index — the dimension-postings analog of
  * [[TextIndex]], and the serving path behind the reference backend's
  * sparse search: Qdrant serves sparse queries from an inverted index
  * keyed on nonzero DIMENSION (its sparse HNSW-free path), never by
  * scanning whole vectors. The engine's `sparse_search` kernel form
  * (map-side `v_sparse_dot` over every row) is the right plan exactly
  * once; a retrieval workload builds this index at ingest.
  *
  * Layout: one posting row per (dim, id, value), written
  * `partitionBy("db")` with db = dim % nBuckets. A query's nonzero dims
  * are LITERALS, so the serving read partition-prunes to at most
  * |query dims| bucket directories — at 100 TB the scan touches the few
  * buckets the query's dims fall into, not the index. Buckets (not raw
  * dims) keep the partition count bounded by `nBuckets` however wide the
  * dimension space (BM25-style vocabularies run to millions of dims).
  *
  * Serving is EXACT and fully index-resident: a candidate's matched
  * postings fold in ascending-dim order with contribution
  * `value * qvalue` — the same multiply-accumulate sequence as the
  * codegen sorted-merge kernel ([[graft.functions]] `v_sparse_dot`,
  * VectorExpressions.scala SparseDotProduct), so index scores are
  * bit-identical to the brute-force scan. Rows sharing no nonzero dim
  * with the query have an exact 0.0 dot and never enter the result
  * (with nonnegative values they cannot out-rank a matching row).
  * ONE shuffle, of pruned postings only (≤ |query dims| rows per doc).
  */
object SparseIndex {

  /** Dimension bucket: the partition key of the index layout. Plain
    * modulus (not a hash) — dims are already small dense integers, and a
    * literal query dim's bucket is computable engine-side for pruning.
    */
  def dimBucket(dimCol: Column, nBuckets: Int): Column =
    pmod(dimCol, lit(nBuckets)).cast(IntegerType)

  /** Build the postings table: one row per (dim, doc, value) from the
    * (indices, values) sparse representation. One explode, no shuffle —
    * write `partitionBy("db")` to lay the index out for pruned serving.
    */
  def buildPostings(df: DataFrame, idCol: String, idxCol: String,
                    valCol: String, nBuckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(zip_with(col(idxCol), col(valCol),
          (i, v) => struct(i.cast(IntegerType).as("dim"),
            v.cast(DoubleType).as("v")))).as("e"))
      .select(col("id"), col("e.dim").as("dim"), col("e.v").as("v"))
      .withColumn("db", dimBucket(col("dim"), nBuckets))

  /** Serve a sparse top-k query from the stored index: literal (db, dim)
    * predicates prune the read to the query dims' buckets, per-doc
    * matched postings fold ascending-dim (the kernel's merge order) into
    * the exact dot, then round/rank/limit. `qIdx` must be strictly
    * ascending (the sparse representation's invariant).
    */
  def searchPostings(postings: DataFrame, qIdx: Seq[Int], qVal: Seq[Double],
                     k: Int, nBuckets: Int, roundTo: Int = 6,
                     excludeId: Option[String] = None): DataFrame = {
    require(qIdx.nonEmpty, "query needs at least one nonzero dim")
    require(qIdx.length == qVal.length, "indices/values length mismatch")
    require(qIdx.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"query dims must be strictly ascending: $qIdx")
    val dbs = qIdx.map(d => ((d % nBuckets) + nBuckets) % nBuckets).distinct
    // literal dim -> qvalue map, broadcast inside the codegen'd project
    val qm = map_from_arrays(
      array(qIdx.map(d => lit(d)): _*), array(qVal.map(v => lit(v)): _*))
    val pruned = postings
      .filter(col("db").isin(dbs: _*) && col("dim").isin(qIdx: _*))
    val base = excludeId.fold(pruned)(x => pruned.filter(col("id") =!= x))
    base
      .withColumn("__c", col("v") * element_at(qm, col("dim")))
      .groupBy(col("id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("dim"), col("__c")))),
        lit(0.0), (acc, e) => acc + e.getField("__c")).as("__s"))
      .select(col("id"), round(col("__s"), roundTo).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
