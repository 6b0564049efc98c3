package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections
import graft.functions._
import graft.ops.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Collections.homogeneous(spark, TestSpark.sfDir)
    .withColumn("vector", col("vector").cast("array<double>"))
    .select("id", "vector")

  private def queryVec: Seq[Double] =
    corpus.filter(col("id") === "0").head().getSeq[Double](1)

  test("IVF with all clusters probed equals brute force") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(queryVec), k = 10)
      .select("id").as[String].collect().toSeq
    val ivfAll = idx.search(vec(queryVec), k = 10, nprobe = 4)
      .select("id").as[String].collect().toSeq
    assert(ivfAll === exact)
  }

  test("IVF with partial probes keeps reasonable recall") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 8)
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(queryVec), k = 10)
      .select("id").as[String].collect().toSet
    val approx = idx.search(vec(queryVec), k = 10, nprobe = 3)
      .select("id").as[String].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("IVF search scans only probed clusters") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 8)
    val probedRows = idx.clustered
      .join(idx.centroids
        .withColumn("cdist", v_euclid(col("centroid"), vec(queryVec)))
        .orderBy(col("cdist")).limit(2).select("cluster"), Seq("cluster"))
      .count()
    assert(probedRows < corpus.count())
  }

  test("lshBuckets is deterministic and distributes") {
    val a = Ann.lshBuckets(corpus, "vector", dim = 64, nbits = 8)
      .select("id", "bucket").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Ann.lshBuckets(corpus, "vector", dim = 64, nbits = 8)
      .select("id", "bucket").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1)
  }

  test("searchLsh: candidates rerank to a high-recall top-k vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val corpus = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") =!= "3")
    val lsh = Ann.searchLsh(corpus, "id", "vector", q, k = 10)
      .collect().map(_.getString(0)).toSet
    val brute = Ann.bruteForce(corpus, "id", "vector",
        graft.functions.vec(q), k = 50, metric = "cosine")
      .collect().map(_.getString(0)).toSet
    assert(lsh.size == 10)
    // banding with 4x4 bits keeps near neighbors: the LSH top-10 sits
    // inside the exact top-50
    assert((lsh -- brute).isEmpty, s"LSH returned far points: ${lsh -- brute}")
  }
}
