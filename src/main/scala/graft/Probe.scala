package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Targeted A/B measurement harness for the optimization rounds —
  * committed deliberately alongside [[Explain]] as measurement tooling
  * (guide §1): edit the `variants` list to the pipeline stages under
  * study, run with SPARK_GRAFT_SF_DIR/SPARK_GRAFT_REPEAT. Not an engine
  * path; the shipped variants are whatever the last investigation
  * probed.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // r19: dedup_embedding_lsh stage decomposition
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
    def emb() = e.union(e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        transform(col("v"), x => x * lit(0.99)).as("v")))
    val nbits = 16; val bands = 4; val r = nbits / bands
    val mask = (1L << r) - 1
    def base() = emb().select(col("vec_id").as("id"), col("v"))
      .filter(col("v").isNotNull)
    def sigs() = graft.ops.Ann.lshBuckets(base(), "v", 64, nbits, 42L)
    def banded() = sigs().select(col("id"),
      array((0 until bands).map(b =>
        shiftright(col("bucket"), b * r).bitwiseAND(lit(mask))): _*).as("keys"))
      .select(col("id"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "bandkey")))
    def buckets() = banded().groupBy(col("band"), col("bandkey"))
      .agg(sort_array(collect_list(struct(col("id"), col("keys")))).as("xs"))
      .filter(size(col("xs")) > 1)
    def cands() = {
      val xs = col("xs")
      val exploded = buckets()
        .select(col("band"), explode(flatten(transform(xs, (a, i) =>
          transform(slice(xs, i + lit(2), size(xs)),
            b => struct(a.getField("id").as("a_id"),
              b.getField("id").as("b_id"), a.getField("keys").as("__ak"),
              b.getField("keys").as("__bk")))))).as("p"))
      val earlier = (0 until bands - 1).map(b =>
        col("band") > b &&
          element_at(col("p.__ak"), b + 1) === element_at(col("p.__bk"), b + 1))
        .reduce(_ || _)
      exploded.filter(!earlier).select(col("p.a_id"), col("p.b_id"))
    }
    def candsNew() = banded()
      .select(col("id"), slice(col("keys"), lit(1), col("band")).as("pref"),
        col("band"), col("bandkey"))
      .groupBy(col("band"), col("bandkey"))
      .agg(sort_array(collect_list(struct(col("id"), col("pref")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(graft.functions.first_band_pairs(col("xs")).as(Seq("a_id", "b_id")))
    def full() = graft.ops.Dedup.embeddingNearDupLsh(emb(), "vec_id", "v",
      threshold = 0.999)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cands_old" -> (() => cands()),
      "cands_new" -> (() => candsNew()),
      "full" -> (() => full())
    )
    println(s"[probe] n_cands=${candsNew().count()}  n_out=${full().count()}")

    variants.foreach { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"[probe] $name%-14s med=$med%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
