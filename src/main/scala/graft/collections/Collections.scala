package graft.collections

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The collection data model (SURVEY.md §1).
  *
  * A collection is one flat columnar table of points: a non-nullable string
  * `id`, a nullable JSON-string `payload`, and one column per vector field —
  * dense `array<float>`, multi `array<array<float>>`, and the two-column
  * sparse convention `{name}_indices` (array<int>) + `{name}_values`
  * (array<float>). Mirrors the Arrow schema inference of
  * /root/reference/src/arrow/schema.rs:59-110 and the deserializer's NULL
  * semantics for absent fields (/root/reference/src/arrow/deserialize.rs:
  * 245-284): a point missing a vector field has NULL, never an empty list.
  *
  * Unlike the reference (which dispatches extractors by column-name suffix,
  * schema.rs / deserialize.rs:128-147), field kinds here are keyed off the
  * descriptor; the external two-column sparse naming is kept.
  */
sealed trait VectorFieldSpec { def name: String }
/** Dense vector field; `dim` is advisory (schema carries no fixed size). */
final case class DenseField(name: String, dim: Int, metric: String = "cosine")
    extends VectorFieldSpec
/** Multi-vector field (ragged list of equal-dim vectors, MaxSim comparator). */
final case class MultiField(name: String, dim: Int) extends VectorFieldSpec
/** Sparse vector field -> two physical columns {name}_indices/{name}_values. */
final case class SparseField(name: String) extends VectorFieldSpec

final case class CollectionDescriptor(
    name: String,
    fields: Seq[VectorFieldSpec],
    /** false = single unnamed dense vector exposed as column `vector`
      * (schema.rs:74-77); true = one column per named field (:78-86). */
    named: Boolean = true) {

  /** StructType per the reference's inference rules (schema.rs:59-110). */
  def schema: StructType = {
    val base = Seq(
      StructField("id", StringType, nullable = false),
      StructField("payload", StringType, nullable = true))
    val vecs = fields.flatMap {
      case DenseField(n, _, _) =>
        val col = if (named) n else "vector"
        Seq(StructField(col, ArrayType(FloatType, containsNull = true), nullable = true))
      case MultiField(n, _) =>
        Seq(StructField(n,
          ArrayType(ArrayType(FloatType, containsNull = true), containsNull = true),
          nullable = true))
      case SparseField(n) => Seq(
        // Arrow UInt32 has no Spark analog; IntegerType documented deviation
        // (SURVEY.md §7.3 risk 4).
        StructField(s"${n}_indices", ArrayType(IntegerType, containsNull = true), nullable = true),
        StructField(s"${n}_values", ArrayType(FloatType, containsNull = true), nullable = true))
    }
    StructType(base ++ vecs)
  }

  /** Names of the physical columns a projection of `fieldNames` requires —
    * the analog of the reference's vector-selector trimming
    * (/root/reference/src/utils.rs:53-83).
    */
  def physicalColumns(fieldNames: Seq[String]): Seq[String] =
    fieldNames.flatMap { f =>
      fields.find(_.name == f) match {
        case Some(SparseField(n)) => Seq(s"${n}_indices", s"${n}_values")
        case Some(DenseField(n, _, _)) => Seq(if (named) n else "vector")
        case Some(MultiField(n, _)) => Seq(n)
        case None => Seq(f) // id / payload / already-physical name
      }
    }
}

object CollectionDescriptor {
  /** The inverse of [[CollectionDescriptor.schema]]: recover a descriptor
    * from a collection-shaped StructType — the catalog's CREATE TABLE
    * path (a user declares the table shape in SQL/DDL and the store
    * derives its field config). Recognizes the same conventions schema()
    * emits: leading non-null `id` string + nullable `payload` string,
    * dense `array<float>`, multi `array<array<float>>`, and the adjacent
    * `{name}_indices`/`{name}_values` sparse pair. A single dense column
    * named `vector` is the UNNAMED single-vector collection
    * (schema.rs:74-77 analog).
    */
  def fromSchema(name: String, st: StructType): CollectionDescriptor = {
    require(st.fields.length >= 2 &&
        st.fields(0).name == "id" && st.fields(0).dataType == StringType &&
        st.fields(1).name == "payload" && st.fields(1).dataType == StringType,
      s"collection schema must start with (id STRING, payload STRING), got $st")
    val vecCols = st.fields.drop(2)
    val fields = scala.collection.mutable.ArrayBuffer.empty[VectorFieldSpec]
    var i = 0
    while (i < vecCols.length) {
      val f = vecCols(i)
      f.dataType match {
        case ArrayType(IntegerType, _) if f.name.endsWith("_indices") &&
            i + 1 < vecCols.length &&
            vecCols(i + 1).name == f.name.stripSuffix("_indices") + "_values" =>
          // The values half must be exactly what the store round-trips
          // (array<float>): accepting any ArrayType here would create a
          // SparseField whose reported schema silently diverges from the
          // declared DDL (e.g. `_values ARRAY<DOUBLE>`).
          vecCols(i + 1).dataType match {
            case ArrayType(FloatType, _) => ()
            case other => throw new IllegalArgumentException(
              s"column '${vecCols(i + 1).name}': sparse values must be " +
                s"ARRAY<FLOAT>, got $other")
          }
          fields += SparseField(f.name.stripSuffix("_indices")); i += 2
        case ArrayType(FloatType, _) =>
          fields += DenseField(f.name, dim = 0); i += 1
        case ArrayType(ArrayType(FloatType, _), _) =>
          fields += MultiField(f.name, dim = 0); i += 1
        case other => throw new IllegalArgumentException(
          s"column '${f.name}': $other is not a collection field type " +
            "(dense array<float>, multi array<array<float>>, or the " +
            "{name}_indices/{name}_values sparse pair)")
      }
      ()
    }
    val unnamed = fields.toSeq match {
      case Seq(DenseField("vector", _, _)) => true
      case _ => false
    }
    CollectionDescriptor(name, fields.toSeq, named = !unnamed)
  }
}

object Collections {

  /** F3: the homogeneous unnamed collection (single dense `vector`), built
    * from `embeddings.parquet`: id = cast(vec_id), payload = JSON of {label},
    * vector = embedding. Mirrors /root/reference/tests/e2e.rs:343-365.
    */
  val homogeneousDescriptor: CollectionDescriptor =
    CollectionDescriptor("embeddings_collection", Seq(DenseField("vector", 64)), named = false)

  def homogeneous(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id").cast(StringType).as("id"),
      to_json(struct(col("label"))).as("payload"),
      col("embedding").as("vector"))

  /** F2: the heterogeneous named collection. Derived deterministically from
    * `embeddings`: three named dense fields populated on disjoint id subsets
    * (vec_id % 3) so the NULL-for-absent-field semantics of
    * /root/reference/tests/e2e.rs:163-208 are reproduced; a multi-vector
    * field [embedding, reverse(embedding)]; and a sparse field `keywords`
    * holding the strictly-positive positions of the embedding (ascending
    * indices, 0-based).
    */
  val heterogeneousDescriptor: CollectionDescriptor =
    CollectionDescriptor("hetero_collection", Seq(
      DenseField("text_embedding", 64),
      DenseField("image_embedding", 64, metric = "dot"),
      DenseField("audio_embedding", 64, metric = "euclid"),
      MultiField("multi_embeddings", 64),
      SparseField("keywords")))

  def heterogeneous(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "embeddings")
    val m = col("vec_id") % 3
    val emb = col("embedding")
    val idxStruct = filter(
      transform(emb, (x, i) => struct(i.as("i"), x.as("x"))), s => s("x") > lit(0f))
    e.select(
      col("vec_id").cast(StringType).as("id"),
      to_json(struct(col("label"))).as("payload"),
      when(m === 0 || m === 1, emb).as("text_embedding"),
      when(m === 1 || m === 2, emb).as("image_embedding"),
      when(m === 2, emb).as("audio_embedding"),
      when(m === 0, array(emb, reverse(emb))).as("multi_embeddings"),
      when(m =!= 1, transform(idxStruct, s => s("i").cast(IntegerType))).as("keywords_indices"),
      when(m =!= 1, transform(idxStruct, s => s("x"))).as("keywords_values"))
  }

  /** Register both collection views. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    homogeneous(spark, sfDir).createOrReplaceTempView(homogeneousDescriptor.name)
    heterogeneous(spark, sfDir).createOrReplaceTempView(heterogeneousDescriptor.name)
  }

  /** Sink (reference A12 — `insert_into`, which the reference leaves
    * `todo!()`, table.rs:186-193): persist a collection-shaped DataFrame as
    * parquet. At scale, `repartition(n)` upstream controls file count and
    * the columnar layout keeps projection pushdown on re-read.
    */
  def writeCollection(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  /** Re-open a written collection (schema travels with the parquet). */
  def readCollection(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
