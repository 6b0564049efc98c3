package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Cast, Expression, GetJsonObject, IsNotNull, LessThan, Literal, Subtract, UnaryMinus}
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** The SQL function surface as (name -> Catalyst builder) pairs — one
  * table consumed by BOTH registration paths: runtime
  * `functions.registerAll(spark)` (temp functions) and the
  * [[graft.GraftExtensions]] `SparkSessionExtensions` injection
  * (`spark.sql.extensions=graft.GraftExtensions`, the canonical library
  * deployment). Builders produce raw Catalyst nodes: a Column expression
  * tree cannot be re-embedded unresolved into a SQL plan.
  */
private[graft] object SqlBuilders {

  private def metricOf(e: Expression): String = e.eval(null) match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString.toLowerCase
    case other => throw new IllegalArgumentException(
      s"metric must be a string literal, got $other")
  }

  private def distanceExpr(a: Expression, b: Expression, metric: String): Expression =
    metric match {
      case "cosine" => Subtract(Literal(1.0), CosineSimilarity(a, b))
      case "dot"    => UnaryMinus(DotProduct(a, b))
      case "euclid" | "euclidean" | "l2" => EuclideanDistance(a, b)
      case m => throw new IllegalArgumentException(s"unknown metric '$m'")
    }

  // V_DISTANCE(a, b, 'metric') / V_WITHIN(a, b, r[, 'metric']): the metric
  // must be a foldable string literal, as in the reference corpus.
  private def pathOf(keys: Seq[Expression]): Expression =
    Literal(org.apache.spark.unsafe.types.UTF8String
      .fromString("$." + keys.map(_.eval(null).toString).mkString(".")))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "v_dot" -> (es => DotProduct(es(0), es(1))),
    "v_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "v_euclid" -> (es => EuclideanDistance(es(0), es(1))),
    "v_sparse_dot" -> (es => SparseDotProduct(es(0), es(1), es(2), es(3))),
    "v_maxsim" -> (es => MaxSim(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "fingerprint64" -> (es => RollingHash64(es(0))),
    "v_distance" -> (es => distanceExpr(es(0), es(1), metricOf(es(2)))),
    "v_within" -> (es => LessThan(
      distanceExpr(es(0), es(1), if (es.length > 3) metricOf(es(3)) else "euclid"),
      Literal(es(2).eval(null).toString.toDouble))),
    // JSON pack aliases (SURVEY §2.D): json_get(j,'k'), typed gets, has_field
    "json_get" -> (es => GetJsonObject(es.head, pathOf(es.tail))),
    "json_get_str" -> (es => GetJsonObject(es.head, pathOf(es.tail))),
    "json_get_int" -> (es => Cast(GetJsonObject(es.head, pathOf(es.tail)), LongType)),
    "json_get_float" -> (es => Cast(GetJsonObject(es.head, pathOf(es.tail)), DoubleType)),
    "json_get_bool" -> (es => Cast(GetJsonObject(es.head, pathOf(es.tail)), BooleanType)),
    "has_field" -> (es => IsNotNull(GetJsonObject(es.head, pathOf(es.tail)))))
}
