package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense/sparse/multi-vector kernels.
  *
  * These are the hot path of the vector-search surface the reference declares
  * in its SQL corpus (/root/reference/tests/bin/tests.sql:10-76,156-168 —
  * V_SEARCH / V_DISTANCE / V_SPARSE_SEARCH / V_COLBERT). The reference
  * delegates all scalar evaluation to its host engine; here we implement the
  * kernels as codegen-capable expressions so they stay inside whole-stage
  * codegen (no UDF boxing) — the difference between viable and not at 100 TB.
  *
  * All kernels accumulate in `double` regardless of input element width, and
  * accept `array<float>` or `array<double>` children without an up-front cast
  * (the accessor is specialized at codegen time).
  */
private[graft] object VecExprUtil {
  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def isMultiVec(dt: DataType): Boolean = dt match {
    case ArrayType(inner, _) => isVec(inner)
    case _ => false
  }
  def isIndexVec(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType | LongType, _) => true
    case _ => false
  }
  /** Java source for reading element `i` of ArrayData `arr` as double. */
  def accessor(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(long) $arr.getInt($i)"
      case LongType    => s"$arr.getLong($i)"
      case other => throw new IllegalStateException(s"unsupported element $other")
    }
  /** Interpreted-mode accessor. */
  def getter(dt: DataType): (ArrayData, Int) => Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case other => throw new IllegalStateException(s"unsupported element $other")
    }
  def longGetter(dt: DataType): (ArrayData, Int) => Long =
    dt.asInstanceOf[ArrayType].elementType match {
      case IntegerType => (a, i) => a.getInt(i).toLong
      case LongType    => (a, i) => a.getLong(i)
      case other => throw new IllegalStateException(s"unsupported element $other")
    }
  def checkVecs(exprs: Seq[Expression], name: String): TypeCheckResult = {
    val bad = exprs.find(e => !isVec(e.dataType))
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float>/array<double>, got ${bad.get.dataType.catalogString}")
  }
}

import VecExprUtil._

/** dot(a, b) over the common prefix of the two arrays -> double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(left, right), "v_dot")
  override def prettyName: String = "v_dot"

  @transient private lazy val getL = getter(left.dataType)
  @transient private lazy val getR = getter(right.dataType)

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { s += getL(a, i) * getR(b, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${accessor(left.dataType, a, i)}) * (${accessor(right.dataType, b, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) -> double in [-1, 1]; NULL when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(left, right), "v_cosine")
  override def prettyName: String = "v_cosine"

  @transient private lazy val getL = getter(left.dataType)
  @transient private lazy val getR = getter(right.dataType)

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${accessor(left.dataType, a, i)};
         |  double $y = ${accessor(right.dataType, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** euclidean distance ||a - b||_2 -> double. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(left, right), "v_euclid")
  override def prettyName: String = "v_euclid"

  @transient private lazy val getL = getter(left.dataType)
  @transient private lazy val getR = getter(right.dataType)

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { val d = getL(a, i) - getR(b, i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${accessor(left.dataType, a, i)}) - (${accessor(right.dataType, b, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): EuclideanDistance =
    copy(left = l, right = r)
}

/** Manhattan (L1) distance sum(|a_i - b_i|) -> double — the fourth
  * variant of the backend's `Distance` enum (the reference's collections
  * are declared with `Distance::Cosine/Dot/Euclid` in
  * /root/reference/tests/e2e.rs:66,135,139; Manhattan is the remaining
  * public variant of the same enum). Same codegen shape as
  * [[EuclideanDistance]]: one fused loop, no allocation.
  */
case class ManhattanDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(left, right), "v_manhattan")
  override def prettyName: String = "v_manhattan"

  @transient private lazy val getL = getter(left.dataType)
  @transient private lazy val getR = getter(right.dataType)

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    while (i < n) { s += math.abs(getL(a, i) - getR(b, i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Math.abs((${accessor(left.dataType, a, i)}) - (${accessor(right.dataType, b, i)}));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ManhattanDistance =
    copy(left = l, right = r)
}

/** Sparse dot product over two (indices, values) pairs with ascending,
  * de-duplicated indices (the two-column sparse convention of
  * /root/reference/src/arrow/schema.rs:91-107). Sorted-merge, O(n1+n2).
  */
case class SparseDotProduct(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "v_sparse_dot"
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!isIndexVec(first.dataType) || !isIndexVec(third.dataType))
      TypeCheckResult.TypeCheckFailure("v_sparse_dot indices must be array<int>/array<bigint>")
    else checkVecs(Seq(second, fourth), "v_sparse_dot")
  }

  @transient private lazy val getI1 = longGetter(first.dataType)
  @transient private lazy val getV1 = getter(second.dataType)
  @transient private lazy val getI2 = longGetter(third.dataType)
  @transient private lazy val getV2 = getter(fourth.dataType)

  protected override def nullSafeEval(i1a: Any, v1a: Any, i2a: Any, v2a: Any): Any = {
    val i1 = i1a.asInstanceOf[ArrayData]; val v1 = v1a.asInstanceOf[ArrayData]
    val i2 = i2a.asInstanceOf[ArrayData]; val v2 = v2a.asInstanceOf[ArrayData]
    val n1 = math.min(i1.numElements(), v1.numElements())
    val n2 = math.min(i2.numElements(), v2.numElements())
    var p = 0; var q = 0; var s = 0.0
    while (p < n1 && q < n2) {
      val a = getI1(i1, p); val b = getI2(i2, q)
      if (a == b) { s += getV1(v1, p) * getV2(v2, q); p += 1; q += 1 }
      else if (a < b) p += 1
      else q += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i1, v1, i2, v2) => {
      val p = ctx.freshName("p"); val q = ctx.freshName("q"); val s = ctx.freshName("s")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      s"""
         |int $n1 = java.lang.Math.min($i1.numElements(), $v1.numElements());
         |int $n2 = java.lang.Math.min($i2.numElements(), $v2.numElements());
         |int $p = 0; int $q = 0; double $s = 0.0;
         |while ($p < $n1 && $q < $n2) {
         |  long $a = ${accessor(first.dataType, i1, p)};
         |  long $b = ${accessor(third.dataType, i2, q)};
         |  if ($a == $b) {
         |    $s += (${accessor(second.dataType, v1, p)}) * (${accessor(fourth.dataType, v2, q)});
         |    $p++; $q++;
         |  } else if ($a < $b) { $p++; } else { $q++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SparseDotProduct =
    copy(first = f, second = s, third = t, fourth = q)
}

/** ColBERT-style late-interaction MaxSim between two multi-vectors:
  * sum over query vectors of (max over doc vectors of dot(q_i, d_j)).
  * Mirrors the MaxSim comparator of /root/reference/tests/e2e.rs:142-147 and
  * the V_COLBERT spec at /root/reference/tests/bin/tests.sql:156-168.
  * `left` = document multi-vector, `right` = query multi-vector; both
  * array<array<float|double>>. Empty doc or query -> 0.0.
  */
case class MaxSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "v_maxsim"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isMultiVec(left.dataType) && isMultiVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"v_maxsim expects array<array<float|double>>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def inner(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType
  @transient private lazy val getD = getter(inner(left.dataType))
  @transient private lazy val getQ = getter(inner(right.dataType))

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val doc = l.asInstanceOf[ArrayData]; val qry = r.asInstanceOf[ArrayData]
    val nq = qry.numElements(); val nd = doc.numElements()
    var qi = 0; var total = 0.0
    while (qi < nq) {
      val qv = qry.getArray(qi)
      var best = Double.NegativeInfinity
      var di = 0
      while (di < nd) {
        val dv = doc.getArray(di)
        val n = math.min(qv.numElements(), dv.numElements())
        var k = 0; var dot = 0.0
        while (k < n) { dot += getQ(qv, k) * getD(dv, k); k += 1 }
        if (dot > best) best = dot
        di += 1
      }
      if (nd > 0) total += best
      qi += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (doc, qry) => {
      val qi = ctx.freshName("qi"); val di = ctx.freshName("di"); val k = ctx.freshName("k")
      val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd"); val n = ctx.freshName("n")
      val qv = ctx.freshName("qv"); val dv = ctx.freshName("dv")
      val dot = ctx.freshName("dot"); val best = ctx.freshName("best"); val total = ctx.freshName("total")
      val qAcc = accessor(inner(right.dataType), qv, k)
      val dAcc = accessor(inner(left.dataType), dv, k)
      s"""
         |int $nq = $qry.numElements(); int $nd = $doc.numElements();
         |double $total = 0.0;
         |for (int $qi = 0; $qi < $nq; $qi++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $qv = $qry.getArray($qi);
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $di = 0; $di < $nd; $di++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $dv = $doc.getArray($di);
         |    int $n = java.lang.Math.min($qv.numElements(), $dv.numElements());
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $n; $k++) { $dot += ($qAcc) * ($dAcc); }
         |    if ($dot > $best) $best = $dot;
         |  }
         |  if ($nd > 0) $total += $best;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MaxSim =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of 64-bit token hashes: bit j of the result
  * is 1 iff sum over tokens of (+1 if token bit j set else -1) > 0.
  * Input: array<bigint> (e.g. murmur3-64 of tokens via xxhash64). -> bigint.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<bigint>, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val h = ctx.freshName("h"); val counts = ctx.freshName("counts"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($counts[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Count of common elements between two SORTED, DISTINCT arrays (string or
  * bigint elements) — one sorted-merge pass, codegen'd. The set-similarity
  * workhorse: Spark's `array_intersect`/`array_union` build a hash set per
  * CALL (interpreted, allocating); in a pair-join verifying millions of
  * candidate pairs this merge is the difference between codegen throughput
  * and GC churn. Jaccard follows as inter / (|a| + |b| - inter).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<string> or two array<bigint>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    if (isLong) {
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val body = if (isLong)
        s"""
           |  long $c = $a.getLong($i) < $b.getLong($j) ? -1L
           |    : ($a.getLong($i) == $b.getLong($j) ? 0L : 1L);
           |  if ($c == 0L) { $n++; $i++; $j++; }
           |  else if ($c < 0L) { $i++; } else { $j++; }
         """.stripMargin
      else
        s"""
           |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($c == 0) { $n++; $i++; $j++; }
           |  else if ($c < 0) { $i++; } else { $j++; }
         """.stripMargin
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $na && $j < $nb) {
         |$body
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Sorted, deduplicated FNV-1a token-hash set of a text in one native pass
  * (tokenize + hash + sort + dedup; no token strings materialized):
  * string -> ascending array<bigint>. Pairs with the array<bigint> mode of
  * [[SortedIntersectCount]] for hash-based Jaccard: identical token sets
  * hash to identical arrays; cross-set collisions are ~2^-64 per pair.
  */
object TokenSetKernel {
  def sortedTokenHashSet(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val all = ShingleKernel.wordShingleHashes(s, 1).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val arr = all.toLongArray()
    java.util.Arrays.sort(arr)
    // in-place dedup
    var n = 0
    var i = 0
    while (i < arr.length) {
      if (n == 0 || arr(i) != arr(n - 1)) { arr(n) = arr(i); n += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(arr, n))
  }
}

case class SortedTokenHashSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_token_hash_set"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"sorted_token_hash_set expects string, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    TokenSetKernel.sortedTokenHashSet(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenSetKernel.sortedTokenHashSet($s);")
  override protected def withNewChildInternal(c: Expression): SortedTokenHashSet = copy(child = c)
}

/** Static kernel for [[WordShingleHashes]] — one pass over the UTF-8
  * bytes: whitespace-tokenize, FNV-1a-hash each token (ASCII case-folded),
  * then emit one polynomial-combined hash per w-gram window. No token or
  * shingle strings are ever materialized.
  */
object ShingleKernel {
  def wordShingleHashes(s: org.apache.spark.unsafe.types.UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    // pass 1: token hashes
    var tokens = new Array[Long](16)
    var nTok = 0
    var h = 0xcbf29ce484222325L // FNV offset basis
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val isWs = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isWs) {
        if (inTok) {
          if (nTok == tokens.length) {
            val grown = new Array[Long](tokens.length * 2)
            System.arraycopy(tokens, 0, grown, 0, nTok); tokens = grown
          }
          tokens(nTok) = h; nTok += 1
          h = 0xcbf29ce484222325L; inTok = false
        }
      } else {
        var b = bytes(i)
        if (b >= 'A' && b <= 'Z') b = (b | 0x20).toByte // ASCII case fold
        h = (h ^ (b & 0xffL)) * 0x100000001b3L // FNV prime
        inTok = true
      }
      i += 1
    }
    // pass 2: w-gram window hashes (polynomial combine)
    val nSh = math.max(0, nTok - w + 1)
    val out = new Array[Long](nSh)
    var j = 0
    while (j < nSh) {
      var sh = 1125899906842597L
      var k = 0
      while (k < w) { sh = sh * 0x9e3779b97f4a7c15L + tokens(j + k); k += 1 }
      sh ^= (sh >>> 32)
      out(j) = sh
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Word w-shingle hashes of a text in one pass (see [[ShingleKernel]]):
  * string -> array<bigint>, the input shape for [[MinHashSignature]]. The
  * HOF composition (split + slice + concat_ws per shingle) interprets a
  * lambda per element and materializes every shingle string; this is a
  * single tight loop, callable from whole-stage codegen.
  */
case class WordShingleHashes(child: Expression, width: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes expects string, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ShingleKernel.wordShingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleKernel.wordShingleHashes($s, $width);")

  override protected def withNewChildInternal(c: Expression): WordShingleHashes = copy(child = c)
}

/** MinHash signature: for an array<bigint> of element hashes, returns
  * array<bigint> of length `numHashes` where out[i] = min over elements of
  * h_i(x), with h_i(x) = mix(a_i * x + b_i) a universal-hash family whose
  * coefficients derive deterministically from `seed`.
  *
  * ONE pass over the input for all H hashes, fully codegen'd — versus the
  * naive H-fold `array_min(transform(...))` composition, which Spark
  * evaluates as H interpreted HOF chains (no CSE across them): at 100 TB
  * that is the difference between one scan and H scans of every token.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash expects array<bigint>, got ${dt.catalogString}")
  }

  // odd multipliers + offsets from a seeded SplittableRandom: a_i*x + b_i
  // followed by an avalanche mix (murmur3 finalizer) decorrelates the H
  // hash functions.
  @transient private lazy val (as, bs) = MinHashSignature.coefficients(numHashes, seed)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        var v = as(i) * x + bs(i)
        v ^= (v >>> 33); v *= 0xff51afd7ed558ccdL; v ^= (v >>> 33)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $arr.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $aRef[$i] * $x + $bRef[$i];
         |    $v ^= ($v >>> 33); $v *= 0xff51afd7ed558ccdL; $v ^= ($v >>> 33);
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

object MinHashSignature {
  private[graft] def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.SplittableRandom(seed)
    val as = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd multipliers
    val bs = Array.fill(numHashes)(rnd.nextLong())
    (as, bs)
  }
}

/** All `nbits` hyperplane sign bits of the [[graft.ops.Ann.lshPlanes]]
  * family in ONE array pass: vector -> 64-bit LSH bucket signature.
  * Replaces `nbits` separate v_dot kernels that each re-read the input
  * (at nbits=64 that is 64 passes over every vector). Per-plane dots
  * accumulate in ascending-dimension order — bit-identical to the v_dot
  * composition and to the DuckDB mirror's per-plane list_reduce.
  */
case class HyperplaneSignature(child: Expression, dim: Int, nbits: Int,
                               seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"
  override def checkInputDataTypes(): TypeCheckResult =
    checkVecs(Seq(child), "lsh_signature")

  // row-major [i * dim + j]: plane i, dimension j
  @transient private lazy val planes: Array[Double] =
    graft.ops.Ann.lshPlanes(dim, nbits, seed).flatten.toArray

  @transient private lazy val get = getter(child.dataType)

  protected override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val acc = new Array[Double](nbits)
    var j = 0
    while (j < n) {
      val x = get(a, j)
      var i = 0
      while (i < nbits) { acc(i) += x * planes(i * dim + j); i += 1 }
      j += 1
    }
    var bucket = 0L
    var i = 0
    while (i < nbits) { if (acc(i) >= 0) bucket |= (1L << i); i += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val x = ctx.freshName("x")
      val acc = ctx.freshName("acc"); val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double[] $acc = new double[$nbits];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $x = ${accessor(child.dataType, arr, j)};
         |  for (int $i = 0; $i < $nbits; $i++) {
         |    $acc[$i] += $x * $pRef[$i * $dim + $j];
         |  }
         |}
         |long $bucket = 0L;
         |for (int $i = 0; $i < $nbits; $i++) {
         |  if ($acc[$i] >= 0) $bucket |= (1L << $i);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignature =
    copy(child = c)
}

/** Deterministic 64-bit polynomial rolling hash (Rabin-Karp, base 31) over a
  * string's UTF-8 bytes -> bigint. Used for document fingerprinting.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"fingerprint64 expects string, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) { $h = 31L * $h + $bytes[$i]; }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(child = c)
}

/** Static kernel for [[QuantizeI8]] — one pass for abs-max + codes. */
object QuantKernel {
  def quantizeI8(arr: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var absMax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (v > absMax) absMax = v
      i += 1
    }
    // same arithmetic as the column form it replaced (and the DuckDB
    // oracle): scale = float32(absMax / 127.0); code = HALF_UP round of
    // x / (double) scale
    val scaleF = (absMax / 127.0).toFloat
    val codes = new Array[Byte](n)
    if (scaleF > 0f) {
      i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val v = x / scaleF.toDouble
        codes(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes), scaleF))
  }
}

/** Per-vector symmetric int8 quantization in one native pass:
  * array<float|double> -> struct<codes: array<tinyint>, scale: float>,
  * scale = max|x|/127, code_i = round(x_i/scale). The HOF composition
  * (array_max(transform(abs)) + transform(round)) interprets two lambda
  * chains per row — this is one tight loop inside whole-stage codegen.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", FloatType, nullable = false)))
  override def prettyName: String = "quantize_i8"
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(child), "quantize_i8")

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    QuantKernel.quantizeI8(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantKernel.quantizeI8($a, $isFloat);")

  override protected def withNewChildInternal(c: Expression): QuantizeI8 = copy(child = c)
}

/** Exact int8 dot product over the common prefix -> double (integer sum,
  * then one widening — bit-identical to casting both arrays to float and
  * running the double-summing [[DotProduct]], since every int8 product is
  * exactly representable).
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "v_dot_i8"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"v_dot_i8 expects array<tinyint>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0L
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    s.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = (double) $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductI8 =
    copy(left = l, right = r)
}

/** Static kernel for [[PackSignBits]] — one pass, no boxing. */
object SignBitsKernel {
  def pack(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v > 0) words(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(words)
  }
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var d = 0
    while (i < n) { d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    d
  }
}

/** Static kernel for [[SignProjection]] — one pass over the input,
  * per-output accumulation in ascending-dimension order.
  */
object SignProjectionKernel {
  def project(arr: ArrayData, isFloat: Boolean, signs: Array[Double],
              inDim: Int, outDim: Int, scale: Double): ArrayData = {
    val n = java.lang.Math.min(arr.numElements(), inDim)
    val acc = new Array[Double](outDim)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var j = 0
      while (j < outDim) { acc(j) += x * signs(j * inDim + i); j += 1 }
      i += 1
    }
    var j = 0
    while (j < outDim) { acc(j) = acc(j) * scale + 0.0; j += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(acc)
  }
}

/** Johnson–Lindenstrauss seeded ±1 sign projection as ONE fused kernel:
  * array<float|double>[inDim] -> array<double>[outDim], out_j =
  * (Σ_i v_i · s_ji) / √outDim + 0.0 with s_ji =
  * [[graft.ops.Quant.projectionSign]]. Replaces the O(inDim·outDim)
  * `element_at` EXPRESSION TREE form (1,024 nodes at 64→16; 262k at the
  * production 1024→256, where Catalyst analysis and Janino choke): the
  * sign matrix is a codegen reference object, the expression count is
  * independent of dims, and the per-output accumulation runs in the same
  * ascending-dimension order as the fold — bit-identical output (the
  * trailing + 0.0 flushes −0.0 exactly as the fold form did; pinned in
  * QuantSpec). Inputs shorter than `inDim` project their prefix (the
  * fold form nulled the row via element_at instead — fixed-dim corpora,
  * the only users, never hit either path).
  */
case class SignProjection(child: Expression, inDim: Int, outDim: Int,
                          seed: Long) extends UnaryExpression {
  require(inDim >= 1 && outDim >= 1, s"bad dims $inDim -> $outDim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_projection"
  override def checkInputDataTypes(): TypeCheckResult =
    checkVecs(Seq(child), "sign_projection")

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // row-major [j * inDim + i]: output j, input i (driver-side seeded)
  @transient private lazy val signs: Array[Double] = {
    val s = new Array[Double](outDim * inDim)
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < inDim) {
        s(j * inDim + i) = graft.ops.Quant.projectionSign(seed, j, i)
        i += 1
      }
      j += 1
    }
    s
  }

  private def scale: Double = 1.0 / math.sqrt(outDim.toDouble)

  protected override def nullSafeEval(input: Any): Any =
    SignProjectionKernel.project(input.asInstanceOf[ArrayData], isFloat,
      signs, inDim, outDim, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("projSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignProjectionKernel.project(" +
        s"$a, $isFloat, $sRef, $inDim, $outDim, $scale);")
  }

  override protected def withNewChildInternal(c: Expression): SignProjection =
    copy(child = c)
}

/** Binary quantization: array<float|double> -> array<bigint> of packed sign
  * bits (bit i of word i/64 set iff x_i > 0) — 32x smaller than float32.
  * The qdrant feature this re-expresses is binary quantization
  * (docs: qdrant.tech/documentation/guides/quantization, the 1-bit tier
  * below the scalar int8 tier of /root/reference's host engine); at 100 TB
  * the packed column is what the candidate stage scans.
  */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pack_sign_bits"
  override def checkInputDataTypes(): TypeCheckResult = checkVecs(Seq(child), "pack_sign_bits")

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    SignBitsKernel.pack(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignBitsKernel.pack($a, $isFloat);")

  override protected def withNewChildInternal(c: Expression): PackSignBits = copy(child = c)
}

/** popcount(xor) over the common prefix of two packed sign-bit arrays ->
  * int. With [[PackSignBits]] on both sides this equals the number of
  * dimensions whose signs disagree, so rank order matches the float-domain
  * sign-mismatch count exactly while scanning 1/32 of the bytes.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "v_hamming"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"v_hamming expects array<bigint>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    SignBitsKernel.hamming(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SignBitsKernel.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

/** Static kernel for [[TextStats]]: one pass over the UTF-8 bytes. */
object CharEntropyKernel {
  /** Character-level Shannon entropy (natural log) of a string, computed
    * per CODE POINT in one pass: collect code points, sort ascending
    * (Java int sort == UTF-8 binary order == the oracle's sorted-char
    * run order), fold -(sum over runs of (r/n) ln(r/n)) LEFT TO RIGHT —
    * the identical IEEE op sequence the DuckDB mirror's sorted
    * run-length reduce performs, so the result is bit-reproducible
    * cross-engine. Empty input returns 0.0 (callers NULL-guard).
    */
  def entropy(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val cps = s.toString.codePoints().toArray
    if (cps.length == 0) return 0.0
    java.util.Arrays.sort(cps)
    val n = cps.length.toDouble
    var acc = 0.0
    var run = 1L
    var i = 1
    while (i <= cps.length) {
      if (i < cps.length && cps(i) == cps(i - 1)) run += 1
      else {
        val p = run.toDouble / n
        acc += p * math.log(p)
        run = 1L
      }
      i += 1
    }
    -acc
  }
}

/** One-pass per-code-point Shannon entropy — the compressibility proxy of
  * the public quality-signal suites, as a native kernel: the HOF
  * formulation (per-char substr array + array_sort + fold) allocates a
  * string per character and measured ~30x slower at corpus doc sizes.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"char_entropy expects string, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharEntropyKernel.entropy(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharEntropyKernel.entropy($s);")

  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(child = c)
}

/** Unicode NFC normalization (canonical compose) — the first transform of
  * a text-cleaning pipeline: decomposed sequences (e + combining acute)
  * fold to their precomposed forms so downstream hashing/dedup treats
  * visually identical text identically. java.text.Normalizer under a
  * codegen call; DuckDB's nfc_normalize is the oracle twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($s);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

object NfcKernel {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized already (true for ~all real text) — skip
    // the rebuild and return the input buffer untouched
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def stripAccents(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    // ASCII fast path: nothing to decompose, return the input untouched
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

/** Accent stripping — the aggressive cousin of [[NfcNormalize]] for
  * match/dedup keys: canonical-decompose (NFD), then drop every
  * non-spacing combining mark, so café/café/cafe collide. ASCII input
  * takes a zero-copy fast path.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"strip_accents expects string, got ${dt.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    NfcKernel.stripAccents(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcKernel.stripAccents($s);")

  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}

object TextStatsKernel {
  /** Raw FNV-1a (ASCII case-folded) of a word — the token hash the kernel
    * matches profile words against.
    */
  def fnv(word: String): Long = {
    var h = 0xcbf29ce484222325L
    for (c <- word.getBytes("UTF-8")) {
      var b = c
      if (b >= 'A' && b <= 'Z') b = (b | 0x20).toByte
      h = (h ^ (b & 0xffL)) * 0x100000001b3L
    }
    h
  }

  def stats(s: org.apache.spark.unsafe.types.UTF8String,
            profiles: Array[Array[Long]]): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val nP = profiles.length
    val occ = new Array[Int](nP)
    val dist = new Array[Int](nP)
    val seen = new Array[Long](nP) // bitmask per profile (<= 64 words)
    var nTok = 0
    var nPunct = 0
    var h = 0xcbf29ce484222325L
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val isWs = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B
      }
      if (isWs) {
        if (inTok) {
          nTok += 1
          var p = 0
          while (p < nP) {
            val words = profiles(p)
            var w = 0
            while (w < words.length) {
              if (words(w) == h) {
                occ(p) += 1
                if ((seen(p) >>> w & 1L) == 0L) { seen(p) |= 1L << w; dist(p) += 1 }
                w = words.length
              } else w += 1
            }
            p += 1
          }
          h = 0xcbf29ce484222325L; inTok = false
        }
      } else {
        var b = bytes(i)
        // punct classification on the RAW byte ([^a-zA-Z0-9\s])
        val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')
        if (!alnum) nPunct += 1
        if (b >= 'A' && b <= 'Z') b = (b | 0x20).toByte
        h = (h ^ (b & 0xffL)) * 0x100000001b3L
        inTok = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, bytes.length, nPunct,
      UnsafeArrayData.fromPrimitiveArray(occ),
      UnsafeArrayData.fromPrimitiveArray(dist)))
  }
}

/** One-pass text statistics: token count (non-empty whitespace tokens),
  * char count, punctuation count ([^a-zA-Z0-9\s], ASCII corpus), and
  * per-profile stopword-style counts (occurrences + distinct words, token
  * matched case-folded). Replaces a stack of interpreted HOF chains
  * (split + filter(array_contains) per profile) with one tight loop.
  */
case class TextStats(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("occ", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("dist", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "text_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (profiles.forall(_.length <= 64)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("text_stats profiles are limited to 64 words each")
    case dt => TypeCheckResult.TypeCheckFailure(s"text_stats expects string, got ${dt.catalogString}")
  }

  @transient private lazy val hashed: Array[Array[Long]] =
    profiles.map(_.map(TextStatsKernel.fnv).toArray).toArray

  protected override def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], hashed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsProfiles", hashed, "long[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextStatsKernel.stats($s, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

object PosOrderedKernel {
  import org.apache.spark.unsafe.types.UTF8String

  /** Permutation of `arr`'s struct rows ascending by field 0 (the
    * position), encoded as (pos << 32 | index) longs so the sort is
    * primitive (no boxing). Positions must be non-negative ints — the
    * posexplode contract every caller satisfies; enforced loudly because
    * a silent mis-sort would corrupt the deterministic fold order.
    * Positions are UNIQUE within one group at every call site, so tie
    * order is never exercised.
    */
  private def sortedKeys(arr: ArrayData, posLong: Boolean): Array[Long] = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      val p = if (posLong) r.getLong(0) else r.getInt(0).toLong
      if (p < 0 || p > Int.MaxValue)
        throw new IllegalArgumentException(
          s"pos_ordered_* expects positions in [0, 2^31), got $p")
      keys(i) = (p << 32) | i
      i += 1
    }
    java.util.Arrays.sort(keys)
    keys
  }

  /** Left-assoc double sum of field 1 in position order, starting at 0.0
    * — the identical IEEE op sequence as array_sort(collect_list(struct
    * (pos, x))) then an interpreted `aggregate` left fold, in one
    * compiled pass (no HOF lambda eval per element, no SortArray
    * fallback).
    */
  def sumField(arr: ArrayData, posLong: Boolean): Double = {
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) { vals(i) = arr.getStruct(i, 2).getDouble(1); i += 1 }
    val keys = sortedKeys(arr, posLong)
    var acc = 0.0
    i = 0
    while (i < n) { acc += vals((keys(i) & 0xffffffffL).toInt); i += 1 }
    acc
  }

  /** Field-1 strings joined by `sep` in position order — the compiled
    * twin of concat_ws/array_join over transform(sort_array(collect_list
    * (struct(pos, s)))). Null strings are skipped, matching both
    * concat_ws and array_join.
    */
  def joinField(arr: ArrayData, sep: UTF8String, posLong: Boolean): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return UTF8String.fromString("")
    val strs = new Array[UTF8String](n)
    var i = 0
    while (i < n) { strs(i) = arr.getStruct(i, 2).getUTF8String(1); i += 1 }
    val keys = sortedKeys(arr, posLong)
    val parts = new Array[UTF8String](n)
    i = 0
    while (i < n) { parts(i) = strs((keys(i) & 0xffffffffL).toInt); i += 1 }
    UTF8String.concatWs(sep, parts: _*)
  }
}

/** Position-ordered sum over array<struct<pos int|long, x double>> — the
  * deterministic per-document LM fold (same IEEE order as the oracle's
  * list(x ORDER BY pos) left reduce) without the interpreted
  * array_sort-comparator + HOF-aggregate hot path.
  */
case class PosOrderedSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pos_ordered_sum"
  private def posType: Option[DataType] = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 &&
      (st.fields(0).dataType == IntegerType || st.fields(0).dataType == LongType) &&
      st.fields(1).dataType == DoubleType => Some(st.fields(0).dataType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (posType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_ordered_sum expects array<struct<int|long, double>>, got ${child.dataType.catalogString}")
  @transient private lazy val posLong = posType.contains(LongType)

  protected override def nullSafeEval(input: Any): Any =
    PosOrderedKernel.sumField(input.asInstanceOf[ArrayData], posLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PosOrderedKernel.sumField($a, $posLong);")

  override protected def withNewChildInternal(c: Expression): PosOrderedSum = copy(child = c)
}

/** Position-ordered string join over array<struct<pos int|long, s string>>
  * — the compiled document-reassembly tail shared by span stripping and
  * line dedup (sort_array + transform(getField) + concat_ws/array_join
  * all interpret per element; this is one kernel call per document).
  */
case class PosOrderedJoin(child: Expression, sep: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pos_ordered_join"
  private def posType: Option[DataType] = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 &&
      (st.fields(0).dataType == IntegerType || st.fields(0).dataType == LongType) &&
      st.fields(1).dataType == StringType => Some(st.fields(0).dataType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (posType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_ordered_join expects array<struct<int|long, string>>, got ${child.dataType.catalogString}")
  @transient private lazy val posLong = posType.contains(LongType)
  @transient private lazy val sepU8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(sep)

  protected override def nullSafeEval(input: Any): Any =
    PosOrderedKernel.joinField(input.asInstanceOf[ArrayData], sepU8, posLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posJoinSep", sepU8,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PosOrderedKernel.joinField($a, $ref, $posLong);")
  }

  override protected def withNewChildInternal(c: Expression): PosOrderedJoin = copy(child = c)
}

object SpanKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Gaps-and-islands merge of hit positions into maximal token spans —
    * the compiled twin of the two-window form (prevEnd = max(pos+w) over
    * preceding, new island when pos > prevEnd, min/max per island): sort
    * ascending, walk once, extend while pos <= curEnd. End exclusive.
    * Duplicate positions merge into their island exactly as the window
    * form's running max did. Pure integer arithmetic — value-identical.
    */
  def mergeIslands(arr: ArrayData, w: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val pos = new Array[Long](n)
    var i = 0
    while (i < n) { pos(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(pos)
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var start = pos(0)
    var end = pos(0) + w
    i = 1
    while (i < n) {
      if (pos(i) > end) {
        out += new GenericInternalRow(Array[Any](start, end))
        start = pos(i); end = pos(i) + w
      } else if (pos(i) + w > end) end = pos(i) + w
      i += 1
    }
    out += new GenericInternalRow(Array[Any](start, end))
    new GenericArrayData(out.toArray)
  }

  /** Lowercased whitespace tokens with empties dropped — the EXACT token
    * list of split(lower(text), "\\s+") with "" removed (leading
    * whitespace yields a leading "" in both Java and Spark split; inner
    * empties cannot occur; trailing empties are dropped here and removed
    * there).
    */
  def tokensOf(s: UTF8String): Array[String] =
    s.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)

  /** Rebuild a document with its span token-ranges REMOVED: tokenize as
    * tokensOf, drop tokens whose position falls in any [start, end) of
    * `spans`, join survivors with single spaces. Returns (n_kept,
    * kept_text) — the compiled, NO-SHUFFLE twin of the posexplode +
    * range-anti-join + collect_list reassembly (bit-identical text:
    * same tokens, same order, same separator).
    */
  def stripSpans(text: UTF8String, spans: ArrayData): InternalRow = {
    val toks = tokensOf(text)
    val m = if (spans == null) 0 else spans.numElements()
    val ss = new Array[Long](m)
    val es = new Array[Long](m)
    var j = 0
    while (j < m) {
      val r = spans.getStruct(j, 2)
      ss(j) = r.getLong(0); es(j) = r.getLong(1); j += 1
    }
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var i = 0
    while (i < toks.length) {
      var inSpan = false
      j = 0
      while (j < m && !inSpan) {
        if (i >= ss(j) && i < es(j)) inSpan = true
        j += 1
      }
      if (!inSpan) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(i))
        kept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](kept, UTF8String.fromString(sb.toString)))
  }

  /** Word w-shingle STRINGS of a text (w consecutive tokens joined by
    * one space), optionally DISTINCT (first-occurrence order) — the
    * compiled twin of transform(sequence(...), i => concat_ws(" ",
    * slice(toks, i, w))) [+ array_distinct]: same tokens, same join,
    * same empty-array result for docs shorter than w.
    */
  def wordShingles(s: UTF8String, w: Int, distinct: Boolean): ArrayData = {
    val toks = tokensOf(s)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[String](Math.min(n, 1024))
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Elementwise floorMod of a long array — the compiled twin of
    * transform(arr, h => pmod(h, m)) (pmod == floorMod for positive m).
    */
  def pmodArray(arr: ArrayData, m: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = java.lang.Math.floorMod(arr.getLong(i), m); i += 1 }
    new GenericArrayData(out)
  }

  /** Left-assoc double fold acc += weights(b) over bucket ids in array
    * order, starting 0.0 — the identical IEEE sequence as
    * aggregate(arr, 0.0, (acc, b) => acc + element_at(wlit, b+1)), with
    * the out-of-range case a loud error instead of a silent null.
    */
  def weightedBucketSum(arr: ArrayData, weights: Array[Double]): Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val b = arr.getLong(i)
      if (b < 0 || b >= weights.length)
        throw new IllegalArgumentException(
          s"bucket $b outside the [0, ${weights.length}) model range")
      acc += weights(b.toInt)
      i += 1
    }
    acc
  }

  /** Sliding token-window chunks — the compiled twin of the
    * transform(sequence)/slice/array_join HOF chunker: case-PRESERVING
    * whitespace tokens (split(text, "\\s+") with "" removed), one
    * struct(chunk_idx, chunk, n_tokens) per window of `w` tokens every
    * `s` tokens, last chunk to the doc end, short docs one chunk, empty
    * docs none. Same single-space rejoin, same int fields.
    */
  def chunkWindows(text: UTF8String, w: Int, s: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val nc = if (n <= w) 1 else (n - w + s - 1) / s + 1
    val out = new Array[Any](nc)
    var i = 0
    while (i < nc) {
      val start = i * s
      val end = Math.min(start + w, n)
      val sb = new java.lang.StringBuilder(toks(start))
      var j = start + 1
      while (j < end) { sb.append(' ').append(toks(j)); j += 1 }
      out(i) = new GenericInternalRow(
        Array[Any](i, UTF8String.fromString(sb.toString), end - start))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Sliding token-window chunking in one compiled pass per document. */
case class ChunkWindows(child: Expression, w: Int, s: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chunk_windows"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"chunk_windows expects string, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    SpanKernel.chunkWindows(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, s)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanKernel.chunkWindows($a, $w, $s);")
  override protected def withNewChildInternal(c: Expression): ChunkWindows =
    copy(child = c)
}

/** Gaps-and-islands span merge over collected hit positions. */
case class MergeIslands(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span_start", LongType, nullable = false),
    StructField("span_end", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "merge_islands"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"merge_islands expects array<bigint>, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    SpanKernel.mergeIslands(input.asInstanceOf[ArrayData], w.toLong)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanKernel.mergeIslands($a, ${w}L);")
  override protected def withNewChildInternal(c: Expression): MergeIslands = copy(child = c)
}

/** Map-side span stripping: (text, spans) -> (n_kept, kept_text).
  * Null-safe on BOTH children — callers coalesce a left-joined spans
  * column to an empty array literal.
  */
case class StripSpans(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kept", StringType, nullable = false)))
  override def prettyName: String = "strip_spans"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(st: StructType, _))
      if st.fields.length == 2 && st.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"strip_spans expects (string, array<struct<bigint,bigint>>), got (${l.catalogString}, ${r.catalogString})")
  }
  protected override def nullSafeEval(t: Any, sp: Any): Any =
    SpanKernel.stripSpans(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      sp.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, sp) =>
      s"${ev.value} = graft.functions.SpanKernel.stripSpans($t, $sp);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StripSpans =
    copy(left = l, right = r)
}

/** Word w-shingle strings in one compiled pass (optionally per-doc
  * distinct) — kills the interpreted transform/slice/concat_ws lambda
  * chain AND (distinct form) the per-doc array_distinct.
  */
case class WordShingles(child: Expression, width: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (width >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"word_shingles width must be >= 1, got $width")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    SpanKernel.wordShingles(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SpanKernel.wordShingles($s, $width, $distinct);")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Elementwise pmod of a bigint array by a positive constant modulus. */
case class PmodArray(child: Expression, m: Long) extends UnaryExpression {
  require(m > 0, s"pmod_array modulus must be positive, got $m")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pmod_array"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pmod_array expects array<bigint>, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    SpanKernel.pmodArray(input.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanKernel.pmodArray($a, ${m}L);")
  override protected def withNewChildInternal(c: Expression): PmodArray = copy(child = c)
}

/** Position-order weighted fold over bucket ids against a constant
  * weight table (the DSIR scoring fold, compiled).
  */
case class WeightedBucketSum(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_bucket_sum"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"weighted_bucket_sum expects array<bigint>, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    SpanKernel.weightedBucketSum(input.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanKernel.weightedBucketSum($a, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): WeightedBucketSum = copy(child = c)
}

object ClassifyKernel {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Elementwise class-weight sum in position order — the compiled twin
    * of aggregate(array_sort(collect_list(struct(pos, ws))), zeros,
    * zip_with(acc, x.ws, _ + _)): same left-assoc IEEE adds per class,
    * positions unique per doc. Input array is non-empty (a groupBy
    * group always has rows); all ws arrays share one length.
    */
  def posOrderedVecSum(arr: ArrayData, posLong: Boolean): ArrayData = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      val p = if (posLong) r.getLong(0) else r.getInt(0).toLong
      if (p < 0 || p > Int.MaxValue)
        throw new IllegalArgumentException(
          s"pos_ordered_vec_sum expects positions in [0, 2^31), got $p")
      keys(i) = (p << 32) | i
      i += 1
    }
    java.util.Arrays.sort(keys)
    val first = arr.getStruct((keys(0) & 0xffffffffL).toInt, 2).getArray(1)
    val k = first.numElements()
    val sums = new Array[Double](k)
    i = 0
    while (i < n) {
      val ws = arr.getStruct((keys(i) & 0xffffffffL).toInt, 2).getArray(1)
      var j = 0
      while (j < k) { sums(j) += ws.getDouble(j); j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sums)
  }

  /** Map-side NB scoring fold: per bucket id in array order, skip
    * buckets the model never saw (null weight row), elementwise-add the
    * rest — the identical IEEE sequence as the filter-then-aggregate
    * zip_with form. Returns (n_matched, sums).
    */
  def bucketVecSum(arr: ArrayData, w: Array[Array[Double]],
                   nClasses: Int): GenericInternalRow = {
    val n = arr.numElements()
    val sums = new Array[Double](nClasses)
    var matched = 0L
    var i = 0
    while (i < n) {
      val b = arr.getLong(i)
      if (b < 0 || b >= w.length)
        throw new IllegalArgumentException(
          s"bucket $b outside the [0, ${w.length}) model range")
      val ws = w(b.toInt)
      if (ws != null) {
        var j = 0
        while (j < nClasses) { sums(j) += ws(j); j += 1 }
        matched += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](matched,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(sums)))
  }
}

/** Position-ordered elementwise vector sum over
  * array<struct<pos int|long, ws array<double>>> (the NB classify fold).
  */
case class PosOrderedVecSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pos_ordered_vec_sum"
  private def posType: Option[DataType] = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 &&
      (st.fields(0).dataType == IntegerType || st.fields(0).dataType == LongType) &&
      (st.fields(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) => Some(st.fields(0).dataType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (posType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_ordered_vec_sum expects array<struct<int|long, array<double>>>, got ${child.dataType.catalogString}")
  @transient private lazy val posLong = posType.contains(LongType)
  protected override def nullSafeEval(input: Any): Any =
    ClassifyKernel.posOrderedVecSum(input.asInstanceOf[ArrayData], posLong)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ClassifyKernel.posOrderedVecSum($a, $posLong);")
  override protected def withNewChildInternal(c: Expression): PosOrderedVecSum = copy(child = c)
}

/** Map-side bucket->class-weight fold against a constant dense weight
  * table: array<long> -> struct(n_matched, sums array<double>).
  */
case class BucketVecSum(child: Expression, weights: Array[Array[Double]],
                        nClasses: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_matched", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "bucket_vec_sum"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bucket_vec_sum expects array<bigint>, got ${dt.catalogString}")
  }
  protected override def nullSafeEval(input: Any): Any =
    ClassifyKernel.bucketVecSum(input.asInstanceOf[ArrayData], weights, nClasses)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbWeights", weights, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ClassifyKernel.bucketVecSum($a, $ref, $nClasses);")
  }
  override protected def withNewChildInternal(c: Expression): BucketVecSum = copy(child = c)
}

/** LSH bucket candidate-pair GENERATOR: one call per (band, bandkey)
  * bucket row emits the (a_id, b_id) pairs whose FIRST colliding band is
  * this bucket's band. Input: the bucket's id-sorted
  * array<struct<id, pref array<bigint>>> where `pref` is each row's
  * band-key prefix BEFORE this band (slice(keys, 1, band) — empty in
  * band 0); a pair is emitted iff no prefix position matches, i.e. the
  * two rows were NOT co-bucketed in any earlier band. Replaces the
  * interpreted nested-transform pair expansion (flatten + explode + the
  * statically unrolled earlier-band filter): per-pair structs carrying
  * both key arrays never materialize, the prefix compare runs compiled,
  * and pairs stream straight out of the generator. Ids emit in bucket
  * order (i < j over the sorted array), so a_id < b_id exactly as
  * before; the emitted pair set is identical (first-band emission is
  * a set property, not an order property).
  */
case class FirstBandPairs(child: Expression)
    extends UnaryExpression with Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "first_band_pairs"

  private def idTypeOpt: Option[(DataType, Boolean)] = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 =>
      st.fields(1).dataType match {
        case ArrayType(LongType, _) => Some((st.fields(0).dataType, st.fields(0).nullable))
        case _ => None
      }
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (idTypeOpt.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "first_band_pairs expects array<struct<id, array<bigint>>>, got " +
        child.dataType.catalogString)

  override def elementSchema: StructType = {
    val (idt, nullable) = idTypeOpt.get
    StructType(Seq(
      StructField("a_id", idt, nullable),
      StructField("b_id", idt, nullable)))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val data = child.eval(input).asInstanceOf[ArrayData]
    if (data == null || data.numElements() < 2) return Iterator.empty
    val n = data.numElements()
    val idt = idTypeOpt.get._1
    // copy ids and prefixes out: the iterator outlives this eval's
    // input-row buffer
    val ids = new Array[Any](n)
    val prefs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val s = data.getStruct(i, 2)
      ids(i) = org.apache.spark.sql.catalyst.InternalRow.copyValue(s.get(0, idt))
      val p = s.getArray(1)
      prefs(i) = if (p == null) Array.emptyLongArray else p.toLongArray()
      i += 1
    }
    new scala.collection.AbstractIterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var a = 0
      private var b = 1
      private var pending: org.apache.spark.sql.catalyst.InternalRow = null
      private def fetch(): Unit = {
        while (pending == null && a < n - 1) {
          if (b >= n) { a += 1; b = a + 1 }
          else {
            val pa = prefs(a); val pb = prefs(b)
            val m = if (pa.length < pb.length) pa.length else pb.length
            var u = 0
            var collide = false
            while (u < m && !collide) {
              if (pa(u) == pb(u)) collide = true
              u += 1
            }
            if (!collide)
              pending = new GenericInternalRow(Array[Any](ids(a), ids(b)))
            b += 1
          }
        }
      }
      override def hasNext: Boolean = { fetch(); pending != null }
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        fetch()
        if (pending == null) throw new NoSuchElementException("empty pair iterator")
        val r = pending; pending = null; r
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): FirstBandPairs =
    copy(child = c)
}
