package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

private[functions] object VectorTypeCheck {
  /** Inputs must be array<float>: ArrayData.getFloat on any other
    * backing silently reads garbage, so reject at analysis time. */
  def check(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> arguments, got ${types.mkString(", ")}")
}

/** Native Catalyst expression for cosine similarity over
  * `array<float>` embedding columns — stays inside whole-stage codegen
  * (no UDF/serialization boundary), accumulates in double left-to-right
  * so results are deterministic and match a sequential oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // null ELEMENTS also produce null, even when the array columns
  // themselves are non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(left.dataType, right.dataType))

  /** Zero-norm inputs yield -1.0 (DuckDB list_cosine_similarity's
    * convention, kept for oracle parity); a null ELEMENT yields a null
    * result (DuckDB raises there — we degrade gracefully instead of
    * reading garbage through getFloat). */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) -1.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? -1.0
         |    : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-pattern LSH bucket of an array<float> vector against a fixed
  * set of hyperplanes: bit b of the result is sign(v·plane_b). One pass
  * over the vector for all planes, fully codegen'd — replaces 2·P
  * interpreted higher-order-function lambdas per row.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))

  @transient private lazy val nPlanes = planes.length

  // null elements ⇒ null bucket (mirrors CosineSimilarity)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var bucket = 0L
    var b = 0
    while (b < nPlanes) {
      val plane = planes(b)
      val dim = math.min(n, plane.length)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += v.getFloat(j).toDouble * plane(j); j += 1 }
      if (dot > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val dot = ctx.freshName("dot")
      val dim = ctx.freshName("dim")
      val plane = ctx.freshName("plane")
      s"""
         |${ev.value} = 0L;
         |for (int $k = 0; $k < $v.numElements(); $k++) {
         |  if ($v.isNullAt($k)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  for (int $b = 0; $b < ${planes.length}; $b++) {
         |    double[] $plane = $planesRef[$b];
         |    int $dim = java.lang.Math.min($v.numElements(), $plane.length);
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += (double) $v.getFloat($i) * $plane[$i];
         |    }
         |    if ($dot > 0) ${ev.value} |= (1L << $b);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: for each of the codebook's M
  * subspaces, the index of the nearest centroid (squared distance
  * rounded to integer e9 BEFORE the argmin, ties to the smaller code —
  * the rounding makes every downstream comparison integer arithmetic,
  * bit-identical in the SQL oracle) plus the summed quantization error.
  * Returns array<long> of length M+1: [c0..c(M-1), err_e9]. A null or
  * NaN element yields a null result (Math.round(NaN)=0 would otherwise
  * silently encode a NaN vector as a perfect-distance code 0).
  *
  * One codegen'd loop nest over a referenced double[][][] — the
  * unrolled Column-tree form of the same computation generated ~1 MB of
  * Janino source and paid ~3s of compilation on EVERY fresh plan
  * (expression ids differ per plan, so the codegen cache can't hit).
  */
case class PqCodes(child: Expression, codebook: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))

  @transient private lazy val m = codebook.length
  @transient private lazy val k = codebook(0).length
  @transient private lazy val s = codebook(0)(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * s) return null
    var i = 0
    while (i < m * s) {
      if (v.isNullAt(i) || java.lang.Float.isNaN(v.getFloat(i))) return null
      i += 1
    }
    val res = new Array[Long](m + 1)
    var err = 0L
    var mi = 0
    while (mi < m) {
      var best = Long.MaxValue
      var bk = 0L
      var ki = 0
      while (ki < k) {
        val c = codebook(mi)(ki)
        var acc = 0.0
        var d = 0
        while (d < s) {
          val x = v.getFloat(mi * s + d).toDouble - c(d)
          acc += x * x
          d += 1
        }
        val d9 = math.round(acc * 1e9)
        if (d9 < best) { best = d9; bk = ki.toLong }
        ki += 1
      }
      res(mi) = bk
      err += best
      mi += 1
    }
    res(m) = err
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("res")
      val err = ctx.freshName("err")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val d9 = ctx.freshName("d9")
      val best = ctx.freshName("best")
      val bk = ctx.freshName("bk")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() < ${m * s}) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < ${m * s}; $i++) {
         |  if ($v.isNullAt($i) || java.lang.Float.isNaN($v.getFloat($i))) {
         |    ${ev.isNull} = true;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $res = new long[${m + 1}];
         |  long $err = 0L;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    long $best = Long.MAX_VALUE; long $bk = 0L;
         |    for (int $ki = 0; $ki < $k; $ki++) {
         |      double[] $c = $cb[$mi][$ki];
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $s; $d++) {
         |        double $x = (double) $v.getFloat($mi * $s + $d) - $c[$d];
         |        $acc += $x * $x;
         |      }
         |      long $d9 = java.lang.Math.round($acc * 1.0E9);
         |      if ($d9 < $best) { $best = $d9; $bk = (long) $ki; }
         |    }
         |    $res[$mi] = $bk;
         |    $err += $best;
         |  }
         |  $res[$m] = $err;
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC lookup table for one query vector: squared e9-rounded
  * distance from each subvector to EVERY codebook entry, flattened as
  * array<long> of length M·K (entry m·K + k) — the per-query table a
  * PQ scan sums candidate codes against. Same arithmetic as
  * [[PqCodes]], same rounding contract. */
case class PqLut(child: Expression, codebook: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.check(prettyName, Seq(child.dataType))

  @transient private lazy val m = codebook.length
  @transient private lazy val k = codebook(0).length
  @transient private lazy val s = codebook(0)(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * s) return null
    var i = 0
    while (i < m * s) {
      if (v.isNullAt(i) || java.lang.Float.isNaN(v.getFloat(i))) return null
      i += 1
    }
    val res = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        val c = codebook(mi)(ki)
        var acc = 0.0
        var d = 0
        while (d < s) {
          val x = v.getFloat(mi * s + d).toDouble - c(d)
          acc += x * x
          d += 1
        }
        res(mi * k + ki) = math.round(acc * 1e9)
        ki += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("res")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() < ${m * s}) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < ${m * s}; $i++) {
         |  if ($v.isNullAt($i) || java.lang.Float.isNaN($v.getFloat($i))) {
         |    ${ev.isNull} = true;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $res = new long[${m * k}];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    for (int $ki = 0; $ki < $k; $ki++) {
         |      double[] $c = $cb[$mi][$ki];
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $s; $d++) {
         |        double $x = (double) $v.getFloat($mi * $s + $d) - $c[$d];
         |        $acc += $x * $x;
         |      }
         |      $res[$mi * $k + $ki] = java.lang.Math.round($acc * 1.0E9);
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer squared-L2 distance over two `array<bigint>` columns
  * (e6-quantized coordinates) — the inner loop of the all-integer
  * k-means path. A zip_with/aggregate lambda pair computes the same
  * value interpreted, per row per centroid; this stays inside
  * whole-stage codegen. Null elements yield null (mirroring
  * CosineSimilarity); length mismatch uses the common prefix. */
case class IntL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "int_l2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left.dataType, right.dataType).forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, " +
        s"got ${left.dataType}, ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API: PQ codes + error, array<long> [c0..c(M-1), err_e9]. */
  def pqCodes(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqCodes(GraftBridge.expression(v), codebook))

  /** Column API: PQ ADC lookup table, array<long> of M·K e9 distances. */
  def pqLut(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(v), codebook))

  /** Column API: exact integer squared-L2 of two array<bigint> columns. */
  def intL2(a: Column, b: Column): Column =
    GraftBridge.column(IntL2(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: cosine similarity of two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: sign-pattern LSH bucket id against fixed planes. */
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneBucket(GraftBridge.expression(v), planes))
}
