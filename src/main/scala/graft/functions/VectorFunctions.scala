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

object VectorFunctions {
  /** Column API: cosine similarity of two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: sign-pattern LSH bucket id against fixed planes. */
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneBucket(GraftBridge.expression(v), planes))
}
