package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit md5 hash as a native Catalyst
  * expression: the top 60 bits of md5(utf8(s)) as a nonnegative long —
  * bit-identical to `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)`
  * (the first 15 hex chars ARE the first 60 bits big-endian) and to
  * the DuckDB oracle's `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`,
  * but computed straight from the digest bytes: no 32-char hex string,
  * no substring copy, no base-16 string parse per row. One reused
  * MessageDigest per operator instance inside whole-stage codegen.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "md5_long60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  // ThreadLocal, not a shared lazy val: one expression instance can be
  // evaluated from several threads (driver-side local-relation eval,
  // subexpression reuse), and MessageDigest is stateful
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 digest bytes big-endian, low nibble (16th hex char)
    * dropped ⇒ the 15-hex-char value, always in [0, 2⁶⁰). */
  private def fold(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  override protected def nullSafeEval(input: Any): Any = {
    val md = digest.get()
    md.reset()
    fold(md.digest(input.asInstanceOf[UTF8String].getBytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5long",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($s.getBytes());
         |long $v = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  $v = ($v << 8) | ($d[$i] & 0xffL);
         |}
         |${ev.value} = $v >>> 4;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
