package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, HyperplaneBucket, Md5Long, PqCodes, PqLut}
import graft.operators.Similarity

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("... cosine_sim(a,b)")`
  * works on any session built with
  * `.withExtensions(new GraftExtensions)` — or via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftExtensions {
  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      require(children.length == n,
        s"$name expects $n argument(s), got ${children.length}")
      b(children)
    }

  val cosineBuilder: Seq[Expression] => Expression =
    arity("cosine_sim", 2)(c => CosineSimilarity(c.head, c(1)))

  val bucketBuilder: Seq[Expression] => Expression =
    arity("lsh_bucket", 1)(c => HyperplaneBucket(c.head, Similarity.hyperplanes))

  val md5LongBuilder: Seq[Expression] => Expression =
    arity("md5_long60", 1)(c => Md5Long(c.head))

  val pqCodesBuilder: Seq[Expression] => Expression =
    arity("pq_codes", 1)(c => PqCodes(c.head, Similarity.pqCodebook))

  val pqLutBuilder: Seq[Expression] => Expression =
    arity("pq_lut", 1)(c => PqLut(c.head, Similarity.pqCodebook))

  /** Register the same functions on an already-built session (temp
    * functions — handy in notebooks/tests where the builder is gone). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", bucketBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long60", md5LongBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_codes", pqCodesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_lut", pqLutBuilder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      GraftExtensions.cosineBuilder))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "lsh_bucket"),
      GraftExtensions.bucketBuilder))
    ext.injectFunction((
      new FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long60"),
      GraftExtensions.md5LongBuilder))
    ext.injectFunction((
      new FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
      GraftExtensions.pqCodesBuilder))
    ext.injectFunction((
      new FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
      GraftExtensions.pqLutBuilder))
  }
}
