package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{CosineSimilarity, DotProduct, PorterStem}

/** Engine extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`):
  *  - the [[RegexAlternationToContains]] optimizer rule;
  *  - SQL bindings for the native expressions (`dot_product`,
  *    `cosine_similarity`, `porter_stem`) so `spark.sql(...)` users get
  *    them too.
  */
object GraftExtensions {
  /** Runtime registration of the same SQL functions on an existing
    * session (extensions configs only apply at session construction). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "dot_product",
      args => DotProduct(args(0), args(1)))
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "cosine_similarity",
      args => CosineSimilarity(args(0), args(1)))
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "porter_stem",
      args => PorterStem(args.head))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RegexAlternationToContains)
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - strict left-to-right dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - single-pass cosine similarity of two array<double>"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("porter_stem"),
      info("porter_stem", "porter_stem(word) - Porter-stemmed form of word"),
      (args: Seq[Expression]) => PorterStem(args.head)))
  }
}
