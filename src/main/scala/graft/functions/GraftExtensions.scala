package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers graft's native expressions so SQL
  * users get them too (`SELECT graft_cosine(a, b)`). Activated via
  * spark.sql.extensions=graft.functions.GraftExtensions (Tables.sessionConfs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
  }
}

object GraftColumns {
  /** Column-API entry point for the native cosine expression (resolved via
    * the GraftExtensions-registered function).
    */
  def graftCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
}
