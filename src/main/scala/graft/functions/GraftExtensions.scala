package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_min"),
      new ExpressionInfo(classOf[RollingHashMin].getName, "graft_rolling_min"),
      (children: Seq[Expression]) => RollingHashMin(children.head)))
    // Hyperplane band signatures: the coefficient matrix and band width
    // arrive as foldable literals and are extracted ONCE at plan build —
    // the expression carries them as a reference object, not as thousands
    // of literal children.
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "graft_hyperplane_sigs"),
      (children: Seq[Expression]) => {
        require(children.size == 3 && children(1).foldable && children(2).foldable,
          "graft_hyperplane_sigs(embedding, coefs, rows): coefs and rows must be literals")
        val arr = children(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val coefs = (0 until arr.numElements())
          .map(i => arr.getArray(i).toDoubleArray().toSeq)
        val rows = children(2).eval().asInstanceOf[Int]
        HyperplaneSigs(children(0), coefs, rows)
      }))
    // Bloom-filter build/probe for join pre-filtering (Scale.bloomPruned):
    // the same Catalyst pair Spark's own InjectRuntimeFilter plans, exposed
    // as session functions so load paths can place the filter explicitly.
    // Callers pass xxhash64(key) on both sides.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(children.head)
          .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(children(0), children(1))))
    ext.injectOptimizerRule(CosineSelfFold)
  }
}

/** Optimizer rule: cosine of a deterministic expression with itself is 1.0
  * by algebraic identity — fold it away before execution (the runtime loop
  * would return 1.0 only up to floating-point rounding; the identity is the
  * semantically intended value). Demonstrates the injectOptimizerRule
  * extension point alongside the function registration.
  */
case class CosineSelfFold(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Null-preserving: folding a nullable input straight to 1.0 would turn
    // NULL rows into 1.0 — keep the null check, fold only the cosine loop.
    case CosineSimilarity(l, r) if l.deterministic && l.semanticEquals(r) =>
      if (!l.nullable) Literal(1.0)
      else org.apache.spark.sql.catalyst.expressions.If(
        org.apache.spark.sql.catalyst.expressions.IsNull(l),
        Literal(null, org.apache.spark.sql.types.DoubleType), Literal(1.0))
  }
}

object GraftColumns {
  /** Column-API entry point for the native cosine expression (resolved via
    * the GraftExtensions-registered function).
    */
  def graftCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)

  /** Rabin-Karp rolling min-hash fingerprint (native expression). */
  def graftRollingMin(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_rolling_min", c)

  /** Native hyperplane band signatures: sigs[b] has bit r set iff the dot
    * against hyperplane (b*rows + r) in `coefs` is positive.
    */
  def graftHyperplaneSigs(e: Column, coefs: Seq[Seq[Double]], rows: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_hyperplane_sigs", e,
      org.apache.spark.sql.functions.typedlit(coefs),
      org.apache.spark.sql.functions.lit(rows))
}
