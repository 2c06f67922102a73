package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd random-hyperplane band signatures over an Array[Float]
  * embedding: for each band b, bit r of sigs[b] is set iff the dot product
  * against hyperplane (b·rows + r) is positive.
  *
  * This is the scan-side kernel of every LSH operator (ANN buckets, the
  * τ=0.4 banded dedup, the production-constant dedup): bands·rows·dim
  * multiply-adds per row. The higher-order-function formulation evaluates
  * interpreted, per-element, with boxed lambdas — at 100 TB that is the
  * whole scan cost. This expression runs the triple loop inside
  * WholeStageCodegen against a constant coefficient matrix carried as a
  * reference object (one array, not thousands of literal expression nodes).
  *
  * Accumulation is index-ordered doubles — bit-identical to the
  * `aggregate(sequence(...))` form and the DuckDB oracle's
  * `list_sum(list_transform(...))`, so swapping it into an oracle-checked
  * query changes nothing observable.
  */
case class HyperplaneSigs(child: Expression, coefs: Seq[Seq[Double]], rows: Int)
    extends UnaryExpression {

  // Fail at construction, not with garbage signatures: trailing hyperplanes
  // would be silently dropped by the bands = coefs.length / rows integer
  // division, and a rows > 64 signature cannot fit the Long sig word
  // (1L << r wraps past 63).
  require(rows > 0 && rows <= 64,
    s"$prettyName: rows must be in [1, 64], got $rows")
  require(coefs.nonEmpty && coefs.length % rows == 0,
    s"$prettyName: ${coefs.length} hyperplanes do not divide into bands of $rows rows")

  // Seq field => structural case-class equality, so two separately built
  // but identical kernels canonicalize/semanticEqual and Catalyst can
  // reuse subexpressions and exchanges; the primitive matrix below is what
  // eval/codegen actually index.
  private lazy val coefArr: Array[Array[Double]] = coefs.map(_.toArray).toArray

  private val bands = coefs.length / rows

  // Reject non-float-array inputs at analysis: reading a double array
  // through getFloat would silently produce garbage signatures.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rows) {
        val c = coefArr(b * rows + r)
        val n = math.min(e.numElements(), c.length)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += e.getFloat(d).toDouble * c(d); d += 1 }
        if (dot > 0) sig |= 1L << r
        r += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cf = ctx.addReferenceObj("hyperplaneCoefs", coefArr, "double[][]")
      val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sigs = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    double[] $c = $cf[$b * $rows + $r];
         |    int $n = java.lang.Math.min($a.numElements(), $c.length);
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double) $a.getFloat($d) * $c[$d];
         |    }
         |    if ($dot > 0) $sig |= 1L << $r;
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
