package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum polynomial
  * hash over all `Window`-char substrings, computed in one O(n) pass
  * inside whole-stage codegen.
  *
  * h(i) = sum_{j<W} code(c_{i+j}) * B^(W-1-j)  mod M, with B=131,
  * M=1e9+7 (terms stay well under 2^63 — exact integer arithmetic, so the
  * value equals the direct windowed sum the DuckDB oracle computes).
  * Returns null for strings shorter than the window.
  */
case class RollingHashMin(child: Expression) extends UnaryExpression {
  import RollingHashMin._

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_min"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < W) null
    else {
      var h = 0L
      var i = 0
      while (i < W) { h = (h * B + s.charAt(i)) % M; i += 1 }
      var min = h
      while (i < s.length) {
        h = ((h - s.charAt(i - W) * BW % M + M * 256) % M * B + s.charAt(i)) % M
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val str = ctx.freshName("str")
    val h = ctx.freshName("h")
    val min = ctx.freshName("min")
    val i = ctx.freshName("i")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = -1L;
         |if (!${childGen.isNull}) {
         |  String $str = ${childGen.value}.toString();
         |  if ($str.length() >= $W) {
         |    long $h = 0L;
         |    int $i = 0;
         |    for (; $i < $W; $i++) { $h = ($h * ${B}L + $str.charAt($i)) % ${M}L; }
         |    long $min = $h;
         |    for (; $i < $str.length(); $i++) {
         |      $h = (($h - $str.charAt($i - $W) * ${BW}L % ${M}L + ${M}L * 256L) % ${M}L * ${B}L + $str.charAt($i)) % ${M}L;
         |      if ($h < $min) $min = $h;
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = $min;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashMin {
  val W = 16
  val B = 131L
  val M = 1000000007L
  /** B^(W-1) mod M, for removing the outgoing character. */
  val BW: Long = {
    var p = 1L
    (1 until W).foreach(_ => p = p * B % M)
    p
  }
  /** B^(W-1-j) mod M for j in 0..W-1 — the direct-sum weights the SQL
    * oracle uses; the rolling recurrence produces identical values.
    */
  def weights: Seq[Long] = {
    val w = Array.fill(W)(1L)
    ((W - 2) to 0 by -1).foreach(j => w(j) = w(j + 1) * B % M)
    w.toSeq
  }
}
