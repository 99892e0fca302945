package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word K-grams ("shingles") of a token array, in position order: element
  * `i` (0-based) is `concat_ws(' ', toks[i … i+k-1])`; empty array below
  * k tokens.
  *
  * Native-expression replacement for the HOF formulation
  * `transform(sequence(1, n-k+1), i -> concat_ws(' ', toks[i-1], …))`
  * (TextFns.shingles3FromToks) — the FIRST stage of the entire dedup
  * family (ngram-Jaccard, MinHash/LSH, SimHash, the incremental index),
  * and at scale its hottest: HOF lambdas evaluate INTERPRETED per
  * element, so every shingle paid an expression-tree walk, boxed index,
  * and ConcatWs vararg machinery per gram — the sf100 probe caught this
  * stage flat at 32 threads of interpreter overhead (the GramDigests /
  * PolyHash precedent, BASELINE.md's measured 15× anti-pattern class).
  * Here each row is one tight loop: token bytes hoisted once, each gram
  * one exact-size byte copy into a reused growable buffer, no Catalyst
  * evaluation inside the loop.
  *
  * Byte-identical to `concat_ws(' ', …)`: null tokens are SKIPPED (token
  * and separator both — `split()` never yields nulls, but the contract
  * must hold for any array<string> input). Oracle mirror unchanged:
  * `array_to_string(t[i:i+k-1], ' ')` in DuckDB.
  */
case class ShingleJoin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  // analysis-time type check (the GramDigests note: AbstractDataType is
  // private[sql], so checkInputDataTypes directly)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_join requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleJoin.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleJoin.shingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleJoin {
  /** Column-API entry point: `ShingleJoin($"toks", 3)`. */
  def apply(c: Column, k: Int): Column =
    ColumnShim.column(ShingleJoin(ColumnShim.expression(c), k))

  /** The whole-row kernel, shared by eval and generated code. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // hoist each token's bytes once; a token is re-read by up to k grams
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      bytes(i) = if (t == null) null else t.getBytes
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      // exact gram length first (null tokens contribute nothing, not
      // even a separator — the concat_ws byte stream), then one fresh
      // exact-size array per gram: UTF8String.fromBytes WRAPS its input
      // without copying, so a reused buffer would corrupt earlier grams
      var len = 0
      var cnt = 0
      var j = 0
      while (j < k) {
        val b = bytes(p + j)
        if (b != null) { len += b.length; cnt += 1 }
        j += 1
      }
      if (cnt > 1) len += cnt - 1
      val g = new Array[Byte](len)
      var off = 0
      var emitted = false
      j = 0
      while (j < k) {
        val b = bytes(p + j)
        if (b != null) {
          if (emitted) { g(off) = ' '; off += 1 }
          System.arraycopy(b, 0, g, off, b.length)
          off += b.length
          emitted = true
        }
        j += 1
      }
      out(p) = UTF8String.fromBytes(g)
      p += 1
    }
    new GenericArrayData(out)
  }
}
