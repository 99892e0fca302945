package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 digests of every K-token gram of a token array, in position order:
  * element `i` (0-based) is `md5(concat_ws(' ', toks[i+1 … i+k]))` (1-based
  * slice). Empty array when the document has fewer than `k` tokens.
  *
  * Native-expression replacement for the HOF formulation
  * `transform(sequence(1, n-k+1), i -> md5(concat_ws(' ', slice(toks,i,k))))`:
  * HOF lambdas evaluate INTERPRETED per element — for duplicate-span
  * detection that was an expression-tree walk plus a slice copy, a concat
  * allocation, and a boxed struct per gram, the same class of overhead
  * BASELINE.md measured at 15× on text_repetition. Here each row is one
  * tight loop: the digest is updated token-by-token with a reused
  * MessageDigest instance (separator byte between tokens — byte-identical
  * to `concat_ws(' ', …)`), no gram string is ever materialized, and each
  * token's bytes are read once per covering gram.
  *
  * Oracle mirror: `md5(array_to_string(t[i:i+k-1], ' '))` in DuckDB —
  * identical bytes in, lowercase hex out on both engines.
  */
case class GramDigests(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")

  // analysis-time type check: the kernel reads UTF8String elements straight
  // off the ArrayData buffer, so a non-array<string> child must fail in the
  // analyzer with a typed error, not as a ClassCastException mid-task
  // (AbstractDataType is private[sql], so this is checkInputDataTypes
  // directly rather than ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_digests requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramDigests.digests(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramDigests.digests($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramDigests {
  /** Column-API entry point: `GramDigests($"toks", 8)`. */
  def apply(c: Column, k: Int): Column =
    ColumnShim.column(GramDigests(ColumnShim.expression(c), k))

  // one digest instance per task thread, reset per gram — allocation-free
  // in the row loop (MessageDigest is not thread-safe, never shared)
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Sep = Array[Byte](' ')
  private val HexChars = "0123456789abcdef".toCharArray

  /** The whole-row kernel, shared by eval and generated code (the loop is
    * one JIT-compiled method either way — what matters is that no
    * per-element Catalyst interpretation happens inside it).
    */
  def digests(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // hoist each token's bytes once; a token is re-read by up to k grams.
    // null elements stay null: concat_ws SKIPS nulls (token and separator
    // both) and the gram loop must mirror that byte stream exactly
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      bytes(i) = if (t == null) null else t.getBytes
      i += 1
    }
    val digest = md.get()
    val out = new Array[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      digest.reset()
      var j = 0
      var emitted = false
      while (j < k) {
        val b = bytes(p + j)
        if (b != null) {
          if (emitted) digest.update(Sep)
          digest.update(b)
          emitted = true
        }
        j += 1
      }
      out(p) = UTF8String.fromString(hex(digest.digest()))
      p += 1
    }
    new GenericArrayData(out)
  }

  private def hex(b: Array[Byte]): String = {
    val cs = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      cs(2 * i) = HexChars((b(i) >> 4) & 0xf)
      cs(2 * i + 1) = HexChars(b(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}
