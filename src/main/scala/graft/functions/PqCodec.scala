package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Product-quantization kernels for the IVF-PQ ANN path
  * ([[graft.operators.Similarity]] `ann_ivfpq_topk`).
  *
  * PQ splits a d-dim vector into M contiguous subvectors and quantizes each
  * against its own K-entry codebook, so a vector stores as M bytes instead
  * of d floats (16–32× less candidate-stage I/O at 100 TB — the codes
  * table, not the float vectors, is what candidate scoring scans). All
  * three kernels follow the [[NearestCentroid]] design: codebooks ride as
  * codegen REFERENCE OBJECTS (`ctx.addReferenceObj`), never as plan
  * literals, so plan size and generated code are O(1) in M×K.
  */

/** `pq_encode(embedding)` → M-byte code: per subspace, the argmin-L2²
  * sub-centroid index (ties to the LOWER index — deterministic). Subspace
  * m covers dims `[m·subDim, (m+1)·subDim)` where subDim =
  * `codebooks(m)(0).length`; input shorter than a subspace zero-pads
  * (missing dims contribute c² to the distance, consistent everywhere).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode requires a non-empty codebook per subspace")
  require(codebooks.forall(_.length <= 256),
    "pq_encode codes are single bytes: at most 256 sub-centroids per subspace")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float> or array<double> input, got ${other.catalogString}")
  }

  @transient private lazy val childDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], codebooks, childDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      s"${ev.value} = graft.functions.PqEncode.encode($a, $books, $childDouble);"
    })

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(emb: Column, codebooks: Seq[Array[Array[Double]]]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(emb), codebooks.toArray))

  /** Shared eval/codegen kernel (called from generated code — keep the
    * signature Java-friendly).
    */
  def encode(x: ArrayData, books: Array[Array[Array[Double]]],
             childDouble: Boolean): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = books(s)
      val subDim = book(0).length
      var bestJ = 0
      var best = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val cent = book(j)
        var dist = 0.0
        var i = 0
        while (i < subDim) {
          val xi = off + i
          val xv =
            if (xi >= x.numElements()) 0.0
            else if (childDouble) x.getDouble(xi)
            else x.getFloat(xi).toDouble
          val dd = xv - cent(i)
          dist += dd * dd
          i += 1
        }
        if (dist < best) { best = dist; bestJ = j }
        j += 1
      }
      out(s) = bestJ.toByte
      off += subDim
      s += 1
    }
    out
  }
}

/** `pq_code_at(code, m)` → the m-th code byte as an unsigned int (NULL out
  * of bounds) — lets distributed Lloyd training group exploded dimensions
  * by their assigned sub-centroid without re-encoding.
  */
case class PqCodeAt(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_code_at requires (binary, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val code = left.eval(input)
    val m = right.eval(input)
    if (code == null || m == null) null
    else {
      val bytes = code.asInstanceOf[Array[Byte]]
      val i = m.asInstanceOf[Int]
      if (i < 0 || i >= bytes.length) null else bytes(i) & 0xff
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, m) =>
      s"""
         |if ($m < 0 || $m >= $code.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $code[$m] & 0xff;
         |}
       """.stripMargin)

  override def prettyName: String = "pq_code_at"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqCodeAt {
  def apply(code: Column, m: Column): Column =
    ColumnShim.column(
      PqCodeAt(ColumnShim.expression(code), ColumnShim.expression(m)))
}

/** `pq_adc_score(code, dot_lut)` → approximate cosine by asymmetric
  * distance computation: `Σₘ dotLut[m·K + code[m]] / sqrt(Σₘ normLut[m·K +
  * code[m]])`, where `dot_lut` is the PER-QUERY table of `⟨q_m, c_mj⟩`
  * (computed once per query — M·K doubles — and broadcast on the probe
  * row) and `normLut` is the query-independent `|c_mj|²` table riding as a
  * reference object. The query's own norm divides out of a per-query
  * ranking, so this orders candidates exactly as cosine against the
  * RECONSTRUCTED vector — while reading only the M-byte code.
  */
case class PqAdcScore(left: Expression, right: Expression,
                      normLut: Array[Double], k: Int) extends BinaryExpression {
  require(k > 0 && normLut.length % k == 0,
    "pq_adc_score: normLut length must be a multiple of K")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (binary, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(codeAny: Any, lutAny: Any): Any =
    PqAdcScore.score(codeAny.asInstanceOf[Array[Byte]],
      lutAny.asInstanceOf[ArrayData], normLut, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val norms = ctx.addReferenceObj("normLut", normLut, "double[]")
      s"${ev.value} = graft.functions.PqAdcScore.score($code, $lut, $norms, $k);"
    })

  override def prettyName: String = "pq_adc_score"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def apply(code: Column, dotLut: Column, normLut: Array[Double], k: Int): Column =
    ColumnShim.column(PqAdcScore(
      ColumnShim.expression(code), ColumnShim.expression(dotLut), normLut, k))

  /** Shared eval/codegen kernel: one M-iteration loop of two table reads. */
  def score(code: Array[Byte], dotLut: ArrayData,
            normLut: Array[Double], k: Int): Double = {
    var dot = 0.0
    var norm = 0.0
    var m = 0
    while (m < code.length) {
      val idx = m * k + (code(m) & 0xff)
      if (idx < dotLut.numElements()) dot += dotLut.getDouble(idx)
      if (idx < normLut.length) norm += normLut(idx)
      m += 1
    }
    if (norm <= 0.0) 0.0 else dot / math.sqrt(norm)
  }
}
