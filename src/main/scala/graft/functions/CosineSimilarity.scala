package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity over two `Array[Float]` columns as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`): a tight primitive
  * `double` loop over the two `ArrayData` buffers, no boxing, no UDF
  * serialization — this is the hot inner kernel of the similarity-search /
  * near-dup operators, so it must stay inside WholeStageCodegen at 100 TB.
  *
  * Accumulates dot product and both norms in one pass, left-to-right, in
  * double precision; callers `round(…, 6)` before comparing against the
  * DuckDB oracle (`list_cosine_similarity`) so last-ulp fold-order
  * differences cannot flip a filter or a rank.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // accepts array<float> or array<double> on either side: corpus columns
  // are float32, trained centroid literals are double (rounded decimals
  // that float32 can't represent exactly)
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  @transient private lazy val leftDouble = isDouble(left)
  @transient private lazy val rightDouble = isDouble(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (leftDouble) "getDouble" else "getFloat"
      val getY = if (rightDouble) "getDouble" else "getFloat"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = $a.$getX($i);
         |  final double $yv = $b.$getY($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `CosineSimilarity($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))
}
