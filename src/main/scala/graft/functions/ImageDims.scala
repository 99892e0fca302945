package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** `(width, height)` of a binary image payload, NULL when the bytes are
  * not a decodable image — the metadata half of the multimodal column
  * contract ([[graft.multimodal.MediaPipeline]]), as a native Catalyst
  * expression so queries can branch on real image dimensions without a
  * UDF.
  *
  * HEADER-ONLY read: `javax.imageio`'s reader protocol resolves
  * width/height from the format header (`ImageReader.getWidth/getHeight`
  * are spec'd not to require pixel decoding), so a query scanning a 100 TB
  * payload column for dimensions never materializes a single pixel plane —
  * the full-decode path stays in MediaPipeline's executor batch loop where
  * the plane is actually consumed.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims requires a binary payload, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageDims.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = ($resultType) graft.functions.ImageDims.dims($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {
  /** Column-API entry point: `ImageDims($"payload")`. */
  def apply(c: Column): Column =
    ColumnShim.column(ImageDims(ColumnShim.expression(c)))

  /** Shared eval/codegen kernel: header-only (w, h), or null. */
  def dims(payload: Array[Byte]): InternalRow = {
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(stream)
          InternalRow(reader.getWidth(0), reader.getHeight(0))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => null }
    finally if (stream != null) stream.close()
  }
}
