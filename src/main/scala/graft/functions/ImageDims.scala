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

  /** Structural magic-number gate BEFORE ImageIO sees the bytes. The SPI
    * sniffers are too permissive to run on arbitrary column content:
    * the BMP reader matches on the 2 ASCII bytes "BM" (any text starting
    * "BMW…" would "decode" with bytes 18–21 of the text as its width) and
    * the WBMP reader matches on a leading 0x00 pair (any binary blob).
    * Only formats whose signature cannot occur as innocent text/binary
    * prefixes pass: PNG/JPEG magics are non-UTF-8, BMP additionally must
    * declare its own exact byte length, GIF must carry its 0x3B trailer.
    * A real image an exotic writer produced without these invariants
    * resolves to null (the callers' byte-derived fallback) — conservative
    * by design; garbage dimensions are the worse failure.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean = {
    def u(i: Int): Int = p(i) & 0xff
    val png = p.length >= 8 && u(0) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G' && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a
    val jpeg = p.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff
    val bmp = p.length >= 6 && p(0) == 'B' && p(1) == 'M' && {
      val declared = u(2).toLong | (u(3).toLong << 8) |
        (u(4).toLong << 16) | (u(5).toLong << 24)
      declared == p.length
    }
    val gif = p.length >= 7 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a' &&
      u(p.length - 1) == 0x3b
    png || jpeg || bmp || gif
  }

  private val MaxDim = 1 << 24 // 16M px a side: anything beyond is garbage

  /** Shared eval/codegen kernel: header-only (w, h), or null. */
  def dims(payload: Array[Byte]): InternalRow = {
    if (payload == null || !looksLikeImage(payload)) return null
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
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) null
          else InternalRow(w, h)
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => null }
    finally if (stream != null) stream.close()
  }
}
