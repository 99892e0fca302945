package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** `(sample_rate, channels, duration_ms)` of a binary audio payload, NULL
  * when the bytes are not a decodable WAV — the audio half of the
  * multimodal metadata contract ([[graft.multimodal.MediaPipeline]]),
  * sibling of [[ImageDims]].
  *
  * HEADER-ONLY read: `javax.sound.sampled.AudioSystem.getAudioFileFormat`
  * resolves format and frame count from the RIFF header without decoding a
  * single sample, so a query scanning a 100 TB payload column for audio
  * metadata never touches PCM data — the full-decode path stays in
  * [[graft.multimodal.MediaPipeline.decodeAudio]]'s executor batch loop.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires a binary payload, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioMeta.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = ($resultType) graft.functions.AudioMeta.meta($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  /** Column-API entry point: `AudioMeta($"payload")`. */
  def apply(c: Column): Column =
    ColumnShim.column(AudioMeta(ColumnShim.expression(c)))

  /** Shared eval/codegen kernel: header-only (sample_rate, channels,
    * duration_ms), or null. The structural RIFF/WAVE gate
    * ([[graft.multimodal.MediaPipeline.looksLikeWav]]) runs BEFORE the
    * sound SPI sees the bytes — the AU reader's ".snd" magic is valid
    * ASCII, so arbitrary text columns could otherwise sniff as audio.
    */
  def meta(payload: Array[Byte]): InternalRow = {
    if (!graft.multimodal.MediaPipeline.looksLikeWav(payload)) return null
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = aff.getFormat
      val sr = math.round(f.getSampleRate)
      val frames = aff.getFrameLength
      if (sr <= 0 || frames < 0) null
      else InternalRow(sr, f.getChannels, frames * 1000L / sr)
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
