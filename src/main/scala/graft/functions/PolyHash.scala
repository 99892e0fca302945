package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial rolling hash of a string — the code-point fold
  * `acc = (acc * 31 + codepoint) % (1e9 + 7)` — as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Replaces the former higher-order-function formulation
  * (`aggregate(transform(split(text, "")), …)`): HOF lambdas run
  * interpreted per element and that chain allocated two arrays per row
  * before folding character by character through `InterpretedEval` — the
  * same pattern BASELINE.md measured at a 15× penalty on
  * `text_repetition`. Here the whole fold is one primitive `long` loop
  * inside WholeStageCodegen.
  *
  * Semantics are pinned by the DuckDB oracle mirror
  * (`list_reduce(list_prepend(0, [unicode(c) for c in string_split(text,'')]), …)`):
  * both iterate UNICODE CODE POINTS (surrogate pairs fold as one value),
  * so results hash-match cell-exact across engines.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.fold(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |final String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API entry point: `PolyHash($"text")`. */
  def apply(c: Column): Column =
    ColumnShim.column(PolyHash(ColumnShim.expression(c)))

  /** The same fold in plain Scala — the DRIVER-side mirror that lets
    * shard routing ([[graft.catalog.DistributedCatalog]]) compute a row's
    * shard without a Spark job, guaranteed consistent with the
    * expression because interpreted eval delegates here.
    */
  def fold(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}
