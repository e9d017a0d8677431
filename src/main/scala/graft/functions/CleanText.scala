package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextClean

/** Native Catalyst expression for the deterministic S5 text cleanup
  * (SURVEY.md §4.3: "a native Expression for unidecode+fixups to stay
  * codegen-friendly"). `doGenCode` emits a direct static call, so the
  * expression participates in whole-stage codegen instead of falling back
  * to an interpreted UDF — the cleanup runs inside the same generated loop
  * as the surrounding projection.
  */
case class CleanTextExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextClean.clean(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.text.TextClean.clean($c.toString()));""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): CleanTextExpression =
    copy(child = newChild)
  override def prettyName: String = "clean_text"
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: `clean_text($"html_text")`. */
  def clean_text(c: Column): Column =
    GraftColumnBridge.column(CleanTextExpression(GraftColumnBridge.expression(c)))
}

/** Session extension registering `clean_text` for SQL
  * (`spark.sql("SELECT clean_text(text) ...")`). Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("clean_text"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CleanTextExpression].getName, "clean_text"),
        (children: Seq[Expression]) => CleanTextExpression(children.head)))
  }
}
