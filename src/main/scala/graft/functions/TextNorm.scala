package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_norm(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — Unicode normalization as
  * a codegen'd Catalyst expression. Spark has no builtin for this (the usual
  * workaround is a Scala UDF, which breaks whole-stage codegen and boxes
  * every row); here the JDK's `java.text.Normalizer` is called inside the
  * generated code with an `isNormalized` fast path, so the common case
  * (already-normalized ASCII/NFC text, i.e. almost all of a real corpus)
  * costs one scan and zero allocation. Deterministic pure function —
  * DuckDB's `nfc_normalize` computes the identical NFC mapping, which is
  * what makes a cross-engine oracle possible.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_norm needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, form)) input
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = s"java.text.Normalizer.Form.${form.name()}"
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $formRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(s"unknown normalization form: $other")
  }

  /** Parse the form argument, which must be a foldable string literal. */
  def fromExprs(exprs: Seq[Expression]): UnicodeNormalize = {
    val form = if (exprs.length > 1) exprs(1).eval(null) match {
      case s: UTF8String => formOf(s.toString)
      case other => throw new IllegalArgumentException(s"unicode_norm form must be a string literal, got $other")
    } else Normalizer.Form.NFC
    UnicodeNormalize(exprs.head, form)
  }
}
