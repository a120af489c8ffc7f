package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 (Robots Exclusion Protocol) path-pattern matching as a
  * codegen expression — does `pattern` match the url path?
  *
  * Semantics (§2.2.2–2.2.3): patterns anchor at the PATH START; `*`
  * matches any character sequence; a trailing `$` anchors the match at
  * the path end; without `$` the pattern matches any path it prefixes.
  * The pattern rides the expression as a constructor parameter (rules
  * are a dictionary-sized literal set, the QueryTerms stance), so the
  * match is pure map-side work with no rules join at all.
  *
  * Greedy leftmost placement of the inter-star segments is complete
  * for existence (the classic wildcard-match argument: taking each
  * middle segment at its earliest feasible position only ever leaves
  * more room for the rest).
  */
case class RobotsMatch(child: Expression, pattern: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"robots_match needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RobotsMatch.matches(input.asInstanceOf[UTF8String].toString, pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("robotsPat", pattern, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RobotsMatch.matches($c.toString(), $pat)")
  }

  override protected def withNewChildInternal(c: Expression): RobotsMatch =
    copy(child = c)

  override def prettyName: String = "robots_match"
}

object RobotsMatch {

  /** Static entry shared by eval and generated code. */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    if (parts.length == 1)
      return if (anchored) path == pat else path.startsWith(pat)
    // first segment anchors at 0
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length - 1) {
      val at = path.indexOf(parts(i), pos)
      if (at < 0) return false
      pos = at + parts(i).length
      i += 1
    }
    val last = parts(parts.length - 1)
    if (anchored)
      path.endsWith(last) && path.length - last.length >= pos
    else
      path.indexOf(last, pos) >= 0
  }
}
