package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-Triples literal escape (`graft_nt_escape`) — the OUTBOUND twin of
  * [[NtUnescape]] and the inner loop of the flagship serialize pipeline
  * (every literal of every quad passes through it in `renderNQuads` /
  * `renderTurtleBlocks`; at 100 TB the escape IS the render CPU).
  *
  * Replaces a five-deep `regexp_replace` chain (backslash → quote → LF →
  * CR → tab), which walks the string five times through five compiled
  * regex engines and allocates four intermediates. One pass, one output
  * buffer, and the common nothing-to-escape case returns the input
  * UTF8String untouched.
  *
  * Parity contract: BYTE-IDENTICAL to the sequential chain (the DuckDB
  * oracles replay the same five replaces — `QuadQueries.escSql`). The
  * chain ordering (backslash first) makes it equivalent to a single
  * per-character mapping, which is what runs here; ExtensionsSpec
  * asserts equality against the chain on adversarial strings, and
  * `NtUnescape(NtEscape(x)) == x` closes the loop.
  */
case class NtEscape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nt_escape"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a string argument, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    NtEscape.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NtEscape.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NtEscape {

  private def needsEscape(c: Char): Boolean =
    c == '\\' || c == '"' || c == '\n' || c == '\r' || c == '\t'

  /** One pass; untouched input returns without copying. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    var i = 0
    val n = s.length
    while (i < n && !needsEscape(s.charAt(i))) i += 1
    if (i == n) return u
    val sb = new java.lang.StringBuilder(n + 8)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ => sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1,
      s"graft_nt_escape takes (string); got ${args.length}")
    NtEscape(args.head)
  }

  /** Programmatic per-session registration (idempotent), mirroring
    * [[DotProduct.register]]; [[GraftExtensions]] covers
    * extension-configured sessions. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nt_escape"),
      new ExpressionInfo(classOf[NtEscape].getName, "graft_nt_escape"),
      builder)
}
