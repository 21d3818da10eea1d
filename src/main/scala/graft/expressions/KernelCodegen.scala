package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Whole-stage-codegen bridge for kernel expressions.
  *
  * The sketch expressions ([[TextSketches]], [[Domains]], the WARC
  * splitter) run imperative JVM kernels that no one would transliterate
  * into generated Java — but leaving them on `CodegenFallback` doesn't
  * just interpret the one expression, it forces the surrounding
  * operators out of whole-stage codegen: the parent span splits and
  * every row crosses an interpreted-projection boundary on what is the
  * hottest path of a 100 TB tokenize/dedup job. The standard fix
  * (Spark's own regexp and datetime expressions do the same) is to
  * generate a single virtual call back into the expression instance via
  * a codegen reference: the span stays fused, the kernel stays JVM
  * code, and JIT inlines the monomorphic call site.
  *
  * Mix in instead of `CodegenFallback`; the concrete class keeps its
  * `nullSafeEval` kernel untouched. Null handling: child nulls are
  * handled by `nullSafeCodeGen` exactly as in the interpreted path, and
  * a `null` RESULT from the kernel (short-vector degrade in the ANN
  * cells) sets `isNull` on a nullable expression and raises a
  * descriptive error on a non-nullable one. Catalyst's own interpreted
  * `eval` trusts `nullable` and would silently pass that null on, so
  * the traits override `eval` with the SAME non-nullable check — both
  * execution modes fail fast with the same message on a
  * broken-invariant kernel instead of diverging (descriptive error
  * under codegen, silent null interpreted).
  */
private[expressions] object KernelCodegen {

  /** Assignment snippet: cast/unbox the kernel's boxed result into the
    * expression's java type, routing kernel-level nulls to `isNull`
    * (nullable) or a descriptive failure (non-nullable — never an
    * unguarded unbox).
    */
  def assign(ctx: CodegenContext, ev: ExprCode, e: Expression,
             call: String): String = {
    val jt = CodeGenerator.javaType(e.dataType)
    val tmp = ctx.freshName("kernelRes")
    val cast =
      if (CodeGenerator.isPrimitiveType(e.dataType))
        s"((${CodeGenerator.boxedType(e.dataType)}) $tmp).${jt}Value()"
      else s"($jt) $tmp"
    val onNull =
      if (e.nullable) s"${ev.isNull} = true;"
      else
        "throw new IllegalStateException(\"kernel returned null on " +
          s"non-nullable expression ${e.getClass.getName}\");"
    s"""Object $tmp = $call;
       |if ($tmp == null) { $onNull }
       |else { ${ev.value} = $cast; }""".stripMargin
  }

  /** Interpreted twin of [[assign]]'s non-nullable guard: same check,
    * same message, so both execution modes surface a kernel that
    * broke its nullability contract identically.
    */
  def checked(e: Expression, result: Any): Any = {
    if (result == null && !e.nullable)
      throw new IllegalStateException(
        s"kernel returned null on non-nullable expression ${e.getClass.getName}")
    result
  }
}

/** Kernel-call codegen for unary kernels — see [[KernelCodegen]]. */
trait UnaryKernelCodegen extends UnaryExpression {

  /** Public bridge for generated code (`nullSafeEval` is protected). */
  final def kernel(input: Any): Any = nullSafeEval(input)

  override def eval(input: InternalRow): Any =
    KernelCodegen.checked(this, super.eval(input))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      c => KernelCodegen.assign(ctx, ev, this, s"$ref.kernel($c)"))
  }
}

/** Kernel-call codegen for binary kernels — see [[KernelCodegen]]. */
trait BinaryKernelCodegen extends BinaryExpression {

  /** Public bridge for generated code (`nullSafeEval` is protected). */
  final def kernel(l: Any, r: Any): Any = nullSafeEval(l, r)

  override def eval(input: InternalRow): Any =
    KernelCodegen.checked(this, super.eval(input))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (l, r) => KernelCodegen.assign(ctx, ev, this, s"$ref.kernel($l, $r)"))
  }
}
