package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative dot-product shape
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, v) => acc+v)` over
  * float-array columns into the codegen'd [[DotProductExpr]] kernel.
  *
  * Why a Rule[LogicalPlan] (the one extension altitude the engine had not
  * needed before): the higher-order-function form is the API users
  * naturally write ([[graft.analysis.Similarity.dot]]/cosine), but HOFs
  * evaluate interpreted — lambda dispatch and a boxed accumulator per
  * element. The kernel is semantically BIT-IDENTICAL (same ascending fold
  * order, same null/empty/length-mismatch results — see
  * [[VectorOps.dotOrNull]]), so the rewrite is safe on every plan, and a
  * cosine written as dot/(√dot·√dot) fuses into three primitive loops with
  * its division semantics untouched. Registered through
  * `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.core.GraftSession]].
  *
  * Scope guard: fires only on `array<float>` inputs (the engine's
  * embedding storage type, and [[DotProductExpr]]'s input contract);
  * double-array forms (e.g. centroid-literal distances) keep the
  * composable plan.
  */
object FuseVectorKernels extends Rule[LogicalPlan] {

  private def stripCastToDouble(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if zero == 0.0 && fin.exprId == fv.exprId &&
            isFloatArray(a) && isFloatArray(b) =>
        val mulOk = (stripCastToDouble(mul.left), stripCastToDouble(mul.right)) match {
          case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
            lv.exprId == x.exprId && rv.exprId == y.exprId
          case _ => false
        }
        val addOk = (add.left, add.right) match {
          case (al: NamedLambdaVariable, ar: NamedLambdaVariable) =>
            al.exprId == acc.exprId && ar.exprId == v.exprId
          case _ => false
        }
        if (mulOk && addOk) Some((a, b)) else None
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The k-means / PQ squared-distance fold:
    * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, (acc, v) => acc+v)`
    * over double arrays (the assignment projections evaluate it k × codes
    * times per row, interpreted — the dominant per-task cost of every
    * Lloyd/PQ/silhouette pass). [[SqDistExpr]] is bit-identical: same
    * ascending accumulation, same per-element IEEE subtract/multiply, same
    * null/length-mismatch results. */
  private object SqDistShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if zero == 0.0 && fin.exprId == fv.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        def isXY(s: Expression): Boolean = s match {
          case Subtract(lv: NamedLambdaVariable, rv: NamedLambdaVariable, _) =>
            lv.exprId == x.exprId && rv.exprId == y.exprId
          case _ => false
        }
        val mulOk = (mul.left, mul.right) match {
          case (l, r) => isXY(l) && isXY(r)
        }
        val addOk = (add.left, add.right) match {
          case (al: NamedLambdaVariable, ar: NamedLambdaVariable) =>
            al.exprId == acc.exprId && ar.exprId == v.exprId
          case _ => false
        }
        if (mulOk && addOk) Some((a, b)) else None
      case _ => None
    }
  }

  // SqDist fusion A/B-adjudicated r15 (site "sqdist-fuse", branch removed):
  // same-JVM ratios vs the interpreted fold — q142 0.69, q162 0.73,
  // q161 0.77, q148 0.80, q108 0.86 (OPTIMIZATION_r15.md)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case DotShape(a, b) => DotProductExpr(a, b)
      case SqDistShape(a, b) => SqDistExpr(a, b)
    }
}
