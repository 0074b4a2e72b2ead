package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound-prefilter for edit-distance predicates
  * (SURVEY.md §7 "custom Rule" stretch goal, motivated by the J4 fuzzy
  * repair path).
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k` —
  * the edit distance can never be less than the length difference. The
  * length check is O(1) per row (lengths are known from the UTF8String
  * header) while levenshtein is O(|a|·|b|), so conjoining the cheap bound
  * FIRST lets short-circuit evaluation skip the quadratic distance for
  * every pair whose lengths already rule it out. On a fuzzy-join cross
  * product (dirty-values × dictionary) that is most pairs.
  *
  * Fixpoint-safe: a filter is only rewritten if the matching length
  * bound is not already present (checked with semanticEquals), so the
  * optimizer's fixed-point batch terminates.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def lengthBound(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def bounds(cond: Expression): Seq[Expression] = cond.collect {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, _)) =>
      lengthBound(a, b, k)
    case GreaterThanOrEqual(k @ Literal(_, _), Levenshtein(a, b, None)) =>
      lengthBound(a, b, k)
    case LessThan(Levenshtein(a, b, None), k @ Literal(_, _)) =>
      LessThan(Abs(Subtract(Length(a), Length(b))), k)
    case GreaterThan(k @ Literal(_, _), Levenshtein(a, b, None)) =>
      LessThan(Abs(Subtract(Length(a), Length(b))), k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = cond.collect { case e => e }
      val missing = bounds(cond).filterNot(b => existing.exists(_.semanticEquals(b)))
      if (missing.isEmpty) f
      else Filter(missing.reduce(And) match {
        case pre => And(pre, cond) // cheap bounds first -> short-circuit
      }, child)
  }
}
