package graft.plans

import java.time.{LocalDate, LocalDateTime}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite `year(col) = N` into a half-open range on the
  * underlying column.
  *
  * Why it earns its place (SURVEY.md §7.4: custom planner work only where
  * built-ins fall short): `year(ts) = 1998` is how users naturally write
  * time filters, but a function of a column can never reach
  * `PushedFilters` — the parquet scan decodes every row group. The range
  * form `col >= '1998-01-01' AND col < '1999-01-01'` prunes row groups by
  * min/max statistics (and partitions, if the table is date-partitioned).
  * At 100 TB that's the difference between scanning one year and scanning
  * thirty. Catalyst has no such rewrite (UnwrapCastInBinaryComparison is
  * the nearest relative but only handles casts).
  *
  * Semantics: `year()` on a timestamp goes through Cast(ts → date) under
  * the session time zone; the generated bounds use the same zone, so the
  * rewrite is exact. Handles date, timestamp, and timestamp_ntz columns;
  * both literal positions. Registered via
  * SparkSessionExtensions.injectOptimizerRule (post-hoc batch — still
  * before physical planning, so pushdown sees the range). */
object YearPredicateRewrite extends Rule[LogicalPlan] {

  /** Years where y and y+1 are safely constructible in every branch
    * (LocalDate.of throws outside ±999,999,999; micros conversion is far
    * tighter). Outside this window the rule backs off and leaves the
    * original predicate — `year(d) = 2147483647` must return empty rows,
    * not a planning-time DateTimeException (and y+1 must not overflow). */
  private def saneYear(y: Int): Boolean = y >= 0 && y <= 9998

  private def bounds(col: Expression, y: Int): Option[(Literal, Literal)] =
    col.dataType match {
      case DateType =>
        Some((
          Literal(LocalDate.of(y, 1, 1).toEpochDay.toInt, DateType),
          Literal(LocalDate.of(y + 1, 1, 1).toEpochDay.toInt, DateType)))
      case TimestampNTZType =>
        Some((
          Literal(DateTimeUtils.localDateTimeToMicros(
            LocalDateTime.of(y, 1, 1, 0, 0)), TimestampNTZType),
          Literal(DateTimeUtils.localDateTimeToMicros(
            LocalDateTime.of(y + 1, 1, 1, 0, 0)), TimestampNTZType)))
      case TimestampType =>
        val zid = DateTimeUtils.getZoneId(conf.sessionLocalTimeZone)
        def micros(yy: Int) = DateTimeUtils.instantToMicros(
          LocalDate.of(yy, 1, 1).atStartOfDay(zid).toInstant)
        Some((
          Literal(micros(y), TimestampType),
          Literal(micros(y + 1), TimestampType)))
      case _ => None
    }

  /** Unwrap year(x): the analyzer plants Cast(ts → date) under Year for
    * timestamp inputs — rewrite against the ORIGINAL column so pushdown
    * sees the stored type. */
  private def unwrapYear(e: Expression): Option[Expression] = e match {
    case Year(Cast(inner, DateType, _, _))
      if inner.dataType == TimestampType || inner.dataType == TimestampNTZType =>
      Some(inner)
    case Year(inner) if inner.dataType == DateType => Some(inner)
    case _ => None
  }

  private def range(colExpr: Expression, y: Int): Option[Expression] =
    if (!saneYear(y)) None
    else bounds(colExpr, y).map { case (lo, hi) =>
      And(GreaterThanOrEqual(colExpr, lo), LessThan(colExpr, hi))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case eq @ EqualTo(yearExpr, Literal(y: Int, IntegerType)) =>
      unwrapYear(yearExpr).flatMap(range(_, y)).getOrElse(eq)
    case eq @ EqualTo(Literal(y: Int, IntegerType), yearExpr) =>
      unwrapYear(yearExpr).flatMap(range(_, y)).getOrElse(eq)
  }
}
