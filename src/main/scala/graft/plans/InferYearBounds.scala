package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Optimizer rule inferring year-partition bounds from smart-date-key ranges
  * (SURVEY.md §4 R6 — the one custom `Rule[LogicalPlan]` the workload
  * motivates).
  *
  * The engine's fact table is range-partitioned by a derived `year` column
  * (the reference's yearly partitions,
  * `Iteration 3/Group No.6_Indexing_Partitioning.sql:99-109`), while its
  * queries filter on the BIGINT smart key `date_key` = yyyyMMddHHmmss
  * (`Iteration 3/Group No.6_Indexing_Partitioning.sql:27-28,95-96`). A
  * `date_key BETWEEN lo AND hi` predicate alone reaches the scan as a plain
  * data filter — every year directory is still listed and read. Because the
  * key encodes the year in its top digits (`year = date_key / 10^10`,
  * [[graft.yearOfDateKey]]), any date_key interval implies a year interval;
  * this rule conjoins the implied `year >= lo/10^10 AND year <= hi/10^10`
  * onto the filter, which Catalyst then classifies as a partition filter →
  * non-matching year directories are pruned instead of scanned. At 100 TB a
  * one-year probe of a 7-year fact touches 1/7th of the files with no query
  * rewrite by the user.
  *
  * REQUIRED INVARIANT — this rewrite is only sound on tables where
  * `year = date_key / 10^10` holds on **every row** (the engine's write
  * path guarantees it: both columns derive from the same timestamp,
  * [[graft.yearOfDateKey]]). On a table where a name-matched `year` column
  * means something else (fiscal year, birth year, …) the inferred conjunct
  * would silently drop rows. The rule therefore fires only when the session
  * opts in via `spark.graft.inferYearBounds.enabled=true` — setting the flag
  * is the user's assertion that every `(date_key: LONG, year: INT|LONG)`
  * relation in the session satisfies the invariant. With the flag unset
  * (the default), registering [[GraftExtensions]] globally changes no query.
  *
  * Structural guards on top of the flag: fires only when the filtered
  * relation exposes both a LongType `date_key` and an integer `year` column
  * and the predicate does not already constrain `year` (also the
  * fixed-point idempotence guard).
  *
  * Registration: `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build, or
  * `spark.experimental.extraOptimizations ++= Seq(InferYearBoundsFromDateKey)`
  * on a live session (the batch runs late, but partition filters are
  * extracted at physical planning, so pruning still applies) — then enable
  * with `spark.conf.set(InferYearBoundsFromDateKey.EnabledKey, "true")`.
  */
object InferYearBoundsFromDateKey extends Rule[LogicalPlan] {

  /** Session opt-in flag; see the invariant note in the class doc. */
  val EnabledKey = "spark.graft.inferYearBounds.enabled"

  private val DateKeyCol = "date_key"
  private val YearCol = "year"
  private val KeyPerYear = 10000000000L

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def keyLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def yearLit(dt: DataType, y: Long): Expression = dt match {
    case LongType => Literal(y)
    case _ => Literal(y.toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case f @ Filter(cond, child) =>
      val dkOpt = child.output.find(a => a.name == DateKeyCol && a.dataType == LongType)
      val yrOpt = child.output.find(a => a.name == YearCol &&
        (a.dataType == IntegerType || a.dataType == LongType))
      (dkOpt, yrOpt) match {
        case (Some(dk), Some(yr)) if !cond.references.contains(yr) =>
          var lo = Option.empty[Long]
          var hi = Option.empty[Long]
          def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
          def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
          splitAnd(cond).foreach {
            case GreaterThanOrEqual(a: AttributeReference, l) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenLo)
            case GreaterThan(a: AttributeReference, l) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenLo)
            case LessThanOrEqual(a: AttributeReference, l) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenHi)
            case LessThan(a: AttributeReference, l) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenHi)
            case EqualTo(a: AttributeReference, l) if a.semanticEquals(dk) =>
              keyLit(l).foreach { v => tightenLo(v); tightenHi(v) }
            // literal-on-the-left flips
            case LessThanOrEqual(l, a: AttributeReference) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenLo)
            case LessThan(l, a: AttributeReference) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenLo)
            case GreaterThanOrEqual(l, a: AttributeReference) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenHi)
            case GreaterThan(l, a: AttributeReference) if a.semanticEquals(dk) =>
              keyLit(l).foreach(tightenHi)
            case EqualTo(l, a: AttributeReference) if a.semanticEquals(dk) =>
              keyLit(l).foreach { v => tightenLo(v); tightenHi(v) }
            case _ => ()
          }
          // smart keys are non-negative, so / truncation == floor division
          val preds =
            lo.filter(_ >= 0L).map(v => GreaterThanOrEqual(yr, yearLit(yr.dataType, v / KeyPerYear))).toSeq ++
            hi.filter(_ >= 0L).map(v => LessThanOrEqual(yr, yearLit(yr.dataType, v / KeyPerYear)))
          if (preds.isEmpty) f
          else Filter(preds.foldLeft(cond)(And(_, _)), child)
        case _ => f
      }
  }
}

/** Analyzer resolution rule routing `spark.sql` statements to the
  * versioned tables registered in [[graft.sources.GraftCatalog]] (r15):
  * a DML/DDL statement whose target name is registered becomes a
  * [[graft.sources.GraftDmlCommand]] (lowered onto the verbs at
  * execution time, exactly once), and registered relation names inside
  * any read — including `VERSION AS OF` time travel — substitute to the
  * snapshot's scan. Unregistered names fall through untouched to Spark's
  * own resolution, so the rule is inert on foreign queries. */
case class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import graft.sources.{GraftCatalog, GraftDmlCommand, SqlDml}
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case s if SqlDml.statementTarget(s).exists(n => GraftCatalog.get(n).isDefined) =>
      GraftDmlCommand(s)
    case other => SqlDml.substituteTables(spark, other, GraftCatalog.registered)
  }
}

/** `SparkSessionExtensions` hook registering the engine's rules:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. Registration
  * alone is inert — each optimizer rule additionally requires its session
  * opt-in flag (e.g. [[InferYearBoundsFromDateKey.EnabledKey]]) and the
  * statement rule only touches names registered in
  * [[graft.sources.GraftCatalog]], so installing the extensions globally
  * never changes results on foreign tables. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule((_: SparkSession) => InferYearBoundsFromDateKey)
    ext.injectOptimizerRule((_: SparkSession) => MvRewrite)
    ext.injectOptimizerRule((_: SparkSession) => StatsPrune)
    ext.injectResolutionRule(GraftSqlRule)
  }
}
