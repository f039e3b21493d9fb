package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllUnionAgg, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite (SURVEY.md §4 extension; r11) — summary-table
  * ROUTING: an aggregate over a registered base-grain TABLE is rewritten to
  * re-aggregate the (orders-of-magnitude smaller) summary table whenever
  * every output is derivable from the summary's partial states. The user
  * keeps writing queries against the base table; the engine serves them
  * from the MV — the OLAP-server behavior the reference approximates by
  * hand-pointing its dashboards at MOLAP tables.
  *
  * Derivability contract (the rewrite fires only when ALL hold):
  *  - grouping expressions are plain columns ⊆ the MV's group keys
  *    (coarser-or-equal grain: re-aggregating partials collapses the
  *    dropped keys correctly);
  *  - every aggregate is `sum(col)` with `col` in the registered partial
  *    map, or `count(<literal>)` with a registered row-count partial —
  *    both re-aggregable as sums of partials. Non-decomposable aggregates
  *    (count DISTINCT, medians) disqualify the whole aggregate;
  *  - no DISTINCT / FILTER modifiers.
  * Exactness: partials are kept in the base's EXACT types (decimal/long),
  * so re-aggregation is bit-identical to the direct aggregate — a double
  * partial would re-sum in a different accumulation order. The re-sum's
  * widened result type casts back to the original aggregate's type
  * (value-preserving: same totals either route).
  *
  * Matching is by the SCAN the aggregate reads (the base table's file-
  * system location), with plain-column projections between the aggregate
  * and the scan accepted — robust to column pruning wherever the optimizer
  * leaves the projection. Rewritten outputs keep the original expression
  * ids, so parent operators above the aggregate are untouched.
  *
  * Same session discipline as [[InferYearBoundsFromDateKey]]: the rule is
  * inert unless `spark.graft.mvRewrite.enabled=true` AND the scanned path
  * is registered — installing it globally changes no foreign query. It is
  * attachable to a live session via `spark.experimental.extraOptimizations`
  * (it runs post-pruning, which the scan-level match is built for).
  * STALENESS is the caller's contract, as with every MV system: re-register
  * (or refresh the summary) when the base table changes.
  */
object MvRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.mvRewrite.enabled"

  /** Opt-in for APPROXIMATE distinct-count routing: `count(DISTINCT col)`
    * rewrites to an HLL-union + estimate over a registered sketch partial.
    * A separate flag because — unlike every other rewrite here — it CHANGES
    * SEMANTICS from exact to approximate (exact in the sketch's sparse
    * regime, ±~2% beyond it); enabling it is the user's statement that
    * sketch-grade distinct counts are acceptable, the approximate-query-
    * processing trade every sketch-serving OLAP store offers. */
  val ApproxDistinctKey = "spark.graft.mvRewrite.approxDistinct.enabled"

  /** One registered summary: the base table's qualified location, the MV's
    * analyzed scan plan, the MV's group-key names, base measure column →
    * MV sum-partial column, the MV's row-count partial column, and base
    * column → MV HLL-sketch partial for approximate distinct counts. */
  final case class Registration(baseLocation: String, mv: LogicalPlan,
      keys: Set[String], sums: Map[String, String], countCol: Option[String],
      distincts: Map[String, String])

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Registration]()

  /** Register `mvDf` (an aggregate of the table at `basePath` by `keys`,
    * carrying sum partials per `sums` and a `count(*)` partial `countCol`)
    * as the serving table for aggregates over `basePath`. */
  def register(spark: SparkSession, basePath: String, mvDf: DataFrame,
      keys: Seq[String], sums: Map[String, String],
      countCol: Option[String] = None,
      distincts: Map[String, String] = Map.empty): Unit = {
    val mvPlan = mvDf.queryExecution.analyzed
    val out = mvPlan.output.map(_.name).toSet
    require((keys ++ sums.values ++ countCol ++ distincts.values).forall(out),
      s"MV output ${out.mkString(",")} is missing registered columns")
    registry.add(Registration(qualify(spark, basePath), mvPlan,
      keys.toSet, sums, countCol, distincts))
  }

  def clear(): Unit = registry.clear()

  private def qualify(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toUri.getPath
  }

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").equalsIgnoreCase("true")

  private def approxDistinct: Boolean =
    conf.getConfString(ApproxDistinctKey, "false").equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transform {
      case agg @ Aggregate(_, _, child, _) =>
        matchBase(child).flatMap(tryRewrite(agg, _)).getOrElse(agg)
    }

  /** The registration whose base table `child` scans — plain-column
    * projections between aggregate and scan are accepted (pruning leaves
    * them in varying shapes), anything computed disqualifies. */
  private def matchBase(child: LogicalPlan): Option[Registration] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(projList, c)
          if projList.forall(_.isInstanceOf[AttributeReference]) => strip(c)
      case other => other
    }
    strip(child) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toUri.getPath).toSet
          registry.asScala.find(r => paths.contains(r.baseLocation))
        case _ => None
      }
      case _ => None
    }
  }

  private def tryRewrite(agg: Aggregate, reg: Registration): Option[LogicalPlan] = {
    val mvOut = reg.mv.output.map(a => a.name -> a).toMap
    val groups = agg.groupingExpressions.map {
      case a: AttributeReference if reg.keys(a.name) => mvOut(a.name)
      case _ => return None
    }
    val aggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // grouping column passthrough — keep the original output exprId
      case a: AttributeReference if reg.keys(a.name) =>
        Alias(mvOut(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(c, name) =>
        // accept the aggregate bare or under a cast (CollapseProject folds
        // a post-aggregate projection's cast into the aggregate list)
        val (ae, rebuild): (AggregateExpression, Expression => Expression) = c match {
          case ae: AggregateExpression => (ae, identity[Expression] _)
          case outer @ Cast(ae: AggregateExpression, _, _, _) =>
            (ae, (e: Expression) => outer.withNewChildren(Seq(e)))
          case _ => return None
        }
        if (ae.filter.isDefined) return None
        // the re-sum widens (decimal precision / long), cast back to the
        // original result type so the plan's schema is unchanged
        val rewritten: Expression = ae.aggregateFunction match {
          case Sum(e: AttributeReference, _)
              if !ae.isDistinct && reg.sums.contains(e.name) =>
            Cast(ae.copy(aggregateFunction = Sum(mvOut(reg.sums(e.name)))), ae.dataType)
          case Count(Seq(Literal(_, _)))
              if !ae.isDistinct && reg.countCol.isDefined =>
            Cast(ae.copy(aggregateFunction = Sum(mvOut(reg.countCol.get))), ae.dataType)
          // count(DISTINCT col) → union the cells' HLL sketches, estimate —
          // only under the explicit approx opt-in (semantics change)
          case Count(Seq(e: AttributeReference))
              if ae.isDistinct && approxDistinct && reg.distincts.contains(e.name) =>
            new HllSketchEstimate(ae.copy(
              aggregateFunction = new HllUnionAgg(mvOut(reg.distincts(e.name))),
              isDistinct = false))
          case _ => return None
        }
        Alias(rebuild(rewritten), name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Aggregate(groups, aggs, reg.mv, None))
  }
}
