package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing of the optimizer-rule layers ([[StatsPrune]],
  * [[MvRewrite]]): path qualification for registry matching, and the
  * attach-enable-materialize-restore harness the gate rows run under. One
  * implementation — these were duplicated between the two rules, and a
  * hardening fix to one silently missed the other. */
private[plans] object PlanRuleSupport {

  /** The qualified URI of `path` — the identity both registries match scan
    * locations against (scheme + authority normalized the way
    * `HadoopFsRelation.rootPaths` reports them). */
  def qualify(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toUri.toString
  }

  /** Run `body` with `rule` attached to the session's extra optimizations
    * and the given conf flags set to "true", hand back an EAGERLY
    * MATERIALIZED copy of the result, and restore every flag to its prior
    * value — a gate row must not leave a rewrite active for later queries,
    * and the materialization runs while the flags are still on, so what a
    * plan assert observed is what executed. */
  def scopedWith(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
      flags: Seq[String])(body: => DataFrame): DataFrame = {
    val prev = flags.map(k => k -> spark.conf.getOption(k))
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    flags.foreach(spark.conf.set(_, "true"))
    try {
      val df = body
      val rows = java.util.Arrays.asList(df.collect(): _*)
      spark.createDataFrame(rows, df.schema)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
