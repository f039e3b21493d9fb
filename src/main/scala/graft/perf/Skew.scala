package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A straight `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key (the reference workload's
  * 'UNKNOWN' country, a viral product) serializes the stage. Salting
  * appends a random-but-deterministic shard to the key for a partial
  * aggregate, then combines the shards — two small shuffles instead of one
  * skewed one. (AQE's skew-join handling covers joins; this covers
  * aggregations, which AQE does not re-balance.)
  *
  * Only algebraic aggregates compose this way; [[saltedSum]] and
  * [[saltedCount]] cover the workload's revenue/count rollups.
  */
object Skew {

  private def salt(n: Int): Column = pmod(spark_partition_id(), lit(n))

  /** sum(valueCol) grouped by `keys`, resistant to hot keys. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, shards: Int = 16): DataFrame =
    saltedSums(df, keys, Seq(valueCol), shards)

  /** Multi-measure [[saltedSum]] (r13): all measures ride ONE two-phase
    * pass (one partial aggregate per salt shard, one combine) instead of a
    * pass per measure. Each re-summed partial casts back to the partial's
    * own type — which IS the plain `groupBy.sum` result type — so the
    * salted route is schema-identical to the direct one, not just
    * value-identical (value-preserving: a total overflowing that type
    * would overflow the direct route too). */
  def saltedSums(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
      shards: Int = 16): DataFrame = {
    require(valueCols.nonEmpty, "saltedSums needs at least one measure")
    val keyCols = keys.map(col)
    val partials = df.groupBy(keyCols :+ salt(shards).as("_salt"): _*)
      .agg(sum(valueCols.head).as(s"_p_${valueCols.head}"),
        valueCols.tail.map(v => sum(v).as(s"_p_$v")): _*)
    def combined(v: String) =
      sum(s"_p_$v").cast(partials.schema(s"_p_$v").dataType).as(s"sum_$v")
    partials.groupBy(keyCols: _*)
      .agg(combined(valueCols.head), valueCols.tail.map(combined): _*)
  }

  /** count(*) grouped by `keys`, resistant to hot keys. */
  def saltedCount(df: DataFrame, keys: Seq[String], shards: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ salt(shards).as("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as("n"))
  }

  /** [[autoSaltedSum]]'s outcome: the result frame plus the decision
    * evidence (whether salting fired, and the measured top-1 key share
    * that drove it) so callers and gate rows can assert the decision, not
    * just the — intentionally identical — numbers. */
  final case class AutoSalted(result: DataFrame, salted: Boolean, top1Share: Double)

  /** Report → mitigation, closed-loop (r12, VERDICT r11 #7): measure the
    * key distribution first, salt ONLY when the top-1 key's share of the
    * rows crosses `topShareThreshold` (strictly greater). The decision
    * runs on the |keys|-row count frame — one map-side-combined count
    * pass, then a 1-row max/total aggregate — never a second scan of the
    * fact for deciding. Uniform feeds skip the salting's second shuffle
    * entirely; skewed feeds get the two-phase shape. Results are identical
    * either route (the SkewSpec contract); only the physical plan differs. */
  def autoSaltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      topShareThreshold: Double = 0.2, shards: Int = 16): AutoSalted = {
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max("c"), sum("c")).head()
    val top1Share =
      if (r.isNullAt(0) || r.getLong(1) == 0L) 0.0
      else r.getLong(0).toDouble / r.getLong(1)
    val salted = top1Share > topShareThreshold
    val result =
      if (salted) saltedSum(df, keys, valueCol, shards)
      else df.groupBy(keys.map(col): _*)
        .agg(sum(valueCol).as(s"sum_$valueCol"))
    AutoSalted(result, salted, top1Share)
  }

  /** Multi-measure [[autoSaltedSum]] (r13): ONE distribution measurement
    * decides for all measures together, then either the plain single-pass
    * aggregate or [[saltedSums]]'s two-phase shape — schema-identical
    * either route. */
  def autoSaltedSums(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
      topShareThreshold: Double = 0.2, shards: Int = 16): AutoSalted = {
    require(valueCols.nonEmpty, "autoSaltedSums needs at least one measure")
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max("c"), sum("c")).head()
    val top1Share =
      if (r.isNullAt(0) || r.getLong(1) == 0L) 0.0
      else r.getLong(0).toDouble / r.getLong(1)
    val salted = top1Share > topShareThreshold
    val result =
      if (salted) saltedSums(df, keys, valueCols, shards)
      else df.groupBy(keys.map(col): _*)
        .agg(sum(valueCols.head).as(s"sum_${valueCols.head}"),
          valueCols.tail.map(v => sum(v).as(s"sum_$v")): _*)
    AutoSalted(result, salted, top1Share)
  }

  /** EXACT heavy-hitter detection without shuffling the full key space
    * (r11) — the other side of skew handling: find the hot keys themselves.
    * A key is heavy when its count exceeds `factorPct`% of the mean
    * per-key count (a scale-free threshold, decided by pure integer
    * cross-multiplication — no division ever happens).
    *
    * The classic distributed two-phase shape with a pigeonhole guarantee:
    * (1) each partition counts ONLY its local keys in memory and emits the
    * keys with local count ≥ ceil(T/P) — any key with global count ≥ T
    * must clear that bar in at least one of the P partitions, so the
    * candidate set is a guaranteed SUPERSET of the true heavy hitters;
    * (2) an exact count over just the candidate keys (broadcast semi-join,
    * so only candidate rows ride the one shuffle) clears the false
    * positives. Result is exact and partitioning-invariant. The per-
    * partition map is local-distinct-keys-sized; for feeds where even that
    * is unbounded, swap the local counter for a SpaceSaving/Misra-Gries
    * summary of size m (undercount ≤ rows_p/m keeps the superset guarantee
    * when m ≥ P·rows_p/T). Keys must be long-typed. Meant for T ≫ P —
    * a threshold near the mean on uniform data degrades toward emitting
    * every key, which is what the data is then saying. */
  def heavyKeys(df: DataFrame, key: String, factorPct: Long = 120): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = df.agg(count(lit(1)), count_distinct(col(key))).head()
    val (total, nKeys) = (r.getLong(0), r.getLong(1))
    // smallest integer count with 100*n*nKeys > factorPct*total
    val tMin = (factorPct * total) / (100L * nKeys) + 1
    val keys = df.select(col(key).cast("long")).as[Long]
    val p = keys.rdd.getNumPartitions.toLong
    val localThresh = (tMin + p - 1) / p
    val cands = keys.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach(k => m.update(k, m.getOrElse(k, 0L) + 1))
      m.iterator.filter(_._2 >= localThresh).map(_._1)
    }.distinct().toDF(key)
    df.join(broadcast(cands), Seq(key), "left_semi")
      .groupBy(key).agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= tMin)
  }

  /** Key-skew diagnosis report (r11) — the measurement that DECIDES whether
    * a key needs salting / AQE skew handling, before any mitigation runs:
    * one row of distribution statistics over the per-key counts — top-1 key
    * share, median and p99 counts (type-7 interpolation, the one float
    * statistic both engines compute identically; rounded to 6dp before
    * emission — the embDimStats discipline), and the exact Gini coefficient
    * of the count distribution (0 = uniform, →1 = one key owns the table).
    * Gini stays in integers until ONE division: with counts ranked
    * ascending (ties broken by key — the tie ORDER never changes the sum,
    * because within a tie block the counts are constant and Σ(2i) over the
    * block is fixed), `gini = (Σ2·i·cᵢ − (n+1)·Σc) / (n·Σc)`. Shape: one
    * key-count aggregate, a window + final fold over the |keys|-row frame —
    * the raw table contributes one map-side-combined pass. */
  def skewReport(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key).agg(count(lit(1)).as("c"))
    val ranked = counts.withColumn("i",
      row_number().over(Window.orderBy(col("c").asc, col(key).asc)))
    ranked.agg(
      count(lit(1)).as("n_keys"),
      sum("c").cast("long").as("total_rows"),
      max("c").cast("long").as("max_count"),
      round(expr("percentile(c, 0.5)"), 6).as("p50_count"),
      round(expr("percentile(c, 0.99)"), 6).as("p99_count"),
      sum(lit(2L) * col("i") * col("c")).cast("long").as("s2"))
    .select(col("n_keys"), col("total_rows"), col("max_count"),
      (col("max_count").cast("double") / col("total_rows")).as("top1_share"),
      col("p50_count"), col("p99_count"),
      ((col("s2") - (col("n_keys") + 1L) * col("total_rows")).cast("double") /
        (col("n_keys") * col("total_rows"))).as("gini"))
  }
}
