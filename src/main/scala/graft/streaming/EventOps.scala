package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Event-stream processing over the `events` table — the reference's
  * "real-time ingestion" roadmap item (`README.md:180-184`, SURVEY.md §2.10)
  * built Spark-first: the same logical aggregations exist as batch DataFrames
  * (oracle-checked) and as Structured Streaming queries (file-source stream →
  * watermark → windowed agg), verified equal by the test suite.
  *
  * == The ingestion contract (VERDICT r9 #1/#2) ==
  * A real event feed does not promise one timestamp encoding: this repo's
  * own testdata has shipped `ts` as both parquet TIMESTAMP(NANOS) (surfacing
  * as ns-epoch LongType under `nanosAsLong`) and TIMESTAMP(MICROS)
  * (surfacing as TIMESTAMP_NTZ). Round 9 hard-assumed nanos and every
  * ts-arithmetic operator broke — worse, the explicit-schema streaming path
  * silently read µs values as ns (timestamps 1000× off, caught only by the
  * oracle hash). The fix is a single normalization point: [[events]] (and
  * the streaming-side [[streamSource]]) inspect the ACTUAL schema and
  * convert `ts` once to **µs-epoch LongType** — the precision the oracle
  * compares at — with integer math only (never doubles, which lose
  * precision above 2^53). Long-encoded feeds have their unit inferred from
  * magnitude (ns/µs/ms/s are 3 orders apart; epochs are unambiguous), and
  * the result must land inside a sane epoch range [2000, 2100) or ingestion
  * throws loudly — a future unit change fails instead of hashing wrong.
  * Everything downstream does integer µs arithmetic on that one contract.
  *
  * Money-like doubles are aggregated as exact cents
  * (`round(value*100) → BIGINT`): deterministic under any partitioning, and
  * the one double→cents formulation both engines round identically.
  */
object EventOps extends QueryRegistry {

  /** Sane epoch-µs bounds: 2000-01-01T00:00Z .. 2100-01-01T00:00Z. An
    * ingested feed whose normalized min/max falls outside fails loudly —
    * the anti-silent-unit-bug assertion VERDICT r9 #2 asked for. */
  private val MinSaneUs = 946684800000000L
  private val MaxSaneUs = 4102444800000000L

  /** Unit of a long-encoded epoch, inferred from magnitude: ns/µs/ms/s are
    * each 3 decimal orders apart, so any epoch between 1973 and 5138 maps
    * to exactly one unit. Returns the divisor/multiplier pair (den, num)
    * with `µs = v * num / den` — integer math only. */
  private def usFactor(sample: Long): (Long, Long) = {
    val a = math.abs(sample)
    if (a >= 100000000000000000L) (1000L, 1L)      // ns → µs
    else if (a >= 100000000000000L) (1L, 1L)       // µs
    else if (a >= 100000000000L) (1L, 1000L)       // ms → µs
    else (1L, 1000000L)                            // s → µs
  }

  private def toUs(v: Long, f: (Long, Long)): Long = v / f._1 * f._2

  private def usColumn(f: (Long, Long)): Column = f match {
    case (1L, 1L)  => col("ts")
    case (den, 1L) => expr(s"ts div $den")
    case (_, num)  => col("ts") * lit(num)
  }

  /** True when the failure (anywhere in its cause chain) is Spark's
    * `PARQUET_TYPE_ILLEGAL` error condition — the stable, versioned error
    * class TIMESTAMP(NANOS) schema inference raises, matched instead of
    * the Spark-version-dependent message text (ADVICE r10). */
  private def isIllegalParquetType(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      t match {
        case st: org.apache.spark.SparkThrowable
            if st.getCondition == "PARQUET_TYPE_ILLEGAL" => return true
        case _ =>
      }
      t = if (t.getCause eq t) null else t.getCause
    }
    false
  }

  /** Raw read of an events parquet path/glob. TIMESTAMP(NANOS) files are
    * unreadable by the vectorized reader without the legacy session switch;
    * it is flipped ONLY when an illegal-parquet-type failure is actually
    * present (the retry path), so a µs/ms feed never mutates session state
    * (VERDICT r9 #4). NANOS is the one illegal physical type the ingestion
    * contract supports; if the legacy retry is not the cure (some OTHER
    * illegal type), the session conf is restored and the ORIGINAL error
    * rethrown — a failed retry never leaves state flipped. */
  private def rawEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Throwable if isIllegalParquetType(e) =>
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try spark.read.parquet(path)
        catch {
          case _: Throwable =>
            prior.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
            throw e
        }
    }

  /** Per-feed unit-inference cache: the min/max probe on a long-encoded
    * feed scans the `ts` column chunks, which at 100 TB is a real job —
    * pay it ONCE per (session, feed state), not on every operator
    * construction. Timestamp-typed feeds never probe at all. The key
    * is keyed by PATH with the feed's FILE SIGNATURE (names + lengths +
    * mtimes, one listing RPC) stored in the value — a regenerated file at
    * the same path re-infers and re-runs the sane-epoch assertion instead
    * of applying a stale factor (ADVICE r10), and a churning feed REPLACES
    * its entry instead of growing the map by one signature-sized key per
    * regeneration for the session's lifetime. */
  private val tsFactorCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, (Long, Long))]()

  /** Listing-derived content signature of a feed path/glob (one level of
    * directory expansion — parquet table dirs are flat). */
  private def feedSignature(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath) else Array(s))
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
  }

  /** The normalizing `ts` expression for a raw events frame, derived from
    * its actual schema (shared by batch and streaming reads; the one
    * min/max job on long feeds reads only parquet column chunks of `ts`,
    * cached per feed path when one is supplied). */
  private def tsToUs(raw: DataFrame,
      cacheKey: Option[(String, String)] = None): Column =
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        // session tz is pinned UTC at every entry point, so NTZ wall-clock
        // and instant µs coincide — same value DuckDB's epoch_us computes
        unix_micros(col("ts").cast("timestamp"))
      case LongType =>
        def infer(): (Long, Long) = {
          val mm = raw.agg(min("ts"), max("ts")).head()
          if (mm.isNullAt(1)) (1L, 1L) // empty feed: nothing to infer
          else {
            val f = usFactor(mm.getLong(1))
            val (lo, hi) = (toUs(mm.getLong(0), f), toUs(mm.getLong(1), f))
            if (lo < MinSaneUs || hi >= MaxSaneUs) throw new IllegalStateException(
              s"events.ts: long values [${mm.getLong(0)}, ${mm.getLong(1)}] do not normalize " +
                s"into a sane epoch-µs range ([$lo, $hi] vs [$MinSaneUs, $MaxSaneUs)); " +
                "refusing to guess the unit — fix the feed or the ingestion contract")
            f
          }
        }
        val f = cacheKey match {
          case Some((path, sig)) =>
            tsFactorCache.compute(path, (_, prev) =>
              if (prev != null && prev._1 == sig) prev else (sig, infer()))._2
          case None => infer()
        }
        usColumn(f)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected timestamp or long)")
    }

  /** The events feed with `ts` normalized to µs-epoch LongType, whatever
    * encoding the file carries (see the class doc's ingestion contract). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val raw = rawEvents(spark, path)
    raw.withColumn("ts", tsToUs(raw, Some((path, feedSignature(spark, path)))))
  }

  /** File-source stream over `eventsDir` with the SAME normalization as the
    * batch reader: schema and ts-unit are derived from a batch read of the
    * (static, already-present) files — never from a hard-coded schema, which
    * is how r9's streaming path silently read µs as ns. */
  private def streamSource(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    val batch = rawEvents(spark, eventsDir)
    // no cache key: a stream's drop directory grows between calls, so a
    // cached inference could go stale; the setup probe is one-time anyway
    val tsCol = tsToUs(batch)
    val r0 = spark.readStream.schema(batch.schema)
    maxFilesPerTrigger.fold(r0)(n => r0.option("maxFilesPerTrigger", n))
      .parquet(eventsDir)
      .withColumn("ts", tsCol)
  }

  /** Event-time column: µs epoch → ntz timestamp. */
  private def eventTime: Column =
    expr("timestamp_micros(ts)").cast("timestamp_ntz").as("t")

  private def cents: Column = expr("CAST(round(value * 100) AS BIGINT)")

  /** Hourly per-type rollup (batch form of the streaming windowed agg). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), eventTime, cents.as("cents"))
      .groupBy(col("event_type"), date_trunc("hour", col("t")).as("hour"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("value_cents"))

  /** Daily distinct-user activity. */
  def dailyUsers(events: DataFrame): DataFrame =
    events
      .select(eventTime, col("user_id"))
      .groupBy(date_trunc("day", col("t")).cast("date").as("day"))
      .agg(count_distinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** Hourly volume anomalies — ops-monitoring over the event feed: each
    * (type, hour) cell z-scored against its type's hourly distribution,
    * flagged beyond 3σ. All statistics stay EXACT integers (count, sum,
    * sum-of-squares over hourly counts) until one final arithmetic chain
    * `(x*n - s) / n / sqrt((n*ssq - s*s) / (n*(n-1)))` written IDENTICALLY
    * in both engines — exact integer operands through the same IEEE
    * operation sequence give bit-identical z-scores, where stddev_samp's
    * engine-internal accumulation order would not. Zero-variance types
    * (all hourly counts equal, n>1) are excluded by an exact-integer
    * `n*ssq - s*s > 0` guard in BOTH engines — sqrt(0) division yields
    * NULL under Spark non-ANSI vs inf/NaN under DuckDB IEEE, so the
    * degenerate case must never reach the division (ADVICE r10). The
    * stats frame is |types| rows and broadcasts back onto the (already
    * tiny) hourly series. */
  /** Robust (median/MAD) hourly anomalies (r11) — the outlier-resistant
    * twin of [[hourlyAnomalies]]: mean/stddev z-scores let a single extreme
    * hour inflate its own baseline and mask itself; the modified z-score
    * `0.6745·(x − median)/MAD` (Iglewicz–Hoaglin, flag at |z| > 3.5) is
    * breakdown-resistant to half the cells. Determinism without integers:
    * both engines implement the SAME type-7 interpolated percentile, hourly
    * counts are integers, so the median is a .5-step value, absolute
    * deviations are .5-step values, and the MAD is a .25-step value — every
    * intermediate is exactly representable and the arithmetic chain is
    * written identically. Zero-MAD types (over half the hours at the
    * median) are excluded in both engines, the zero-variance discipline of
    * the z-score variant. Shape: the percentile aggregates run over the
    * |types|×|hours| pre-collapse, never raw events; stats broadcast
    * back. */
  def hourlyAnomaliesMad(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), eventTime)
      .groupBy(col("event_type"), date_trunc("hour", col("t")).as("hour"))
      .agg(count(lit(1)).as("x"))
    val med = hourly.groupBy("event_type")
      .agg(expr("percentile(x, 0.5D)").as("med"))
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad") > 0)
      .select(col("event_type"), col("hour"), col("x").as("n_events"),
        round(lit(0.6745) * (col("x") - col("med")) / col("mad"), 6).as("robust_z"))
      .withColumn("is_anomaly", abs(col("robust_z")) > 3.5)
  }

  def hourlyAnomalies(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), eventTime)
      .groupBy(col("event_type"), date_trunc("hour", col("t")).as("hour"))
      .agg(count(lit(1)).as("x"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("ssq"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(col("n") > 1 && col("n") * col("ssq") - col("s") * col("s") > 0)
      .select(col("event_type"), col("hour"), col("x").as("n_events"),
        round(expr(
          "(x * n - s) / n / sqrt((n * ssq - s * s) / (n * (n - 1)))"), 6).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 3.0)
  }

  /** Day-7 cohort retention — the product-analytics staple over the event
    * feed: users grouped by their FIRST active day, with the share active
    * again exactly seven days later. Shape: one distinct over (user, day)
    * (the shuffle that bounds everything downstream — activity collapses to
    * at most one row per user-day before any join), a per-user min for the
    * cohort day, then an equi-join back on (user, day = cohort+7). No
    * window over raw events, no cross-day blowup — linear at any feed
    * size. */
  def retentionD7(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), expr("timestamp_micros(ts)").cast("timestamp_ntz").as("t"))
      .select(col("user_id"), date_trunc("day", col("t")).cast("date").as("day"))
      .distinct()
    val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    // rename the rejoined leg: both frames descend from `days`, and the
    // rename keeps the self-join condition unambiguous (the attribution
    // pattern)
    val retained = days.select(col("user_id").as("r_user"), col("day").as("r_day"))
    cohorts
      .join(retained,
        col("user_id") === col("r_user") &&
          col("r_day") === date_add(col("cohort_day"), 7), "left")
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"), count(col("r_day")).as("n_retained_d7"))
  }

  /** Per-type value stats (min/max are order-free; avg via exact cents). */
  def typeStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        (sum(cents).cast("double") / count(lit(1)) / 100.0).as("avg_value"))

  /** Batch sessionization: a new session starts after a >30 min gap.
    * The window partitions by user — no global window, scales with users. */
  def sessions(events: DataFrame): DataFrame = {
    val wnd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000L
    events
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(wnd).isNull ||
          col("ts") - lag(col("ts"), 1).over(wnd) > gapUs, 1).otherwise(0))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("new_s").as("n_sessions"))
  }

  /** Per-session rollup — the sessionizer extended to session-grain facts:
    * each (user, session) with its bounds, event count, and exact-cents
    * purchase revenue. The running `sum(new_s)` over the SAME window that
    * detects gaps assigns the session id, so everything still rides one
    * `user_id` shuffle; the session aggregate groups on (user, sid) — the
    * key the window already clustered. */
  def sessionFacts(events: DataFrame): DataFrame = {
    val wnd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000L
    events
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(wnd).isNull ||
          col("ts") - lag(col("ts"), 1).over(wnd) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(
        min("ts").as("start_us"), max("ts").as("end_us"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", cents).otherwise(0L))
          .as("purchase_cents"))
      .select(col("user_id"), col("sid"),
        expr("timestamp_micros(start_us)").cast("timestamp_ntz").as("start_t"),
        expr("timestamp_micros(end_us)").cast("timestamp_ntz").as("end_t"),
        col("n_events"), col("purchase_cents"))
  }

  /** Ordered conversion funnel: first view → first click STRICTLY AFTER it →
    * first purchase strictly after that, collapsed to stage counts and
    * conversion rates. The three whole-partition windows share one shuffle on
    * `user_id`, and the per-user collapse groups on the same key (the
    * exchange is already satisfied) — no event ever leaves its user
    * partition, so the shape survives any user count. */
  def funnel(events: DataFrame): DataFrame =
    funnelCore(events, gapUs = None,
      clickedName = "clicked_after_view", purchasedName = "purchased_after_funnel")

  /** The shared funnel pipeline: [[funnel]] is exactly [[funnelWindowed]]
    * with no deadline, so one parameterized core carries both (the
    * unbounded form's `within` folds to a true literal — same plan). */
  private def funnelCore(events: DataFrame, gapUs: Option[Long],
      clickedName: String, purchasedName: String): DataFrame = {
    val wAll = Window.partitionBy("user_id")
    def within(prev: Column): Column =
      gapUs.map(g => col("ts") <= prev + g).getOrElse(lit(true))
    val perUser = events
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(wAll))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") > col("v_ts") &&
          within(col("v_ts")), col("ts"))).over(wAll))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("c_ts") &&
          within(col("c_ts")), col("ts"))).over(wAll))
      .groupBy("user_id")
      .agg(max("v_ts").as("v_ts"), max("c_ts").as("c_ts"), max("p_ts").as("p_ts"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count(col("v_ts")).as("viewed"),
      count(col("c_ts")).as(clickedName),
      count(col("p_ts")).as(purchasedName),
      (count(col("c_ts")).cast("double") / count(col("v_ts"))).as("view_to_click"),
      (count(col("p_ts")).cast("double") / count(col("c_ts"))).as("click_to_purchase"))
  }

  /** Nearest-incident attribution (r11): each purchase paired with the
    * error CLOSEST in time for the same user — either direction, within a
    * tolerance — via the generic [[graft.operators.AsOf.nearestJoin]]
    * (backward running-last + forward running-first sharing ONE user_id
    * shuffle). The backward-only as-of answers "what broke before this?";
    * nearest answers the incident-correlation question "what incident is
    * this purchase closest to?", which a purchase seconds BEFORE an error
    * belongs to just as much. */
  def nearestError(events: DataFrame,
      toleranceUs: Long = 6L * 3600 * 1000000L): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = events.filter(col("event_type") === "error")
      .select("user_id", "ts")
    graft.operators.AsOf.nearestJoin(purchases, errors, Seq("user_id"),
        "ts", "ts", Some(toleranceUs))
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(ts)").cast("timestamp_ntz").as("t"),
        expr("timestamp_micros(asof.ts)").cast("timestamp_ntz").as("nearest_error_t"),
        col("delta_us"))
  }

  /** Time-bounded funnel (r11): the ordered funnel with a conversion
    * DEADLINE per stage — first view, first click within `maxGapHours` of
    * it, first purchase within `maxGapHours` of the click. Product
    * analytics measures conversion this way (an unbounded funnel credits a
    * purchase made months later); the deadline is pure µs-integer
    * arithmetic inside the SAME per-user windows, so the one-shuffle shape
    * of [[funnel]] is unchanged. */
  def funnelWindowed(events: DataFrame, maxGapHours: Int = 48): DataFrame =
    funnelCore(events, gapUs = Some(maxGapHours * 3600L * 1000000L),
      clickedName = "clicked_in_window", purchasedName = "purchased_in_window")

  /** As-of join: every event picks up the most recent STRICTLY PRIOR `error`
    * event of the same user (time-to-last-error). Spark has no native as-of
    * operator; the scale-correct shape is not a range join (which plans as a
    * BroadcastNestedLoopJoin) but a single window over the union of both
    * streams: partition by the join key, order by event time, running
    * `max(error_ts)` with a `ROWS ... 1 PRECEDING` frame. One shuffle on
    * `user_id`, linear in events. Timestamps stay µs-integer throughout. */
  def asofLastError(events: DataFrame): DataFrame = {
    val wnd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("err_ts", max(when(col("event_type") === "error", col("ts"))).over(wnd))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(ts)").cast("timestamp_ntz").as("t"),
        expr("timestamp_micros(err_ts)").cast("timestamp_ntz").as("last_error_t"),
        (col("ts") - col("err_ts")).as("us_since_error"))
  }

  /** The generic as-of operator ([[graft.operators.AsOf]]) instantiated:
    * each purchase picks up the latest STRICTLY-PRIOR click of the same user
    * (payload = click value + time). The oracle runs DuckDB's native
    * `ASOF LEFT JOIN` — a cross-engine check of true as-of semantics against
    * an independent implementation, not a re-expression of this plan.
    *
    * Duplicate (user_id, ts) clicks resolve to the MAX value on both sides
    * (ADVICE r6 — without a pinned rule the hash compare silently depends on
    * the generator never emitting such ties): AsOf's own tie-break already
    * picks the greatest payload struct, whose leading field is `value`, so
    * the Spark side needs no extra dedup aggregation; DuckDB's native ASOF
    * pick on time ties is unspecified, so the ORACLE pre-dedups its click
    * side with `GROUP BY user_id, ts → max(value)` to assert the same rule
    * (EventOpsSpec pins the equivalence). */
  def asofLastClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    graft.operators.AsOf.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts", strict = true)
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        expr("timestamp_micros(ts)").cast("timestamp_ntz").as("t"),
        expr("timestamp_micros(asof.ts)").cast("timestamp_ntz").as("last_click_t"),
        col("asof.value").as("last_click_value"))
  }

  /** The generic bucketized range join ([[graft.operators.RangeJoin]])
    * instantiated KEYLESS — each purchase counted against every error
    * incident window `[error_ts, error_ts + 10 min)` corpus-wide. With no
    * equi-conjunct Catalyst would plan this as a BroadcastNestedLoopJoin
    * (|purchases| × |errors| comparisons); the bucket key restores a hash
    * join (RangeJoinSpec asserts no NL join survives in the plan). */
  /** Interval-overlap join (r11): each error's 10-minute incident window
    * against each purchase's ±5-minute activity window — which purchases
    * had ANY of their activity window inside an incident, with the overlap
    * duration (exact µs integers). KEYLESS like [[purchasesInErrorWindows]]
    * (Catalyst would plan a BroadcastNestedLoopJoin), so it runs on the
    * bucketized [[graft.operators.RangeJoin.intervalOverlap]]. */
  def incidentActivityOverlap(events: DataFrame): DataFrame = {
    val tenMinUs = 600L * 1000000L
    val fiveMinUs = 300L * 1000000L
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_lo"),
        (col("ts") + tenMinUs).as("e_hi"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), (col("ts") - fiveMinUs).as("p_lo"),
        (col("ts") + fiveMinUs).as("p_hi"))
    graft.operators.RangeJoin
      .intervalOverlap(errors, purchases, "e_lo", "e_hi", "p_lo", "p_hi", tenMinUs)
      .select(col("error_id"), col("purchase_id"),
        (least(col("e_hi"), col("p_hi")) - greatest(col("e_lo"), col("p_lo")))
          .as("overlap_us"))
  }

  def purchasesInErrorWindows(events: DataFrame): DataFrame = {
    val winUs = 600L * 1000000L // 10 minutes
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    val incidents = events.filter(col("event_type") === "error")
      .select(col("ts").as("lo"), (col("ts") + winUs).as("hi"))
    graft.operators.RangeJoin.pointInInterval(purchases, incidents, "ts", "lo", "hi", winUs)
      .groupBy(col("event_id").as("purchase_id"))
      .agg(count(lit(1)).as("n_active_incidents"))
  }

  /** Structured Streaming form of [[hourlyAgg]]: file-source stream over a
    * directory of event parquet drops → event-time watermark → tumbling 1h
    * window. Run with `.writeStream.outputMode("complete")` (tests) or
    * `append` + watermark close in production. */
  def streamingHourlyAgg(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    streamSource(spark, eventsDir, maxFilesPerTrigger)
      // watermarks require TIMESTAMP (session-tz) event time, not NTZ;
      // session tz is pinned UTC so the wall-clock values coincide
      .select(col("event_type"), expr("timestamp_micros(ts)").as("t"), cents.as("cents"))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("value_cents"))
      .select(col("window.start").cast("timestamp_ntz").as("hour"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Per-type top-k spenders via the heap aggregate
    * ([[graft.operators.TopK]]) — the window-free top-k-per-group shape: the
    * per-(type, user) rollup shuffles once on its own key with map-side
    * combine, then the heap aggregate prunes to k pairs per type per task
    * before the (tiny) second exchange. The `row_number()` window form would
    * re-shuffle and SORT every (type, user) row just to keep k of them —
    * the difference between `groups × k` and `users` riding the second
    * exchange at 100 TB. */
  def topkUsersBySpend(events: DataFrame, k: Int = 5): DataFrame = {
    val perUser = events.groupBy("event_type", "user_id")
      .agg(sum(cents).as("cents"))
    graft.operators.TopK.perGroup(perUser, Seq("event_type"),
        col("cents"), col("user_id"), k)
      .select(col("event_type"), col("rank"),
        col("id").as("user_id"), col("score").as("value_cents"))
  }

  /** The NATIVE session-window surface (r11) — `session_window(t, gap)` is
    * the engine-managed form of the gap sessionizer: Catalyst merges
    * events into session ranges inside the aggregate itself (and the
    * identical call works under a watermark in streaming, where the custom
    * state operator is the alternative). Boundary semantics match the
    * `diff > gap` lag idiom exactly — an event exactly `gap` after its
    * predecessor still MERGES (spec-pinned on the exact-gap fixture) — so
    * the gate row shares `events_sessions`' oracle verbatim: the native
    * aggregate and the window idiom are proven equivalent cross-engine. */
  def sessionsNativeWindow(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("timestamp_micros(ts)").as("t"))
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("ev"))
      .groupBy("user_id")
      .agg(sum("ev").as("n_events"), count(lit(1)).as("n_sessions"))

  private val AttrWindowUs = 30L * 60 * 1000000L

  /** Click→purchase attribution: every purchase picks up the clicks the same
    * user made in the 30 minutes up to (and including) the purchase. The
    * batch form of the stream-stream interval join
    * ([[streamingAttribution]]): an equi-join on `user_id` with a range
    * conjunct — shuffles both sides once on the key, never a broadcast
    * nested loop, so it scales with users like the sessionizer. LEFT join:
    * un-attributed purchases stay (n_clicks_30m = 0). The range compare runs
    * in µs, the precision the oracle's timestamps carry. */
  def attribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_us"))
    // the click leg renames its key (as streamingAttribution does): both legs
    // resolve against the same source relation, and `purchases("user_id") ===
    // clicks("user_id")` is the ambiguous self-join reference Spark warns is
    // trivially true — the rename makes the join condition unambiguous
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_us"))
    purchases
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") > col("p_us") - AttrWindowUs && col("c_us") <= col("p_us"),
        "left")
      .groupBy(col("purchase_id"), col("user_id"), col("p_us"))
      .agg(count(col("c_us")).as("n_clicks_30m"),
        max(col("c_us")).as("last_c_us"))
      .select(
        col("purchase_id"), col("user_id"),
        expr("timestamp_micros(p_us)").cast("timestamp_ntz").as("t"),
        col("n_clicks_30m"),
        expr("timestamp_micros(last_c_us)").cast("timestamp_ntz").as("last_click_t"))
  }

  /** Multi-touch linear attribution with EXACT cents (r11) — [[attribution]]
    * counts the window's clicks; this splits each purchase's revenue across
    * them, under the warehouse discipline that money must sum exactly: a
    * floating 1/n share accumulates order-dependently and loses cents, so
    * the split is integer division with the remainder going one cent each
    * to the R EARLIEST clicks (deterministic, and Σ shares == cents by
    * construction — spec-pinned). Clicks collapse to distinct (user, ts)
    * first, making the within-purchase rank total; the join + both windows
    * ride the same user-keyed shuffle family as [[attribution]]. Purchases
    * with no windowed click keep their full revenue unattributed
    * (click_ts NULL). */
  def attributionLinear(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_us"), cents.as("cents"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_us")).distinct()
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_us") > col("p_us") - AttrWindowUs && col("c_us") <= col("p_us"),
      "left")
    val wnd = org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")
    val ord = wnd.orderBy(col("c_us").asc)
    joined
      .withColumn("n", count(col("c_us")).over(wnd))
      .withColumn("k", row_number().over(ord))
      .select(col("purchase_id"), col("user_id"),
        expr("timestamp_micros(p_us)").cast("timestamp_ntz").as("t"),
        expr("timestamp_micros(c_us)").cast("timestamp_ntz").as("click_t"),
        when(col("n") === 0, col("cents"))
          .otherwise(expr("cents div n") +
            when(col("k") <= expr("cents % n"), lit(1L)).otherwise(lit(0L)))
          .as("attributed_cents"))
  }

  /** Stream-stream interval join (§2.10): the streaming form of
    * [[attribution]] — clicks and purchases arrive as two independent
    * streams; each purchase joins the same user's clicks from the preceding
    * 30 minutes. Both sides carry watermarks, and the time-bound condition
    * lets Spark expire click state past `watermark + 30min` — state is
    * bounded by the interval, not the stream (inner join: the un-attributed
    * purchases need an outer join, which additionally waits out the
    * watermark before emitting). */
  def streamingAttribution(spark: SparkSession, eventsDir: String): DataFrame = {
    def stream = streamSource(spark, eventsDir, None)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("timestamp_micros(ts)").as("c_t"))
      .withWatermark("c_t", "2 hours")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        expr("timestamp_micros(ts)").as("p_t"))
      .withWatermark("p_t", "2 hours")
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("c_t") > col("p_t") - expr("INTERVAL 30 MINUTES") && col("c_t") <= col("p_t"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_t").cast("timestamp_ntz").as("t"), col("c_t").cast("timestamp_ntz").as("click_t"))
  }

  /** JSON property extraction (§2.8 JSON surface): parse the `props` JSON
    * payload with the codegen'd `get_json_object` path and aggregate by a
    * derived bucket. The oracle extracts the same field with a regex so the
    * compare does not depend on the oracle engine's JSON extension. */
  def propsBuckets(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        max("k").as("max_k"),
        sum(cents).as("value_cents"))

  /** Streaming exact dedup on event_id: at-least-once sources re-deliver,
    * and unbounded dedup state would OOM a year-long stream — the watermark
    * bounds state to the late-arrival window (the training-data ingestion
    * dedup shape: state scales with the window, not the stream). */
  def streamingDedup(spark: SparkSession, eventsDir: String,
      watermark: String = "1 hour",
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    streamSource(spark, eventsDir, maxFilesPerTrigger)
      .select(col("event_id"), expr("timestamp_micros(ts)").as("t"),
        col("user_id"), col("event_type"), col("value"))
      .withWatermark("t", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Correctness roundtrip for [[streamingDedup]] (VERDICT r8 #4): the
    * events feed split into two drops, the second RE-DELIVERING half of the
    * first (the at-least-once redelivery scenario the operator exists for),
    * forced into one-file micro-batches so the duplicate arrives in a LATER
    * batch and must be dropped from cross-batch state — not by within-batch
    * dedup. The watermark is wider than the feed's time span, so no dedup
    * state expires mid-test and the appended log must hold every event
    * exactly once; redelivered rows are exact copies, making the output set
    * independent of which copy the state keeps. */
  private def streamDedupRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_stream_dedup_").toString
    ev.filter(col("event_id") % 4 === 1).coalesce(1).write.parquet(s"$base/drops/a")
    ev.filter(col("event_id") % 4 === 3 || col("event_id") % 8 === 1)
      .coalesce(1).write.parquet(s"$base/drops/b")
    val query = streamingDedup(s, s"$base/drops/*",
        watermark = "87600 hours", maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_dedup_roundtrip did not finish within 300 s; output log is partial")
    }
    s.read.parquet(s"$base/out")
      .select(col("event_id"), col("t").cast("timestamp_ntz").as("t"),
        col("user_id"), col("event_type"), col("value"))
  }

  final case class SessionEvent(user_id: Long, ts: Long) // µs epoch
  final case class SessionSummary(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long)
  final case class SessState(start: Long, last: Long, n: Long) // public: encoder codegen instantiates it

  /** Custom streaming state: gap-based sessionization via
    * `flatMapGroupsWithState` — the stateful-operator path for semantics
    * windowed aggregation can't express. A session closes (and is emitted)
    * when a later event for the same user arrives more than `gapMinutes`
    * after the previous one; the open session stays in the state store.
    * State is partitioned by user — scales with the key space. Works
    * identically over a batch Dataset (state starts empty, closed sessions
    * emit). Timestamps are µs epoch (the engine-wide event contract). */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent], gapMinutes: Int)
      : org.apache.spark.sql.Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[SessState]) =>
          val out = scala.collection.mutable.Buffer.empty[SessionSummary]
          var st = state.getOption
          evs.toSeq.sortBy(_.ts).foreach { e =>
            st match {
              case Some(s) if e.ts - s.last > gapUs =>
                out += SessionSummary(user, s.start, s.last, s.n)
                st = Some(SessState(e.ts, e.ts, 1))
              case Some(s) =>
                // a CROSS-BATCH late event (sorted within a batch, but a
                // later micro-batch can carry an older ts) must never move
                // the session's bounds backwards: last going backwards
                // would spuriously split on the next on-time event
                st = Some(SessState(math.min(s.start, e.ts),
                  math.max(s.last, e.ts), s.n + 1))
              case None =>
                st = Some(SessState(e.ts, e.ts, 1))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Correctness roundtrip for [[streamingHourlyAgg]] in APPEND mode — the
    * watermark-closure semantics the `complete`-mode spec can't see: a
    * window row is emitted exactly once, when the watermark (max event time
    * seen in prior batches minus the 1 h delay) passes the window end. The
    * feed splits into two time-ordered drops at the ts midpoint with
    * one-file micro-batches, so the first batch's windows close during the
    * second batch / the terminal no-data batch, out of the state store.
    * The oracle replays the contract: hourly groups whose window end is at
    * or before `max(t) - 1 h`; each user-visible value matches the batch
    * aggregate, proving append-mode emission loses and duplicates nothing
    * short of the (still-open) tail windows. */
  // memoized per (session, dir): the trending row ranks THIS row's stored
  // output — re-running the full checkpointed streaming pipeline for it
  // doubled the streaming gates' wall-clock for a |hours|×|types| rank
  private val hourlyRoundtripCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def streamHourlyRoundtrip(s: SparkSession, dir: String): DataFrame =
    hourlyRoundtripCache.computeIfAbsent((s, dir),
      _ => buildStreamHourlyRoundtrip(s, dir))

  private def buildStreamHourlyRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val r = ev.agg(min("ts"), max("ts")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val base = java.nio.file.Files.createTempDirectory("graft_stream_hourly_").toString
    ev.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$base/drops/a")
    ev.filter(col("ts") > mid).coalesce(1).write.parquet(s"$base/drops/b")
    val query = streamingHourlyAgg(s, s"$base/drops/*", maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_hourly_roundtrip did not finish within 300 s; output log is partial")
    }
    s.read.parquet(s"$base/out")
  }

  /** Watermark late-data discipline proven on gate data (r12): the
    * roundtrips above feed drops in time order, so nothing ever arrives
    * late — here the feed's ENTIRE first half arrives LAST, weeks behind
    * the watermark, and the engine must drop every row of it: the
    * maintained hourly aggregate equals the on-time-half-only truth (any
    * late row leaking into a count hash-mismatches the oracle), closed
    * per the same watermark-emission rule as `stream_hourly_roundtrip`.
    * The on-time half lands as TWO time-ordered drops first, because of
    * Spark's two-watermark design (probed empirically —
    * `tools/WmProbe`): a batch filters late events against the PREVIOUS
    * batch's watermark and evicts/emits against the current one, so the
    * watermark that drops the late file must have been established one
    * batch before it arrives. This is the state-bound contract that makes
    * streaming aggregation viable at 100 TB — state is the late-arrival
    * window, not the feed. */
  private def streamLateDataRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val r = ev.agg(min("ts"), max("ts")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val mid2 = mid + (r.getLong(1) - mid) / 2
    val base = java.nio.file.Files.createTempDirectory("graft_stream_late_").toString
    // third quarter, then fourth (carrying the max — the watermark stands
    // at max − 1h from batch 2 on) ...
    ev.filter(col("ts") > mid && col("ts") <= mid2)
      .coalesce(1).write.parquet(s"$base/drops/a")
    ev.filter(col("ts") > mid2).coalesce(1).write.parquet(s"$base/drops/b")
    // ... then the whole first half arrives entirely behind it
    ev.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$base/drops/c")
    val query = streamingHourlyAgg(s, s"$base/drops/*", maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_late_data_roundtrip did not finish within 300 s; output log is partial")
    }
    s.read.parquet(s"$base/out")
  }

  /** Streaming trending top-k (r11) — "what's hot this hour" in the
    * production serving shape: the STREAM maintains only the per-(hour,
    * type) counts ([[streamingHourlyAgg]], append mode, watermark closure),
    * and the trending question — each closed hour's top-3 event types — is
    * answered at READ time by ranking the maintained aggregate, a frame of
    * |hours|·|types| rows that never touches raw events. Splitting the rank
    * out of the stream is the point: chained stateful aggregations inside
    * one streaming query are unsupported/fragile, and the serving-side rank
    * re-evaluates correctly however late the read happens. */
  private def streamTrendingRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val stored = streamHourlyRoundtrip(s, dir)
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("hour").orderBy(col("n_events").desc, col("event_type"))
    stored.withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= 3)
      .select(col("hour"), col("rank"), col("event_type"), col("n_events"))
  }

  /** Streaming form of the NATIVE session window (r11) — the claim behind
    * [[sessionsNativeWindow]] made real: the same `session_window` call
    * under a watermark, per-user session rows (bounds + event count)
    * emitted in append mode once the watermark passes the session's end.
    * State is engine-managed (merge-on-arrival, eviction at watermark) —
    * the alternative to [[sessionize]]'s hand-rolled
    * `flatMapGroupsWithState` state machine, compared head-to-head by
    * their roundtrip oracles. */
  def streamingSessionWindow(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    streamSource(spark, eventsDir, maxFilesPerTrigger)
      .select(col("user_id"), expr("timestamp_micros(ts)").as("t"))
      .withWatermark("t", "1 hour")
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_ts"),
        expr("unix_micros(session_window.end)").as("end_gap_ts"),
        col("n_events"))

  /** Roundtrip for [[streamingSessionWindow]]: time-ordered two-drop
    * ingestion, one-file micro-batches; the emitted set must be exactly
    * the sessions whose window END (last event + gap) is at or before the
    * final watermark `max(t) − 1 h` — each exactly once with its full
    * batch-equal bounds and count. The oracle replays gap sessionization
    * plus that closure predicate. */
  private def streamSessionWindowRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val r = ev.agg(min("ts"), max("ts")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val base = java.nio.file.Files.createTempDirectory("graft_stream_swin_").toString
    ev.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$base/drops/a")
    ev.filter(col("ts") > mid).coalesce(1).write.parquet(s"$base/drops/b")
    val query = streamingSessionWindow(s, s"$base/drops/*", maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_session_window_roundtrip did not finish within 300 s; output log is partial")
    }
    s.read.parquet(s"$base/out")
  }

  /** Correctness roundtrip for the stateful [[sessionize]] path (the last
    * streaming surface without an oracle row): the events feed split into
    * two TIME-ORDERED drops at the ts midpoint, one-file micro-batches, so
    * sessions spanning the split are closed by the SECOND batch out of the
    * state store — the emitted set equals a single time-ordered pass. The
    * oracle computes gap-based sessions per user and excludes each user's
    * last session (still open in the state store, never emitted under
    * NoTimeout — exactly the operator's contract). Both engines sessionize
    * the same µs instants: the normalized feed IS µs, and DuckDB's
    * `epoch_us` over the timestamp column yields the identical values. */
  private def streamSessionizeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select(col("user_id"), col("ts"))
    val r = ev.agg(min("ts"), max("ts")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sess_").toString
    ev.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$base/drops/a")
    ev.filter(col("ts") > mid).coalesce(1).write.parquet(s"$base/drops/b")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType)))
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$base/drops/*").as[SessionEvent]
    val query = sessionize(stream, gapMinutes = 30)
      .toDF().writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000L)) {
      query.stop()
      throw new IllegalStateException(
        "stream_sessionize_roundtrip did not finish within 300 s; output log is partial")
    }
    s.read.parquet(s"$base/out")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("events_hourly", (s, d) => hourlyAgg(events(s, d)), Some(oq("""
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1, 2"""))),

    QueryDef("events_daily_users", (s, d) => dailyUsers(events(s, d)), Some(oq("""
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(DISTINCT user_id) AS n_users, count(*) AS n_events
      FROM events GROUP BY 1"""))),

    QueryDef("events_hourly_anomalies", (s, d) => hourlyAnomalies(events(s, d)), Some(oq("""
      , ahourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS x
          FROM events GROUP BY 1, 2),
      astats AS (
          SELECT event_type, count(*) AS n, sum(x) AS s, sum(x * x) AS ssq
          FROM ahourly GROUP BY 1)
      SELECT h.event_type, h.hour, h.x AS n_events,
             round((h.x * t.n - t.s) / t.n / sqrt((t.n * t.ssq - t.s * t.s) / (t.n * (t.n - 1))), 6) AS z,
             abs(round((h.x * t.n - t.s) / t.n / sqrt((t.n * t.ssq - t.s * t.s) / (t.n * (t.n - 1))), 6)) > 3.0 AS is_anomaly
      FROM ahourly h JOIN astats t ON h.event_type = t.event_type
      WHERE t.n > 1 AND t.n * t.ssq - t.s * t.s > 0"""))),

    // robust (median/MAD) variant: DuckDB's quantile_cont and Spark's
    // percentile are the same type-7 interpolation, and every intermediate
    // is a .25-step value — exactly representable, so round(…,6) agrees
    QueryDef("events_hourly_anomalies_mad",
      (s, d) => hourlyAnomaliesMad(events(s, d)), Some(oq("""
      , mhourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS x
          FROM events GROUP BY 1, 2),
      mmed AS (SELECT event_type, quantile_cont(x, 0.5) AS med FROM mhourly GROUP BY 1),
      mdev AS (SELECT h.event_type, h.hour, h.x, m.med, abs(h.x - m.med) AS dev
               FROM mhourly h JOIN mmed m ON h.event_type = m.event_type),
      mmad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM mdev GROUP BY 1)
      SELECT d.event_type, d.hour, d.x AS n_events,
             round(0.6745 * (d.x - d.med) / t.mad, 6) AS robust_z,
             abs(round(0.6745 * (d.x - d.med) / t.mad, 6)) > 3.5 AS is_anomaly
      FROM mdev d JOIN mmad t ON d.event_type = t.event_type
      WHERE t.mad > 0"""))),

    QueryDef("events_session_facts", (s, d) => sessionFacts(events(s, d)), Some(oq("""
      , sflag2 AS (
          SELECT user_id, event_id, ts, event_type, value,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM events),
      sgrp2 AS (
          SELECT user_id, ts, event_type, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM sflag2)
      SELECT user_id, CAST(sid AS BIGINT) AS sid,
             CAST(min(ts) AS TIMESTAMP) AS start_t,
             CAST(max(ts) AS TIMESTAMP) AS end_t,
             count(*) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS purchase_cents
      FROM sgrp2 GROUP BY user_id, sid"""))),

    QueryDef("events_retention_d7", (s, d) => retentionD7(events(s, d)), Some(oq("""
      , udays AS (
          SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
          FROM events),
      ucohort AS (SELECT user_id, min(day) AS cohort_day FROM udays GROUP BY user_id)
      SELECT c.cohort_day, count(*) AS n_users,
             count(r.user_id) AS n_retained_d7
      FROM ucohort c
      LEFT JOIN udays r ON r.user_id = c.user_id AND r.day = c.cohort_day + 7
      GROUP BY 1"""))),

    QueryDef("events_type_stats", (s, d) => typeStats(events(s, d)), Some(oq("""
      SELECT event_type, count(*) AS n_events,
             min(value) AS min_value, max(value) AS max_value,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_value
      FROM events GROUP BY event_type"""))),

    QueryDef("events_asof_last_error", (s, d) => asofLastError(events(s, d)), Some(oq("""
      , w AS (
          SELECT event_id, user_id, event_type, ts,
                 max(CASE WHEN event_type = 'error' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS err_ts
          FROM events)
      SELECT event_id, user_id, event_type,
             CAST(ts AS TIMESTAMP) AS t,
             CAST(err_ts AS TIMESTAMP) AS last_error_t,
             epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(err_ts AS TIMESTAMP)) AS us_since_error
      FROM w"""))),

    QueryDef("events_attribution", (s, d) => attribution(events(s, d)), Some(oq("""
      SELECT p.event_id AS purchase_id, p.user_id,
             CAST(p.ts AS TIMESTAMP) AS t,
             count(c.ts) AS n_clicks_30m,
             CAST(max(c.ts) AS TIMESTAMP) AS last_click_t
      FROM events p
      LEFT JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts > p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts
      WHERE p.event_type = 'purchase'
      GROUP BY 1, 2, 3"""))),

    QueryDef("events_asof_join_click", (s, d) => asofLastClick(events(s, d)), Some(oq("""
      SELECT p.event_id AS purchase_id, p.user_id,
             CAST(p.ts AS TIMESTAMP) AS t,
             CAST(c.ts AS TIMESTAMP) AS last_click_t,
             c.value AS last_click_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
                      WHERE event_type = 'click' GROUP BY user_id, ts) c
        ON p.user_id = c.user_id AND c.ts < p.ts"""))),

    // exact-cents multi-touch split: the oracle replays the integer
    // division + remainder-to-earliest rule, so a lost cent, a float
    // share, or a different remainder placement hash-mismatches
    QueryDef("events_attribution_linear",
      (s, d) => attributionLinear(events(s, d)), Some(oq("""
      , lpur AS (SELECT event_id AS purchase_id, user_id, ts AS p_t,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events WHERE event_type = 'purchase'),
      lclk AS (SELECT DISTINCT user_id AS c_user, ts AS c_t
               FROM events WHERE event_type = 'click'),
      lj AS (SELECT p.purchase_id, p.user_id, p.p_t, p.cents, c.c_t
             FROM lpur p LEFT JOIN lclk c
               ON p.user_id = c.c_user
              AND c.c_t > p.p_t - INTERVAL '30 minutes' AND c.c_t <= p.p_t),
      lr AS (SELECT *, count(c_t) OVER (PARTITION BY purchase_id) AS n,
                    row_number() OVER (PARTITION BY purchase_id ORDER BY c_t ASC) AS k
             FROM lj)
      SELECT purchase_id, user_id, p_t AS t, c_t AS click_t,
             CAST(CASE WHEN n = 0 THEN cents
                       ELSE cents // n + (CASE WHEN k <= cents % n THEN 1 ELSE 0 END)
                  END AS BIGINT) AS attributed_cents
      FROM lr"""))),

    // Exact heavy-hitter detection (graft.perf.Skew.heavyKeys): the oracle
    // is the plain HAVING-over-groupBy truth — the pigeonhole prefilter +
    // verify pipeline must reproduce it exactly (the bloom-join equivalence
    // discipline); threshold is scale-free (>120% of the mean per-user
    // count) so the row bites at every SF
    // skew DIAGNOSIS beside the heavy-key DETECTION below: the one-row
    // distribution report (top-1 share, p50/p99, exact-integer Gini) that
    // decides whether mitigation is needed at all
    QueryDef("events_key_skew_report",
      (s, d) => graft.perf.Skew.skewReport(events(s, d), "user_id"), Some(oq("""
      , skc AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
      skr AS (SELECT *, row_number() OVER (ORDER BY c, user_id) AS i FROM skc),
      ska AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total_rows,
                     CAST(max(c) AS BIGINT) AS max_count,
                     round(quantile_cont(c, 0.5), 6) AS p50_count,
                     round(quantile_cont(c, 0.99), 6) AS p99_count,
                     CAST(sum(2 * i * c) AS BIGINT) AS s2
              FROM skr)
      SELECT n_keys, total_rows, max_count,
             CAST(max_count AS DOUBLE) / total_rows AS top1_share,
             p50_count, p99_count,
             CAST(s2 - (n_keys + 1) * total_rows AS DOUBLE) / (n_keys * total_rows) AS gini
      FROM ska"""))),

    QueryDef("events_heavy_users",
      (s, d) => graft.perf.Skew.heavyKeys(events(s, d), "user_id"), Some(oq("""
      , htot AS (SELECT count(*) AS total, count(DISTINCT user_id) AS nkeys
                 FROM events)
      SELECT user_id, count(*) AS n_events
      FROM events, htot
      GROUP BY user_id, total, nkeys
      HAVING 100 * count(*) * nkeys > 120 * total"""))),

    // Report→mitigation closed loop (r12): a PLANTED 80%-hot key (every
    // user_id ending 0-7 collapses onto key 0) must flip the auto-salting
    // decision — the require turns a silent decision regression into a RED
    // row — and the salted two-phase aggregate must equal the plain
    // group-by truth the oracle computes.
    QueryDef("events_auto_salted_sum",
      (s, d) => {
        val planted = events(s, d).select(
          when(col("user_id") % 10 < 8, lit(0L)).otherwise(col("user_id"))
            .as("hot_key"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val auto = graft.perf.Skew.autoSaltedSum(planted, Seq("hot_key"), "cents")
        require(auto.salted,
          f"planted 80%% skew must trigger salting (top1=${auto.top1Share}%.3f)")
        auto.result
      }, Some(oq("""
      , asf AS (SELECT CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id END AS hot_key,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
      SELECT hot_key, CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM asf GROUP BY hot_key"""))),

    QueryDef("events_interval_overlap", (s, d) => incidentActivityOverlap(events(s, d)), Some(oq("""
      , ierr AS (SELECT event_id AS error_id, epoch_us(ts) AS e_lo,
                        epoch_us(ts) + 600000000 AS e_hi
                 FROM events WHERE event_type = 'error'),
      ipur AS (SELECT event_id AS purchase_id, epoch_us(ts) - 300000000 AS p_lo,
                      epoch_us(ts) + 300000000 AS p_hi
               FROM events WHERE event_type = 'purchase')
      SELECT e.error_id, p.purchase_id,
             least(e.e_hi, p.p_hi) - greatest(e.e_lo, p.p_lo) AS overlap_us
      FROM ierr e JOIN ipur p ON e.e_lo < p.p_hi AND p.p_lo < e.e_hi"""))),

    QueryDef("events_range_join_incidents", (s, d) => purchasesInErrorWindows(events(s, d)), Some(oq("""
      SELECT p.event_id AS purchase_id, count(*) AS n_active_incidents
      FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT ts AS lo, ts + INTERVAL '10 minutes' AS hi
            FROM events WHERE event_type = 'error') i
        ON p.ts >= i.lo AND p.ts < i.hi
      GROUP BY 1"""))),

    // the oracle resolves nearest per purchase by (distance, earlier-ts) —
    // the same tie rule the operator's prev-on-tie implements
    QueryDef("events_nearest_error",
      (s, d) => nearestError(events(s, d)), Some(oq("""
      , npur AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      nsel AS (
        SELECT p.event_id, p.user_id, p.ts AS t,
          (SELECT e.ts FROM events e
           WHERE e.user_id = p.user_id AND e.event_type = 'error'
             AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 21600000000
           ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)), e.ts LIMIT 1) AS nearest_error_t
        FROM npur p)
      SELECT event_id, user_id, t, nearest_error_t,
             CASE WHEN nearest_error_t IS NOT NULL
                  THEN abs(epoch_us(nearest_error_t) - epoch_us(t)) END AS delta_us
      FROM nsel"""))),

    QueryDef("events_funnel_windowed",
      (s, d) => funnelWindowed(events(s, d)), Some(oq("""
      , fw1 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS v_ts
          FROM events),
      fw2 AS (
          SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts
                              AND ts <= v_ts + INTERVAL '48 hours' THEN ts END)
                      OVER (PARTITION BY user_id) AS c_ts
          FROM fw1),
      fw3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts
                              AND ts <= c_ts + INTERVAL '48 hours' THEN ts END)
                      OVER (PARTITION BY user_id) AS p_ts
          FROM fw2),
      fpu AS (SELECT user_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
              FROM fw3 GROUP BY user_id)
      SELECT count(*) AS n_users,
             count(v_ts) AS viewed,
             count(c_ts) AS clicked_in_window,
             count(p_ts) AS purchased_in_window,
             CAST(count(c_ts) AS DOUBLE) / count(v_ts) AS view_to_click,
             CAST(count(p_ts) AS DOUBLE) / count(c_ts) AS click_to_purchase
      FROM fpu"""))),

    QueryDef("events_funnel", (s, d) => funnel(events(s, d)), Some(oq("""
      , w1 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS v_ts
          FROM events),
      w2 AS (
          SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
                      OVER (PARTITION BY user_id) AS c_ts
          FROM w1),
      w3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
                      OVER (PARTITION BY user_id) AS p_ts
          FROM w2),
      pu AS (SELECT user_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
             FROM w3 GROUP BY user_id)
      SELECT count(*) AS n_users,
             count(v_ts) AS viewed,
             count(c_ts) AS clicked_after_view,
             count(p_ts) AS purchased_after_funnel,
             CAST(count(c_ts) AS DOUBLE) / count(v_ts) AS view_to_click,
             CAST(count(p_ts) AS DOUBLE) / count(c_ts) AS click_to_purchase
      FROM pu"""))),

    QueryDef("events_json_props", (s, d) => propsBuckets(events(s, d)), Some(oq("""
      , parsed AS (
          SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k, value
          FROM events)
      SELECT k % 10 AS k_bucket, count(*) AS n_events, max(k) AS max_k,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM parsed GROUP BY 1"""))),

    QueryDef("events_sessions", (s, d) => sessions(events(s, d)), Some(oq("""
      , flagged AS (
          SELECT user_id,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM events)
      SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
      FROM flagged GROUP BY user_id"""))),

    QueryDef("events_sessions_native",
      (s, d) => sessionsNativeWindow(events(s, d)), Some(oq("""
      , nflag AS (
          SELECT user_id,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM events)
      SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
      FROM nflag GROUP BY user_id"""))),

    // Streaming dedup roundtrip (VERDICT r8 #4): drop B redelivers half of
    // drop A as exact copies; the oracle is the plain one-row-per-event
    // select — any redelivered row surviving the cross-batch state would
    // break the row-count/hash match.
    QueryDef("stream_dedup_roundtrip", streamDedupRoundtrip, Some(oq("""
      SELECT event_id, CAST(ts AS TIMESTAMP) AS t, user_id, event_type, value
      FROM events WHERE event_id % 4 IN (1, 3)"""))),

    // Heap-aggregate top-k: the oracle is the window idiom it replaces —
    // identical output proves the aggregate IS the window semantics
    QueryDef("events_topk_users", (s, d) => topkUsersBySpend(events(s, d)), Some(oq("""
      SELECT event_type, CAST(rn AS BIGINT) AS rank, user_id, value_cents
      FROM (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
               row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC, user_id) AS rn
        FROM events GROUP BY event_type, user_id)
      WHERE rn <= 5"""))),

    // Append-mode windowed-agg roundtrip: only watermark-closed windows
    // (window end at or before max event time minus the 1 h delay) may
    // appear, each exactly once with its full batch-equal aggregate.
    // the inverted-drop watermark gate: the oracle aggregates ONLY the
    // on-time (second) half under the same emission rule — a late row
    // surviving into any count, or a window leaking open, hash-mismatches
    QueryDef("stream_late_data_roundtrip", streamLateDataRoundtrip, Some(oq("""
      , lev AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(ts AS TIMESTAMP) AS t
          FROM events),
      lmid AS (SELECT min(epoch_us(t)) + (max(epoch_us(t)) - min(epoch_us(t))) // 2 AS m
               FROM lev),
      lon AS (SELECT lev.* FROM lev, lmid WHERE epoch_us(t) > m),
      lwm AS (SELECT max(t) - INTERVAL 1 HOUR AS w FROM lon)
      SELECT hour, event_type, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM lon, lwm
      WHERE hour + INTERVAL 1 HOUR <= w
      GROUP BY hour, event_type"""))),

    QueryDef("stream_hourly_roundtrip", streamHourlyRoundtrip, Some(oq("""
      , hev AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(ts AS TIMESTAMP) AS t
          FROM events),
      hwm AS (SELECT max(t) - INTERVAL 1 HOUR AS w FROM hev)
      SELECT hour, event_type, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM hev, hwm
      WHERE hour + INTERVAL 1 HOUR <= w
      GROUP BY hour, event_type"""))),

    // Trending consumer over the stream-maintained hourly counts: the
    // oracle replays the watermark-closure contract, then ranks each
    // closed hour's types — a leaked open window, a lost closed one, or a
    // tie broken differently all hash-mismatch
    QueryDef("stream_trending_roundtrip", streamTrendingRoundtrip, Some(oq("""
      , tev AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 CAST(ts AS TIMESTAMP) AS t
          FROM events),
      twm AS (SELECT max(t) - INTERVAL 1 HOUR AS w FROM tev),
      tcnt AS (
          SELECT hour, event_type, count(*) AS n_events
          FROM tev, twm
          WHERE hour + INTERVAL 1 HOUR <= w
          GROUP BY hour, event_type),
      trank AS (
          SELECT hour, event_type, n_events,
                 row_number() OVER (PARTITION BY hour
                                    ORDER BY n_events DESC, event_type) AS rank
          FROM tcnt)
      SELECT hour, CAST(rank AS INT) AS rank, event_type, n_events
      FROM trank WHERE rank <= 3"""))),

    // Native-session-window streaming roundtrip: only sessions whose end
    // (last event + gap) has been passed by the final watermark may
    // appear, exactly once, with batch-equal bounds — cross-batch session
    // MERGING in the engine-managed state is the behavior under test
    QueryDef("stream_session_window_roundtrip", streamSessionWindowRoundtrip, Some(oq("""
      , swb AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
      swf AS (SELECT user_id, tsu,
                     CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
                           OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                              > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM swb),
      swg AS (SELECT user_id, tsu,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM swf),
      sws AS (SELECT user_id, min(tsu) AS start_ts,
                     max(tsu) + 1800000000 AS end_gap_ts, count(*) AS n_events
              FROM swg GROUP BY user_id, sid),
      swm AS (SELECT max(tsu) - 3600000000 AS wm FROM swb)
      SELECT s.user_id, s.start_ts, s.end_gap_ts, CAST(s.n_events AS BIGINT) AS n_events
      FROM sws s, swm WHERE s.end_gap_ts <= swm.wm"""))),

    // Stateful sessionizer roundtrip: closed sessions only — each user's
    // LAST session stays open in the state store and must not appear.
    // Session bounds are µs epoch longs on both sides (the ingestion
    // contract's unit; DuckDB's epoch_us over the µs timestamps matches).
    QueryDef("stream_sessionize_roundtrip", streamSessionizeRoundtrip, Some(oq("""
      , sbase AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
      sflag AS (
          SELECT user_id, tsu,
                 CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
                       OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                          > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM sbase),
      sgrp AS (
          SELECT user_id, tsu,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM sflag),
      sess AS (
          SELECT user_id, sid, min(tsu) AS start_ts, max(tsu) AS end_ts,
                 count(*) AS n_events
          FROM sgrp GROUP BY user_id, sid),
      lastsid AS (SELECT user_id, max(sid) AS last_sid FROM sess GROUP BY user_id)
      SELECT s.user_id, s.start_ts, s.end_ts, CAST(s.n_events AS BIGINT) AS n_events
      FROM sess s JOIN lastsid l ON s.user_id = l.user_id AND s.sid <> l.last_sid"""))))
}
