import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft — a Spark-native (Scala) analytics engine with the capability surface
  * of the reference e-commerce data-warehouse workload (see SURVEY.md).
  *
  * Shared expression helpers. Cleaning expressions are deliberately written as
  * SQL fragments (via `expr`) whose text is letter-for-letter equivalent to the
  * DuckDB oracle SQL in [[graft.oracle.OracleSql]], so both engines apply
  * identical semantics to the same dirty staging inputs.
  */
package object graft {

  /** Case-normalization used by the reference's INITCAP cleaning
    * (`Iteration 1/Group No.6_ETL.sql:88-89,120-122`). Spark's `initcap` has no
    * DuckDB equivalent, so the engine standardizes on a first-letter-upcase
    * variant expressible identically in both engines (documented deviation,
    * SURVEY.md §7). Empty strings become NULL (reference `NULLIF(x,'')`).
    */
  def initcapLite(c: String): Column = expr(
    s"concat(upper(substr(nullif(trim($c),''),1,1)), lower(substr(nullif(trim($c),''),2)))")

  /** Strip currency symbols / junk and parse to an exact decimal; NULL when
    * nothing numeric remains (reference `REGEXP_REPLACE(x,'[^0-9\.\-]','','g')`
    * + cast, `Iteration 1/Group No.6_ETL.sql:124-127,168-173`). try_cast keeps
    * the pipeline safe under Spark 4's default ANSI mode.
    *
    * The cast tries the trimmed string directly first and only falls back to
    * the regex strip when that fails — strictly equivalent (a castable string
    * is untouched by the strip; an uncastable one takes the old path), and it
    * skips the per-row regex for the clean majority of values. */
  def numClean(c: String, sqlType: String): Column = expr(
    s"""coalesce(
          try_cast(trim($c) AS $sqlType),
          try_cast(nullif(regexp_replace(trim($c), '[^0-9.-]', ''), '') AS $sqlType))""")

  /** Strict `YYYY-MM-DD` validation then parse, else NULL (reference
    * `Iteration 1/Group No.6_ETL.sql:90-94`). */
  def strictDate(c: String): Column = expr(
    s"CASE WHEN trim($c) RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2}$$' THEN try_cast(trim($c) AS DATE) ELSE NULL END")

  /** Dual-format timestamp parse: `YYYY-MM-DD HH:MM:SS` then `DD/MM/YYYY
    * HH:MM:SS`, else NULL (reference CASE parser,
    * `Iteration 1/Group No.6_ETL.sql:161-167`).
    *
    * Dispatches on the separator at position 5 instead of the oracle's
    * coalesce(try, try): a failed `try_to_timestamp` attempt costs a thrown
    * exception per row, which dominated the staging parse. Equivalent on any
    * string either format can parse (an ISO-parseable string always has `-`
    * at 5, a DD/MM one never does); garbage yields NULL on both paths. */
  def dualTimestamp(c: String): Column = expr(
    s"""CASE WHEN substr(trim($c), 5, 1) = '-'
             THEN try_to_timestamp(trim($c), 'yyyy-MM-dd HH:mm:ss')
             ELSE try_to_timestamp(trim($c), 'dd/MM/yyyy HH:mm:ss') END""")

  /** Non-empty-string predicate `COALESCE(TRIM(c),'') <> ''` (reference
    * `Iteration 1/Group No.6_ETL.sql:105,129,193-194`). */
  def nonBlank(c: String): Column = coalesce(trim(col(c)), lit("")) =!= ""

  /** The reference's smart date key `TO_CHAR(ts,'YYYYMMDDHH24MISS')::BIGINT`
    * (`Iteration 1/Group No.6_ETL.sql:231`), computed arithmetically from the
    * datetime fields — the same BIGINT the format-then-cast round-trip
    * produces, without a per-row formatter (which was a top cost of the fact
    * load at sf0.1). NULL ts propagates to a NULL key, as before. */
  def smartDateKey(ts: Column): Column =
    (year(ts).cast("long") * 10000000000L + month(ts) * 100000000L +
      dayofmonth(ts) * 1000000L + hour(ts) * 10000L + minute(ts) * 100L + second(ts))
      .cast("long")

  /** Year component of a smart date key — the fact partitioning column
    * (one definition so every write site shares the scheme; keys are always
    * positive, so truncation and floor agree). */
  def yearOfDateKey(dateKey: Column): Column =
    floor(dateKey / 10000000000L).cast("int")

  /** The fact-load fallback key for unparseable timestamps (reference
    * `19700101000000`, `Iteration 1/Group No.6_ETL.sql:337`). Queries that
    * decode dates from the key arithmetically must treat it as "no date" —
    * exactly what a `dim_date` join yields (the fallback key has no dim row). */
  val FallbackDateKey = 19700101000000L

  /** Month component (1-12) of a smart date key. */
  def monthNumOfDateKey(dateKey: Column): Column =
    ((dateKey % 10000000000L) / 100000000L).cast("int")

  /** Calendar date encoded in a smart date key's top 8 digits.
    *
    * The smart key is a *covering* encoding: any query needing only
    * date parts can decode them arithmetically instead of joining
    * `dim_date` — at scale that deletes a fact⋈dim shuffle per query, and a
    * `full_date` range predicate becomes a `date_key` range that reaches the
    * parquet scan (row-group skipping on the date-sorted fact files).
    * Equivalent to the join for every key the engine writes: non-fallback
    * keys all appear in `dim_date` (the date domain is built from the same
    * timestamps), and the fallback key decodes to NULL here just as the
    * missing dim row does. */
  def dateOfDateKey(dateKey: Column): Column =
    when(dateKey =!= FallbackDateKey,
      make_date(yearOfDateKey(dateKey), monthNumOfDateKey(dateKey),
        ((dateKey % 100000000L) / 1000000L).cast("int")))

  /** First-of-month date of a smart date key (NULL for the fallback key) —
    * the arithmetic form of `trunc(full_date, 'month')` after a dim_date
    * join. */
  def monthOfDateKey(dateKey: Column): Column =
    when(dateKey =!= FallbackDateKey,
      make_date(yearOfDateKey(dateKey), monthNumOfDateKey(dateKey), lit(1)))

  /** The inclusive `date_key` interval covering calendar dates `[lo, hi]` —
    * the pushdown form of a `full_date BETWEEN lo AND hi` filter (P6/J5):
    * a plain scan-level range on the sort/partition column, no dim join.
    * The explicit `=!= FallbackDateKey` conjunct keeps the dim_date-join
    * semantics (the fallback key has no dim row) even for ranges spanning
    * 1970-01-01 — for modern ranges it is a single always-true long compare
    * on rows that already passed the range. */
  def dateKeyRange(lo: java.time.LocalDate, hi: java.time.LocalDate): Column = {
    def k(d: java.time.LocalDate): Long =
      d.getYear * 10000000000L + d.getMonthValue * 100000000L + d.getDayOfMonth * 1000000L
    col("date_key").between(k(lo), k(hi) + 235959L) && col("date_key") =!= FallbackDateKey
  }

  /** DAX DIVIDE: null-safe division (Iteration 4 measures 3-7). */
  def safeDiv(num: Column, den: Column): Column =
    when(den.isNotNull && den =!= 0, num / den)

  /** Portable 2dp rounding of a double ratio. Always `round(x*100)/100`,
    * never `round(x, 2)`: the engines implement scaled rounding differently
    * and diverge by a cent at .005 boundaries. Stays DOUBLE — see [[moneyOut]]. */
  def money2(c: Column): Column =
    round(c.cast("double") * 100) / 100

  /** Final projection for a compared money column: exact decimal cents in,
    * DOUBLE out. Compared outputs never carry DECIMAL columns — the
    * correctness gate renders the oracle side through pandas, which turns
    * DECIMAL into float64 (dropping trailing zeros), while a parquet DECIMAL
    * keeps its scale; emitting DOUBLE on both sides makes the comparison
    * representation-proof. The cents→double conversion is correctly rounded
    * and bit-identical across engines for values below 2^53 cents. */
  def moneyOut(c: Column): Column = c.cast("decimal(18,2)").cast("double")
}
