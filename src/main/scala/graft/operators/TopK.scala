package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKRows, expressions => ge}

/** Per-group top-k as a heap aggregate — see [[TopKRows]] for why this
  * beats the `row_number()` window at scale (map-side pruning to k pairs
  * per group per task; no full-data exchange, no discarded sort). */
object TopK {

  /** Top `k` rows of each `groupCols` group by `score` (long, descending;
    * ties broken by ascending `id`), as
    * `(groupCols*, rank, score, id)` — the exact relational shape of the
    * window idiom `row_number() OVER (PARTITION BY g ORDER BY score DESC,
    * id) <= k`. */
  def perGroup(df: DataFrame, groupCols: Seq[String], score: Column, id: Column,
               k: Int): DataFrame = {
    val agg = ge.column(
      TopKRows(ge.expression(score), ge.expression(id), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("_topk"))
      .select(groupCols.map(col) :+ posexplode(col("_topk")).as(Seq("pos", "item")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("item.score").as("score"),
        col("item.id").as("id")): _*)
  }
}
