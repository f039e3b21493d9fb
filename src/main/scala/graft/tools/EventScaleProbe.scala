package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r11): measured scaling evidence for the EVENT-family
  * operators, completing the dedup (`ScaleProbe`) and embedding
  * (`EmbScaleProbe`) evidence set. A synthetic 10× corpus of the sf0.1
  * events feed — 9 user-shifted copies beside the original, so the USER
  * count grows 10× while each user's per-key event mass (the windowed
  * operators' unit of work) stays constant — is run through the
  * sessionizer, the as-of join, attribution, the interval-overlap join,
  * and the heavy-hitter pipeline at 1× and 10×. The scale claim under
  * test: every one of these shuffles on `user_id` (or the time bucket)
  * once and does per-key linear work, so wall time must grow at or below
  * linear-in-rows — never with users², and never toward all-pairs in the
  * keyless overlap join. Not part of the shipped library. */
object EventScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val base = graft.streaming.EventOps.events(spark, dir)
    // 10x: user-shifted copies (event ids re-keyed past the domain); ts
    // unchanged so per-user temporal density — the per-key work unit —
    // is identical across scales
    val x10 = (0 until 10).map { k =>
      base.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
    val mats = Seq("x1" -> base, "x10" -> x10).map { case (tag, df) =>
      val p = java.nio.file.Files.createTempDirectory(s"graft_evscale_$tag").toString
      df.write.parquet(s"$p/events"); tag -> spark.read.parquet(s"$p/events")
    }

    def t(label: String, tag: String)(f: => DataFrame): Double = {
      noop(f)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[evscale] $label%-24s $tag%-4s min ${times.min}%7.3f s")
      times.min
    }

    Seq[(String, DataFrame => DataFrame)](
      ("events_sessions", graft.streaming.EventOps.sessions),
      ("events_asof_join", graft.streaming.EventOps.asofLastClick),
      ("events_attribution", graft.streaming.EventOps.attribution),
      ("events_interval_overlap", graft.streaming.EventOps.incidentActivityOverlap),
      ("events_heavy_users", df => graft.perf.Skew.heavyKeys(df, "user_id"))
    ).foreach { case (label, op) =>
      val times = mats.map { case (tag, df) => t(label, tag)(op(df)) }
      println(f"[evscale] $label%-24s growth ${times(1) / times(0)}%5.2fx for 10x rows")
    }
    spark.stop()
  }
}
