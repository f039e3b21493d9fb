package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources
import graft.{QueryDef, QueryRegistry}
import graft.oracle.OracleSql.{q => oq}

/** Multimodal-column handling: media payloads as opaque `binary` columns with
  * typed metadata, plus batch feature extraction through the engine's
  * per-partition path.
  *
  * The container has no image/audio codecs, so [[decodeFeatures]]' decoder is
  * a clearly-marked STUB producing deterministic fake features from the raw
  * bytes — the Spark-side plumbing (binary column, typed Dataset, batched
  * mapPartitions, schema of the feature frame) is real and oracle-checked.
  * At 100 TB this is the shape that matters: decode runs partition-local
  * with zero shuffle, media bytes never leave the executor that scanned them,
  * and feature frames are narrow columnar outputs.
  */
object MultimodalOps extends QueryRegistry {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, fake_width: Int, fake_height: Int, fake_frames: Int)

  /** Media table: documents' text re-typed as an opaque binary payload with
    * metadata (mime + byte length + content prefix). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        substring(hex(col("text").cast("binary")), 1, 8).as("prefix_hex")).as("meta"))

  /** STUB decoder: a real deployment decodes image/audio bytes here
    * (per-partition, batch-wise); absent codecs, features are deterministic
    * arithmetic over the byte length so the pipeline is testable end-to-end. */
  private def stubDecode(m: MediaRow): MediaFeatures = {
    val n = m.media.length
    MediaFeatures(m.doc_id, n, n % 640, n / 640 + 1, n % 30)
  }

  /** Batched per-partition feature extraction over the binary column —
    * the Scala analog of a `mapInPandas` decode stage. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode))
  }

  def mediaAsDataset(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, dir).select("doc_id", "media").as[MediaRow]
  }

  /** Frame-sampling plumbing (the video analog): every `every`-th frame
    * index of each media payload with its byte-window offset — the
    * row-explosion stage a video pipeline feeds to the batched decoder.
    * Narrow per-row `sequence` + `explode`, no shuffle; frame count and
    * geometry come from the same stub arithmetic as [[decodeFeatures]]
    * (a real deployment reads them from the container header), and the
    * decode of each sampled window stays stubbed. */
  def sampleFrames(spark: SparkSession, dir: String, every: Int = 5): DataFrame = {
    val frames = (length(col("media")) % 30).cast("long")
    val idx = when(frames > 0, sequence(lit(0L), frames - 1, lit(every.toLong)))
      .otherwise(expr("array()"))
    mediaTable(spark, dir)
      .select(col("doc_id"), length(col("media")).cast("long").as("n_bytes"),
        frames.as("n_frames"), explode(idx).as("frame_idx"))
      // integer div, not floor(/): double true-division drifts above 2^53
      // byte counts — the same hazard class RangeJoin/packSequences handle
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("n_bytes div n_frames")).cast("long")
          .as("byte_offset"))
  }

  /** Frame-level exact dedup — the keyframe dedup a video pipeline runs
    * before paying decode cost: each sampled frame's byte window hashed
    * (over its hex text, identical in both engines) and grouped, duplicate
    * windows collapsing to the smallest doc id. Narrow explode + one
    * digest-keyed aggregate — media bytes never shuffle, only digests. */
  def frameDedup(spark: SparkSession, dir: String, every: Int = 5): DataFrame = {
    val frames = (length(col("media")) % 30).cast("long")
    val idx = when(frames > 0, sequence(lit(0L), frames - 1, lit(every.toLong)))
      .otherwise(expr("array()"))
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"),
        length(col("media")).cast("long").as("n_bytes"), frames.as("n_frames"),
        explode(idx).as("frame_idx"))
      // the window slices the HEX text (2 chars/byte): DuckDB has no BLOB
      // substring, and the hex round-trip is engine-identical either way
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(
          "substring(hex(media), frame_idx * (n_bytes div n_frames) * 2 + 1, (n_bytes div n_frames) * 2)"))
          .as("frame_hash"))
      .groupBy("frame_hash")
      .agg(count(lit(1)).as("n_copies"),
        count_distinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("keep_doc_id"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("multimodal_frame_dedup", (s, d) => frameDedup(s, d), Some(oq("""
      , fgeom AS (
          SELECT doc_id, text::BLOB AS media,
                 CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
                 CAST(octet_length(text::BLOB) % 30 AS BIGINT) AS n_frames
          FROM documents),
      fwin AS (
          SELECT doc_id, f.frame_idx,
                 md5(substring(hex(media),
                   CAST(f.frame_idx * (n_bytes // n_frames) * 2 AS BIGINT) + 1,
                   CAST((n_bytes // n_frames) * 2 AS BIGINT))) AS frame_hash
          FROM fgeom, unnest(generate_series(0, n_frames - 1, 5)) AS f(frame_idx)
          WHERE n_frames > 0)
      SELECT frame_hash, count(*) AS n_copies,
             count(DISTINCT doc_id) AS n_docs,
             min(doc_id) AS keep_doc_id
      FROM fwin GROUP BY 1"""))),

    QueryDef("multimodal_meta",
      (s, d) => mediaTable(s, d).select(
        col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.prefix_hex").as("prefix_hex")),
      Some(oq("""
        SELECT doc_id, 'text/plain' AS mime,
               octet_length(text::BLOB) AS n_bytes,
               substr(hex(text::BLOB), 1, 8) AS prefix_hex
        FROM documents"""))),

    QueryDef("multimodal_frames", (s, d) => sampleFrames(s, d), Some(oq("""
      , geom AS (
          SELECT doc_id,
                 CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
                 CAST(octet_length(text::BLOB) % 30 AS BIGINT) AS n_frames
          FROM documents)
      SELECT doc_id, f.frame_idx,
             CAST(f.frame_idx * (n_bytes // n_frames) AS BIGINT) AS byte_offset
      FROM geom, unnest(generate_series(0, n_frames - 1, 5)) AS f(frame_idx)
      WHERE n_frames > 0"""))),

    QueryDef("multimodal_features",
      (s, d) => decodeFeatures(mediaAsDataset(s, d)).toDF(),
      Some(oq("""
        SELECT doc_id,
               CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
               CAST(octet_length(text::BLOB) % 640 AS INT) AS fake_width,
               CAST(octet_length(text::BLOB) // 640 + 1 AS INT) AS fake_height,
               CAST(octet_length(text::BLOB) % 30 AS INT) AS fake_frames
        FROM documents"""))))
}
