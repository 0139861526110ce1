package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque binary columns
  * with typed metadata, plus per-partition batched "decode" — the Spark
  * plumbing (schema, partitioning, batch shape) is real; the actual
  * codec is a clearly-marked deterministic stub (no image/audio libs in
  * this environment, per the brief).
  */
object Multimodal {
  /** A media row: opaque payload + typed metadata (what an
    * image/audio ingestion table looks like at scale). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Long, height: Long, channels: Long,
                         fmt: String)

  /** Decoded features (what a real decoder would emit per record). */
  case class MediaFeatures(doc_id: Long, byte_len: Long, mean_byte: Long,
                           first_byte: Long, frames: Long)

  /** Build the media table from `documents`: the text bytes stand in
    * for the media payload; metadata is deterministic. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("long").as("width"),
      ((col("doc_id") * 37) % 480).cast("long").as("height"),
      lit(3L).as("channels"),
      lit("fake/raw").as("fmt"))

  /** STUB DECODER — deterministic fake standing in for a real image/
    * audio codec. Shape matters, values don't: it consumes the binary
    * payload per record, batched per partition (the mapInPandas
    * equivalent), and emits a fixed feature schema.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long) = {
    // real impl would be: decode → resize → feature-extract
    val len = bytes.length.toLong
    val mean = if (len == 0) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)) / len
    val first = if (len == 0) 0L else (bytes(0) & 0xff).toLong
    (len, mean, first)
  }

  /** Records per decode batch (the mapInPandas batch-size analog). */
  val DecodeBatchSize = 64

  /** Batched per-partition decode: the distributed plumbing around the
    * stub. Partition count is preserved; each partition drains its
    * records in fixed-size batches — the exact shape a vectorized
    * (Arrow/pandas) decode UDF sees — with zero driver involvement. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // a real codec would decode the whole batch in one native call
          batch.iterator.map { case (id, bytes) =>
            val (len, mean, first) = decodeStub(bytes)
            MediaFeatures(id, len, mean, first, frames = len / 1000L + 1L)
          }
        }
      }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte],
                   width: Long, height: Long)

  /** Frame sampling: slice the payload into fixed-size "frames", keep
    * every `everyN`-th up to `maxFrames` — the video-frame-sample shape
    * (one input row fans out to 0..maxFrames rows; schema + fan-out are
    * real, the frame content is the stubbed byte slice). */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 100, everyN: Int = 3,
                  maxFrames: Int = 8): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Long, Long)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, w, h) =>
          bytes.grouped(frameBytes).zipWithIndex
            .filter(_._2 % everyN == 0)
            .take(maxFrames)
            .map { case (chunk, idx) => Frame(id, idx.toLong, chunk, w, h) }
        }
      }
  }

  /** Resize stub: rewrite the metadata (and, in a real codec, the
    * payload) to a target box preserving aspect ratio — metadata math
    * is real, pixel work is stubbed. */
  def resizeMeta(media: DataFrame, maxDim: Long = 224L): DataFrame = {
    import org.apache.spark.sql.functions._
    val longest = greatest(col("width"), col("height"))
    media.withColumn("out_width",
        when(longest <= maxDim, col("width"))
          .otherwise(expr(s"(width * $maxDim) div greatest(width, height)")))
      .withColumn("out_height",
        when(longest <= maxDim, col("height"))
          .otherwise(expr(s"(height * $maxDim) div greatest(width, height)")))
  }

  /** Oracle-checkable feature projection (pure native functions over
    * the binary column — octet_length/md5 are codegen'd). */
  def features(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("checksum"),
      col("width"),
      col("height"),
      (octet_length(col("payload")) % 256).cast("long").as("fake_brightness"))

  /** Cross-modal alignment audit: the text table vs the embedding
    * table, full-outer on the shared id — per (status, lang, label)
    * counts, where status says whether a row has both modalities or is
    * orphaned on one side. The check every multimodal training join
    * runs first (a silent inner join would just drop the orphans it
    * should be reporting). One hash join on the id, then a tiny
    * aggregate. */
  def modalAlign(documents: DataFrame, embeddings: DataFrame): DataFrame =
    documents.select(col("doc_id").as("d_id"), col("lang"))
      .join(embeddings.select(col("vec_id").as("e_id"),
        col("label").cast("long").as("label")),
        col("d_id") === col("e_id"), "full_outer")
      .select(
        // status keys on JOIN-KEY presence, never on payload columns —
        // a matched row with a NULL lang/label is still MATCHED
        when(col("d_id").isNotNull && col("e_id").isNotNull, "MATCHED")
          .when(col("d_id").isNotNull, "DOC_ONLY")
          .otherwise("EMB_ONLY").as("status"),
        coalesce(col("lang"), lit("-")).as("lang"),
        coalesce(col("label"), lit(-1L)).as("label"))
      .groupBy("status", "lang", "label")
      .agg(count(lit(1)).as("n"))
}
