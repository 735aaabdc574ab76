package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing here is real — schemas, encoders, mapPartitions
  * batching, deterministic outputs — while the codec math is a clearly-marked
  * STUB (`stubDecode`): this environment has no image/audio libraries, so the
  * "decoder" derives deterministic pseudo-metadata from the bytes. Swapping in
  * a real decoder changes only the body of `stubDecode`; every schema,
  * partition shape and operator contract stays.
  *
  * Scale design: decode/feature-extract runs inside `mapPartitions` — one
  * JVM-side pass per partition, no per-row closure setup, no driver
  * involvement, no shuffle. At 100 TB the operator is embarrassingly parallel
  * and bounded by scan bandwidth.
  */
object Multimodal {

  /** A media object: id + modality tag + raw payload. */
  final case class Media(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata + a fixed-width feature vector. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** STUB decoder — deterministic pseudo-decode standing in for an actual
    * image/audio codec (none available in this container). Derives stable
    * "dimensions" and a feature sketch from ONE pass over the payload bytes
    * (no per-feature copies of the content). */
  private[operators] def stubDecode(m: Media, featureDim: Int): MediaFeatures = {
    val h = graft.functions.SimHash64.fnv1a(m.content)
    val width = 16 + (java.lang.Long.remainderUnsigned(h, 1024L)).toInt
    val height = 16 + (java.lang.Long.remainderUnsigned(h >>> 10, 1024L)).toInt
    val frames = m.kind match {
      case "video" => 1 + (java.lang.Long.remainderUnsigned(h >>> 20, 240L)).toInt
      case _ => 1
    }
    val feats = Array.tabulate(featureDim) { i =>
      // continue the FNV chain per feature index instead of re-hashing content
      val hi = (h ^ (i + 1).toLong) * 1099511628211L
      (hi.toDouble / Long.MaxValue).toFloat
    }
    MediaFeatures(m.media_id, m.kind, m.content.length.toLong, width, height, frames, feats)
  }

  /** Batch decode + feature extraction over a typed media dataset. */
  def extractFeatures(media: Dataset[Media], featureDim: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode(_, featureDim)))
  }

  /** STUB resize: maps each payload to a target-dimension record plus a
    * deterministic downsampled byte sketch (every len/targetBytes-th byte) —
    * a real codec would decode + interpolate; the partition-parallel shape,
    * schema, and determinism contract are what this pins. */
  def resize(media: Dataset[Media], targetW: Int, targetH: Int,
             targetBytes: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val len = m.content.length
      val sketch =
        if (len == 0) Array.empty[Byte]
        else Array.tabulate(math.min(targetBytes, len)) { i =>
          m.content(((len.toLong * i) / math.min(targetBytes, len)).toInt)
        }
      val h = graft.functions.SimHash64.fnv1a(sketch) // one hash per record
      val feats = Array.tabulate(4) { i =>
        (((h ^ (i + 1).toLong) * 1099511628211L).toDouble / Long.MaxValue).toFloat
      }
      MediaFeatures(m.media_id, m.kind, len.toLong, targetW, targetH, 1, feats)
    })
  }

  /** Frame sampling for video-like payloads: n evenly-spaced fixed-size byte
    * windows per payload (a real implementation would seek keyframes; the
    * batching/explode plumbing is identical). */
  def sampleFrames(media: Dataset[Media], n: Int, frameBytes: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = m.content.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = ((len.toLong * i) / n).toInt.min(math.max(0, len - frameBytes))
        (m.media_id, i, m.content.slice(off, math.min(len, off + frameBytes)))
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Wrap any (id, string) table as opaque media payloads — how tests and the
    * correctness gate mint binary columns from the driver's documents table. */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String,
               textCol: String, kind: String): Dataset[Media] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        col(textCol).cast("binary").as("content"))
      .as[Media]
  }
}
