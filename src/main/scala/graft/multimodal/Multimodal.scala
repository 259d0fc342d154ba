package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed by a batched partition-level decoder.
  *
  * The real Spark-side machinery — schema (binary + struct metadata),
  * partition-preserving batched map, typed Encoders — is implemented
  * and tested. The codec itself is STUBBED (this container has no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions from the payload hash. Swapping in a real decoder means
  * replacing only `decodeStub`'s body; the distributed plumbing (what
  * actually matters at 100 TB: batch shape, no driver collect, one
  * narrow stage) is unchanged.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte], source: String,
      n_bytes: Int)
  case class MediaMeta(doc_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, frames: Int)

  /** STUB decoder — deterministic fake dims from a payload hash.
    * A real implementation would parse the image/video container here,
    * per batch, reusing a decoder instance per partition. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 16 + math.floorMod(h, 640).toInt
    val ht = 16 + math.floorMod(h >> 16, 480).toInt
    val frames = 1 + math.floorMod(h >> 32, 32).toInt
    (w, ht, frames)
  }

  /** M1: binary ingest → batched partition decode → typed metadata.
    * `mapPartitions` is the Scala analogue of `mapInPandas`: one
    * decoder per partition, streaming batches, no per-row setup. */
  def m1MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaIn] = Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"), // stand-in media bytes
        col("source"), length(col("text")).as("n_bytes"))
      .as[MediaIn]
    media.mapPartitions { batch =>
      batch.map { m =>
        val (w, h, f) = decodeStub(m.payload)
        MediaMeta(m.doc_id, m.source, m.n_bytes, w, h, f)
      }
    }.toDF().orderBy("doc_id")
  }
}
