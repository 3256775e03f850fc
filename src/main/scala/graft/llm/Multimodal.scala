package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed metadata.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub — but the Spark-side plumbing is real:
  * binary columns, a typed mapPartitions pipeline with batch iteration
  * (the Scala analogue of mapInPandas), schema propagation, and the
  * docs↔embeddings wide-row join.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, codec: String)

  /** STUB decode: deterministic fake metadata derived from payload length.
    * A real deployment replaces the arithmetic with an actual codec call;
    * the batch shape (iterate a partition, decode record-by-record,
    * emit typed rows) is exactly what a codec-backed version needs. */
  def decodeStubRecord(docId: Long, payload: Array[Byte]): MediaMeta = {
    val b = payload.length
    MediaMeta(docId,
      width = 64 + (b % 577),
      height = 64 + ((b * 7) % 417),
      n_frames = 1 + (b % 16),
      codec = (b % 3) match { case 0 => "h264"; case 1 => "vp9"; case _ => "av1" })
  }

  /** The typed pipeline: binary column in, Dataset[MediaMeta] out.
    * mapPartitions keeps per-batch setup (a real decoder context) out of
    * the per-record path — one decoder per partition, not per row. */
  def decodeStub(spark: SparkSession, binDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val decoder = Codec.open(); it.map(...decode...)
        it.map { case (id, bytes) => decodeStubRecord(id, bytes) }
      }
  }

  /** Wide multimodal rows: text metadata + embedding vector stats, 1:1 join
    * documents↔embeddings. The join key is a bare column on both sides so a
    * bucketed layout co-locates it; at fixture scale Spark broadcasts. */
  val multimodalCols: GraftQuery = GraftQuery(
    "llm_multimodal_cols",
    (s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id"))
        .select($"doc_id", $"lang", $"source", $"n_chars", $"label",
          size($"embedding").as("dim"),
          round(sqrt(aggregate(transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, v) => acc + v)), 4).as("l2_norm"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, lang, source, n_chars, label,
                   CAST(len(embedding) AS INT) AS dim,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                         x -> x * x))), 4) AS l2_norm
            FROM documents JOIN embeddings ON doc_id = vec_id
            ORDER BY doc_id""")
  )

  /** Binary-payload decode pipeline, SQL-surface form: text cast to binary
    * plays the opaque payload; metadata derived from byte length with the
    * same arithmetic as decodeStubRecord (asserted equal in MultimodalSpec).
    */
  val decodeStubQuery: GraftQuery = GraftQuery(
    "mm_decode_stub",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"text".cast("binary").as("payload"))
        .select($"doc_id",
          (lit(64) + pmod(octet_length($"payload"), lit(577))).as("width"),
          (lit(64) + pmod(octet_length($"payload") * 7, lit(417))).as("height"),
          (lit(1) + pmod(octet_length($"payload"), lit(16))).as("n_frames"),
          when(pmod(octet_length($"payload"), lit(3)) === 0, "h264")
            .when(pmod(octet_length($"payload"), lit(3)) === 1, "vp9")
            .otherwise("av1").as("codec"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
                   CAST(64 + (octet_length(encode(text)) * 7) % 417 AS INT) AS height,
                   CAST(1 + octet_length(encode(text)) % 16 AS INT) AS n_frames,
                   CASE octet_length(encode(text)) % 3
                     WHEN 0 THEN 'h264' WHEN 1 THEN 'vp9' ELSE 'av1' END AS codec
            FROM documents ORDER BY doc_id""")
  )

  /** Frame sampling: every 2nd frame index from each media payload's
    * decoded frame count, exploded to one row per sampled frame with a
    * deterministic per-frame tag (stand-in for the frame's bytes — a real
    * deployment emits the decoded frame here).
    *
    * Scale shape: generate-and-explode at the scan (no shuffle); output
    * rows ∝ Σ n_frames/stride, never a dense cross join. The stride lives
    * in one `sequence()` literal — sampling policy changes are plan-side
    * only. */
  val frameSample: GraftQuery = GraftQuery(
    "mm_frame_sample",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"text".cast("binary").as("payload"))
        .select($"doc_id",
          octet_length($"payload").as("n_bytes"),
          (lit(1) + pmod(octet_length($"payload"), lit(16))).as("n_frames"))
        .select($"doc_id", $"n_frames",
          explode(sequence(lit(0), $"n_frames" - 1, lit(2))).as("frame_idx"))
        .withColumn("frame_tag",
          pmod($"doc_id" * 31 + $"frame_idx" * 7, lit(997L)))
        .orderBy($"doc_id", $"frame_idx")
    },
    Some("""SELECT doc_id,
                   CAST(1 + octet_length(encode(text)) % 16 AS INT) AS n_frames,
                   CAST(unnest(range(0, 1 + octet_length(encode(text)) % 16, 2)) AS INT)
                     AS frame_idx,
                   (doc_id * 31 + CAST(unnest(range(0, 1 + octet_length(encode(text)) % 16, 2)) AS INT) * 7) % 997
                     AS frame_tag
            FROM documents ORDER BY doc_id, frame_idx""")
  )

  def all: Seq[GraftQuery] = Seq(multimodalCols, decodeStubQuery, frameSample)
}
