package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct, and are
  * processed by (a) codegen'd expressions over the bytes where possible and
  * (b) batched per-partition decoding where a real codec would be invoked.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked DETERMINISTIC STUB (md5-derived fake
  * dimensions / embeddings — the Spark-side schema, partitioning, and batch
  * shape are real and tested; swap `decodeStub` for a codec call to go
  * live). This mirrors the mapInPandas batch contract: `decodeBatched`
  * processes whole partitions via an iterator, one buffer at a time, never
  * materializing a partition in memory.
  */
object Multimodal {

  val MetadataType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("content_id", StringType)))

  /** Wrap a payload column in (binary, metadata) — the ingestion surface. */
  def pack(payload: Column, mediaType: String): Column =
    struct(
      payload.as("data"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(payload).cast(LongType).as("n_bytes"),
        md5(payload).as("content_id")).as("meta"))

  /** DETERMINISTIC DECODE STUB (expression form): fake image dimensions
    * derived from the content hash — replace with a codec for real media.
    */
  def decodeStubDims(data: Column): (Column, Column, Column) = {
    val h = md5(data)
    val width = lit(64) + conv(substring(h, 1, 2), 16, 10).cast(IntegerType) % 192
    val height = lit(64) + conv(substring(h, 3, 2), 16, 10).cast(IntegerType) % 192
    (width, height, lit(3))
  }

  /** Deterministic pseudo-embedding of the payload (md5-derived, mirrors
    * graft.functions.Planes coefficient construction) — stands in for a
    * model-served embedding; exactly reproducible in SQL.
    */
  def fakeEmbedding(data: Column, dim: Int): Seq[Column] = {
    val h = md5(data)
    (0 until dim).map { j =>
      (conv(substring(md5(concat(h, lit(j.toString))), 1, 8), 16, 10)
        .cast(DoubleType) / math.pow(2, 31) - 1.0).as(s"emb_$j")
    }
  }

  /** Frame sampling plan for a fixed-size frame: how many `frameBytes`-sized
    * frames a payload yields (the scheduling half of frame extraction; the
    * bytes themselves come from `substr(data, off, len)` which Spark
    * supports on binary).
    */
  def nFrames(nBytes: Column, frameBytes: Int): Column =
    floor(nBytes.cast(DoubleType) / frameBytes).cast(LongType) + 1

  /** Aspect-preserving resize plan: output dims fitting inside
    * (targetW, targetH) with the aspect ratio kept and a 1-pixel floor —
    * the scheduling half of an image resize (the pixel work itself is the
    * decode stub's job; a production deployment swaps a real resampler
    * into `decodeBatched`). Pure arithmetic on the metadata columns.
    */
  def resizeFit(w: Column, h: Column, targetW: Int, targetH: Int): (Column, Column) = {
    val scale = least(lit(targetW).cast(DoubleType) / w.cast(DoubleType),
      lit(targetH).cast(DoubleType) / h.cast(DoubleType))
    (greatest(floor(w.cast(DoubleType) * scale), lit(1.0)).cast(IntegerType),
      greatest(floor(h.cast(DoubleType) * scale), lit(1.0)).cast(IntegerType))
  }

  /** Frame sampling: materialize every `everyK`-th `frameBytes`-sized slice
    * of the payload (video-keyframe shape: the plan from `nFrames`, the
    * bytes from binary `substr` — real byte slicing, not a stub). Output
    * grain is one row per sampled frame: (id, frame_id, frame_len,
    * frame_md5). A generator + scan: zero shuffles, cardinality = payload
    * bytes / (frameBytes * everyK), linear at any corpus size. The final
    * (shorter or empty) tail frame is kept, matching `nFrames`' plan.
    */
  def sampleFrames(df: DataFrame, idCols: Seq[String], dataCol: Column,
                   frameBytes: Int, everyK: Int = 1): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be > 0")
    val ids = idCols.map(col)
    df.select(ids ++ Seq(dataCol.as("__data"),
        (nFrames(length(dataCol), frameBytes) - 1).as("__last")): _*)
      .select(ids ++ Seq(col("__data"),
        explode(sequence(lit(0L), col("__last"), lit(everyK.toLong)))
          .as("frame_id")): _*)
      .select(ids ++ Seq(col("frame_id"),
        col("__data").substr((col("frame_id") * frameBytes + 1).cast(IntegerType),
          lit(frameBytes)).as("__frame")): _*)
      .select(ids ++ Seq(col("frame_id"),
        length(col("__frame")).cast(LongType).as("frame_len"),
        md5(col("__frame")).as("frame_md5")): _*)
  }

  /** Batched per-partition decode: the mapInPandas-shaped path. Processes an
    * iterator of rows (id, bytes) one at a time — constant memory per
    * partition — computing a 16-bin byte histogram (the stand-in for a real
    * decode + feature extraction).
    */
  def decodeBatched(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_hist", ArrayType(LongType))))
    val rdd = df.select(col(idCol).cast(LongType), col(dataCol)).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
          Row(id, hist.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
