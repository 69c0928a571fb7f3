package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary slicing, resize geometry, batched decode. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sampleFrames slices exact byte windows incl. the short tail") {
    // 10-byte payload, 4-byte frames -> plan has floor(10/4)+1 = 3 frames
    // (4, 4, 2 bytes); everyK=1 keeps all three
    val df = Seq((1L, "abcdefghij")).toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("data"))
    val out = Multimodal.sampleFrames(df, Seq("id"), col("data"),
        frameBytes = 4, everyK = 1)
      .orderBy("frame_id").collect()
    assert(out.map(_.getAs[Long]("frame_len")).toSeq === Seq(4L, 4L, 2L))
    // md5 of the exact byte windows
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.map(_.getAs[String]("frame_md5")).toSeq ===
      Seq(m("abcd"), m("efgh"), m("ij")))
    // everyK=2 keeps frames 0 and 2
    val sampled = Multimodal.sampleFrames(df, Seq("id"), col("data"),
      frameBytes = 4, everyK = 2).select("frame_id").as[Long].collect().sorted
    assert(sampled.toSeq === Seq(0L, 2L))
  }

  test("resizeFit preserves aspect ratio inside the target box") {
    val df = Seq((200, 100), (50, 400), (64, 64), (1, 1)).toDF("w", "h")
    val (ow, oh) = Multimodal.resizeFit(col("w"), col("h"), 64, 64)
    val out = df.select(col("w"), col("h"), ow.as("ow"), oh.as("oh"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3)))
      .toMap
    assert(out((200, 100)) === (64, 32))
    assert(out((50, 400)) === (8, 64))
    assert(out((64, 64)) === (64, 64))
    assert(out((1, 1)) === (64, 64)) // upscale to fill, floor at 1 never hit here
    out.foreach { case ((w, h), (a, b)) =>
      assert(a <= 64 && b <= 64 && a >= 1 && b >= 1, s"($w,$h) -> ($a,$b)")
    }
  }

  test("decodeBatched computes the per-payload byte histogram") {
    val df = Seq((7L, "AAAA")).toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("data"))
    val row = Multimodal.decodeBatched(df, "id", "data").collect()(0)
    val hist = row.getSeq[Long](row.fieldIndex("byte_hist"))
    assert(hist(0x41 >> 4) === 4L) // 'A' = 0x41 -> nibble bucket 4
    assert(hist.sum === 4L)
  }

  test("decodeImages: real PNG round-trip; garbage payloads -> ok=false") {
    val png = Multimodal.encodePng(4, 3, 0x112233)
    val df = Seq((1L, png), (2L, Array[Byte](1, 2, 3))).toDF("id", "data")
    val out = Multimodal.decodeImages(df, "id", "data").collect()
      .map(r => r.getLong(0) -> r).toMap
    val good = out(1L)
    assert(good.getBoolean(1) && good.getInt(2) === 4 && good.getInt(3) === 3)
    // lossless PNG: fingerprint equals md5 of the known hex serialization
    val expectHex = "112233" * 12
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectHex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(good.getString(5) === md)
    assert(math.abs(good.getDouble(6) - (0x11 + 0x22 + 0x33) / 3.0) < 1e-9)
    val bad = out(2L)
    assert(!bad.getBoolean(1) && bad.getInt(2) === 0) // quarantined, not thrown
  }
}
