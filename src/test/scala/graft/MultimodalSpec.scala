package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** The media container parsers must read real byte layouts: round-trip the
  * synth writers, survive extra chunks (spec-correct chunk walking), and
  * reject corrupt input instead of mis-parsing it. */
class MultimodalSpec extends AnyFunSuite {

  private val payload = "hello media".getBytes("UTF-8")

  test("PNG: signature + IHDR big-endian dims round-trip; corrupt rejected") {
    val b = Multimodal.synthPng(1920, 1080, payload)
    assert(b.length == Multimodal.PngHeaderBytes + payload.length)
    assert(MediaCodec.parsePng(b).contains((1920, 1080)))
    // corrupt signature byte
    val bad = b.clone(); bad(1) = 'Q'.toByte
    assert(MediaCodec.parsePng(bad).isEmpty)
    assert(MediaCodec.parsePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.parse(bad) == ("unknown", -1, -1))
  }

  test("JPEG: marker walk skips APPn/COM segments to SOF0; corrupt rejected") {
    val b = Multimodal.synthJpeg(1280, 720, payload)
    assert(b.length == Multimodal.JpegHeaderBytes + payload.length)
    assert(MediaCodec.parseJpeg(b).contains((1280, 720)))
    assert(MediaCodec.parse(b) == ("image", 1280, 720))
    // insert a COM segment between APP0 and SOF0 — the walk must skip it
    val withCom = new java.io.ByteArrayOutputStream()
    withCom.write(b, 0, 20) // SOI + APP0
    withCom.write(0xFF); withCom.write(0xFE) // COM
    withCom.write(0); withCom.write(7)       // len = 2 + 5
    withCom.write("notes".getBytes("US-ASCII"))
    withCom.write(b, 20, b.length - 20)
    assert(MediaCodec.parseJpeg(withCom.toByteArray).contains((1280, 720)))
    // 0xFF FILL bytes before a marker code are legal — the walk skips them
    val withFill = new java.io.ByteArrayOutputStream()
    withFill.write(b, 0, 20)             // SOI + APP0
    withFill.write(0xFF); withFill.write(0xFF) // two fill bytes, then SOF's own FF
    withFill.write(b, 20, b.length - 20)
    assert(MediaCodec.parseJpeg(withFill.toByteArray).contains((1280, 720)))
    // SOS before any SOF → None; truncated → None
    assert(MediaCodec.parseJpeg(Array(0xFF, 0xD8, 0xFF, 0xDA, 0, 4).map(_.toByte)).isEmpty)
    assert(MediaCodec.parseJpeg(b.take(10)).isEmpty)
    assert(MediaCodec.parse(Array[Byte](9, 9, 9)) == ("unknown", -1, -1))
  }

  test("WAV: fmt chunk found by walking, not fixed offsets") {
    val b = Multimodal.synthWav(44100, 2, payload)
    assert(b.length == Multimodal.WavHeaderBytes + payload.length)
    assert(MediaCodec.parseRiff(b).contains(("audio", 44100, 2)))
    // insert an extra chunk BEFORE fmt — a fixed-offset reader would break
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(b, 0, 12) // RIFF..WAVE
    extra.write("JUNK".getBytes("US-ASCII")); extra.write(Array[Byte](6, 0, 0, 0))
    extra.write(Array[Byte](1, 2, 3, 4, 5, 6))
    extra.write(b, 12, b.length - 12)
    assert(MediaCodec.parseRiff(extra.toByteArray).contains(("audio", 44100, 2)))
  }

  test("AVI: avih dims inside LIST/hdrl; truncated rejected") {
    val b = Multimodal.synthAvi(640, 480, payload)
    assert(b.length == Multimodal.AviHeaderBytes + payload.length)
    assert(MediaCodec.parseRiff(b).contains(("video", 640, 480)))
    assert(MediaCodec.parseRiff(b.take(20)).isEmpty)
    assert(MediaCodec.parse(b.take(20)) == ("unknown", -1, -1))
  }

  test("features parses and SNIFFS every synth row (no -1 dims) at sf0.001") {
    val spark = TestSpark.spark
    val out = Multimodal.features(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("width") > 0 && r.getAs[Long]("height") > 0))
    // kind came from magic-byte sniffing and must match the %4 source cycle
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = (id % 4) match {
        case 0 | 3 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      assert(r.getAs[String]("kind") == expected, s"doc $id sniffed ${r.getAs[String]("kind")}")
    }
  }
}
