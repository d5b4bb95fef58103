package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import BinaryOps.wavMeta
import graft.operators.DataOps.wavBytes

/** Byte-level contracts of the dependency-free RIFF/WAV header parser —
  * chunk-order independence, odd-size even-padding, truncation/garbage
  * fallbacks, and round-trip against the qmm3 planted builder.
  */
class WavHeaderSpec extends AnyFunSuite {

  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def fmtChunk(ch: Int, rate: Int, bits: Int): Array[Byte] = {
    val align = ch * bits / 8
    "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(rate) ++ le32(rate * align) ++ le16(align) ++ le16(bits)
  }
  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.flatten.toArray
    "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
  }

  test("round-trips the qmm3 planted builder, including padded-junk ids") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 12L, 901L)) {
      val got = wavMeta(wavBytes(id))
      val (ch, rate, bits) = ((1 + id % 2).toInt, (8000 * (1 + id % 5)).toInt,
        (8 * (1 + id % 3)).toInt)
      val n = 100 + id % 900
      assert(got === Some((ch, rate, bits, n, n * 1000000L / rate)), s"id $id")
    }
  }

  test("chunk order is free: data (with real payload) before fmt still parses") {
    val d = "data".getBytes("US-ASCII") ++ le32(800) ++
      Array.fill(800)(0: Byte)
    assert(wavMeta(wav(d, fmtChunk(2, 16000, 16))) ===
      Some((2, 16000, 16, 200L, 12500L)))
  }

  test("odd-sized chunk is padded to even — the next chunk is still found") {
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // 3 data bytes + 1 pad
    val d = "data".getBytes("US-ASCII") ++ le32(160)
    assert(wavMeta(wav(junk, fmtChunk(1, 8000, 16), d)) ===
      Some((1, 8000, 16, 80L, 10000L)))
  }

  test("mediaKind dispatch: image → image parser, wav → audio, text → unknown with byte length") {
    assert(BinaryOps.mediaKind(graft.operators.DataOps.imageBytes(8L))
      ._1 === "image")
    val (k, f, a, b) = BinaryOps.mediaKind(wavBytes(1L))
    assert((k, f) === (("audio", "wav")))
    assert(a === 8000L * 2 && b === 101L * 1000000L / 16000L)
    val txt = "just some words".getBytes("UTF-8")
    assert(BinaryOps.mediaKind(txt) === (("unknown", "unknown",
      txt.length.toLong, 0L)))
  }

  test("truncation, garbage, and missing chunks fall back to None") {
    assert(wavMeta(Array.emptyByteArray).isEmpty)
    assert(wavMeta("RIFF".getBytes("US-ASCII")).isEmpty)
    assert(wavMeta("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // fmt but no data
    assert(wavMeta(wav(fmtChunk(1, 8000, 8))).isEmpty)
    // data but no fmt
    assert(wavMeta(wav("data".getBytes("US-ASCII") ++ le32(10))).isEmpty)
    // zeroed fmt fields (division guards)
    val zero = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(0) ++ le32(0) ++ le32(0) ++ le16(0) ++ le16(8)
    assert(wavMeta(wav(zero,
      "data".getBytes("US-ASCII") ++ le32(10))).isEmpty)
    // corrupt giant chunk size must not overflow into a loop
    assert(wavMeta(wav("LIST".getBytes("US-ASCII") ++
      le32(0x7fffffff))).isEmpty)
  }
}
