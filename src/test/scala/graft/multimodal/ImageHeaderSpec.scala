package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import BinaryOps.imageDims

/** Byte-level contracts of the dependency-free image-header parsers —
  * cases the qmm2 driver corpus doesn't cover: truncation, garbage,
  * GIF87a, BITMAPCOREHEADER, top-down BMP, progressive JPEG, JPEG fill
  * bytes/restart markers, and payloads that must fall through to the
  * codec stub.
  */
class ImageHeaderSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("png: IHDR big-endian dims") {
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0x00, 0x01, 0x00, 0x00, // w = 65536
      0x00, 0x00, 0x02, 0x01, // h = 513
      8, 2, 0, 0, 0)
    assert(imageDims(png) === Some(("png", 65536, 513)))
    assert(imageDims(png.take(20)) === None, "truncated IHDR")
    // PNG whose FIRST chunk is not IHDR (Apple CgBI): dims at 16/20 would
    // be flags/CRC garbage — must fall through to the stub, not parse
    val cgbi = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 4, 'C', 'g', 'B', 'I', 0x50, 0x00, 0x20, 0x02,
      0xde, 0xad, 0xbe, 0xef)
    assert(imageDims(cgbi) === None, "non-IHDR first chunk is not parseable")
  }

  test("gif: 87a and 89a little-endian dims") {
    def gif(ver: Char) = ("GIF8" + ver + "a").getBytes("US-ASCII") ++
      b(0x34, 0x12, 0xcd, 0x00, 0, 0, 0)
    assert(imageDims(gif('9')) === Some(("gif", 0x1234, 0xcd)))
    assert(imageDims(gif('7')) === Some(("gif", 0x1234, 0xcd)))
  }

  test("bmp: info header abs()es a negative (top-down) height; core header is uint16") {
    def le32(v: Int) = b(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >>> 24) & 0xff)
    val info = "BM".getBytes("US-ASCII") ++ le32(58) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(640) ++ le32(-480) ++ b(1, 0, 24, 0)
    assert(imageDims(info) === Some(("bmp", 640, 480)))
    val core = "BM".getBytes("US-ASCII") ++ le32(26) ++ le32(0) ++ le32(26) ++
      le32(12) ++ b(0x80, 0x02, 0xe0, 0x01) // uint16 w=640 h=480
    assert(imageDims(core) === Some(("bmp", 640, 480)))
  }

  test("jpeg: skips APP/COM segments, fill bytes and restart markers; reads SOF0 and SOF2") {
    def be16(v: Int) = b((v >> 8) & 0xff, v & 0xff)
    def seg(marker: Int, payload: Array[Byte]) =
      b(0xff, marker) ++ be16(payload.length + 2) ++ payload
    def sof(marker: Int, w: Int, h: Int) =
      seg(marker, b(8) ++ be16(h) ++ be16(w) ++ b(1, 1, 0x11, 0))
    val baseline = b(0xff, 0xd8) ++ seg(0xe0, "JFIF".getBytes ++ b(0)) ++
      seg(0xfe, "comment".getBytes) ++ b(0xff) /* fill */ ++
      sof(0xc0, 1920, 1080).drop(1) /* fill byte doubles as the marker's ff */
    assert(imageDims(baseline) === Some(("jpeg", 1920, 1080)))
    val progressive = b(0xff, 0xd8) ++ b(0xff, 0x01) /* TEM standalone */ ++
      seg(0xc4, b(0, 0)) /* DHT is NOT a SOF */ ++ sof(0xc2, 33, 44)
    assert(imageDims(progressive) === Some(("jpeg", 33, 44)))
    val noSof = b(0xff, 0xd8) ++ seg(0xe0, b(0)) ++ b(0xff, 0xd9)
    assert(imageDims(noSof) === None, "EOI before any SOF")
    assert(imageDims(b(0xff, 0xd8, 0x00, 0x11)) === None, "lost marker sync")
  }

  test("garbage and short payloads fall through to None (stub fallback path)") {
    assert(imageDims("not an image".getBytes) === None)
    assert(imageDims(Array.emptyByteArray) === None)
    assert(imageDims(b(0x89, 'P')) === None)
    assert(imageDims("BM".getBytes) === None)
  }

  test("qmm2 builder round-trips through the parser for every format class") {
    import graft.operators.DataOps
    for (id <- 0L to 31L) {
      val expectFmt = (id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"; case _ => "jpeg"
      }
      assert(imageDims(DataOps.imageBytes(id)) ===
        Some((expectFmt, (100 + id % 900).toInt, (50 + id % 500).toInt)),
        s"id=$id")
    }
  }
}
