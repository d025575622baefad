package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TiffRaster

/** TIFF raster codec: PackBits round trips (runs > 128, literal caps,
  * interleaves), the INDEPENDENT ImageIO pin (the JDK TIFF plugin
  * decodes our uncompressed and PackBits strips to the same pixels),
  * and strip-accounting refusals. */
class TiffRasterSpec extends AnyFunSuite {

  test("packbits round-trips runs, literals, caps, and interleaves") {
    val cases = Seq(
      Array.fill(300)(7.toByte),                       // run > 128
      Array.tabulate(200)(i => i.toByte),              // pure literal > 128
      Array.tabulate(300)(i => (i / 3).toByte),        // runs of 3
      Array.tabulate(257)(i => (i % 2).toByte),        // worst-case alternation
      Array[Byte](5),                                  // single byte
      Array.tabulate(97)(i => if (i % 13 < 4) 9.toByte else i.toByte))
    cases.foreach { c =>
      val enc = TiffRaster.packBitsEncode(c)
      val dec = TiffRaster.packBitsDecode(enc, 0, enc.length, c.length)
      assert(dec.exists(_.toSeq == c.toSeq), s"len=${c.length}")
    }
    // declared-length mismatches refuse instead of over/under-filling
    val enc = TiffRaster.packBitsEncode(Array.fill(10)(3.toByte))
    assert(TiffRaster.packBitsDecode(enc, 0, enc.length, 9).isEmpty)
    assert(TiffRaster.packBitsDecode(enc, 0, enc.length, 11).isEmpty)
  }

  test("ImageIO independently decodes our strips to the same pixels") {
    for {
      spp <- Seq(1, 3)
      le <- Seq(true, false)
      pack <- Seq(false, true)
    } {
      val (w, h) = (12, 8)
      val px = Array.tabulate(w * h * spp)(i => ((i * 7 + 13) % 256).toByte)
      val bytes = TiffRaster.tiffRasterBytes(w, h, spp, px,
        rowsPerStrip = 3, packBits = pack, littleEndian = le)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused spp=$spp le=$le pack=$pack")
      assert(img.getWidth == w && img.getHeight == h)
      // compare RAW raster samples — getRGB would run the JDK's
      // linear-gray -> sRGB conversion and "brighten" every gray value
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w; b <- 0 until spp) {
        val expect = px((y * w + x) * spp + b) & 0xff
        assert(raster.getSample(x, y, b) == expect,
          s"($x,$y,$b) spp=$spp le=$le pack=$pack")
      }
      // and our decoder agrees with itself on the same stream
      val Some((info, out)) = TiffRaster.tiffRasterDecode(bytes)
      assert(out.toSeq == px.toSeq && info.nStrips == 3)
    }
  }

  test("strip accounting and magic refusals") {
    val px = Array.tabulate(96)(i => i.toByte)
    val good = TiffRaster.tiffRasterBytes(12, 8, 1, px, 4, packBits = false,
      littleEndian = true)
    assert(TiffRaster.tiffRasterDecode(good).isDefined)
    // truncated strip data refuses
    assert(TiffRaster.tiffRasterDecode(good.take(good.length - 5)).isEmpty)
    // wrong magic refuses
    val bad = good.clone; bad(0) = 'X'
    assert(TiffRaster.tiffRasterDecode(bad).isEmpty)
    // corrupt a StripByteCount so strips no longer tile the image:
    // single-strip variant has the count inline — halve it
    val one = TiffRaster.tiffRasterBytes(12, 8, 1, px, 10, packBits = false,
      littleEndian = true)
    assert(TiffRaster.tiffRasterDecode(one).isDefined)
    // find the 279 tag and wreck its inline value (LE: tag id at entry)
    var p = 8 + 2
    var wrecked: Array[Byte] = null
    (0 until 10).foreach { i =>
      val e = p + 12 * i
      val id = (one(e) & 0xff) | ((one(e + 1) & 0xff) << 8)
      if (id == 279) {
        wrecked = one.clone
        wrecked(e + 8) = (wrecked(e + 8) ^ 0x01).toByte
      }
    }
    assert(wrecked != null && TiffRaster.tiffRasterDecode(wrecked).isEmpty)
  }
}
