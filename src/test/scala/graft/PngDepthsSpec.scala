package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PngDepths

/** Sub-byte PNG: the INDEPENDENT ImageIO pin (the JDK PNG reader
  * decodes our packed/filtered streams to the same samples), partial
  * trailing-byte packing, all-filter coverage, and refusals. */
class PngDepthsSpec extends AnyFunSuite {

  private def gen(w: Int, h: Int, d: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (seed * 3 + x * 5 + y * 7) % (1 << d)
    }

  test("ImageIO independently decodes gray depths 1/2/4 to the same samples") {
    for (d <- Seq(1, 2, 4); w <- Seq(13, 16)) { // 13: partial last byte
      val h = 8
      val px = gen(w, h, d, 5)
      val bytes = PngDepths.pngBytesSubByte(w, h, d, px)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == px(y * w + x),
          s"($x,$y) d=$d w=$w")
      val Some((info, out)) = PngDepths.pngSubByteDecode(bytes)
      assert(info.depth == d && out.toSeq == px.toSeq)
    }
  }

  test("ImageIO independently decodes sub-byte palette indices") {
    for (d <- Seq(2, 4)) {
      val (w, h) = (13, 8)
      val m = 1 << d
      val pal = Array.tabulate(m)(i => (i * 31 % 256 << 16) |
        (i * 57 % 256 << 8) | (i * 11 % 256))
      val px = gen(w, h, d, 9)
      val bytes = PngDepths.pngBytesSubByte(w, h, d, px, Some(pal))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == px(y * w + x), s"($x,$y) d=$d")
      val Some((info, out)) = PngDepths.pngSubByteDecode(bytes)
      assert(info.palette.toSeq == pal.toSeq && out.toSeq == px.toSeq)
    }
  }

  test("every filter type survives the packed round trip") {
    for (ft <- 0 to 4) {
      val px = gen(13, 8, 2, ft)
      val bytes = PngDepths.pngBytesSubByte(13, 8, 2, px, filterOf = _ => ft)
      assert(PngDepths.pngSubByteDecode(bytes).exists(_._2.toSeq == px.toSeq),
        s"filter $ft")
    }
  }

  test("BI_RLE4 BMP: ImageIO pin and stats agreement") {
    import graft.pipeline.Multimodal
    val (w, h) = (24, 10)
    val px = Array.tabulate(w * h)(i => ((7 + (i / 4) * 3) % 16).toByte)
    val bytes = Multimodal.bmpBytesRle4(w, h, px)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    // BMP rows are stored bottom-up; palette value = idx * 17
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val expect = px((h - 1 - y) * w + x) & 0xf
      assert(raster.getSample(x, y, 0) == expect, s"($x,$y)")
    }
    val Some((meta, n, sums, _)) = Multimodal.bmpRle4Stats(bytes)
    assert(meta.width == w && meta.height == h && n == w * h)
    val want = px.map(i => (i & 0xf) * 17 / 255.0).sum
    assert(math.abs(sums(0) - want) < 1e-9)
  }

  test("refusals: depth 8 routes elsewhere, truncation, bad magic") {
    val px = gen(13, 8, 4, 1)
    val good = PngDepths.pngBytesSubByte(13, 8, 4, px)
    assert(PngDepths.pngSubByteDecode(good).isDefined)
    assert(PngDepths.pngSubByteDecode(good.take(50)).isEmpty)
    val bad = good.clone; bad(0) = 0
    assert(PngDepths.pngSubByteDecode(bad).isEmpty)
    // an 8-bit stream from the main PNG path is not this decoder's job
    val eight = graft.pipeline.Multimodal.pngBytes(8, 4, 1,
      Array.tabulate(32)(_.toByte))
    assert(PngDepths.pngSubByteDecode(eight).isEmpty)
  }
}
