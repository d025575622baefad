package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{L3IsoHuff, Multimodal}

/** Runtime-loadable big-values Huffman tables (round 16,
  * [[L3IsoHuff.load]]): the declared ISO slots (11/13/15/16-31) become
  * user-pluggable — a table file is admitted only through the SAME
  * structural closure gate the shipped tables pass per build (exact
  * Kraft completeness, prefix-freeness, v < 2^hlen), gate-failing data
  * throws, and a stream selecting a loaded id decodes ONLY when the
  * tables are mounted (the shipped registry still refuses it). */
class L3HuffLoadSpec extends AnyFunSuite {

  private def fileText = L3IsoHuff.synthLoadFileText(Seq((13, 0), (24, 4)))

  test("synthetic fixture data is itself gate-clean and canonical") {
    val lens = L3IsoHuff.synthLoadLens
    val codes = L3IsoHuff.synthLoadCodes
    assert(lens.count(_ == 7) == 64 && lens.count(_ == 8) == 64 &&
           lens.count(_ == 9) == 128)
    val unit = 1L << 32
    assert(lens.map(l => unit >> l).sum == unit)
    // canonical layout landmarks
    assert(codes(0) == 0 && codes(63) == 63)
    assert(codes(64) == 128 && codes(127) == 191)
    assert(codes(128) == 384 && codes(255) == 511)
  }

  test("load registers gated tables from a file and decode uses them") {
    val tf = java.nio.file.Files.createTempFile("graft_hufftest", ".txt")
    try {
      java.nio.file.Files.write(tf, fileText.getBytes("UTF-8"))
      val extra = L3IsoHuff.load(tf.toString)
      assert(extra.keySet == Set(13, 24))
      assert(extra(13).linbits == 0 && extra(24).linbits == 4)
      assert(extra(13).maxLen == 9)
      // every entry round-trips through the loaded decode map
      val enc = L3IsoHuff.synthLoadEncode
      enc.foreach { case (xy, w) => assert(extra(13).codes(w) == xy) }

      val enc2 = enc
      (0L until 6L).foreach { id =>
        val nf = (id % 3).toInt + 1
        val bytes = Multimodal.layer3HuffLoadBytes(id, nf, 13, 24, enc2, 4)
        // WITHOUT the loaded tables the stream refuses (ids 13/24 are
        // not in the shipped registry)
        assert(Multimodal.layer3DecodeFull(bytes).isEmpty, s"id $id")
        // WITH them it decodes, with the exact formula counts and ESC
        // magnitudes above 15 present in region1
        val out = Multimodal.layer3DecodeFull(bytes, extra)
        assert(out.isDefined, s"id $id refused with loaded tables")
        val (_, grans, _, _) = out.get
        assert(grans.size == nf * 2)
        grans.foreach { g =>
          assert(g.nCount1 == 4 + (id + g.frame * 2 + g.granule) % 5)
        }
      }
    } finally java.nio.file.Files.deleteIfExists(tf)
  }

  test("gate refuses structurally bad data") {
    def gated(f: String => String): Unit =
      L3IsoHuff.parse(f(fileText))
    def refuses(f: String => String, what: String): Unit =
      assertThrows[IllegalArgumentException](gated(f))

    // Kraft violation: lengthen one codeword (incomplete code)
    refuses(_.replaceFirst("(?m)^7 0$", "8 0"), "kraft")
    // duplicate codeword
    refuses(_.replaceFirst("(?m)^7 1$", "7 0"), "dup")
    // code value out of range for its length
    refuses(_.replaceFirst("(?m)^7 0$", "7 128"), "v >= 2^len")
    // shipped-table override refuses (12 is real ISO data, 4 synthetic)
    refuses(_.replace("table 13 dim 16 linbits 0",
                      "table 12 dim 16 linbits 0"), "override 12")
    refuses(_.replace("table 13 dim 16 linbits 0",
                      "table 4 dim 16 linbits 0"), "override 4")
    // out-of-range id / dim / linbits
    refuses(_.replace("table 13 dim 16 linbits 0",
                      "table 32 dim 16 linbits 0"), "tid 32")
    refuses(_.replace("table 13 dim 16 linbits 0",
                      "table 13 dim 15 linbits 0"), "dim 15")
    refuses(_.replace("table 24 dim 16 linbits 4",
                      "table 24 dim 16 linbits 14"), "linbits 14")
    // malformed header / truncation / empty / double-mount
    refuses(_.replace("table 13 dim 16 linbits 0", "table 13"), "header")
    refuses(t => t.substring(0, t.indexOf("table 24") + 30), "truncated")
    refuses(_ => "# nothing here\n", "empty")
    refuses(_.replace("table 24 dim 16 linbits 4",
                      "table 13 dim 16 linbits 4"), "tid twice")
    // and the happy path still parses after all that
    assert(L3IsoHuff.parse(fileText).keySet == Set(13, 24))
  }
}
