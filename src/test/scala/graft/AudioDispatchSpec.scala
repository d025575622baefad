package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Aac, AudioDispatch, Flac, Multimodal}
import graft.pipeline.Flac._

/** Magic-byte sniff + routed decode: each format lands in its own
  * decoder, ID3v2 prefixes are skipped by syncsafe size, and junk or
  * corrupted streams refuse with a class instead of misrouting. */
class AudioDispatchSpec extends AnyFunSuite {

  private def flacStream(): Array[Byte] = {
    val frame = Flac.frameBytes(Array(Array.tabulate(48)(_.toLong)), 0, 16,
      44100, FrameHeaderPlan(6, 9, 4, 0, 0),
      Array(ChannelPlan(PlanFixed(1), 0, ResidualPlan(0, 0))))
    Flac.streamBytes(44100, 1, 16, 48L, Seq(frame))
  }

  test("each format routes to its decoder") {
    assert(AudioDispatch.dispatch(
      Multimodal.wavBytes(22050, 2, 16, new Array[Byte](80)))
      == Right(("wav", 22050, 2, 40L))) // interleaved-total samples
    assert(AudioDispatch.dispatch(flacStream())
      == Right(("flac", 44100, 1, 1L)))
    assert(AudioDispatch.dispatch(Multimodal.layer3Bytes(7, 2))
      == Right(("mp3", 48000, 1, 2L)))
    assert(AudioDispatch.dispatch(Multimodal.layer1Bytes(7, 2))
      == Right(("mp1", 32000, 1, 2L)))
    assert(AudioDispatch.dispatch(Multimodal.layer2Bytes(7, 2))
      == Right(("mp2", 48000, 1, 2L)))
    assert(AudioDispatch.dispatch(Aac.aacLcBytes(7, 2, "long"),
      allowSyntheticAac = true) == Right(("aac", 48000, 1, 2L)))
  }

  test("ID3v2 prefixes are skipped by syncsafe size") {
    val mp3 = Multimodal.layer3Bytes(3, 2)
    val pad = 200 // forces the two-byte syncsafe form: 200 = (1<<7) + 72
    val wrapped = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0,
      ((pad >> 7) & 0x7f).toByte, (pad & 0x7f).toByte) ++
      new Array[Byte](pad) ++ mp3
    assert(AudioDispatch.dispatch(wrapped) == Right(("mp3", 48000, 1, 2L)))
    // tag claiming to extend past the payload refuses
    val overrun = wrapped.take(10 + pad - 1)
    assert(AudioDispatch.dispatch(overrun) == Left("id3-truncated"))
  }

  test("junk and corrupted streams refuse with a class") {
    assert(AudioDispatch.dispatch("not audio at all".getBytes("US-ASCII"))
      == Left("unknown-format"))
    assert(AudioDispatch.dispatch(Array[Byte]()) == Left("unknown-format"))
    // FLAC with a broken frame CRC refuses through the flac route
    val s = flacStream()
    s(s.length - 1) = (s(s.length - 1) ^ 1).toByte
    assert(AudioDispatch.dispatch(s) == Left("crc16"))
    // AAC without the synthetic-table opt-in refuses rather than decode
    assert(AudioDispatch.dispatch(Aac.aacLcBytes(7, 2, "long")).isLeft)
  }
}
