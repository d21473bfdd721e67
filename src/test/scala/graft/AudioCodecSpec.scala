package graft

import graft.multimodal.{AudioCodec, Multimodal}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** The javax.sound.sampled-backed audio codec: real WAV decode, mono
  * downmix, and per-second framing inside the distributed decode path. */
class AudioCodecSpec extends SparkTestBase {

  private def tone(n: Int): Array[Short] =
    Array.tabulate(n)(i => (8000 * math.sin(2 * math.Pi * 440 * i / 8000)).toShort)

  test("wav round-trip recovers the exact PCM samples and rate") {
    val samples = tone(12345)
    val wav = AudioCodec.encodeWav(8000, samples)
    val (rate, decoded) = AudioCodec.decode(wav).get
    assert(rate === 8000)
    assert(decoded.toSeq === samples.toSeq)
  }

  test("undecodable payloads are None, not an exception") {
    assert(AudioCodec.decode("not audio".getBytes("UTF-8")) === None)
    assert(AudioCodec.decode(Array.empty[Byte]) === None)
    val wav = AudioCodec.encodeWav(8000, tone(100))
    assert(AudioCodec.decode(wav.take(10)) === None) // truncated RIFF header
  }

  test("decodeFrames emits one real PCM frame per second for wav audio") {
    import spark.implicits._
    // 2.5 s at 8 kHz → frames of 8000, 8000, 4000 samples
    val wav = AudioCodec.encodeWav(8000, tone(20000))
    // metadata deliberately lies about the duration: framing must follow
    // the actual sample count, not the claim
    val rows = Seq(
      MediaRow(1L, "audio", wav, MediaMeta("wav", 16, 16, 999999L)),
      MediaRow(2L, "audio", "garbage".getBytes("UTF-8"), MediaMeta("mp4", 16, 16, 3000L)))
    val frames = Multimodal.decodeFrames(rows.toDS()).collect()
    val real = frames.filter(_.media_id == 1L).sortBy(_.frame_index)
    assert(real.map(f => (f.frame_index, f.width, f.height)).toSeq ===
      Seq((0, 8000, 1), (1, 8000, 1), (2, 4000, 1)))
    // frame 0's bytes are the first second of PCM, little-endian
    val expect = tone(20000).take(8000).flatMap(s =>
      Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))
    assert(real(0).pixels.toSeq === expect.toSeq, "distributed decode != local PCM")
    // undecodable audio falls back to the stub path (per-second stub frames)
    assert(frames.count(_.media_id == 2L) === 3)
  }
}
