package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.util.Try

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec on `javax.sound.sampled` — JDK-built-in like
  * [[ImageCodec]]'s `javax.imageio`, so it adds no dependency and runs
  * headless. WAV/AIFF/AU payloads decode to genuine PCM samples; the JDK
  * converts any PCM width/endianness/channel layout it can read to 16-bit
  * signed, and the downmix to mono is integer averaging. Compressed
  * formats (mp3/ogg) have no JDK service provider and take the `None`
  * path, exactly like a truncated payload — decode failure is a VALUE,
  * not an exception, because a codec that throws inside `mapPartitions`
  * kills the stage ([[ImageCodec]]'s contract).
  *
  * Deterministic end to end: PCM decode is exact and the downmix is
  * integer arithmetic — no float resampling is requested (the sample RATE
  * is reported, not altered).
  */
object AudioCodec {

  /** Decoded mono audio: (sampleRateHz, 16-bit signed samples, downmixed
    * to mono by integer-averaging channels). */
  def decode(payload: Array[Byte]): Option[(Int, Array[Short])] =
    Try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = ais.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, ais)
        try {
          val bytes = readAll(pcm)
          val ch = target.getChannels
          val nFrames = bytes.length / (2 * ch)
          val mono = new Array[Short](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2
              acc += ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort
              c += 1
            }
            mono(f) = (acc / ch).toShort
            f += 1
          }
          (src.getSampleRate.toInt, mono)
        } finally pcm.close()
      } finally ais.close()
    }.toOption

  private def readAll(in: AudioInputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** WAV-encode 16-bit mono PCM — the fixture generator for specs and
    * synthetic media (WAV is lossless, so decode(encode(s)) == s). */
  def encodeWav(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRateHz.toFloat, 16, 1, 2, sampleRateHz.toFloat, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) finally ais.close()
    bos.toByteArray
  }
}
