package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** WAV arm pinned against javax.sound.sampled, the JDK's independent
  * RIFF/PCM implementation — both directions. */
class WavCodecSpec extends AnyFunSuite {

  private def tone(n: Int, ch: Int): Array[Short] =
    Array.tabulate(n * ch)(i =>
      (math.sin(i * 0.1) * 12000 + (i % 7) * 11).toShort)

  test("round trip: encode -> decode is the identity") {
    val w = WavCodec.Wav(16000, 2, tone(1200, 2))
    val bytes = WavCodec.encode(w)
    assert(WavCodec.isWav(bytes))
    val back = WavCodec.decode(bytes)
    assert(back.isDefined)
    assert(back.get.sampleRate === 16000 && back.get.channels === 2)
    assert(back.get.samples.toSeq === w.samples.toSeq)
  }

  test("javax.sound reads our encoder's output sample-exact") {
    val w = WavCodec.Wav(8000, 1, tone(800, 1))
    val ais = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(WavCodec.encode(w)))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 8000f && fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    val buf = ais.readAllBytes()
    assert(buf.length === w.samples.length * 2)
    for (i <- w.samples.indices) {
      val v = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
      assert(v === w.samples(i), s"sample $i")
    }
  }

  test("decodes javax.sound-written WAVs, skipping foreign chunks") {
    val samples = tone(600, 1)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val got = WavCodec.decode(out.toByteArray)
    assert(got.isDefined)
    assert(got.get.sampleRate === 22050 && got.get.channels === 1)
    assert(got.get.samples.toSeq === samples.toSeq)
    // derived stats
    assert(math.abs(got.get.durationMs -
      600 * 1000.0 / 22050) < 1e-9)
    assert(got.get.rms > 0)
  }

  test("rejects non-PCM16 and truncated payloads cleanly") {
    val w = WavCodec.Wav(8000, 1, tone(100, 1))
    val good = WavCodec.encode(w)
    assert(WavCodec.decode(good.take(50)).isEmpty)
    val mangled = good.clone()
    mangled(20) = 3 // format tag -> IEEE float
    assert(WavCodec.decode(mangled).isEmpty)
  }
}
