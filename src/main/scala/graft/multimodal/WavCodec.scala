package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM PCM WAV codec (RIFF/WAVE, format tag 1, 16-bit samples,
  * any channel count / sample rate). Decode walks the RIFF chunk list —
  * unknown chunks (LIST, fact, cue…) skip by their declared size, `fmt `
  * and `data` are interpreted — so files from arbitrary writers parse as
  * long as they carry integer PCM16. The audio arm of the multimodal
  * family: same Option-returning contract as the image codecs, pinned
  * against javax.sound.sampled (an independent JDK implementation) in
  * the spec. */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Double = nFrames * 1000.0 / sampleRate
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(b: Array[Byte]): Option[Wav] = {
    try {
      if (!isWav(b)) return None
      var pos = 12
      var sampleRate = 0
      var channels = 0
      var bits = 0
      var fmtTag = 0
      var samples: Array[Short] = null
      while (pos + 8 <= b.length && (samples == null || sampleRate == 0)) {
        val id = new String(b, pos, 4, "US-ASCII")
        val size = u32(b, pos + 4).toInt
        if (size < 0 || pos + 8 + size > b.length) return None
        id match {
          case "fmt " =>
            fmtTag = u16(b, pos + 8)
            channels = u16(b, pos + 10)
            sampleRate = u32(b, pos + 12).toInt
            bits = u16(b, pos + 22)
          case "data" =>
            if (fmtTag != 1 || bits != 16 || channels <= 0) return None
            val n = size / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              samples(i) = ((b(pos + 8 + 2 * i) & 0xff) |
                (b(pos + 9 + 2 * i) << 8)).toShort
              i += 1
            }
          case _ => ()
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (samples == null || sampleRate <= 0 || channels <= 0) None
      else Some(Wav(sampleRate, channels, samples))
    } catch { case _: Exception => None }
  }

  def encode(w: Wav): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    val dataBytes = w.samples.length * 2
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataBytes)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1) // PCM
    w16(w.channels)
    w32(w.sampleRate)
    w32(w.sampleRate * w.channels * 2) // byte rate
    w16(w.channels * 2) // block align
    w16(16) // bits
    out.write("data".getBytes("US-ASCII")); w32(dataBytes)
    w.samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }
}
