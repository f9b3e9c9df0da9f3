package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the deep-decode codecs: arbitrary pixel/sample
  * content must roundtrip exactly through the real containers at any
  * dimension, filter choice, or sample count — the generating-formula
  * oracles (q_multimodal_pixels/_samples) check one deterministic family;
  * these check the codecs on adversarial random content.
  */
object CodecPropertySpec extends Properties("MediaCodecs") {

  private val dimGen = Gen.choose(1, 24)

  private val pngCase: Gen[(Int, Int, Array[Byte], Int)] = for {
    w <- dimGen; h <- dimGen
    px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))
    f0 <- Gen.choose(0, 4)
  } yield (w, h, px, f0)

  property("PNG roundtrip: any pixels, any dims, any per-row filter mix") =
    Prop.forAll(pngCase) { case (w, h, px, f0) =>
      val png = PngCodec.encode(w, h, px, row => (row + f0) % 5)
      PngCodec.decode(png).exists { case (dw, dh, dp) =>
        dw == w && dh == h && dp.sameElements(px)
      }
    }

  property("PNG decode never misreports content on truncation") =
    Prop.forAll(pngCase, Gen.choose(1, 40)) { case ((w, h, px, _), cut) =>
      val png = PngCodec.encode(w, h, px)
      val trunc = png.take(math.max(8, png.length - cut))
      // a truncated blob must decode to None, never to wrong pixels
      PngCodec.decode(trunc).forall { case (dw, dh, dp) =>
        dw == w && dh == h && dp.sameElements(px)
      }
    }

  private val pcmCase: Gen[(Array[Short], Int, Int)] = for {
    n <- Gen.choose(0, 512)
    samples <- Gen.containerOfN[Array, Short](n, Gen.choose(Short.MinValue, Short.MaxValue))
    ch <- Gen.choose(1, 8)
    rate <- Gen.choose(8000, 48000)
  } yield (samples, ch, rate)

  property("PCM16 roundtrip: any samples, any channel/rate header") =
    Prop.forAll(pcmCase) { case (samples, ch, rate) =>
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val wav = Multimodal.AudioHeaders.wavWrap(ch, rate, 16, bytes)
      Multimodal.AudioHeaders.pcmSamples16(wav).exists(_.sameElements(samples)) &&
        Multimodal.AudioHeaders.sniffWav(wav).exists(t => t._1 == ch && t._2 == rate)
    }
}
