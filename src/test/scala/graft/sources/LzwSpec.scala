package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** TIFF-LZW and PackBits codec units: known-bytes vectors derived by hand
  * from the TIFF 6.0 spec (§13 / §9), round trips over adversarial data,
  * and the early-change width boundaries. */
class LzwSpec extends AnyFunSuite {

  test("LZW known-bytes: hand-packed spec stream encodes and decodes") {
    // input [7,7,7,8,8,7,7,6,6] → codes [Clear,7,258,8,8,258,6,6,EOI], all
    // 9-bit, MSB-first packed (derived by hand from TIFF 6.0 §13):
    val data = Array[Byte](7, 7, 7, 8, 8, 7, 7, 6, 6)
    val expected = Array(0x80, 0x01, 0xE0, 0x40, 0x80, 0x44, 0x08, 0x0C,
      0x06, 0x80, 0x80).map(_.toByte)
    assert(Lzw.encode(data).sameElements(expected))
    assert(Lzw.decode(expected, data.length).sameElements(data))
  }

  test("LZW round-trips constant, random-ish, and KwKwK-heavy data") {
    val rng = new java.util.Random(42)
    val cases = Seq(
      Array.fill(4096)(0.toByte),                       // max-run constant
      Array.tabulate(5000)(i => (i % 251).toByte),       // cycling
      Array.tabulate(3000)(_ => (rng.nextInt(256) - 128).toByte), // noise
      Array.tabulate(2000)(i => ((i / 3) % 7).toByte),   // KwKwK patterns
      Array[Byte](),                                     // empty
      Array[Byte](42))                                   // single byte
    cases.foreach { c =>
      assert(Lzw.decode(Lzw.encode(c), c.length).sameElements(c),
        s"length ${c.length}")
    }
  }

  test("LZW flush on a width boundary: EOI written one bit wider (libtiff parity)") {
    // When the table-entry count at flush lands exactly on a DECODER
    // width boundary (510/1022/2046), the decoder bumps before reading
    // EOI — the encoder must write EOI one bit wider (libtiff's
    // LZWPostEncode free_ent++/nbits++). Pre-fix, 253 distinct bytes
    // (= 252 entries + the flush entry = 510) threw 'premature code 514'.
    assert(Lzw.decode(Lzw.encode(Array.tabulate(253)(_.toByte)), 253)
      .sameElements(Array.tabulate(253)(_.toByte)))
    // sweep EVERY length 1..4000 of a cycling ramp: the flush entry count
    // takes all values through both the 510 and 1022 boundaries and the
    // mid-stream bumps, so any width-accounting regression lands on some n
    for (n <- 1 to 4000) {
      val d = Array.tabulate(n)(i => (i % 256).toByte)
      assert(Lzw.decode(Lzw.encode(d), n).sameElements(d), s"length $n")
    }
    // and across the 2046 boundary / 4094 reset with higher-entropy data
    val rng = new java.util.Random(7)
    for (n <- 3950 to 4150) {
      val d = Array.tabulate(n)(_ => rng.nextInt(256).toByte)
      assert(Lzw.decode(Lzw.encode(d), n).sameElements(d), s"noise length $n")
    }
  }

  test("LZW width grows EARLY (511/1023/2047) and resets at table cap") {
    // incompressible data forces one table entry per input byte: by byte
    // ~253 the table passes 511 and codes go 10-bit; a long enough stream
    // crosses every boundary and the 4094 reset. Round-trip is the proof
    // that encoder and decoder agree on every switch point.
    val rng = new java.util.Random(7)
    val big = Array.tabulate(100000)(_ => rng.nextInt(256).toByte)
    assert(Lzw.decode(Lzw.encode(big), big.length).sameElements(big))
    // compressible long data exercises the same boundaries on the
    // multi-byte-entry side
    val runs = Array.tabulate(100000)(i => ((i / 17) % 23).toByte)
    assert(Lzw.decode(Lzw.encode(runs), runs.length).sameElements(runs))
  }

  test("LZW corrupt streams fail loudly, never pad or wrap") {
    val ok = Lzw.encode(Array.tabulate(100)(_.toByte))
    intercept[IllegalArgumentException](Lzw.decode(ok, 50))  // overrun
    intercept[IllegalArgumentException](Lzw.decode(ok, 200)) // short
    // truncated stream: EOI synthesized at exhaustion → short output
    intercept[IllegalArgumentException](Lzw.decode(ok.take(5), 100))
  }

  test("PackBits known-bytes: the TIFF 6.0 §9 worked example") {
    // spec's canonical example: 24 unpacked bytes ↔ 15 packed
    val unpacked = (Array.fill(3)(0xAA) ++ Array(0x80, 0x00, 0x2A) ++
      Array.fill(4)(0xAA) ++ Array(0x80, 0x00, 0x2A, 0x22) ++
      Array.fill(10)(0xAA)).map(_.toByte)
    val packed = Array(0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
      0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA).map(_.toByte)
    assert(Packbits.decode(packed, unpacked.length).sameElements(unpacked))
    // our encoder reproduces the spec's packing for this input
    assert(Packbits.encode(unpacked, unpacked.length).sameElements(packed))
  }

  test("PackBits round-trips rows independently; runs never cross rows") {
    val rng = new java.util.Random(13)
    val row = 37
    val data = Array.tabulate(row * 21) { i =>
      if ((i / row) % 2 == 0) 0x55.toByte else (rng.nextInt(4)).toByte
    }
    assert(Packbits.decode(Packbits.encode(data, row), data.length)
      .sameElements(data))
    // >128-byte runs split correctly
    val long = Array.fill(1000)(9.toByte)
    assert(Packbits.decode(Packbits.encode(long, 1000), 1000).sameElements(long))
    // ragged final row
    val ragged = Array.tabulate(100)(i => (i % 3).toByte)
    assert(Packbits.decode(Packbits.encode(ragged, 64), 100).sameElements(ragged))
  }
}
