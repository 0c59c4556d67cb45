package graft.sources

/** CCITT Group 4 (ITU-T T.6 two-dimensional MMR) codec for bilevel TIFF
  * tiles — the reference lowers boolean layers to uint8 / NBITS=1 /
  * CCITTFAX4 (`gfw_pixetl/data_type.py:122-124`); this closes the last
  * byte-parity gap of the K1 GeoTIFF sink without GDAL.
  *
  * Conventions: bit 0 = white, bit 1 = black (TIFF PhotometricInterpretation
  * MINISWHITE pairs 0 with white — the layer writer sets it for CCITT
  * profiles); the codestream is MSB-first (FillOrder = 1, the TIFF
  * default); every row codes exactly `width` pixels against the previous
  * row (an imaginary all-white line above row 0); the stream ends with
  * EOFB. In-memory rows are the same MSB-first byte-padded packing the
  * NBITS=1 DEFLATE path uses, so the two codecs swap freely.
  *
  * Mode and run-length codes are the published T.4/T.6 tables (terminating
  * runs 0–63, makeups 64–2560; runs past 2560+63 repeat the 2560 makeup).
  */
private[sources] object CcittG4 {

  // ---- published T.4 run-length code tables (code strings, MSB-first) ----

  private val whiteTerm: Array[String] = Array(
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100", "110101",
    "101010", "101011", "0100111", "0001100", "0001000", "0010111", "0000011", "0000100",
    "0101000", "0101011", "0010011", "0100100", "0011000", "00000010", "00000011", "00011010",
    "00011011", "00010010", "00010011", "00010100", "00010101", "00010110", "00010111", "00101000",
    "00101001", "00101010", "00101011", "00101100", "00101101", "00000100", "00000101", "00001010",
    "00001011", "01010010", "01010011", "01010100", "01010101", "00100100", "00100101", "01011000",
    "01011001", "01011010", "01011011", "01001010", "01001011", "00110010", "00110011", "00110100")

  private val blackTerm: Array[String] = Array(
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100", "00000111", "000011000",
    "0000010111", "0000011000", "0000001000", "00001100111", "00001101000", "00001101100", "00000110111", "00000101000",
    "00000010111", "00000011000", "000011001010", "000011001011", "000011001100", "000011001101", "000001101000", "000001101001",
    "000001101010", "000001101011", "000011010010", "000011010011", "000011010100", "000011010101", "000011010110", "000011010111",
    "000001101100", "000001101101", "000011011010", "000011011011", "000001010100", "000001010101", "000001010110", "000001010111",
    "000001100100", "000001100101", "000001010010", "000001010011", "000000100100", "000000110111", "000000111000", "000000100111",
    "000000101000", "000001011000", "000001011001", "000000101011", "000000101100", "000001011010", "000001100110", "000001100111")

  private val whiteMakeup: Array[String] = Array( // 64, 128, … 1728
    "11011", "10010", "010111", "0110111", "00110110", "00110111",
    "01100100", "01100101", "01101000", "01100111", "011001100", "011001101",
    "011010010", "011010011", "011010100", "011010101", "011010110", "011010111",
    "011011000", "011011001", "011011010", "011011011", "010011000", "010011001",
    "010011010", "011000", "010011011")

  private val blackMakeup: Array[String] = Array( // 64, 128, … 1728
    "0000001111", "000011001000", "000011001001", "000001011011", "000000110011",
    "000000110100", "000000110101", "0000001101100", "0000001101101", "0000001001010",
    "0000001001011", "0000001001100", "0000001001101", "0000001110010", "0000001110011",
    "0000001110100", "0000001110101", "0000001110110", "0000001110111", "0000001010010",
    "0000001010011", "0000001010100", "0000001010101", "0000001011010", "0000001011011",
    "0000001100100", "0000001100101")

  private val extMakeup: Array[String] = Array( // 1792, 1856, … 2560, both colors
    "00000001000", "00000001100", "00000001101", "000000010010",
    "000000010011", "000000010100", "000000010101", "000000010110",
    "000000010111", "000000011100", "000000011101", "000000011110", "000000011111")

  private def parsed(s: String): (Int, Int) = (s.length, Integer.parseInt(s, 2))

  /** (makeupCodes by value 64·(i+1), terminating by run) per color. */
  private val whiteCodes = (whiteMakeup.map(parsed), whiteTerm.map(parsed))
  private val blackCodes = (blackMakeup.map(parsed), blackTerm.map(parsed))
  private val extCodes = extMakeup.map(parsed)

  /** run decode maps: (bitLen << 16 | bits) → run. */
  private def decodeMap(makeup: Array[String], term: Array[String]): Map[Int, Int] = {
    val b = Map.newBuilder[Int, Int]
    term.zipWithIndex.foreach { case (s, run) =>
      val (l, v) = parsed(s); b += ((l << 16 | v) -> run) }
    makeup.zipWithIndex.foreach { case (s, i) =>
      val (l, v) = parsed(s); b += ((l << 16 | v) -> (64 * (i + 1))) }
    extMakeup.zipWithIndex.foreach { case (s, i) =>
      val (l, v) = parsed(s); b += ((l << 16 | v) -> (1792 + 64 * i)) }
    b.result()
  }
  private val whiteDecode = decodeMap(whiteMakeup, whiteTerm)
  private val blackDecode = decodeMap(blackMakeup, blackTerm)

  // ---- bit IO ------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nBits = 0
    def write(len: Int, bits: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((bits >>> i) & 1)
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def toArray: Array[Byte] = {
      if (nBits > 0) { out.write(cur << (8 - nBits)); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def bitsLeft: Int = data.length * 8 - pos
    def read(): Int = {
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
  }

  // ---- encode ------------------------------------------------------------

  /** Change positions of one packed row: ascending p where bit(p) differs
    * from bit(p−1) (bit(−1) = white). */
  private def rowChanges(packed: Array[Byte], rowOff: Int, w: Int): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](16)
    var prev = 0
    var p = 0
    while (p < w) {
      val bit = (packed(rowOff + (p >> 3)) >> (7 - (p & 7))) & 1
      if (bit != prev) { buf += p; prev = bit }
      p += 1
    }
    buf.toArray
  }

  private def at(arr: Array[Int], i: Int, w: Int): Int = if (i < arr.length) arr(i) else w

  /** First index j of `ref` with ref(j) > a0 and transition color opposite
    * `color` (ref transitions alternate to-black at even j). */
  private def b1Index(ref: Array[Int], a0: Int, color: Int, w: Int): Int = {
    var j = 0
    while (j < ref.length && ref(j) <= a0) j += 1
    // want the to-!color transition: even j starts a BLACK run, so keep j
    // when (j & 1) == color (a0 white → even j). The inverted comparison
    // shipped rounds 11-13: self-roundtrip hid it (encoder and decoder
    // shared the helper) — caught by cross-decoding against the JDK's
    // independent T.6 codec, which misread 186/200 random bitmaps.
    if ((j & 1) == color) j else j + 1
  }

  private def writeRun(bw: BitWriter, runIn: Int, color: Int): Unit = {
    var run = runIn
    val (makeup, term) = if (color == 0) whiteCodes else blackCodes
    while (run > 2560 + 63) {
      val (l, v) = extCodes(extCodes.length - 1) // 2560
      bw.write(l, v)
      run -= 2560
    }
    if (run >= 1792) {
      val (l, v) = extCodes((run - 1792) / 64)
      bw.write(l, v)
      run -= ((run - 1792) / 64) * 64 + 1792
    } else if (run >= 64) {
      val (l, v) = makeup(run / 64 - 1)
      bw.write(l, v)
      run &= 63
    }
    val (l, v) = term(run)
    bw.write(l, v)
  }

  /** Encode `height` packed byte-padded rows as a G4 codestream (+EOFB). */
  def encode(packed: Array[Byte], width: Int, height: Int, bytesPerRow: Int): Array[Byte] = {
    val bw = new BitWriter
    var ref = Array.empty[Int] // imaginary all-white line above row 0
    var row = 0
    while (row < height) {
      val cur = rowChanges(packed, row * bytesPerRow, width)
      var a0 = -1
      var color = 0
      var ci = 0
      while (a0 < width) {
        while (ci < cur.length && cur(ci) <= a0) ci += 1
        val a1 = at(cur, ci, width)
        val j = b1Index(ref, a0, color, width)
        val b1 = at(ref, j, width)
        val b2 = at(ref, j + 1, width)
        if (b2 < a1) { // pass
          bw.write(4, 0x1) // 0001
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) { // vertical
          (a1 - b1) match {
            case 0  => bw.write(1, 0x1)     // 1
            case 1  => bw.write(3, 0x3)     // 011
            case 2  => bw.write(6, 0x3)     // 000011
            case 3  => bw.write(7, 0x3)     // 0000011
            case -1 => bw.write(3, 0x2)     // 010
            case -2 => bw.write(6, 0x2)     // 000010
            case -3 => bw.write(7, 0x2)     // 0000010
          }
          a0 = a1
          color ^= 1
        } else { // horizontal
          val a2 = at(cur, ci + 1, width)
          bw.write(3, 0x1) // 001
          writeRun(bw, a1 - math.max(a0, 0), color)
          writeRun(bw, a2 - a1, color ^ 1)
          a0 = a2
        }
      }
      ref = cur
      row += 1
    }
    bw.write(12, 0x1); bw.write(12, 0x1) // EOFB
    bw.toArray
  }

  // ---- decode ------------------------------------------------------------

  private def readRun(br: BitReader, color: Int): Int = {
    val map = if (color == 0) whiteDecode else blackDecode
    var total = 0
    var terminating = false
    while (!terminating) {
      var len = 0; var bits = 0; var run = -1
      while (run < 0) {
        if (len > 13) throw new IllegalArgumentException("bad CCITT G4 run code")
        bits = (bits << 1) | br.read(); len += 1
        run = map.getOrElse(len << 16 | bits, -1)
      }
      total += run
      terminating = run < 64
    }
    total
  }

  /** Decode a G4 codestream back to packed byte-padded rows. */
  def decode(data: Array[Byte], width: Int, height: Int, bytesPerRow: Int): Array[Byte] = {
    val out = new Array[Byte](bytesPerRow * height)
    val br = new BitReader(data)
    var ref = Array.empty[Int]
    var row = 0
    while (row < height) {
      val cur = new scala.collection.mutable.ArrayBuffer[Int](16)
      var a0 = -1
      var color = 0
      while (a0 < width) {
        // mode code: 1 | 011 | 010 | 001 | 0001 | 000011 | 000010 |
        // 0000011 | 0000010 (V0, VR1, VL1, H, P, VR2, VL2, VR3, VL3)
        var zeros = 0
        while (br.read() == 0) {
          zeros += 1
          if (zeros >= 11) throw new IllegalArgumentException(
            "unexpected EOL in CCITT G4 tile codestream")
        }
        val j = b1Index(ref, a0, color, width)
        def bAt(i: Int) = if (i < ref.length) ref(i) else width
        zeros match {
          case 0 => // V0
            val a1 = bAt(j); cur += a1; a0 = a1; color ^= 1
          case 1 => // 01x → VR1 | VL1
            val a1 = bAt(j) + (if (br.read() == 1) 1 else -1)
            cur += a1; a0 = a1; color ^= 1
          case 2 => // 001 → horizontal
            val start = math.max(a0, 0)
            val a1 = math.min(width, start + readRun(br, color))
            val a2 = math.min(width, a1 + readRun(br, color ^ 1))
            cur += a1; cur += a2; a0 = a2
          case 3 => // 0001 → pass
            a0 = bAt(j + 1)
          case 4 => // 00001x → VR2 | VL2
            val a1 = bAt(j) + (if (br.read() == 1) 2 else -2)
            cur += a1; a0 = a1; color ^= 1
          case 5 => // 000001x → VR3 | VL3
            val a1 = bAt(j) + (if (br.read() == 1) 3 else -3)
            cur += a1; a0 = a1; color ^= 1
          case _ => throw new IllegalArgumentException("bad CCITT G4 mode code")
        }
      }
      // changes → packed bits (runs alternate starting white)
      val changes = cur.toArray
      var bit = 0; var ci = 0; var p = 0
      while (p < width) {
        while (ci < changes.length && changes(ci) == p) { bit ^= 1; ci += 1 }
        if (bit == 1) {
          val i = row * bytesPerRow + (p >> 3)
          out(i) = (out(i) | (1 << (7 - (p & 7)))).toByte
        }
        p += 1
      }
      ref = changes
      row += 1
    }
    out
  }
}
