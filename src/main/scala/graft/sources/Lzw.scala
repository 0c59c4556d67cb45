package graft.sources

import java.io.ByteArrayOutputStream

/** TIFF-variant LZW codec (TIFF 6.0 spec §13) — the most common
  * compression on public GeoTIFFs; the reference ingests such files for
  * free through rasterio/GDAL (`gfw_pixetl/utils/utils.py:99-120`), so a
  * user pointing this engine at an existing dataset hits LZW on day one.
  *
  * TIFF's LZW differs from GIF's: codes pack MSB-first into the byte
  * stream, the table starts at 9-bit codes with ClearCode = 256 and
  * EOI = 257 (first free entry 258), and the code width increments EARLY —
  * when the next entry to be created is 511/1023/2047 rather than
  * 512/1024/2048 (the spec's historical off-by-one, kept for
  * compatibility by every decoder since). At table entry 4094 the encoder
  * emits ClearCode and resets.
  */
object Lzw {
  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxTable = 4094 // emit Clear when nextCode reaches this

  /** MSB-first bit packer. */
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc = (acc << width) | (code & ((1L << width) - 1))
      nBits += width
      while (nBits >= 8) {
        out.write(((acc >>> (nBits - 8)) & 0xff).toInt)
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
      out.toByteArray
    }
  }

  /** MSB-first bit reader. */
  private final class BitReader(data: Array[Byte]) {
    private var acc = 0L
    private var nBits = 0
    private var pos = 0
    /** Next `width`-bit code, or EOI if the stream is exhausted. */
    def read(width: Int): Int = {
      while (nBits < width) {
        if (pos >= data.length) return EoiCode
        acc = (acc << 8) | (data(pos) & 0xff)
        pos += 1; nBits += 8
      }
      val v = ((acc >>> (nBits - width)) & ((1L << width) - 1)).toInt
      nBits -= width
      v
    }
  }

  /** Encode with the greedy longest-match table walk. The string table is
    * a hash map keyed (prefixCode << 8 | nextByte) — O(1) per input byte,
    * no per-entry byte arrays. */
  def encode(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    // (prefix, byte) -> code
    val table = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = FirstFree
    var width = 9
    def reset(): Unit = { table.clear(); nextCode = FirstFree; width = 9 }
    bw.write(ClearCode, width)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = Integer.valueOf((prefix << 8) | b)
        val hit = table.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          bw.write(prefix, width)
          table.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // EARLY change: width grows when the next entry to create is
          // 511/1023/2047 (one before the power of two)
          if (nextCode == 511) width = 10
          else if (nextCode == 1023) width = 11
          else if (nextCode == 2047) width = 12
          else if (nextCode >= MaxTable) { bw.write(ClearCode, width); reset() }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      bw.write(prefix, width)
      // The flush code makes the DECODER create one more table entry
      // before it reads EOI, and its width switch fires one entry earlier
      // than the encoder's (510/1022/2046 vs 511/1023/2047). When the
      // entry count lands exactly on a decoder boundary, EOI must be
      // written one bit wider — libtiff's LZWPostEncode does the same
      // free_ent++/nbits++ before EOI. Without this, ~1 tile in 1365
      // (flush landing on a boundary) is written UNDECODABLE by every
      // conforming reader including this file's own decoder.
      if (nextCode == 510 || nextCode == 1022 || nextCode == 2046) width += 1
    }
    bw.write(EoiCode, width)
    bw.finish()
  }

  /** Decode into exactly `expected` bytes (tile payload size is known from
    * the profile); fails loudly on a corrupt stream rather than padding. */
  def decode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    val br = new BitReader(data)
    // table entries as (bytes); literals resolved implicitly
    var entries = new Array[Array[Byte]](4096)
    var nextCode = FirstFree
    var width = 9
    def reset(): Unit = {
      java.util.Arrays.fill(entries.asInstanceOf[Array[AnyRef]], null)
      nextCode = FirstFree; width = 9
    }
    def entry(code: Int): Array[Byte] =
      if (code < 256) Array(code.toByte)
      else {
        val e = entries(code)
        require(e != null, s"LZW: reference to undefined code $code")
        e
      }
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val code = br.read(width)
      if (code == EoiCode) done = true
      else if (code == ClearCode) { reset(); prev = null }
      else {
        val cur =
          if (code < nextCode || code < 256) entry(code)
          else { // the KwKwK case: code being defined right now
            require(prev != null && code == nextCode,
              s"LZW: premature code $code (next $nextCode)")
            prev :+ prev(0)
          }
        require(outPos + cur.length <= expected,
          s"LZW: output overrun at $outPos + ${cur.length} > $expected")
        System.arraycopy(cur, 0, out, outPos, cur.length)
        outPos += cur.length
        if (prev != null && nextCode < 4096) {
          entries(nextCode) = prev :+ cur(0)
          nextCode += 1
          // the decoder's table lags the encoder's by ONE entry (the
          // encoder adds when emitting, the decoder on the NEXT code), so
          // its width switches fire one entry earlier: 510/1022/2046
          if (nextCode == 510) width = 10
          else if (nextCode == 1022) width = 11
          else if (nextCode == 2046) width = 12
        }
        prev = cur
      }
    }
    require(outPos == expected, s"LZW: short stream ($outPos of $expected bytes)")
    out
  }
}

/** PackBits (TIFF 6.0 §9, the classic Apple RLE): runs of 2–128 equal
  * bytes become (257−n, byte); literal spans of 1–128 become (n−1,
  * bytes…); 0x80 is a no-op. The encoder packs each tile ROW separately
  * (the spec's rule for strips, and what keeps a row-window read
  * self-contained); the decoder is a plain stream fold, so it reads
  * row-restarted and continuous streams alike. */
object Packbits {
  def encode(data: Array[Byte], bytesPerRow: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 16)
    var rowStart = 0
    while (rowStart < data.length) {
      val rowEnd = math.min(rowStart + bytesPerRow, data.length)
      var i = rowStart
      while (i < rowEnd) {
        // count the run at i
        var run = 1
        while (i + run < rowEnd && run < 128 && data(i + run) == data(i)) run += 1
        if (run >= 2) {
          out.write(257 - run); out.write(data(i))
          i += run
        } else {
          // literal span: until the next run of >= 3 (2-byte runs inside a
          // literal cost the same either way; 3 breaks even + restart cost)
          var j = i + 1
          var lit = 1
          var break = false
          while (j < rowEnd && lit < 128 && !break) {
            var r = 1
            while (j + r < rowEnd && r < 3 && data(j + r) == data(j)) r += 1
            if (r >= 3) break = true
            else { j += 1; lit += 1 }
          }
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      rowStart = rowEnd
    }
    out.toByteArray
  }

  def decode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    var i = 0
    while (i < data.length && outPos < expected) {
      val n = data(i); i += 1
      if (n >= 0) { // literal n+1 bytes
        val len = n + 1
        require(i + len <= data.length && outPos + len <= expected,
          s"PackBits: literal overrun at $i")
        System.arraycopy(data, i, out, outPos, len)
        i += len; outPos += len
      } else if (n != -128) { // repeat next byte 1-n times
        val len = 1 - n
        require(i < data.length && outPos + len <= expected,
          s"PackBits: run overrun at $i")
        java.util.Arrays.fill(out, outPos, outPos + len, data(i))
        i += 1; outPos += len
      } // -128: no-op
    }
    require(outPos == expected, s"PackBits: short stream ($outPos of $expected)")
    out
  }
}
