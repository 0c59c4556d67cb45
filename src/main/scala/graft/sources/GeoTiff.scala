package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/** Pure-JVM tiled GeoTIFF codec — the K1 sink and S5/S4 scan of SURVEY §2
  * without GDAL (`gfw_pixetl/tiles/utils/window_utils.py:20-79`,
  * `utils/utils.py:99-120`).
  *
  * Scope: classic TIFF, little-endian, tiled layout, band-separate planes
  * (PlanarConfiguration=2 — the reference writes INTERLEAVE=BAND,
  * `tiles/tile.py:66`), DEFLATE (8) or uncompressed, all pixel types of the
  * lattice (uint8..float64), GDAL_NODATA tag, and the minimal GeoKey set
  * for EPSG:4326 / EPSG:3857. Tile payloads stream to disk as they arrive
  * (any order) and the IFD is written last — a 10-Gpx tile never needs more
  * than one block in memory.
  */
object GeoTiff {

  final case class Profile(
      width: Int, height: Int, bands: Int,
      dataType: String,            // pixel-type lattice name, e.g. "uint16"
      tileWidth: Int, tileHeight: Int,
      noData: Option[Double],
      epsg: Int,                   // 4326 | 3857
      originX: Double, originY: Double,
      xres: Double, yres: Double,
      deflate: Boolean = true,
      nbits: Option[Int] = None,  // sub-byte NBITS (data_type.py:112-149)
      photometric: Option[String] = None, // PHOTOMETRIC creation option (tile.py:68-71)
      ccitt: Boolean = false) { // CCITTFAX4 for bilevel (data_type.py:122-124)
    /** TIFF PhotometricInterpretation code (tag 262). */
    val photometricCode: Int = photometric.map(_.toUpperCase) match {
      case None | Some("MINISBLACK") => 1
      case Some("MINISWHITE") => 0
      case Some("RGB")    => 2
      case Some("PALETTE") => 3
      case Some("CMYK")   => 5
      case Some("YCBCR")  => 6
      case Some("CIELAB") => 8
      case Some("ICCLAB") => 9
      case Some("ITULAB") => 10
      case Some(other) => throw new IllegalArgumentException(s"Unknown photometric $other")
    }
    val (containerBits: Int, sampleFormat: Int) = dataType match {
      case "uint8" | "boolean" => (8, 1)
      case "int8"    => (8, 2)   // SIGNEDBYTE: SampleFormat=INT at 8 bits
      case "uint16"  => (16, 1)
      case "int16"   => (16, 2)
      case "uint32"  => (32, 1)
      case "int32"   => (32, 2)
      case "float16" => (16, 3)  // IEEE half, stored at true 16-bit width
      case "float32" => (32, 3)
      case "float64" => (64, 3)
      case other => throw new IllegalArgumentException(s"Unsupported data type $other")
    }
    /** BitsPerSample as stored: an NBITS of 1–7 bit-packs unsigned samples
      * (boolean → 1-bit rows, the reference's NBITS creation option);
      * 9–15 / 17–31 keep the container width like GDAL's non-packing
      * codecs do. */
    val bitsPerSample: Int =
      nbits.filter(b => b >= 1 && b < 8 && sampleFormat == 1).getOrElse(containerBits)
    require(!ccitt || bitsPerSample == 1,
      s"CCITTFAX4 requires a bilevel profile (NBITS=1), got $bitsPerSample bits")
    /** TIFF packs sub-byte rows MSB-first, each row padded to a byte. */
    def bytesPerRow: Int = (tileWidth * bitsPerSample + 7) / 8
    def tileByteSize: Int =
      if (bitsPerSample >= 8) tileWidth * tileHeight * (bitsPerSample / 8)
      else bytesPerRow * tileHeight
    def tilesAcross: Int = (width + tileWidth - 1) / tileWidth
    def tilesDown: Int   = (height + tileHeight - 1) / tileHeight
    def tilesPerBand: Int = tilesAcross * tilesDown
  }

  // IEEE 754 half-precision conversions (Java 17 lacks Float.floatToFloat16)
  private[sources] def floatToHalf(fval: Float): Short = {
    val fbits = java.lang.Float.floatToIntBits(fval)
    val sign = (fbits >>> 16) & 0x8000
    // round-to-nearest-EVEN like a C float→half cast: bias by half an ulp
    // minus one, plus the LSB of the retained mantissa
    val v = (fbits & 0x7fffffff) + 0xfff + ((fbits >>> 13) & 1)
    if (v >= 0x47800000) {
      if ((fbits & 0x7fffffff) >= 0x47800000) {
        if ((fbits & 0x7fffffff) <= 0x7f800000) (sign | 0x7c00).toShort // overflow / ±inf
        else (sign | 0x7c00 | ((fbits & 0x007fffff) >>> 13) | 1).toShort // NaN (mantissa kept non-zero)
      } else (sign | 0x7bff).toShort // rounded up to max half
    }
    else if (v >= 0x38800000) (sign | ((v - 0x38000000) >>> 13)).toShort // normal
    else if (v < 0x33000000) sign.toShort // underflow → ±0
    else { // subnormal half
      val e = (fbits & 0x7fffffff) >>> 23
      (sign | ((((fbits & 0x7fffff) | 0x800000) + (0x800000 >>> (e - 102))) >>> (126 - e))).toShort
    }
  }

  private[sources] def halfToFloat(half: Int): Float = {
    val mant = half & 0x03ff
    val exp = half & 0x7c00
    if (exp == 0x7c00) // inf/NaN
      java.lang.Float.intBitsToFloat(((half & 0x8000) << 16) | 0x7f800000 | (mant << 13))
    else if (exp != 0)
      java.lang.Float.intBitsToFloat(((half & 0x8000) << 16) | ((exp + 0x1c000 | mant) << 13))
    else if (mant != 0) { // subnormal
      var e = 0x1c400; var m = mant
      while ((m & 0x400) == 0) { m <<= 1; e -= 0x400 }
      java.lang.Float.intBitsToFloat(((half & 0x8000) << 16) | ((e | (m & 0x3ff)) << 13))
    } else java.lang.Float.intBitsToFloat((half & 0x8000) << 16) // ±0
  }

  // ------------------------------------------------------------------ write
  /** Incremental writer: feed tiles in ANY order, close() writes the IFD. */
  final class Writer(path: String, profile: Profile) {
    private val raf = new RandomAccessFile(path, "rw")
    raf.setLength(0)
    // header: II, 42, IFD offset placeholder (patched on close)
    raf.write(Array[Byte]('I', 'I', 42, 0))
    raf.write(Array[Byte](0, 0, 0, 0))
    private val nTiles = profile.tilesPerBand * profile.bands
    private val offsets = new Array[Long](nTiles)
    private val counts = new Array[Long](nTiles)

    /** Write one tile's pixels (row-major, length tileWidth*tileHeight).
      * Values are narrowed to the profile's storage type here — the
      * widen-compute/narrow-store boundary (SURVEY §1.2). */
    def writeTile(band: Int, tileRow: Int, tileCol: Int, pixels: Array[Double]): Unit = {
      require(pixels.length == profile.tileWidth * profile.tileHeight,
        s"tile must be padded to ${profile.tileWidth}x${profile.tileHeight}")
      val idx = (band - 1) * profile.tilesPerBand + tileRow * profile.tilesAcross + tileCol
      val raw = encode(pixels)
      val payload =
        if (profile.ccitt)
          CcittG4.encode(raw, profile.tileWidth, profile.tileHeight, profile.bytesPerRow)
        else if (profile.deflate) deflate(raw)
        else raw
      val at = raf.getFilePointer
      // classic TIFF stores offsets as 32-bit: fail loudly instead of
      // silently wrapping into a corrupt file (BigTIFF is out of scope)
      require(at + payload.length <= 0xFFFFFFFFL,
        s"$path exceeds the classic TIFF 4GB limit at tile ($band,$tileRow,$tileCol)")
      offsets(idx) = at
      counts(idx) = payload.length
      raf.write(payload)
    }

    private def encode(px: Array[Double]): Array[Byte] = {
      // out-of-range values CLAMP to the storage range (GDAL semantics);
      // Java's narrowing casts would silently wrap instead
      def cl(v: Double, lo: Long, hi: Long): Long =
        math.max(lo, math.min(hi, math.rint(v).toLong))
      val bits = profile.bitsPerSample
      if (bits < 8) { // sub-byte NBITS: MSB-first packing, byte-padded rows
        val tw = profile.tileWidth; val bpr = profile.bytesPerRow
        val out = new Array[Byte](profile.tileByteSize)
        val maxV = (1L << bits) - 1
        var r = 0
        while (r < profile.tileHeight) {
          var c = 0
          while (c < tw) {
            val v = cl(px(r * tw + c), 0, maxV)
            var remaining = bits; var bit = c * bits
            while (remaining > 0) { // a 3/5/6/7-bit sample can span two bytes
              val free = 8 - (bit % 8)
              val take = math.min(free, remaining)
              val chunk = (v >>> (remaining - take)) & ((1 << take) - 1)
              val i = r * bpr + bit / 8
              out(i) = (out(i) | (chunk << (free - take))).toByte
              bit += take; remaining -= take
            }
            c += 1
          }
          r += 1
        }
        return out
      }
      val bb = ByteBuffer.allocate(profile.tileByteSize).order(ByteOrder.LITTLE_ENDIAN)
      (bits, profile.sampleFormat) match {
        case (8, 1)  => px.foreach(v => bb.put(cl(v, 0, 255).toByte))
        case (8, 2)  => px.foreach(v => bb.put(cl(v, -128, 127).toByte))
        case (16, 1) => px.foreach(v => bb.putShort(cl(v, 0, 65535).toShort))
        case (16, 2) => px.foreach(v => bb.putShort(cl(v, -32768, 32767).toShort))
        case (16, 3) => px.foreach(v => bb.putShort(floatToHalf(v.toFloat)))
        case (32, 1) => px.foreach(v => bb.putInt(cl(v, 0, 4294967295L).toInt))
        case (32, 2) => px.foreach(v => bb.putInt(cl(v, Int.MinValue, Int.MaxValue).toInt))
        case (32, 3) => px.foreach(v => bb.putFloat(v.toFloat))
        case (64, 3) => px.foreach(bb.putDouble)
        case other   => throw new IllegalStateException(s"encode $other")
      }
      bb.array()
    }

    def close(): Unit = {
      require(offsets.forall(_ > 0), "not all tiles were written")
      val ifdOffset = raf.getFilePointer
      val ifd = buildIfd(ifdOffset)
      require(ifdOffset + ifd.length <= 0xFFFFFFFFL,
        s"$path exceeds the classic TIFF 4GB limit (IFD at $ifdOffset)")
      raf.write(ifd)
      raf.seek(4)
      raf.write(leInt(ifdOffset.toInt))
      raf.close()
    }

    // --- IFD construction -------------------------------------------------
    private case class Entry(tag: Int, typ: Int, count: Int, valueOrOffset: Array[Byte])
    private val TByte = 1; private val TAscii = 2; private val TShort = 3
    private val TLong = 4; private val TDouble = 12

    private def leShort(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    private def leInt(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    private def leDouble(v: Double): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()

    private def buildIfd(ifdOffset: Long): Array[Byte] = {
      val p = profile
      val entries = mutable.ArrayBuffer.empty[Entry]
      val overflow = new ByteArrayOutputStream() // data blocks after the IFD

      def shortVal(v: Int) = leShort(v) ++ Array[Byte](0, 0)
      def longVal(v: Long) = leInt(v.toInt)

      def add(tag: Int, typ: Int, count: Int, inline: Array[Byte]): Unit =
        entries += Entry(tag, typ, count, inline.padTo(4, 0.toByte))

      // data too big for the 4 inline bytes goes to the overflow block;
      // its offset is resolved after the entry table size is known
      case class Deferred(tag: Int, typ: Int, count: Int, data: Array[Byte])
      val deferred = mutable.ArrayBuffer.empty[Deferred]
      def addBig(tag: Int, typ: Int, count: Int, data: Array[Byte]): Unit =
        if (data.length <= 4) add(tag, typ, count, data)
        else deferred += Deferred(tag, typ, count, data)

      add(256, TLong, 1, longVal(p.width))
      add(257, TLong, 1, longVal(p.height))
      val bits = Array.fill(p.bands)(leShort(p.bitsPerSample)).flatten
      addBig(258, TShort, p.bands, bits)
      add(259, TShort, 1, shortVal(if (p.ccitt) 4 else if (p.deflate) 8 else 1))
      add(262, TShort, 1, shortVal(p.photometricCode))
      add(277, TShort, 1, shortVal(p.bands))
      add(284, TShort, 1, shortVal(2)) // planar = separate (INTERLEAVE=BAND)
      if (p.ccitt) add(293, TLong, 1, longVal(0)) // T6Options: no extensions
      add(322, TLong, 1, longVal(p.tileWidth))
      add(323, TLong, 1, longVal(p.tileHeight))
      addBig(324, TLong, nTiles, offsets.flatMap(o => leInt(o.toInt)))
      addBig(325, TLong, nTiles, counts.flatMap(c => leInt(c.toInt)))
      val fmts = Array.fill(p.bands)(leShort(p.sampleFormat)).flatten
      addBig(339, TShort, p.bands, fmts)
      // ModelPixelScale (33550): (xres, yres, 0)
      addBig(33550, TDouble, 3,
        leDouble(p.xres) ++ leDouble(p.yres) ++ leDouble(0))
      // ModelTiepoint (33922): raster (0,0,0) → model (originX, originY, 0)
      addBig(33922, TDouble, 6,
        leDouble(0) ++ leDouble(0) ++ leDouble(0) ++
          leDouble(p.originX) ++ leDouble(p.originY) ++ leDouble(0))
      // GeoKeyDirectory (34735): version, rev, minor, nkeys + keys
      val geographic = p.epsg == 4326
      val keys: Array[Int] =
        Array(1, 1, 0, 3,
          1024, 0, 1, if (geographic) 2 else 1,          // GTModelType
          1025, 0, 1, 1,                                  // RasterPixelIsArea
          if (geographic) 2048 else 3072, 0, 1, p.epsg)   // CS key
      addBig(34735, TShort, keys.length, keys.flatMap(leShort))
      p.noData.foreach { nd =>
        val s = (if (nd == nd.toLong.toDouble) nd.toLong.toString else nd.toString) + " "
        addBig(42113, TAscii, s.length, s.getBytes("ASCII"))
      }

      // resolve deferred offsets
      val sorted = (entries.map(e => (e.tag, e)) ++ deferred.map(d => (d.tag, null))).map(_._1)
      val nEntries = entries.length + deferred.length
      val ifdSize = 2 + nEntries * 12 + 4
      var overflowOffset = ifdOffset + ifdSize
      val resolved = deferred.map { d =>
        val e = Entry(d.tag, d.typ, d.count, leInt(overflowOffset.toInt))
        overflow.write(d.data)
        overflowOffset += d.data.length
        e
      }
      val all = (entries ++ resolved).sortBy(_.tag)

      val out = new ByteArrayOutputStream()
      val dos = new DataOutputStream(out)
      dos.write(leShort(all.length))
      all.foreach { e =>
        dos.write(leShort(e.tag)); dos.write(leShort(e.typ))
        dos.write(leInt(e.count)); dos.write(e.valueOrOffset.take(4))
      }
      dos.write(leInt(0)) // next IFD = none
      dos.write(overflow.toByteArray)
      out.toByteArray
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected) off += inf.inflate(out, off, expected - off)
    inf.end()
    out
  }

  // ------------------------------------------------------------------- read
  /** Seekable read abstraction: POSIX files locally, any Hadoop FileSystem
    * (s3a://, gs://, hdfs://) in production — same ranged-read access
    * pattern either way (the reference's VSI curl reads, SURVEY §4). */
  sealed trait RangeReader extends java.io.Closeable {
    def seek(pos: Long): Unit
    def readFully(buf: Array[Byte]): Unit
  }

  private final class LocalRangeReader(path: String) extends RangeReader {
    private val raf = new RandomAccessFile(path, "r")
    override def seek(pos: Long): Unit = raf.seek(pos)
    override def readFully(buf: Array[Byte]): Unit = raf.readFully(buf)
    override def close(): Unit = raf.close()
  }

  private[sources] final class HadoopRangeReader(path: String) extends RangeReader {
    private val hp = new org.apache.hadoop.fs.Path(path)
    private val in = hp.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(hp)
    override def seek(pos: Long): Unit = in.seek(pos)
    override def readFully(buf: Array[Byte]): Unit = in.readFully(buf, 0, buf.length)
    override def close(): Unit = in.close()
  }

  private[sources] def rangeReader(path: String): RangeReader =
    if (path.startsWith("file:") || !path.contains("://")) new LocalRangeReader(localPath(path))
    else new HadoopRangeReader(path)

  final case class Tiff(profile: Profile, tileOffsets: Array[Long], tileCounts: Array[Long],
                        path: String) {
    /** S5: read one tile's pixels as doubles (masked handling upstream). */
    def readTile(band: Int, tileRow: Int, tileCol: Int): Array[Double] = {
      val p = profile
      val idx = (band - 1) * p.tilesPerBand + tileRow * p.tilesAcross + tileCol
      val raf = rangeReader(path)
      try {
        raf.seek(tileOffsets(idx))
        val payload = new Array[Byte](tileCounts(idx).toInt)
        raf.readFully(payload)
        val nPx = p.tileWidth * p.tileHeight
        val raw =
          if (p.ccitt) CcittG4.decode(payload, p.tileWidth, p.tileHeight, p.bytesPerRow)
          else if (p.deflate) inflate(payload, p.tileByteSize)
          else payload
        decode(raw, nPx)
      } finally raf.close()
    }

    private def decode(raw: Array[Byte], nPx: Int): Array[Double] = {
      val p = profile
      val out = new Array[Double](nPx)
      val bits = p.bitsPerSample
      if (bits < 8) { // sub-byte NBITS: MSB-first, byte-padded rows
        val tw = p.tileWidth; val bpr = p.bytesPerRow
        var r = 0
        while (r < p.tileHeight) {
          var c = 0
          while (c < tw) {
            var v = 0L; var remaining = bits; var bit = c * bits
            while (remaining > 0) {
              val free = 8 - (bit % 8)
              val take = math.min(free, remaining)
              val chunk = (raw(r * bpr + bit / 8) >>> (free - take)) & ((1 << take) - 1)
              v = (v << take) | chunk
              bit += take; remaining -= take
            }
            out(r * tw + c) = v.toDouble
            c += 1
          }
          r += 1
        }
        return out
      }
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      (bits, p.sampleFormat) match {
        case (8, 1)  => while (i < nPx) { out(i) = bb.get() & 0xff; i += 1 }
        case (8, 2)  => while (i < nPx) { out(i) = bb.get().toDouble; i += 1 }
        case (16, 1) => while (i < nPx) { out(i) = bb.getShort() & 0xffff; i += 1 }
        case (16, 2) => while (i < nPx) { out(i) = bb.getShort().toDouble; i += 1 }
        case (16, 3) => while (i < nPx) { out(i) = halfToFloat(bb.getShort() & 0xffff).toDouble; i += 1 }
        case (32, 1) => while (i < nPx) { out(i) = bb.getInt() & 0xffffffffL; i += 1 }
        case (32, 2) => while (i < nPx) { out(i) = bb.getInt().toDouble; i += 1 }
        case (32, 3) => while (i < nPx) { out(i) = bb.getFloat().toDouble; i += 1 }
        case (64, 3) => while (i < nPx) { out(i) = bb.getDouble(); i += 1 }
        case other   => throw new IllegalStateException(s"decode $other")
      }
      out
    }

    def bounds: (Double, Double, Double, Double) = {
      val p = profile
      (p.originX, p.originY - p.height * p.yres, p.originX + p.width * p.xres, p.originY)
    }
  }

  /** S4: metadata scan — open the file, parse the IFD into a Profile
    * (`utils/utils.py:99-120`). */
  def open(rawPath: String): Tiff = {
    val path = rawPath
    val raf = rangeReader(path)
    try {
      val head = new Array[Byte](8); raf.readFully(head)
      require(head(0) == 'I' && head(1) == 'I' && head(2) == 42, s"not a little-endian TIFF: $path")
      val ifdOffset = ByteBuffer.wrap(head, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt & 0xffffffffL
      raf.seek(ifdOffset)
      val nEntries = readShortLE(raf)
      // tag -> (type, count, raw 4 value bytes): values totalling <= 4 bytes
      // are stored inline in the entry; larger ones live at the offset those
      // bytes encode
      val tags = mutable.Map.empty[Int, (Int, Int, Array[Byte])]
      for (_ <- 0 until nEntries) {
        val tag = readShortLE(raf); val typ = readShortLE(raf)
        val count = readIntLE(raf)
        val raw = new Array[Byte](4); raf.readFully(raw)
        tags(tag) = (typ, count, raw)
      }
      def typeWidth(typ: Int): Int = typ match {
        case 1 | 2 => 1; case 3 => 2; case 4 => 4; case 12 => 8
        case other => throw new IllegalArgumentException(s"TIFF type $other")
      }
      def rawData(tag: Int): Option[Array[Byte]] = tags.get(tag).map { case (typ, count, raw) =>
        val total = count * typeWidth(typ)
        if (total <= 4) raw.take(total)
        else {
          val off = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).getInt & 0xffffffffL
          raf.seek(off)
          val data = new Array[Byte](total); raf.readFully(data)
          data
        }
      }
      def array(tag: Int): Array[Long] = tags.get(tag) match {
        case None => Array.empty
        case Some((typ, count, _)) =>
          val bb = ByteBuffer.wrap(rawData(tag).get).order(ByteOrder.LITTLE_ENDIAN)
          Array.fill(count)(typ match {
            case 1 => (bb.get() & 0xff).toLong
            case 3 => (bb.getShort & 0xffff).toLong
            case 4 => bb.getInt & 0xffffffffL
            case 12 => java.lang.Double.doubleToLongBits(bb.getDouble)
          })
      }
      def scalar(tag: Int, dflt: Long = -1): Long = array(tag).headOption.getOrElse(dflt)
      def doubles(tag: Int): Array[Double] = array(tag).map(java.lang.Double.longBitsToDouble)
      def ascii(tag: Int): Option[String] =
        rawData(tag).map(new String(_, "ASCII").takeWhile(c => c != ' ' && c != 0.toChar))

      val bands = scalar(277, 1).toInt
      val bits = array(258).headOption.getOrElse(8L).toInt
      val fmt = array(339).headOption.getOrElse(1L).toInt
      val dataType = (bits, fmt) match {
        case (b, 1) if b < 8 => "uint8" // sub-byte NBITS container
        case (8, 1) => "uint8";   case (8, 2) => "int8"
        case (16, 1) => "uint16"; case (16, 2) => "int16"
        case (16, 3) => "float16"
        case (32, 1) => "uint32"; case (32, 2) => "int32"
        case (32, 3) => "float32"; case (64, 3) => "float64"
        case other => throw new IllegalArgumentException(s"unsupported sample $other")
      }
      // only NONE (1), CCITT G4 (4, bilevel), and DEFLATE (8) decode here —
      // anything else (LZW, PackBits, JPEG…) must fail fast instead of
      // yielding garbage pixels
      val compression = scalar(259, 1)
      require(compression == 1 || compression == 8 ||
          (compression == 4 && bits == 1),
        s"unsupported TIFF compression $compression in $path " +
          "(only none=1, ccitt-g4=4 bilevel, deflate=8)")
      val scale = doubles(33550)
      val tiepoint = doubles(33922)
      val geoKeys = array(34735)
      val epsg = geoKeys.grouped(4).collectFirst {
        case Array(k, _, _, v) if k == 2048 || k == 3072 => v.toInt
      }.getOrElse(4326)
      val profile = Profile(
        width = scalar(256).toInt, height = scalar(257).toInt, bands = bands,
        dataType = dataType,
        tileWidth = scalar(322).toInt, tileHeight = scalar(323).toInt,
        noData = ascii(42113).map(_.trim.toDouble),
        epsg = epsg,
        originX = if (tiepoint.length >= 6) tiepoint(3) else 0,
        originY = if (tiepoint.length >= 6) tiepoint(4) else 0,
        xres = if (scale.nonEmpty) scale(0) else 1,
        yres = if (scale.length > 1) scale(1) else 1,
        deflate = compression == 8,
        ccitt = compression == 4,
        nbits = if (bits < 8) Some(bits) else None,
        photometric = scalar(262, 1) match {
          case 0 => Some("MINISWHITE"); case 2 => Some("RGB"); case 3 => Some("PALETTE")
          case 5 => Some("CMYK"); case 6 => Some("YCBCR"); case 8 => Some("CIELAB")
          case 9 => Some("ICCLAB"); case 10 => Some("ITULAB"); case _ => None
        })
      Tiff(profile, array(324), array(325), path)
    } finally raf.close()
  }

  /** Accept plain paths and file: URIs (Hadoop listings yield the latter). */
  private def localPath(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  private def readShortLE(raf: RangeReader): Int = {
    val b = new Array[Byte](2); raf.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
  }
  private def readIntLE(raf: RangeReader): Int = {
    val b = new Array[Byte](4); raf.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }
}
