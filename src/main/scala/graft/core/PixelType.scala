package graft.core

import org.apache.spark.sql.types._

/** Scalar pixel type lattice of the engine.
  *
  * Re-expression of `gfw_pixetl/data_type.py:14-149`: declared output types
  * with optional sub-byte `nbits`, a `noData` sentinel, and type-directed
  * nodata validation (ints require integer nodata, floats require
  * float/NaN, boolean requires 0/None). `boolean` lowers to uint8/nbits=1
  * with CCITTFAX4 compression (`data_type.py:122-124`); `int8` is tagged
  * signed-byte (`data_type.py:44-47`).
  *
  * The JVM has no unsigned integers, so each type carries BOTH a compute
  * type (widened so arithmetic can't overflow: uint8→Short, uint16→Int,
  * uint32→Long) and a storage width for the sink — the widen-compute /
  * narrow-store discipline of SURVEY §7.4.
  */
final case class PixelType(
    name: String,              // canonical reference name (post-aliasing)
    sparkType: DataType,       // compute-time Spark type (widened for unsigned)
    storageBits: Int,          // bits written by the sink (before nbits override)
    isFloat: Boolean,
    unsigned: Boolean,
    nbits: Option[Int] = None, // sub-byte / sub-word width override
    noData: Option[Double] = None,
    compression: String = "DEFLATE",
    signedByte: Boolean = false) {

  def hasNoData: Boolean = noData.exists(nd => nd == 0.0 || nd != 0.0 || nd.isNaN)

  /** Valid value range for overflow checks at the sink. */
  def range: (Double, Double) = (name, unsigned) match {
    case (_, true)     => (0.0, math.pow(2, storageBits) - 1)
    case ("float16", _) => (-65504.0, 65504.0)
    case (n, _) if isFloat => (Double.MinValue, Double.MaxValue)
    case _             => (-math.pow(2, storageBits - 1), math.pow(2, storageBits - 1) - 1)
  }
}

object PixelType {
  /** `data_type_factory` (`data_type.py:112-149`): aliases resolved, nbits
    * clamped to the width class of the type, boolean lowered to uint8/1. */
  def of(dataType: String, nbits: Option[Int] = None,
         noData: Option[Double] = None): PixelType = {
    val dt = dataType.toLowerCase
    validateNoData(dt, noData, nbits)
    def bitsIn(lo: Int, hi: Int): Option[Int] = nbits.filter(b => b >= lo && b <= hi)
    dt match {
      case "boolean" => PixelType("uint8", ShortType, 8, isFloat = false, unsigned = true,
        nbits = Some(1), noData = noData, compression = "CCITTFAX4")
      case "uint8"   => PixelType("uint8", ShortType, 8, isFloat = false, unsigned = true, bitsIn(1, 7), noData)
      case "int8"    => PixelType("int8", ByteType, 8, isFloat = false, unsigned = false, bitsIn(1, 7), noData,
        signedByte = true)
      case "uint16"  => PixelType("uint16", IntegerType, 16, isFloat = false, unsigned = true, bitsIn(9, 15), noData)
      case "int16"   => PixelType("int16", ShortType, 16, isFloat = false, unsigned = false, bitsIn(9, 15), noData)
      case "uint32"  => PixelType("uint32", LongType, 32, isFloat = false, unsigned = true, bitsIn(17, 31), noData)
      case "int32"   => PixelType("int32", IntegerType, 32, isFloat = false, unsigned = false, bitsIn(17, 31), noData)
      case "float16" | "half" =>
        PixelType("float16", FloatType, 16, isFloat = true, unsigned = false, Some(16), noData)
      case "float32" | "single" =>
        PixelType("float32", FloatType, 32, isFloat = true, unsigned = false, None, noData)
      case "float64" | "double" =>
        PixelType("float64", DoubleType, 64, isFloat = true, unsigned = false, None, noData)
      case other => throw new IllegalArgumentException(s"Unknown data type $other")
    }
  }

  /** Type-directed nodata validation (`data_type.py:52-78`). */
  private def validateNoData(dt: String, noData: Option[Double], nbits: Option[Int]): Unit = {
    val isBool = dt == "boolean" || nbits.contains(1)
    noData.foreach { nd =>
      if (isBool && nd != 0.0)
        throw new IllegalArgumentException(
          s"No data value $nd must be 0 or None for data type Boolean")
      else if (dt.contains("int") && (nd != math.rint(nd) || nd.isNaN || nd.isInfinite))
        throw new IllegalArgumentException(
          s"No data value $nd must be of type `int` or None for data type $dt")
    }
  }

  val names: Seq[String] = Seq("boolean", "uint8", "int8", "uint16", "int16",
    "uint32", "int32", "float16", "half", "float32", "single", "float64", "double")
}
