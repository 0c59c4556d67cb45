package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type lattice + nodata validation — ports tests/test_data_types.py. */
class PixelTypeSpec extends AnyFunSuite {

  test("boolean lowers to uint8 nbits=1 CCITTFAX4 (data_type.py:122-124)") {
    val t = PixelType.of("boolean")
    assert(t.name == "uint8" && t.nbits.contains(1) && t.compression == "CCITTFAX4")
  }

  test("int8 is signed-byte tagged (data_type.py:44-47)") {
    assert(PixelType.of("int8").signedByte)
    assert(!PixelType.of("uint8").signedByte)
  }

  test("unsigned types widen for compute (uint8→Short, uint16→Int, uint32→Long)") {
    assert(PixelType.of("uint8").sparkType == ShortType)
    assert(PixelType.of("uint16").sparkType == IntegerType)
    assert(PixelType.of("uint32").sparkType == LongType)
    assert(PixelType.of("int32").sparkType == IntegerType)
  }

  test("aliases: half/single/double (data_type.py:131-139)") {
    assert(PixelType.of("half").name == "float16")
    assert(PixelType.of("single").name == "float32")
    assert(PixelType.of("double").name == "float64")
  }

  test("nbits clamps to the width class (data_type_factory)") {
    assert(PixelType.of("uint8", nbits = Some(5)).nbits.contains(5))
    assert(PixelType.of("uint8", nbits = Some(12)).nbits.isEmpty)
    assert(PixelType.of("uint16", nbits = Some(12)).nbits.contains(12))
    assert(PixelType.of("float16").nbits.contains(16))
  }

  test("nodata validation is type-directed (data_type.py:52-78)") {
    intercept[IllegalArgumentException](PixelType.of("boolean", noData = Some(5)))
    assert(PixelType.of("boolean", noData = Some(0)).noData.contains(0.0))
    intercept[IllegalArgumentException](PixelType.of("uint16", noData = Some(1.5)))
    intercept[IllegalArgumentException](PixelType.of("int32", noData = Some(Double.NaN)))
    assert(PixelType.of("float32", noData = Some(Double.NaN)).noData.exists(_.isNaN))
    assert(PixelType.of("uint16", noData = Some(0)).hasNoData)
  }

  test("value ranges honour storage width, not compute width") {
    assert(PixelType.of("uint8").range == ((0.0, 255.0)))
    assert(PixelType.of("int16").range == ((-32768.0, 32767.0)))
    assert(PixelType.of("uint32").range == ((0.0, 4294967295.0)))
  }

  test("unknown type rejected") {
    intercept[IllegalArgumentException](PixelType.of("uint64"))
  }
}
