package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.bitset.BitSetMethods

/** Direct construction of null-carrying [[UnsafeArrayData]] blocks.
  *
  * `UnsafeArrayData.fromPrimitiveArray` only covers null-free arrays, so
  * every masked (null-carrying) block used to round-trip through a
  * `GenericArrayData` of boxed elements — one `java.lang.Double` per pixel
  * on the way OUT of a kernel, then an element-wise (not memcpy) copy into
  * every downstream UnsafeRow. These builders write the Unsafe wire format
  * straight from the primitive loop: [numElements][null bitset][values],
  * exactly the layout `UnsafeArrayData.pointTo` reads back, so downstream
  * row writers copy the block with one memcpy and nothing ever boxes.
  */
object UnsafeArrayBuilders {
  private def alloc(n: Int, elemSize: Int): (Array[Byte], Int) = {
    val header = UnsafeArrayData.calculateHeaderPortionInBytes(n)
    val total = ((header + elemSize.toLong * n + 7L) / 8L * 8L).toInt
    val data = new Array[Byte](total)
    Platform.putLong(data, Platform.BYTE_ARRAY_OFFSET, n.toLong)
    (data, header)
  }
  private def result(data: Array[Byte]): UnsafeArrayData = {
    val a = new UnsafeArrayData()
    a.pointTo(data, Platform.BYTE_ARRAY_OFFSET, data.length)
    a
  }

  final class Doubles(n: Int) {
    private val (data, header) = alloc(n, 8)
    @inline def setNull(i: Int): Unit =
      BitSetMethods.set(data, Platform.BYTE_ARRAY_OFFSET + 8L, i)
    @inline def set(i: Int, v: Double): Unit =
      Platform.putDouble(data, Platform.BYTE_ARRAY_OFFSET + header + 8L * i, v)
    def build(): UnsafeArrayData = result(data)
  }

  final class Longs(n: Int) {
    private val (data, header) = alloc(n, 8)
    @inline def setNull(i: Int): Unit =
      BitSetMethods.set(data, Platform.BYTE_ARRAY_OFFSET + 8L, i)
    @inline def set(i: Int, v: Long): Unit =
      Platform.putLong(data, Platform.BYTE_ARRAY_OFFSET + header + 8L * i, v)
    def build(): UnsafeArrayData = result(data)
  }

  final class Ints(n: Int) {
    private val (data, header) = alloc(n, 4)
    @inline def setNull(i: Int): Unit =
      BitSetMethods.set(data, Platform.BYTE_ARRAY_OFFSET + 8L, i)
    @inline def set(i: Int, v: Int): Unit =
      Platform.putInt(data, Platform.BYTE_ARRAY_OFFSET + header + 4L * i, v)
    def build(): UnsafeArrayData = result(data)
  }

  final class Floats(n: Int) {
    private val (data, header) = alloc(n, 4)
    @inline def setNull(i: Int): Unit =
      BitSetMethods.set(data, Platform.BYTE_ARRAY_OFFSET + 8L, i)
    @inline def set(i: Int, v: Float): Unit =
      Platform.putFloat(data, Platform.BYTE_ARRAY_OFFSET + header + 4L * i, v)
    def build(): UnsafeArrayData = result(data)
  }

  final class Booleans(n: Int) {
    private val (data, header) = alloc(n, 1)
    @inline def setNull(i: Int): Unit =
      BitSetMethods.set(data, Platform.BYTE_ARRAY_OFFSET + 8L, i)
    @inline def set(i: Int, v: Boolean): Unit =
      Platform.putBoolean(data, Platform.BYTE_ARRAY_OFFSET + header + i.toLong, v)
    def build(): UnsafeArrayData = result(data)
  }
}
