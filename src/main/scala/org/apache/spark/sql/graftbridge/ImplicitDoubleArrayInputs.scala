package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType}

/** Mixin declaring every input of an expression as `array<double>` with
  * implicit coercion: the analyzer inserts `array<numeric>`→`array<double>`
  * casts instead of failing analysis. `AbstractDataType` (the type of
  * `inputTypes`) is `private[sql]`, so the declaration lives in this bridge
  * package — same extension-point shim pattern as [[ColumnBridge]].
  *
  * Used by the per-block pixel kernels (graft.functions.BlockKernels):
  * integer band arrays (uint8/uint16 rasters, floor() legs, P2 cast output)
  * must widen exactly as the type-generic HOF forms they replaced did.
  */
trait ImplicitDoubleArrayInputs extends ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(ArrayType(DoubleType, containsNull = true))
}
