package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.VectorDotProduct

/** Embedding-vector scalar functions over ArrayType(FloatType) columns.
  *
  * The kernel is [[graft.expressions.VectorDotProduct]] — a custom codegen
  * Catalyst expression (tight primitive loop inside whole-stage codegen).
  * The declarative `aggregate(zip_with(...))` formulation it replaces is
  * ~1000x slower on all-pairs workloads: higher-order functions evaluate
  * interpreted, per element, and break codegen for the enclosing operator.
  *
  * Everything accumulates left-to-right in DOUBLE. The DuckDB oracle
  * mirrors the exact fold order (`list_reduce(list_prepend(0.0, ...))`),
  * making the two engines bit-identical — cheaper than reasoning about
  * float error bounds. (DuckDB's own list_cosine_similarity accumulates
  * in float32 and drifts at 1e-7; not used.)
  */
object vectors {

  /** Σ a_i*b_i in double, sequential. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ a_i^2 in double, sequential (no sqrt — callers compose). */
  def sumSquares(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(sumSquares(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Dot product against a constant integer plane (LSH hyperplanes). The
    * plane is lifted to a float-array literal: its small integers are
    * exact in float32, so the double accumulation matches the oracle's
    * int-to-double arithmetic bit-for-bit.
    */
  def dotPlane(a: Column, plane: Seq[Int]): Column =
    dot(a, lit(plane.map(_.toFloat).toArray))

  /** Random-hyperplane signature: bit j set iff dot(v, plane_j) > 0. */
  def lshSignature(a: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex
      .map { case (p, j) => when(dotPlane(a, p) > 0, lit(1L << j)).otherwise(lit(0L)) }
      .reduce(_ + _)
}
