package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-dimension vector arithmetic as unrolled codegen-friendly
  * expressions.
  *
  * `aggregate`/`zip_with` higher-order functions are interpreted (no
  * `doGenCode`) and box every element; for a known dimension, an unrolled
  * `element_at` product chain stays inside whole-stage codegen and runs
  * ~an order of magnitude faster on the similarity hot paths. The unrolled
  * left-associated sum (p1 + p2 + …) is IEEE-identical to the sequential
  * fold ((0.0 + p1) + p2 + …) the DuckDB oracle computes, so results stay
  * bit-exact across engines.
  */
object VectorOps {

  /** Σ a[i]·b[i] over 1-based positions 1…dim, evaluated left to right. */
  def dot(a: Column, b: Column, dim: Int = 64): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  /** Σ a[i]² — squared L2 norm, same evaluation order guarantees. */
  def norm2(a: Column, dim: Int = 64): Column =
    (1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _)

  /** Exact double cosine similarity — native one-pass expression
    * (graft.expressions.CosineSimilarity); bit-identical to
    * `dot(a,b)/sqrt(norm2(a)*norm2(b))` with the unrolled helpers below. */
  def cosine(a: Column, b: Column, dim: Int = 64): Column =
    call_function("graft_cosine", a, b)

  /** Unrolled composition of the same cosine (kept for the equivalence
    * spec and as the no-extensions fallback). */
  def cosineUnrolled(a: Column, b: Column, dim: Int = 64): Column =
    dot(a, b, dim) / sqrt(norm2(a, dim) * norm2(b, dim))
}
