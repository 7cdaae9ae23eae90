package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{CentroidArgMin, CosineSimilarity, DotProduct, NfcNormalize, StripAccents, TwoLevelArgMin}

/** Column-facing wrappers for the engine's native Catalyst expressions.
  * Inputs are cast to `array<double>` here so the expressions themselves
  * can assume primitive double arrays. */
object Native {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Nearest-centroid cell for a vector column against a driver-side
    * codebook — constant-size generated code at ANY codebook size (the
    * codebook rides as a reference object, never as inlined literals,
    * so 256×64 stays inside WholeStageCodegen where the literal
    * `array_min(struct(...))` form tripped Janino's 64 KB limit). */
  def centroidArgMin(v: Column, codebook: Array[Array[Double]]): Column =
    Bridge.column(CentroidArgMin(
      Bridge.expression(v.cast("array<double>")),
      codebook.map(_.toSeq).toSeq))

  /** Two-level (coarse → fine) nearest-centroid assignment; composite
    * cell id = coarse·fineStride + fineIdx. (k₀+k₁)·d per-row cost for
    * k₀·k₁ effective cells — the constant-cell-size path SemDeDup-style
    * pair joins need at 10M+ vectors. */
  def twoLevelArgMin(v: Column, coarse: Array[Array[Double]],
                     fine: Array[Array[Array[Double]]], fineStride: Int): Column =
    Bridge.column(TwoLevelArgMin(
      Bridge.expression(v.cast("array<double>")),
      coarse.map(_.toSeq).toSeq,
      fine.map(_.map(_.toSeq).toSeq).toSeq, fineStride))

  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  def stripAccents(text: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(text)))
}
