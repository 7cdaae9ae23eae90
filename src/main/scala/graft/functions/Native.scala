package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{CosineSimilarity, DotProduct, NfcNormalize, StripAccents}

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

  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  def stripAccents(text: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(text)))
}
