package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn.{column => toCol, expression => toExpr}

import graft.functions._

/** Column-level facade over the native text kernels (round 6) — each value
  * is bit-identical to the higher-order-function formulation it replaces
  * (see [[graft.functions.TextKernels]]; TextKernelSpec pins equality).
  */
private[graft] object Kernels {

  /** ≡ `filter(split(lowered, "[^a-z0-9]+"), t => length(t) > 0)`. */
  def alnumRuns(lowered: Column): Column = toCol(AlnumRunsExpression(toExpr(lowered)))

  /** ≡ the `zip_with`-of-`slice`s shingle chain over a token array. */
  def shingles(toks: Column, w: Int): Column = toCol(ShinglesExpression(toExpr(toks), w))

  /** ≡ `transform(arr, s => conv(substring(md5(s), 1, hexDigits), 16, 10).cast("long"))`. */
  def hashArray(arr: Column, hexDigits: Int): Column =
    toCol(HashArrayExpression(toExpr(arr), hexDigits))

  /** ≡ `array(array_min(transform(sh, s => hash64(concat(s, "#0")))), …)`. */
  def minhash(sh: Column, numHashes: Int): Column =
    toCol(MinhashExpression(toExpr(sh), numHashes))

  /** ≡ the per-bit `aggregate` sign-sum folds of Dedup.simhash. */
  def simhashFold(hashes: Column, bits: Int): Column =
    toCol(SimhashFoldExpression(toExpr(hashes), bits))

  /** ≡ `size(filter(arr, t => t.isin(values: _*)))`. */
  def countIn(arr: Column, values: Seq[String]): Column =
    toCol(CountInExpression(toExpr(arr), values))

  /** ≡ `aggregate(arr, lit(0.0), (acc, t) => acc + length(t).cast("double"))`. */
  def sumLen(arr: Column): Column = toCol(SumLenExpression(toExpr(arr)))
}
