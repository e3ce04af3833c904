package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Bridge

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** Reference doc-id hash (Query.java:303-316) as a codegen'd
    * expression: `sdbm_hash(seed, str)`. Null string → 0.
    */
  def sdbm_hash(seed: Column, s: Column): Column =
    Bridge.column(SdbmHashExpr(
      Bridge.expression(seed.cast("long")),
      Bridge.expression(s.cast("string"))))

  /** k-minima MinHash signature of a token array (array<long>). */
  def minhash_sig(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(tokens), k))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))

  /** Exact int64 dot product of two array<long> columns (codegen'd). */
  def dot_long(a: Column, b: Column): Column =
    Bridge.column(DotLongExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Sliding word n-gram shingles of a token array (codegen'd). */
  def word_shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(tokens), n))

  /** Fused shingle+MinHash signature (codegen'd, no materialization). */
  def minhash_shingled(tokens: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashShingledExpr(Bridge.expression(tokens), n, k))

  /** Sign-random-projection LSH bucket id of an array<double>. */
  def sign_lsh(vec: Column, nPlanes: Int): Column =
    Bridge.column(SignLshExpr(Bridge.expression(vec.cast("array<double>")), nPlanes))
}
