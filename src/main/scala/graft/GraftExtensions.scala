package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: inject the engine's codegen'd
  * Catalyst expressions at SESSION BUILD time —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — so a cluster operator enables the function surface once in
  * spark-defaults and every session (including pure-SQL ones: JDBC
  * gateways, notebooks) resolves `dot_product`, `minhash_sig`, … with
  * no library call. [[graft.functions.GraftFunctions.register]] is the
  * in-process twin used by `Tables.tune` for sessions we build
  * ourselves; both feed the same builders, so there is exactly one
  * definition of each function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression): Int = GraftFunctions.intLit(e)

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inj(name: String, usage: String,
            builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    inj("dot_product",
      "_FUNC_(a, b) - double sequential-fold dot product of two arrays",
      exprs => DotProduct(exprs(0), exprs(1)))
    inj("char_gram_hashes",
      "_FUNC_(text, n) - distinct xxhash64 set of the n-char grams",
      exprs => CharGramHashes(exprs(0), intLit(exprs(1))))
    inj("token_shingle_hashes",
      "_FUNC_(text, n) - distinct xxhash64 set of the n-token shingles",
      exprs => TokenShingleHashes(exprs(0), intLit(exprs(1))))
    inj("minhash_sig",
      "_FUNC_(hashes, k) - k-slot minhash signature of a hash set",
      exprs => MinHashSig(exprs(0), intLit(exprs(1))))
    inj("simhash64",
      "_FUNC_(text) - 64-bit token simhash as [lo32, hi32]",
      exprs => SimHash64(exprs(0)))
  }
}
