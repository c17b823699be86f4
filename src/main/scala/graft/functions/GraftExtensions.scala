package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the engine's codegen kernels, so a
  * SQL-first user (the reference drives everything through spark.sql
  * strings) can call them by name:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   spark.sql("SELECT simhash64(text), doc_fingerprint(text) FROM docs")
  * }}}
  *
  * or, on an already-built session (tests, notebooks):
  * `GraftExtensions.register(spark)`.
  *
  * Every function resolves to the SAME Catalyst `Expression` the Scala
  * API uses — one implementation, two surfaces, identical codegen. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $e")
  }

  /** (identifier, info, builder) triples — the exact shape
    * SparkSessionExtensions.injectFunction takes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit Charikar sketch of distinct lowercased tokens"),
      { case Seq(t) => SimHashExpr(t)
        case args => throw new IllegalArgumentException(
          s"simhash64 expects 1 argument, got ${args.size}") }),
    (FunctionIdentifier("doc_fingerprint"),
      info("doc_fingerprint", "doc_fingerprint(text) - rolling polynomial token-hash fingerprint"),
      { case Seq(t) => FingerprintExpr(t)
        case args => throw new IllegalArgumentException(
          s"doc_fingerprint expects 1 argument, got ${args.size}") }),
    (FunctionIdentifier("repetition_ratio"),
      info("repetition_ratio", "repetition_ratio(text, w) - fraction of repeated w-grams"),
      { case Seq(t, w) => RepetitionRatioExpr(t, litInt(w, "repetition_ratio", "w"))
        case args => throw new IllegalArgumentException(
          s"repetition_ratio expects 2 arguments, got ${args.size}") }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(text, w, k) - k portable affine min-hashes over w-shingles"),
      { case Seq(t, w, k) => MinHashSignatureExpr(t,
          litInt(w, "minhash_signature", "w"), litInt(k, "minhash_signature", "k"),
          portable = true)
        case args => throw new IllegalArgumentException(
          s"minhash_signature expects 3 arguments, got ${args.size}") }),
    (FunctionIdentifier("quantize_q"),
      info("quantize_q", "quantize_q(vec) - float vector to exact 1e3-scaled longs"),
      { case Seq(v) => QuantizeExpr(v)
        case args => throw new IllegalArgumentException(
          s"quantize_q expects 1 argument, got ${args.size}") }),
    (FunctionIdentifier("cosine_q"),
      info("cosine_q", "cosine_q(a, b) - exact cosine over quantized long vectors"),
      { case Seq(a, b) => CosineQExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"cosine_q expects 2 arguments, got ${args.size}") }),
    (FunctionIdentifier("jl_project"),
      info("jl_project", "jl_project(qvec, in_dim, out_dim) - integer-exact JL sign projection"),
      { case Seq(v, i, o) => JlProjectExpr(v,
          litInt(i, "jl_project", "in_dim"), litInt(o, "jl_project", "out_dim"))
        case args => throw new IllegalArgumentException(
          s"jl_project expects 3 arguments, got ${args.size}") }),
    (FunctionIdentifier("pq_encode"),
      info("pq_encode", "pq_encode(qvec, in_dim, n_sub, n_cent) - PQ codes + per-subspace error"),
      { case Seq(v, i, s, c) => PqEncodeExpr(v, litInt(i, "pq_encode", "in_dim"),
          litInt(s, "pq_encode", "n_sub"), litInt(c, "pq_encode", "n_cent"))
        case args => throw new IllegalArgumentException(
          s"pq_encode expects 4 arguments, got ${args.size}") }),
    (FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(text) - lowercase + accent fold + NFC"),
      { case Seq(t) => NormalizeTextExpr(t)
        case args => throw new IllegalArgumentException(
          s"normalize_text expects 1 argument, got ${args.size}") }))

  /** Register on a live session (the config-based path only applies at
    * session build time). Idempotent: re-registration replaces. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graft.SqlInternals
        .registerFunction(spark, ident, inf, builder)
    }
}
