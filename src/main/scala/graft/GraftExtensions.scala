package graft

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native Catalyst surface —
  * the documented public injection point (`spark.sql.extensions=
  * graft.GraftExtensions` or `SparkSession.builder.withExtensions`).
  * Kept deliberately small, added only where composition of built-ins
  * measurably loses (SURVEY §4.2 said "no custom Catalyst required" —
  * correct for capability; these are performance escalations):
  *
  *  - `graft_dot(array<double>, array<double>) → double` — codegen'd
  *    dot product on the similarity hot path.
  *  - [[graft.plans.RangeJoinRewrite]] — opt-in optimizer rule
  *    (enabled by setting `spark.graft.rangeJoin.bucketWidth`) that
  *    turns BETWEEN theta-joins into bucketed equi-joins instead of
  *    per-key nested loops.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.expressions.Shingles].getName,
        "graft_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_shingles takes exactly 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        graft.expressions.Shingles(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_horner_hash"),
      new ExpressionInfo(classOf[graft.expressions.HornerHash].getName,
        "graft_horner_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_horner_hash takes exactly 1 argument")
        graft.expressions.HornerHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[graft.expressions.GramHashes].getName,
        "graft_gram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_gram_hashes takes exactly 2 arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_gram_hashes k must be an integer literal, got $other")
        }
        graft.expressions.GramHashes(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[graft.expressions.CharNgrams].getName,
        "graft_char_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_char_ngrams takes exactly 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_char_ngrams n must be an integer literal, got $other")
        }
        graft.expressions.CharNgrams(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk_freq"),
      new ExpressionInfo(classOf[graft.expressions.TopKFreq].getName,
        "graft_topk_freq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "graft_topk_freq takes exactly 3 arguments")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk_freq $what must be an integer literal, got $other")
        }
        graft.expressions.TopKFreq(children.head,
          intLit(children(1), "k"), intLit(children(2), "capacity"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo(classOf[graft.expressions.QualityScore].getName,
        "graft_quality_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1,
          "graft_quality_score takes exactly 1 argument")
        graft.expressions.QualityScore(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_unicode_norm"),
      new ExpressionInfo(classOf[graft.expressions.UnicodeNorm].getName,
        "graft_unicode_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "graft_unicode_norm takes exactly 2 arguments")
        val strip = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_unicode_norm strip must be a boolean literal, got $other")
        }
        graft.expressions.UnicodeNorm(children.head, strip)
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
