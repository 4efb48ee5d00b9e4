package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, DotProduct, MinHashSig, NormalizeText, SplitTokens}

/** SparkSessionExtensions injector: makes the engine's custom expressions
  * available to any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide SQL
  * users get them without touching code).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("split_tokens"),
      new ExpressionInfo(classOf[SplitTokens].getName, "split_tokens"),
      (es: Seq[Expression]) => SplitTokens(es(0), es(1), es(2))))
    ext.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (es: Seq[Expression]) => NormalizeText(es.head)))
    // minhash_sig(shingles, numHashes, seed): numHashes/seed must be
    // literals — the hash-family constants are derived at plan time.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig.fromSql(es)))
    // materialized-view rewrites: aggregates over a registered base
    // relation serve from the maintained AggStore / ViewStore instead
    // of scanning the corpus (registration + the BaseFiles landed-file
    // fingerprint gate freshness — stale bases refuse and answer from
    // the base)
    ext.injectOptimizerRule(sp => graft.plans.AggStoreRewrite(sp))
    ext.injectOptimizerRule(sp => graft.plans.JoinViewRewrite(sp))
    // runtime filters: selective fact⋈dim equi-joins get the dim's key
    // set injected above the fact side (exact IN, or the portable
    // bloom past the IN cap) — INERT until
    // spark.graft.runtimeFilters.enabled=true, because it runs a
    // plan-time job per new dim. Injected BEFORE the zone-map rule so
    // an injected IN composes into file skipping in the same pass.
    ext.injectOptimizerRule(sp => graft.plans.RuntimeFilterJoin(sp))
    // zone-map pruning: plain filters over a registered z-ordered
    // layout open only the stat-intersecting files (residual kept,
    // undescribed landed files refuse)
    ext.injectOptimizerRule(sp => graft.plans.ZoneMapPrune(sp))
  }
}
