package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom functions work through SQL (registry path + injector applies)") {
    // NOTE: getOrCreate() in one JVM returns the session every other suite
    // shares — never build-and-stop a "fresh" session here. The injector is
    // applied to a bare SparkSessionExtensions; SQL behavior is exercised
    // through the registry on the shared session (same builders).
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.expressions.VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c")
      .collect()(0).getDouble(0)
    assert(r == 1.0)
    val chunks = spark.sql(
      """SELECT c.chunk_id, c.chunk_text
        |FROM (SELECT 'a b c d e f g' AS t)
        |LATERAL VIEW split_tokens(t, 4, 1) c AS chunk_id, chunk_text""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(chunks == Seq((0L, "a b c d"), (1L, "d e f g")))
    // minhash_sig through SQL equals the Column-API expression
    val sqlSig = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 8, 7) AS s")
      .collect()(0).getSeq[Long](0)
    val colSig = Seq(("x", Seq("a b c", "b c d"))).toDF("id", "sh")
      .select(graft.expressions.MinHashSig(col("sh"), 8, 7).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sqlSig == colSig && sqlSig.length == 8)
    // normalize_text through SQL: NFC + whitespace collapse
    val n = spark.sql("SELECT normalize_text('cafe\\u0301  x') AS n")
      .collect()(0).getString(0)
    assert(n == "caf\u00e9 x")
  }

  test("minhash_sig rejects non-literal numHashes/seed with a clear message") {
    graft.expressions.VectorExpressions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(array('a'), doc_id, 7) FROM (SELECT 8L AS doc_id)")
        .collect()
    }
    assert(e.getMessage.contains("requires literal"), s"got: ${e.getMessage}")
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(array('a'), 8)").collect()
    }
    assert(arity.getMessage.contains("exactly 3 arguments") ||
      arity.getMessage.toLowerCase.contains("number of arguments"), s"got: ${arity.getMessage}")
  }

  test("split_tokens generator matches the DataFrame chunker") {
    graft.expressions.VectorExpressions.register(spark)
    val docs = Tables(spark, sfDir, "documents").limit(50)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_id, c.chunk_text
        |FROM ext_docs LATERAL VIEW split_tokens(text, 30, 5) c AS chunk_id, chunk_text""".stripMargin)
      .as[(Long, Long, String)].collect().toSet
    val viaDf = graft.operators.Chunker.split(docs, "text", 30, 5)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .as[(Long, Long, String)].collect().toSet
    assert(viaSql == viaDf)
  }

  test("query execution listener records completed actions") {
    val listener = new GraftQueryListener()
    spark.listenerManager.register(listener)
    try {
      Tables(spark, sfDir, "orders").groupBy("o_orderstatus").count().collect()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.entries.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!listener.entries.isEmpty)
      assert(listener.totalSeconds > 0)
    } finally spark.listenerManager.unregister(listener)
  }
}
