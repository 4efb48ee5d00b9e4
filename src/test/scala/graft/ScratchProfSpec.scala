package graft

import org.apache.spark.sql.functions._

class ScratchProfSpec extends SparkSpec {

  test("profile q155 stages at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sets = docs.select(col("doc_id"),
      graft.functions.TextFns.wordShingles(
        graft.functions.TextFns.tokens(col("text")), 3).as("sh"))
    val base = sets.select(col("doc_id").as("__id"),
        array_distinct(col("sh")).as("__tk"))
      .filter(size(col("__tk")) > 0)
    time("base count")(println(base.count()))
    val tokDf = base.select(explode(col("__tk")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    time("tokDf count")(println(tokDf.count()))
    time("tokDf df>=2")(println(tokDf.filter(col("df") >= 2).count()))
    val ordered = base.select(col("__id"), explode(col("__tk")).as("t"))
      .join(tokDf, Seq("t"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("st"))
      .select(col("__id"), col("st"), expr("transform(st, x -> x.t)").as("tks"),
        size(col("st")).cast("long").as("len"))
      .withColumn("plen",
        col("len") - call_function("div", col("len") * 1 + 1, lit(2L)) + 1L)
    time("ordered count")(println(ordered.count()))
    val pref = ordered
      .select(col("__id"), col("len"),
        explode(slice(col("st"), lit(1), col("plen").cast("int"))).as("s"))
      .filter(col("s.df") >= 2L)
      .select(col("__id"), col("len"), col("s.t").as("t"))
    time("pref count")(println(pref.count()))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.t") === col("b.t") && col("a.__id") < col("b.__id") &&
          col("a.len") * 2 >= col("b.len") * 1 &&
          col("b.len") * 2 >= col("a.len") * 1)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    time("cand count")(println(cand.count()))
    val full = time("full allPairs")(
      graft.operators.SetJoin.allPairs(sets, "doc_id", "sh", 1, 2).count())
    println(s"pairs $full")
  }
}
