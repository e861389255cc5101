package graft

import graft.ops.Retrieval
import org.apache.spark.sql.DataFrame

/** BM25 retrieval against an independent driver-side implementation
  * of the documented formula (Lucene-form idf, unique query terms,
  * lowercased whitespace tokens). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def terms(s: String): Seq[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq

  /** Driver-side BM25: scores for every (query, doc) pair with at
    * least one matching term. */
  private def bruteScores(corpus: Map[Long, String], queries: Map[Long, String],
                          k1: Double, b: Double): Map[(Long, Long), Double] = {
    val n = corpus.size
    val dls = corpus.view.mapValues(t => terms(t).size).toMap
    val avgdl = if (n == 0) 0.0 else dls.values.sum.toDouble / n
    val dfs = corpus.values.flatMap(t => terms(t).distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    def idf(t: String) = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
    (for {
      (qid, q) <- queries.toSeq
      (did, d) <- corpus.toSeq
      dterms = terms(d)
      matched = terms(q).distinct.filter(t => dterms.contains(t))
      if matched.nonEmpty
    } yield {
      // mirror the engine's DECIMAL(18,6) per-term quantization + the
      // exact decimal sum (HALF_UP = Spark's cast rounding), with the
      // engine's exact FP evaluation order idf * (tf-norm)
      val score = matched.map { t =>
        val tf = dterms.count(_ == t).toDouble
        java.math.BigDecimal.valueOf(
          idf(t) * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls(did) / avgdl))))
          .setScale(6, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
      (qid, did) -> score
    }).toMap
  }

  private val corpus = Map(
    1L -> "the cat sat on the mat",
    2L -> "a dog chased the cat",
    3L -> "dogs and cats live together",
    4L -> "the stock market closed higher today",
    5L -> "cat cat cat cat",
    6L -> "   ")
  private val queries = Map(
    10L -> "the cat",
    11L -> "DOG chased",          // case folding
    12L -> "cat cat cat",         // duplicate query terms count once
    13L -> "zebra quux",          // no corpus hits
    14L -> "")                    // zero-term query

  test("bm25Build/bm25TopK: ranking and scores equal the brute force") {
    val k1 = 1.2; val b = 0.75
    val ix = Retrieval.bm25Build(corpus.toSeq.toDF("doc_id", "text"), k1, b)
    assert(ix.nDocs == 6)
    assert((ix.avgdl - corpus.values.map(terms(_).size).sum / 6.0).abs < 1e-12)

    val want = bruteScores(corpus, queries, k1, b)
    val got = Retrieval.bm25TopK(ix, queries.toSeq.toDF("query_id", "query"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // per query: the top-3 of the brute scores, (-score, doc_id) order
    for (qid <- queries.keys) {
      val expect = want.collect { case ((q, d), s) if q == qid => (d, s) }
        .toSeq.sortBy { case (d, s) => (-s, d) }.take(3)
      val rows = got.filter(_._1 == qid).sortBy(_._2)
      assert(rows.map(_._3).toSeq == expect.map(_._1),
        s"query $qid ranking: got ${rows.toSeq} want $expect")
      rows.zip(expect).foreach { case ((_, _, _, gs), (_, ws)) =>
        assert((gs - ws).abs < 1e-9, s"query $qid score: got $gs want $ws") }
      assert(rows.map(_._2).toSeq == (1 to rows.length))
    }
    // no-hit and zero-term queries return no rows
    assert(!got.exists(r => r._1 == 13L || r._1 == 14L))
    // duplicate query terms count once: q12 ≡ single-term "cat"
    val q12 = got.filter(_._1 == 12L).map(r => r._3 -> r._4).toMap
    val single = bruteScores(corpus, Map(12L -> "cat"), k1, b)
      .map { case ((_, d), s) => d -> s }
    q12.foreach { case (d, s) => assert((s - single(d)).abs < 1e-9) }
    // tf saturation: doc 5 (tf=4, short) outranks doc 1 (tf=1) on "cat"
    // but by far less than 4× — the k1 saturation BM25 exists for
    assert(q12(5L) > q12(1L) && q12(5L) < 4 * q12(1L))
  }

  test("bm25TopK: seeded random corpus agrees with the brute force at full k") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "b", "c", "dog", "cat", "The", "ü", "日本")
    def randDoc(): String = Seq.fill(rnd.nextInt(10))(
      alphabet(rnd.nextInt(alphabet.length))).mkString(" " * (1 + rnd.nextInt(2)))
    val corpus = (1L to 40L).map(i => i -> randDoc()).toMap
    val queries = (101L to 110L).map(i => i -> randDoc()).toMap
    val k1 = 0.9; val b = 0.4
    val ix = Retrieval.bm25Build(corpus.toSeq.toDF("doc_id", "text"), k1, b)
    val want = bruteScores(corpus, queries, k1, b)
    // k ≥ |corpus|: every candidate surfaces — compare the full score
    // relation (rank order on near-equal doubles is checked separately)
    val got = Retrieval.bm25TopK(ix, queries.toSeq.toDF("query_id", "query"), k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getInt(1), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (key, ws) =>
      assert((got(key)._2 - ws).abs < 1e-9, s"$key: got ${got(key)._2} want $ws") }
    // ranks are score-descending within each query (ties by doc_id)
    got.groupBy(_._1._1).values.foreach { rows =>
      val byRank = rows.toSeq.sortBy(_._2._1)
      byRank.sliding(2).foreach {
        case Seq(((_, d1), (_, s1)), ((_, d2), (_, s2))) =>
          assert(s1 > s2 || (s1 == s2 && d1 < d2) || (s1 - s2).abs < 1e-12)
        case _ => ()
      }
    }
  }

  test("bm25Save/bm25Load: a loaded index serves identically") {
    val ix = Retrieval.bm25Build(corpus.toSeq.toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("bm25-artifact")
    Retrieval.bm25Save(ix, s"$dir/ix")
    val loaded = Retrieval.bm25Load(spark, s"$dir/ix")
    assert(loaded.nDocs == ix.nDocs && loaded.avgdl == ix.avgdl &&
      loaded.k1 == ix.k1 && loaded.b == ix.b)
    val q = queries.toSeq.toDF("query_id", "query")
    def rel(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rel(Retrieval.bm25TopK(loaded, q)) == rel(Retrieval.bm25TopK(ix, q)))
  }

  test("bm25 serve plan: query side broadcasts, no cartesian product") {
    val ix = Retrieval.bm25Build(corpus.toSeq.toDF("doc_id", "text"))
    val res = Retrieval.bm25TopK(ix, queries.toSeq.toDF("query_id", "query"), k = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bm25 guards: bad parameters are rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Retrieval.bm25Build(docs, k1 = -0.1))
    intercept[IllegalArgumentException](Retrieval.bm25Build(docs, b = 1.5))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(Retrieval.bm25Build(docs), docs.toDF("query_id", "query"), 0))
  }

  test("bm25Build: corpus stats ride the built relation — no second tokenization pass") {
    import org.apache.spark.sql.functions.{col, udf}
    // count how many times the text column is MATERIALIZED: the r8
    // finding was a stats aggregate re-reading + re-splitting every
    // text after the tf relation already carried (doc_id, dl)
    val reads = spark.sparkContext.longAccumulator("textReads")
    val tap = udf((s: String) => { reads.add(1); s })
    // keep the local fixture plan-shaped like a parquet scan: without
    // this, ConvertToLocalRelation eagerly evaluates the tap
    // projection at OPTIMIZATION time for the metadata-only count()
    // job, charging reads a real corpus never pays
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val base = Seq((1L, "a b c"), (2L, "a a"), (3L, "")).toDF("doc_id", "text")
      val docs = base.select(col("doc_id"), tap(col("text")).as("text"))
      val ix = Retrieval.bm25Build(docs)
      val perPass = reads.value
      // empty docs count in the stats (dl = 0), exactly as avg(size) did
      assert(ix.nDocs == 3)
      assert(ix.avgdl == (3 + 2 + 0) / 3.0)
      // the build's own tokenization already materialized text; the
      // stats jobs (metadata count + cached-tf fold) must not again.
      // ONE pass costs 5 taps on this fixture (the collapsed dl/terms
      // projection evaluates the tapped column twice for docs that
      // reach the explode — an artifact of the opaque UDF: production
      // codegen CSE dedupes the pure-expression form; measured
      // per-stage: docs.count() +0, Σdl off the cached tf +0). The
      // old stats aggregate re-tokenized every doc: +3 on 3 docs.
      assert(perPass <= 5,
        s"text materialized $perPass times for 3 docs — a second corpus pass leaked in")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
      graft.ops.Caches.releaseAll(spark)
    }
  }
}
