package graft

import graft.ops.{Dsir, Retrieval}
import graft.stream.{StreamingBm25Serve, StreamingDsirScore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The DSIR and BM25 serving seams: streamed scoring against the
  * persisted artifacts must agree bit-for-bit with the batch paths,
  * across micro-batch boundaries (no cross-batch state). */
class StreamingServeSpec extends SparkSpec {

  test("stream of documents ≡ batch dsirLogWeights, across two micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val targetTexts = Seq((1L, "the quiet garden held a hundred small worlds"),
      (2L, "she read the letter twice before answering"))
    val rawTexts = Seq((11L, "click here to subscribe now"),
      (12L, "the road was long and quiet"))
    val dir = Files.createTempDirectory("dsir-serve").toString
    Dsir.dsirSave(Dsir.dsirTrain(targetTexts.toDF("doc_id", "text"), 64, 0.25), s"$dir/t")
    Dsir.dsirSave(Dsir.dsirTrain(rawTexts.toDF("doc_id", "text"), 64, 0.25), s"$dir/r")

    // pool mix including an empty doc (no row, stream and batch alike)
    val pool = Seq((21L, "the garden was quiet"), (22L, "click subscribe now"),
      (23L, "a zebra wanders"), (24L, "   "))
    val target = Dsir.dsirLoad(spark, s"$dir/t")
    val raw = Dsir.dsirLoad(spark, s"$dir/r")
    def key(r: Row): Long = r.getAs[Long]("doc_id")
    def value(r: Row): (Long, Double) =
      (r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight"))
    val batch = Dsir.dsirLogWeights(pool.toDF("doc_id", "text"), target, raw)
      .collect().map(r => key(r) -> value(r)).toMap
    assert(batch.keySet == Set(21L, 22L, 23L))

    val (h1, h2) = pool.splitAt(2)
    val input = MemoryStream[(Long, String)]
    val got = collection.mutable.Map.empty[Long, (Long, Double)]
    val ckpt = Files.createTempDirectory("dsir-ckpt").toString
    val q = StreamingDsirScore.run(spark, input.toDF().toDF("doc_id", "text"),
      s"$dir/t", s"$dir/r", ckpt) { scored =>
      scored.collect().foreach(r => got += key(r) -> value(r))
    }
    try {
      input.addData(h1)
      q.processAllAvailable()
      assert(got.keySet == Set(21L, 22L),
        "first micro-batch must weigh exactly its own docs")
      input.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch,
      "streamed weighting diverged from the batch dsirLogWeights path")
  }

  test("stream of queries ≡ batch bm25TopK, across two micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val corpus = Seq((1L, "the cat sat on the mat"), (2L, "a dog chased the cat"),
      (3L, "dogs and cats live together"), (4L, "the stock market closed higher"))
    val dir = Files.createTempDirectory("bm25-serve").toString
    Retrieval.bm25Save(Retrieval.bm25Build(corpus.toDF("doc_id", "text")), s"$dir/ix")

    // query mix including a no-hit and a zero-term query (no rows)
    val queries = Seq((10L, "the cat"), (11L, "dog chased"),
      (12L, "zebra quux"), (13L, "stock market"))
    val loaded = Retrieval.bm25Load(spark, s"$dir/ix")
    def key(r: Row): (Long, Int) = (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))
    def value(r: Row): (Long, Double) =
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))
    val batch = Retrieval.bm25TopK(loaded, queries.toDF("query_id", "query"), k = 2)
      .collect().map(r => key(r) -> value(r)).toMap
    assert(batch.keys.map(_._1).toSet == Set(10L, 11L, 13L))

    val (h1, h2) = queries.splitAt(2)
    val input = MemoryStream[(Long, String)]
    val got = collection.mutable.Map.empty[(Long, Int), (Long, Double)]
    val ckpt = Files.createTempDirectory("bm25-ckpt").toString
    val q = StreamingBm25Serve.run(spark, input.toDF().toDF("query_id", "query"),
      s"$dir/ix", k = 2, ckpt) { res =>
      res.collect().foreach(r => got += key(r) -> value(r))
    }
    try {
      input.addData(h1)
      q.processAllAvailable()
      assert(got.keys.map(_._1).toSet == Set(10L, 11L),
        "first micro-batch must answer exactly its own queries")
      input.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == batch,
      "streamed serving diverged from the batch bm25TopK path")
  }
}
