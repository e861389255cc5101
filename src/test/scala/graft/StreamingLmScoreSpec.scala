package graft

import graft.ops.TextOps
import graft.stream.StreamingLmScore
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming LM serving seam: a stream of documents scored
  * against the PERSISTED model artifact must agree bit-for-bit with
  * the batch lmScore path — across micro-batch boundaries, so the
  * per-batch plan provably carries no cross-batch state. */
class StreamingLmScoreSpec extends SparkSpec {

  test("stream of documents ≡ batch lmScore, across two micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // train once → persist → load: the deployment trajectory (cap
    // below the token count so <unk> rows flow through the stream)
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a dog ran fast")).toDF("doc_id", "text")
    val artifact = Files.createTempDirectory("lm-serve").toString
    TextOps.lmSave(TextOps.lmTrain(train, maxVocab = 6, k = 0.2), artifact)

    // eval mix: training docs, an OOV doc, a literal-"<s>" doc, and
    // an empty doc (must emit NO row, in stream and batch alike)
    val evalDocs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (4L, "the zebra sat"), (5L, "<s> the cat"), (6L, "   "))
    val loaded = TextOps.lmLoad(spark, artifact)
    def key(r: Row): Long = r.getAs[Long]("doc_id")
    def value(r: Row): (Long, Double, Double) =
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("cross_entropy"),
        r.getAs[Double]("perplexity"))
    val batch = TextOps.lmScore(evalDocs.toDF("doc_id", "text"), loaded)
      .collect().map(r => key(r) -> value(r)).toMap
    assert(batch.keySet == Set(1L, 2L, 4L, 5L) && batch.nonEmpty)

    // the same docs, fed as a STREAM in two micro-batches
    val (firstHalf, secondHalf) = evalDocs.splitAt(2)
    val input = MemoryStream[(Long, String)]
    val got = collection.mutable.Map.empty[Long, (Long, Double, Double)]
    val ckpt = Files.createTempDirectory("lmserve-ckpt").toString
    val q = StreamingLmScore.run(spark,
      input.toDF().toDF("doc_id", "text"), artifact, ckpt) { scored =>
      scored.collect().foreach(r => got += key(r) -> value(r))
    }
    try {
      input.addData(firstHalf)
      q.processAllAvailable()
      assert(got.keySet == firstHalf.map(_._1).toSet,
        "first micro-batch must score exactly its own docs")
      input.addData(secondHalf)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toMap == batch,
      "streamed scoring diverged from the batch lmScore path")
  }
}
