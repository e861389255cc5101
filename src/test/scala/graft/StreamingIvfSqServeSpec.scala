package graft

import graft.ops.{Embeddings, Sq}
import graft.stream.StreamingIvfSqServe
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The IVF+SQ8 serving seam: both artifacts (coarse quantizer +
  * residual bounds) round-trip, and a stream of query vectors scored
  * against them must agree bit-for-bit with the batch q82 path —
  * across micro-batch boundaries (the family's standard stream ≡
  * batch identity). */
class StreamingIvfSqServeSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("artifacts round-trip; stream of query vectors ≡ batch ivfSq8TopK") {
    assume(new java.io.File(SfDir).isDirectory, "testdata not present")
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val (cents, mins, maxs) = Sq.trainIvfSq8(spark, SfDir)
    val qArtifact = Files.createTempDirectory("ivfsq").toString + "/quantizer"
    val bArtifact = Files.createTempDirectory("ivfsq").toString + "/bounds"
    Embeddings.saveQuantizer(spark, cents, qArtifact)
    Sq.saveBounds(spark, mins, maxs, bArtifact)
    val loaded = Embeddings.loadQuantizer(spark, qArtifact)
    assert(loaded.map(c => (c.j, c.n, c.s)) == cents.map(c => (c.j, c.n, c.s)),
      "quantizer artifact round-trip diverged")
    val (lm, lx) = Sq.loadBounds(spark, bArtifact)
    assert(lm == mins && lx == maxs, "bounds artifact round-trip diverged")

    def key(r: Row): (Long, Long) = (r.getAs[Long]("q_id"), r.getAs[Long]("rank"))
    def value(r: Row): (Long, Long) =
      (r.getAs[Long]("neighbor_id"), r.getAs[Long]("est"))
    val batch = Sq.ivfSq8TopK(spark, SfDir, k = 5, queryMod = 50)
      .collect().map(r => key(r) -> value(r)).toMap
    assert(batch.nonEmpty)
    graft.ops.Caches.releaseAll(spark)

    val queryVecs = graft.ops.Tables.embeddings(spark, SfDir)
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(queryVecs.length >= 2, "need at least two queries to split across batches")
    val (firstHalf, secondHalf) = queryVecs.splitAt(queryVecs.length / 2)

    val input = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    val ckpt = Files.createTempDirectory("ivfsqserve-ckpt").toString
    val q = StreamingIvfSqServe.run(spark,
      input.toDF().toDF("q_id", "embedding"),
      SfDir, qArtifact, bArtifact, ckpt, k = 5, excludeSelf = true) { scored =>
      scored.collect().foreach(r => got += key(r) -> value(r))
    }
    try {
      input.addData(firstHalf.toSeq)
      q.processAllAvailable()
      assert(got.keySet.map(_._1) == firstHalf.map(_._1).toSet,
        "first micro-batch must serve exactly its own queries")
      input.addData(secondHalf.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toMap == batch,
      "streamed IVF+SQ8 serving diverged from the batch q82 path")
    graft.ops.Caches.releaseAll(spark)
  }

  test("service-level selector: filtered stream ≡ batch ivfSq8TopKFiltered (q86)") {
    assume(new java.io.File(SfDir).isDirectory, "testdata not present")
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val (cents, mins, maxs) = Sq.trainIvfSq8(spark, SfDir)
    val qArtifact = Files.createTempDirectory("ivfsqf").toString + "/quantizer"
    val bArtifact = Files.createTempDirectory("ivfsqf").toString + "/bounds"
    Embeddings.saveQuantizer(spark, cents, qArtifact)
    Sq.saveBounds(spark, mins, maxs, bArtifact)

    def key(r: Row): (Long, Long) = (r.getAs[Long]("q_id"), r.getAs[Long]("rank"))
    def value(r: Row): (Long, Long) =
      (r.getAs[Long]("neighbor_id"), r.getAs[Long]("est"))
    val batch = Sq.ivfSq8TopKFiltered(spark, SfDir, k = 5, queryMod = 50)
      .collect().map(r => key(r) -> value(r)).toMap
    assert(batch.nonEmpty)
    graft.ops.Caches.releaseAll(spark)

    val queryVecs = graft.ops.Tables.embeddings(spark, SfDir)
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    val ckpt = Files.createTempDirectory("ivfsqf-ckpt").toString
    val q = StreamingIvfSqServe.run(spark,
      input.toDF().toDF("q_id", "embedding"),
      SfDir, qArtifact, bArtifact, ckpt, k = 5, excludeSelf = true,
      selector = Some(org.apache.spark.sql.functions.col("label") % 2 === 0)) { scored =>
      scored.collect().foreach(r => got += key(r) -> value(r))
    }
    try {
      input.addData(queryVecs.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toMap == batch,
      "selector-filtered streamed serving diverged from the batch q86 path")
    graft.ops.Caches.releaseAll(spark)
  }
}
