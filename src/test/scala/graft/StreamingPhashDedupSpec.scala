package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, timestamp_millis}

import graft.ops.{MediaRecord, Multimodal}
import graft.stream.{MediaEvent, StreamingPhashDedup}

/** The streaming phash seam end-to-end (VERDICT r14 #4): a media
  * intake stream matched against a corpus band index — near-dup
  * re-encodes flagged with exact Hamming, novel images pass, band
  * multiplicity and re-arrivals collapsed by watermark state, and the
  * state carried across a checkpointed restart (the stateful-shape
  * contract every other streaming operator in the repo meets). */
class StreamingPhashDedupSpec extends SparkSpec {

  import spark.implicits._

  // --- the MultimodalSpec image fixtures (same wave pattern) ---
  private def patternBytes(w: Int, h: Int, format: String)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }
  private def wave(w: Int, h: Int)(x: Int, y: Int): Int =
    (110 + 90 * math.sin(2 * math.Pi * 1.5 * x / w) * math.cos(2 * math.Pi * y / h)).toInt

  private val (w, h) = (72, 64)
  private val png = patternBytes(w, h, "png")(wave(w, h))
  private val jpg = patternBytes(w, h, "jpg")(wave(w, h))           // near-dup of png
  private val bright = patternBytes(w, h, "png")((x, y) => wave(w, h)(x, y) + 30) // dHash-identical to png
  private val other = patternBytes(w, h, "png")((x, y) => 220 - wave(w, h)(x, y)) // far from png

  private def index = StreamingPhashDedup.phashIndex(Seq(
    MediaRecord(10L, "image", png),
    MediaRecord(30L, "image", other)).toDS())

  private val base = 1700000000000L
  private def ts(minute: Int) = new Timestamp(base + minute * 60000L)

  test("nearDupMatches: re-encodes match with exact Hamming, novelty passes, re-arrivals dedup") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[MediaEvent]
    val seen = scala.collection.concurrent.TrieMap.empty[(Long, Long), Long]
    val q = StreamingPhashDedup.nearDupMatches(input.toDS(), index, maxHamming = 6)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.put(
          (r.getAs[Long]("media_id"), r.getAs[Long]("match_id")),
          r.getAs[Int]("hamming").toLong))
        ()
      }
      .outputMode("append").start()
    try {
      // batch 1: a JPEG re-encode of corpus image 10 plus non-matching
      // and non-image traffic
      input.addData(
        MediaEvent(ts(0), 100L, "image", jpg),
        MediaEvent(ts(1), 101L, "audio", png),                    // non-image kind: never hashed
        MediaEvent(ts(1), 102L, "image", "junk".getBytes("UTF-8"))) // undecodable: dropped
      q.processAllAvailable()
      assert(seen.keySet == Set((100L, 10L)), s"got ${seen.keySet}")
      // exact Hamming rides along (the corpus png vs lossy jpg distance)
      val hPng = Multimodal.hashImage("image", png).get
      val hJpg = Multimodal.hashImage("image", jpg).get
      assert(seen((100L, 10L)) == java.lang.Long.bitCount(hPng ^ hJpg).toLong)
      // batch 2, SAME stream: a re-arrival of 100 within the horizon is
      // dropped by watermark state; a match against the OTHER corpus
      // image still passes
      input.addData(
        MediaEvent(ts(2), 100L, "image", jpg),
        MediaEvent(ts(3), 103L, "image", other))
      q.processAllAvailable()
      assert(seen.keySet == Set((100L, 10L), (103L, 30L)), s"got ${seen.keySet}")
    } finally q.stop()
  }

  test("checkpointed restart carries the match-dedup state across the stop") {
    val root = java.nio.file.Files.createTempDirectory("phashckpt")
    val srcDir = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    new java.io.File(srcDir).mkdirs()
    // parquet file source (the StreamingHybridServeSpec pattern —
    // binary payloads need a typed file source, not JSON)
    def writeBatch(rows: Seq[(Long, Long, String, Array[Byte])]): Unit =
      rows.toDF("ts_ms", "media_id", "kind", "content")
        .write.mode("append").parquet(srcDir)
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    def start(sink: scala.collection.concurrent.TrieMap[(Long, Long), Int]) =
      StreamingPhashDedup.nearDupMatches(
          spark.readStream.schema(sch).parquet(srcDir)
            .select(timestamp_millis(col("ts_ms")).as("ts"),
              col("media_id"), col("kind"), col("content"))
            .as[MediaEvent],
          index, maxHamming = 6)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => sink.put(
            (r.getAs[Long]("media_id"), r.getAs[Long]("match_id")), 1))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()

    // run 1: one matching re-encode
    writeBatch(Seq((base, 100L, "image", jpg)))
    val run1 = scala.collection.concurrent.TrieMap.empty[(Long, Long), Int]
    val q1 = start(run1)
    try q1.processAllAvailable() finally q1.stop()
    assert(run1.keySet == Set((100L, 10L)))

    // run 2, SAME checkpoint: the re-arrival of (100, jpg) within the
    // horizon must be dropped by the RESTORED state store — not the
    // sink — while a fresh near-dup (the brightness-shifted png, a
    // dHash-identical image under a new id) still matches
    writeBatch(Seq(
      (base + 120000L, 100L, "image", jpg),
      (base + 180000L, 103L, "image", bright)))
    val run2 = scala.collection.concurrent.TrieMap.empty[(Long, Long), Int]
    val q2 = start(run2)
    try {
      q2.processAllAvailable()
      assert(run2.keySet == Set((103L, 10L)),
        s"restart re-emitted or missed matches: ${run2.keySet}")
    } finally q2.stop()
  }
}
