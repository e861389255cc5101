package graft

import graft.ops.Dsir
import org.apache.spark.sql.DataFrame

/** DSIR importance resampling against a fully independent driver-side
  * brute force: the 60-bit hash is REIMPLEMENTED here from its
  * definition (first 15 hex chars of md5), so a drift in
  * [[graft.ops.LlmOps.portableHash64]] fails this suite too. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Independent twin of portableHash64: md5 → first 15 hex → base-16
    * long (60 bits, non-negative). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Documented feature rule: whitespace unigrams + adjacent
    * space-joined bigrams, each hashed into [0, nBuckets). */
  private def feats(s: String, nBuckets: Int): Seq[Long] = {
    val t = s.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    grams.map(g => h60(g) % nBuckets)
  }

  private def bruteModel(texts: Iterable[String], nBuckets: Int):
      (Map[Long, Long], Long) = {
    val counts = texts.flatMap(feats(_, nBuckets))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (counts, counts.values.sum)
  }

  /** The engine's DECIMAL(18,8) quantization rule (valueOf = Spark's
    * shortest-string cast rounding). */
  private def q8(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(8, java.math.RoundingMode.HALF_UP)

  /** Exact-decimal log weight (the engine's internal ranking form). */
  private def bruteLogWQ(text: String, nBuckets: Int, k: Double,
                         t: (Map[Long, Long], Long),
                         r: (Map[Long, Long], Long)): (Long, java.math.BigDecimal) = {
    val fs = feats(text, nBuckets)
    val denomT = t._2 + k * nBuckets
    val denomR = r._2 + k * nBuckets
    val lw = fs.map(b => q8(math.log((t._1.getOrElse(b, 0L) + k) / denomT) -
        math.log((r._1.getOrElse(b, 0L) + k) / denomR)))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    (fs.size.toLong, lw)
  }

  private def bruteLogW(text: String, nBuckets: Int, k: Double,
                        t: (Map[Long, Long], Long),
                        r: (Map[Long, Long], Long)): (Long, Double) = {
    val (n, lw) = bruteLogWQ(text, nBuckets, k, t, r)
    (n, lw.doubleValue)
  }

  private def collectW(df: DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(row =>
      row.getLong(0) -> ((row.getLong(1), row.getDouble(2)))).toMap

  // target: bookish prose; raw: mixed prose + boilerplate — the
  // selection problem DSIR exists for
  private val targetTexts = Map(
    1L -> "the quiet garden held a hundred small worlds",
    2L -> "she read the letter twice before answering",
    3L -> "a long road wound through the old forest")
  private val rawTexts = Map(
    11L -> "click here to subscribe now subscribe now",
    12L -> "the road through the forest was long and quiet",
    13L -> "error 404 page not found click here",
    14L -> "he answered the letter from the garden",
    15L -> "buy now limited offer click subscribe")

  test("dsirLogWeights: per-doc log importance ratio equals the brute force") {
    val nBuckets = 64 // small enough to force real collisions
    val k = 0.25
    val target = Dsir.dsirTrain(targetTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val raw = Dsir.dsirTrain(rawTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val bt = bruteModel(targetTexts.values, nBuckets)
    val br = bruteModel(rawTexts.values, nBuckets)
    assert(target.total == bt._2 && raw.total == br._2)

    val pool = (rawTexts ++ Map(21L -> "an unseen zebra wanders alone", 22L -> "   "))
      .toSeq.toDF("doc_id", "text")
    val got = collectW(Dsir.dsirLogWeights(pool, target, raw))
    // zero-token doc: no row
    assert(!got.contains(22L))
    for ((id, text) <- rawTexts ++ Map(21L -> "an unseen zebra wanders alone")) {
      val (n, lw) = bruteLogW(text, nBuckets, k, bt, br)
      assert(got(id)._1 == n, s"doc $id n_feats")
      assert((got(id)._2 - lw).abs < 1e-9, s"doc $id log_weight: got ${got(id)._2} want $lw")
    }
    // the semantic point: target-like raw docs outweigh boilerplate
    assert(got(12L)._2 > got(11L)._2 && got(14L)._2 > got(15L)._2)
  }

  test("dsirLogWeights: seeded random corpus agrees with the brute force") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "b", "c", "ab", "ba", "ü", "日本", "now", "the")
    def randDoc(): String = Seq.fill(rnd.nextInt(9))(
      alphabet(rnd.nextInt(alphabet.length))).mkString(" " * (1 + rnd.nextInt(2)))
    val tTexts = (1L to 30L).map(i => i -> randDoc()).toMap
    val rTexts = (31L to 70L).map(i => i -> randDoc()).toMap
    val poolTexts = (101L to 130L).map(i => i -> randDoc()).toMap
    val nBuckets = 16 // heavy collisions on purpose
    val k = 0.1
    val target = Dsir.dsirTrain(tTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val raw = Dsir.dsirTrain(rTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val bt = bruteModel(tTexts.values, nBuckets)
    val br = bruteModel(rTexts.values, nBuckets)
    assert(target.buckets.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == bt._1)
    val got = collectW(Dsir.dsirLogWeights(poolTexts.toSeq.toDF("doc_id", "text"), target, raw))
    val nonEmpty = poolTexts.filter(e => feats(e._2, nBuckets).nonEmpty)
    assert(got.keySet == nonEmpty.keySet)
    for ((id, text) <- nonEmpty) {
      val (n, lw) = bruteLogW(text, nBuckets, k, bt, br)
      assert(got(id)._1 == n && (got(id)._2 - lw).abs < 1e-9, s"doc $id")
    }
  }

  test("dsirResample: deterministic Gumbel-top-k matches the brute force, per salt") {
    val nBuckets = 64
    val k = 0.25
    val target = Dsir.dsirTrain(targetTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val raw = Dsir.dsirTrain(rawTexts.toSeq.toDF("doc_id", "text"), nBuckets, k)
    val bt = bruteModel(targetTexts.values, nBuckets)
    val br = bruteModel(rawTexts.values, nBuckets)
    val pool = rawTexts.toSeq.toDF("doc_id", "text")

    // the engine's EXACT ranking key: decimal weight + the q8-quantized
    // Gumbel noise, rendered to double only for display
    def bruteTopK(salt: String, nKeep: Int): Seq[(Long, Double)] =
      rawTexts.toSeq.map { case (id, text) =>
        val u = (h60(s"$salt:$id") + 0.5) / math.pow(2.0, 60)
        id -> bruteLogWQ(text, nBuckets, k, bt, br)._2
          .add(q8(-math.log(-math.log(u)))).doubleValue
      }.sortBy { case (id, key) => (-key, id) }.take(nKeep)

    for (salt <- Seq("dsir-v1", "dsir-v2")) {
      val got = Dsir.dsirResample(pool, target, raw, nKeep = 3, salt = salt)
        .select("doc_id", "gumbel_key").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = bruteTopK(salt, 3)
      assert(got.map(_._1) == want.map(_._1), s"salt $salt selection")
      got.zip(want).foreach { case ((_, g), (_, w)) => assert((g - w).abs < 1e-9) }
      // replay: the selection is a pure function of (pool, salt, nKeep)
      val again = Dsir.dsirResample(pool, target, raw, nKeep = 3, salt = salt)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(again == got.map(_._1))
    }
    // the two salts draw different noise (the top-3 SET happens to
    // coincide on this small pool — the weights dominate — so pin the
    // keys, which is what the salt actually perturbs)
    assert(bruteTopK("dsir-v1", 3).map(_._2) != bruteTopK("dsir-v2", 3).map(_._2))
  }

  test("dsirSave/dsirLoad: a loaded model weighs identically to the in-memory one") {
    val target = Dsir.dsirTrain(targetTexts.toSeq.toDF("doc_id", "text"), 32, 0.5)
    val raw = Dsir.dsirTrain(rawTexts.toSeq.toDF("doc_id", "text"), 32, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("dsir-artifact")
    Dsir.dsirSave(target, s"$dir/target")
    Dsir.dsirSave(raw, s"$dir/raw")
    val lt = Dsir.dsirLoad(spark, s"$dir/target")
    val lr = Dsir.dsirLoad(spark, s"$dir/raw")
    assert(lt.total == target.total && lt.nBuckets == target.nBuckets && lt.k == target.k)
    val pool = rawTexts.toSeq.toDF("doc_id", "text")
    assert(collectW(Dsir.dsirLogWeights(pool, lt, lr)) ==
      collectW(Dsir.dsirLogWeights(pool, target, raw)))
  }

  test("dsir plans: no cartesian product; resample is a TakeOrdered top-k") {
    val target = Dsir.dsirTrain(targetTexts.toSeq.toDF("doc_id", "text"), 32, 0.1)
    val raw = Dsir.dsirTrain(rawTexts.toSeq.toDF("doc_id", "text"), 32, 0.1)
    val pool = rawTexts.toSeq.toDF("doc_id", "text")
    val resample = Dsir.dsirResample(pool, target, raw, nKeep = 2)
    resample.collect() // materialize so AQE finalizes the plan
    val plan = resample.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dsir guards: mismatched feature spaces and bad params are rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val m16 = Dsir.dsirTrain(docs, 16, 0.1)
    val m32 = Dsir.dsirTrain(docs, 32, 0.1)
    intercept[IllegalArgumentException](Dsir.dsirLogWeights(docs, m16, m32))
    intercept[IllegalArgumentException](Dsir.dsirTrain(docs, 0, 0.1))
    intercept[IllegalArgumentException](Dsir.dsirTrain(docs, 16, 0.0))
    intercept[IllegalArgumentException](Dsir.dsirResample(docs, m16, m16, -1))
  }
}
