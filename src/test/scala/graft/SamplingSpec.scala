package graft

import graft.ops.{LlmOps, Sampling, Tables}
import org.apache.spark.sql.functions._

/** Deterministic splitting/sampling (q36/q37) and the curation
  * capstone (q35): coverage, disjointness, reproducibility, and
  * agreement with the component operators they compose. */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def available = new java.io.File(dir).isDirectory

  test("hashSplit: total coverage, deterministic, ~80/10/10, salt-sensitive") {
    assume(available, "testdata not present")
    val nDocs = Tables.documents(spark, dir).count()
    val split = Sampling.hashSplit(spark, dir).collect()
    // exactly one row per document — coverage AND disjointness
    assert(split.length == nDocs && split.map(_.getLong(0)).distinct.length == nDocs)
    val byLabel = split.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // 500 docs: binomial 3-sigma around 400/50/50
    assert(byLabel("train") > 350 && byLabel("train") < 450, s"train=${byLabel("train")}")
    assert(byLabel("val") > 20 && byLabel("val") < 85, s"val=${byLabel("val")}")
    // pure function of (doc_id, salt): identical on re-run...
    val again = Sampling.hashSplit(spark, dir).collect()
    assert(split.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).toSeq)
    // ...and a different salt reassigns a nontrivial fraction
    val other = Sampling.hashSplit(spark, dir, salt = "split-v2")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val moved = split.count(r => other(r.getLong(0)) != r.getString(2))
    assert(moved > 50, s"only $moved docs moved under a new salt")
  }

  test("stratifiedSample: per-stratum rate honored, subset, deterministic") {
    assume(available, "testdata not present")
    val totals = Tables.documents(spark, dir).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Sampling.stratifiedSample(spark, dir).collect()
    val bySrc = sample.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // every sampled stratum exists, and no stratum is wildly off 20%
    // (small strata can legitimately sample to zero)
    bySrc.foreach { case (src, n) =>
      assert(totals.contains(src))
      assert(n <= totals(src))
    }
    val overall = sample.length.toDouble / totals.values.sum
    assert(overall > 0.10 && overall < 0.35, s"overall rate $overall")
    val again = Sampling.stratifiedSample(spark, dir).collect()
    assert(sample.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("packSequences: per-shard running offsets, pack boundaries, full coverage") {
    assume(available, "testdata not present")
    val nDocs = Tables.documents(spark, dir).count()
    val rows = Sampling.packSequences(spark, dir).collect()
    assert(rows.length == nDocs && rows.map(_.getLong(0)).distinct.length == nDocs)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0) % 8)) // shard rule
    // within each shard, in doc_id order: start_tok is the exact
    // running token total and pack_id = start_tok div contextLen
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum, s"doc ${r.getLong(0)} start_tok")
        assert(r.getLong(4) == cum / 128, s"doc ${r.getLong(0)} pack_id")
        cum += r.getLong(2)
      }
    }
    // docs span pack boundaries (GPT-style concatenation): some doc
    // must start mid-pack — packing that padded every doc to a fresh
    // pack would still pass the offset checks above
    assert(rows.exists(r => r.getLong(3) % 128 != 0))
    val again = Sampling.packSequences(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(4))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(4))).toSeq)
  }

  test("stratumCapSample: exact integer rates, uncapped strata intact, deterministic") {
    assume(available, "testdata not present")
    val totals = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Sampling.stratumCapSample(spark, dir).collect()
    // per-row: n_stratum and the 60-bit threshold formula are exact;
    // the threshold is NEVER zero (the rate-floor cliff a
    // permille-granular rate would have at n > 1000·cap)
    got.foreach { r =>
      val n = totals((r.getString(1), r.getString(2)))
      assert(r.getLong(3) == n)
      assert(r.getLong(4) == (if (n <= 5) 1L << 60 else ((1L << 60) / n) * 5))
      assert(r.getLong(4) > 0)
    }
    val keptBy = got.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    // strata at or under the cap keep every document (threshold 2^60
    // is one past the 60-bit hash maximum)
    totals.filter(_._2 <= 5).foreach { case (k, n) =>
      assert(keptBy.getOrElse(k, 0L) == n, s"uncapped stratum $k lost docs")
    }
    // no stratum exceeds its population, and over-cap strata exist in
    // the fixture (else this test certifies nothing)
    keptBy.foreach { case (k, n) => assert(n <= totals(k)) }
    assert(totals.values.exists(_ > 5), "fixture has no capped stratum")
    val again = Sampling.stratumCapSample(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("sourceMix: T maximal, targets respect supply, weight-0 excluded, map-lookup form") {
    assume(available, "testdata not present")
    val docs = Tables.documents(spark, dir)
    val totals = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def wt(src: String): Long = src.drop(3).toLong % 4 + 1
    // replay the exact-integer sizing: T = min over sources of
    // supply·1000 div weight, target = (T·w) div 1000
    val t = totals.map { case (s, n) => n * 1000 / wt(s) }.min
    val got = Sampling.sourceMix(spark, dir).collect()
    val bySrc = got.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val target = t * wt(src) / 1000
      assert(rows.forall(_.getLong(3) == target), s"$src target_n mismatch")
      assert(rows.forall(_.getLong(2) == totals(src)))
      assert(rows.length <= totals(src), s"$src kept more than its supply")
    }
    // the kept set is binomial around the target sum (the hash
    // threshold gives EXPECTED counts): allow a generous ±20% band
    val targetSum = totals.keys.toSeq.map(s => t * wt(s) / 1000).sum
    assert(math.abs(got.length - targetSum) <= targetSum / 5,
      s"kept ${got.length} of expected ~$targetSum")
    // a weight-0 source is excluded entirely and the mix re-sizes
    val zeroed = Sampling.sourceMixDocs(docs,
      when(col("source") === "src0", 0L).otherwise(lit(1L))).collect()
    assert(!zeroed.exists(_.getString(1) == "src0"))
    // a weight that varies WITHIN a source is a caller bug — the
    // duplicate-fanout hazard is fenced with raise_error, not silence
    val varying = intercept[Exception] {
      Sampling.sourceMixDocs(docs, (col("doc_id") % 3 + 1).cast("long")).collect()
    }
    assert(varying.getMessage.contains("constant per source") ||
      Option(varying.getCause).exists(_.getMessage.contains("constant per source")),
      varying.toString)
    // map-lookup weights (the real-pipeline form) agree with the
    // equivalent expression form
    val m = totals.keys.map(s => s -> wt(s)).toMap
    val viaMap = Sampling.sourceMixDocs(docs,
      element_at(typedLit(m), col("source"))).collect()
    assert(viaMap.map(_.getLong(0)).sorted.toSeq ==
      got.map(_.getLong(0)).sorted.toSeq)
    // a row whose OWN weight is 0 is excluded even when its source
    // carries a positive rate (the rate join keys on source NAME —
    // without the per-row filter, weight-0 rows would ride along and
    // the source would over-contribute vs its target)
    val mixedRows = Sampling.sourceMixDocs(docs,
      when(col("doc_id") % 2 === 0, 0L).otherwise(lit(2L))).collect()
    assert(mixedRows.nonEmpty && mixedRows.forall(_.getLong(0) % 2 != 0))
    // and the supply count sizing the rate reflects only weighted rows
    val oddTotals = docs.filter(col("doc_id") % 2 =!= 0)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mixedRows.foreach(r => assert(r.getLong(2) == oddTotals(r.getString(1))))
  }

  test("temperatureMix: flattening boosts low-resource share, exact arithmetic, α=1 ≡ proportional") {
    assume(available, "testdata not present")
    val docs = Tables.documents(spark, dir)
    val totals = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side brute replay of the documented arithmetic, with the
    // engine's DECIMAL(18,6) weight quantization (valueOf = Spark's
    // shortest-string cast rounding)
    def brute(alpha: Double, permille: Int): Map[String, Long] = {
      val wq = totals.view.mapValues(n =>
        java.math.BigDecimal.valueOf(math.pow(n.toDouble, alpha))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()).toMap
      val sumWq = wq.values.sum
      val budget = totals.values.sum * permille / 1000
      totals.map { case (s, n) => s -> math.min(n, budget * wq(s) / sumWq) }
    }
    val got = Sampling.temperatureMixDocs(docs).collect()
    val targets = got.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(targets == brute(0.5, 500), s"targets $targets != ${brute(0.5, 500)}")
    // per-row: n_stratum exact; kept count never exceeds the target's
    // stratum population
    got.foreach(r => assert(r.getLong(2) == totals(r.getString(1))))
    val keptBy = got.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    keptBy.foreach { case (s, n) => assert(n <= totals(s)) }
    // α=1 is proportional sampling exactly (on the real table)
    val prop = brute(1.0, 500)
    // the flattening property needs a SKEWED corpus (the driver
    // fixture's sources are uniform, where temperature is a no-op by
    // design): 200/40/10 docs — at α=0.5 the smallest source's share
    // of the kept mix strictly exceeds its proportional share, and
    // the largest's strictly shrinks
    import spark.implicits._
    val skewed = ((1 to 200).map(i => (i.toLong, "big")) ++
      (201 to 240).map(i => (i.toLong, "mid")) ++
      (241 to 250).map(i => (i.toLong, "rare")))
      .toDF("doc_id", "source")
    def mixShare(alpha: Double): Map[String, Double] = {
      val t = Sampling.temperatureMixDocs(skewed, alpha = alpha)
        .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
      t.view.mapValues(_.toDouble / t.values.sum).toMap
    }
    val (flatSh, propSh) = (mixShare(0.5), mixShare(1.0))
    assert(flatSh("rare") > propSh("rare"),
      s"α=0.5 must boost the rare source's share: $flatSh vs $propSh")
    assert(flatSh("big") < propSh("big"),
      s"α=0.5 must shrink the big source's share: $flatSh vs $propSh")
    // α=1 is proportional sampling exactly
    val atOne = Sampling.temperatureMixDocs(docs, alpha = 1.0).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(atOne == prop)
    // deterministic replay
    val again = Sampling.temperatureMixDocs(docs).collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
    // guards
    intercept[IllegalArgumentException](Sampling.temperatureMixDocs(docs, alpha = 0.0))
    intercept[IllegalArgumentException](Sampling.temperatureMixDocs(docs, budgetPermille = 1001))
  }

  test("pipeline composition: curate → split → pack runs over the surviving subset") {
    assume(available, "testdata not present")
    val docs = Tables.documents(spark, dir)
    val kept = LlmOps.curateCorpus(spark, dir).filter(col("keep")).select("doc_id")
    val keptDocs = docs.join(kept, Seq("doc_id"))
    val nKept = keptDocs.count()
    assert(nKept > 0 && nKept < docs.count()) // curation actually dropped something
    // hash splitting commutes with curation: a doc's split on the
    // curated subset equals its split on the full corpus
    val subsetSplit = Sampling.hashSplitDocs(keptDocs)
    val fullSplit = Sampling.hashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    subsetSplit.collect().foreach(r =>
      assert(fullSplit(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
    // pack ONLY the curated train subset — SERVER-SIDE: the Docs form
    // appends `split` keeping every input column, so the pipeline
    // composes without a driver round-trip or corpus re-join
    val train = subsetSplit.filter(col("split") === "train")
    val packed = Sampling.packSequencesDocs(train).collect()
    assert(packed.length.toLong == train.count())
    packed.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum, s"subset offsets must be contiguous (doc ${r.getLong(0)})")
        cum += r.getLong(2)
      }
    }
    graft.ops.Caches.releaseAll(spark)
  }

  test("slidingChunks: start/len arithmetic on pinned docs, full token coverage") {
    assume(available, "testdata not present")
    // pinned arithmetic via an inline fixture: 10 tokens, size 4, stride 3
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toString
    Seq((1L, "a b c d e f g h i j"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Sampling.slidingChunks(spark, tmp, size = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 1L)))          // empty doc 3 yields no chunks
    // real corpus: every doc's chunks tile it — first start 0, steps of
    // stride, last chunk ends exactly at n_tokens
    val corpus = Sampling.slidingChunks(spark, dir).collect()
      .groupBy(_.getLong(0)).values
    corpus.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == i.toLong * 48)
      }
      val last = sorted.last
      assert(last.getLong(3) >= 1 && last.getLong(3) <= 64)
    }
  }

  test("curateCorpus: reasons agree with the component operators, precedence holds") {
    assume(available, "testdata not present")
    val cur = LlmOps.curateCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    graft.ops.Caches.releaseAll(spark)

    // exact_dup reasons = exactly the docs that are NOT their hash
    // group's survivor (q19 semantics)
    val keepIds = LlmOps.exactDedup(spark, dir).collect().map(_.getLong(1)).toSet
    val exactDups = cur.keySet -- keepIds
    assert(cur.filter(_._2._2 == "exact_dup").keySet == exactDups)
    graft.ops.Caches.releaseAll(spark)

    // near_dup reasons = q32's dropped docs MINUS those already exact
    // (precedence), and keep == (reason == kept) everywhere
    val nearDropped = LlmOps.nearDupClusters(spark, dir).collect()
      .filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(cur.filter(_._2._2 == "near_dup").keySet == (nearDropped -- exactDups))
    cur.values.foreach { case (keep, reason) => assert(keep == (reason == "kept")) }
    assert(cur.values.exists(_._2 == "exact_dup") || cur.values.exists(_._2 == "near_dup"))
    graft.ops.Caches.releaseAll(spark)
  }

  test("leakageSafeSplit: clusters share a split, singletons replay q36, total coverage") {
    assume(available, "testdata not present")
    val nDocs = Tables.documents(spark, dir).count()
    val rows = Sampling.leakageSafeSplit(spark, dir).collect()
    graft.ops.Caches.releaseAll(spark)
    // one row per document (coverage + disjointness)
    assert(rows.length == nDocs && rows.map(_.getLong(0)).distinct.length == nDocs)
    val byDoc = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every cluster member carries the SAME split — the defining
    // property, checked via the group ids the operator itself emits
    byDoc.values.groupBy(_._1).foreach { case (g, members) =>
      assert(members.map(_._2).toSet.size == 1, s"group $g straddles splits")
    }
    // the q32 components ARE the groups: every q32-clustered doc maps
    // to its cluster_id, so near-dup pairs can never straddle splits
    val comp = LlmOps.nearDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.Caches.releaseAll(spark)
    byDoc.foreach { case (d, (g, _)) => assert(g == comp(d)) }
    // a nontrivial cluster exists at this SF (otherwise the test is
    // vacuous) and its members indeed share one split
    assert(comp.groupBy(_._2).exists(_._2.size > 1), "fixture has no near-dup cluster")
    // singletons (group == self) get bit-identically the q36 split
    val q36 = Sampling.hashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    byDoc.foreach { case (d, (g, s)) => if (g == d) assert(s == q36(d)) }
  }
}
