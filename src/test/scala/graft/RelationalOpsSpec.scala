package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Embeddings, Relational, TextOps}

/** Semantics specs for the q58-q63 relational/embedding completions —
  * each pins the one behavior its oracle alone can't isolate (the
  * RANGE-vs-ROWS frame distinction needs a gap-ful fixture; the
  * brute-force twins need driver-side recomputation). */
class RelationalOpsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("q58 rolling revenue: RANGE frame skips missing days (not ROWS)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("roll").toString
    // days 1, 2, then a 7-day gap to day 10: a ROWS 6-PRECEDING frame
    // would include days 1-2 in day 10's window; RANGE must not.
    Seq(
      ("2020-01-01 00:00:00", 100.0),
      ("2020-01-02 00:00:00", 50.0),
      ("2020-01-10 00:00:00", 10.0),
      ("2020-01-10 00:00:00", 20.0))
      .toDF("d", "o_totalprice")
      .select(col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Relational.rollingRevenue(spark, dir)
      .select("day", "n_orders", "day_rev", "rev7", "days7", "avg7").collect()
    assert(rows.length == 3)
    val byDay = rows.map(r => r.getAs[Timestamp]("day").toString.take(10) -> r).toMap
    assert(byDay("2020-01-01").getAs[Double]("rev7") == 100.0)
    assert(byDay("2020-01-02").getAs[Double]("rev7") == 150.0)
    assert(byDay("2020-01-02").getAs[Long]("days7") == 2L)
    val d10 = byDay("2020-01-10")
    assert(d10.getAs[Long]("n_orders") == 2L)
    assert(d10.getAs[Double]("day_rev") == 30.0)
    assert(d10.getAs[Double]("rev7") == 30.0, "RANGE frame must exclude the pre-gap days")
    assert(d10.getAs[Long]("days7") == 1L)
    assert(d10.getAs[Double]("avg7") == 30.0)
  }

  test("q59 deciles: ntile balance and rank ratios per source") {
    val rows = Relational.lengthDeciles(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, grp) =>
      val byDecile = grp.groupBy(_.getAs[Long]("decile")).view.mapValues(_.length)
      assert(byDecile.keys.forall(d => d >= 1 && d <= 10))
      // ntile invariant: bucket sizes differ by at most 1
      assert(byDecile.values.max - byDecile.values.min <= 1)
      // percent_rank/cume_dist are ratios in [0, 1], monotone in n_chars
      val sorted = grp.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val prs = sorted.map(_.getAs[Double]("pct_rank"))
      assert(prs.head == 0.0 && prs.forall(p => p >= 0.0 && p <= 1.0))
      assert(prs.zip(prs.tail).forall { case (a, b) => a <= b })
      val cds = sorted.map(_.getAs[Double]("cume"))
      assert(cds.last == 1.0 && cds.zip(cds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q60 unpivot: long form carries exactly the wide profile's cells") {
    val wide = Relational.corpusProfile(spark, SfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val long = Relational.profileUnpivot(spark, SfDir).collect()
    assert(long.length == wide.size * 6)
    long.foreach { r =>
      val w = wide(r.getAs[String]("source"))
      val expected = r.getAs[String]("stat") match {
        case "n_docs" => w.getAs[Long]("n_docs").toDouble
        case "n_langs" => w.getAs[Long]("n_langs").toDouble
        case "min_chars" => w.getAs[Long]("min_chars").toDouble
        case "max_chars" => w.getAs[Long]("max_chars").toDouble
        case "median_chars" => w.getAs[Double]("median_chars")
        case "p90_chars" => w.getAs[Double]("p90_chars")
      }
      assert(r.getAs[Double]("value") == expected, s"cell $r")
    }
  }

  test("q61 BPE pairs: agrees with a driver-side brute force at sf0.001") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, SfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    // Pair by CODE POINTS, matching char_pairs' documented semantics —
    // String.sliding(2) would pair UTF-16 code units and split
    // surrogate pairs on non-BMP text (ADVICE r6).
    def cpPairs(w: String): Seq[String] = {
      val cps = w.codePoints().toArray
      (0 until cps.length - 1).map(i => new String(cps, i, 2))
    }
    val occ = docs.flatMap { case (id, t) =>
      t.split(" ", -1).flatMap(cpPairs).map(p => (p, id))
    }
    val brute = occ.groupBy(_._1).map { case (p, xs) =>
      (p, xs.length.toLong, xs.map(_._2).distinct.length.toLong)
    }.toSeq.sortBy(x => (-x._2, x._1)).take(50)
    val got = TextOps.bpePairCounts(spark, SfDir)
      .select("pair", "n", "df").as[(String, Long, Long)].collect().toSeq
    assert(got == brute)
  }

  test("q62 centroids: dim-wise quantized sums match a driver-side brute force") {
    import spark.implicits._
    val vecs = graft.ops.Tables.embeddings(spark, SfDir)
      .select("label", "embedding").as[(Int, Seq[Float])].collect()
    // Round half AWAY FROM ZERO (BigDecimal HALF_UP), matching both
    // Spark's round() and DuckDB's round() on negative .5 values —
    // math.round is half-up toward +infinity and would diverge there
    // (ADVICE r6).
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val brute = vecs.flatMap { case (l, v) =>
      v.zipWithIndex.map { case (x, d) => ((l, d), q(x.toDouble * 1e6)) }
    }.groupBy(_._1).map { case ((l, d), xs) =>
      ((l, d), (xs.length.toLong, xs.map(_._2).sum))
    }
    val got = Embeddings.labelCentroids(spark, SfDir)
      .select("label", "dim", "n", "sum_q", "mean_q").collect()
    assert(got.length == brute.size)
    got.foreach { r =>
      val key = (r.getAs[Int]("label"), r.getAs[Int]("dim"))
      val (n, sum) = brute(key)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sum_q") == sum, s"at $key")
      assert(r.getAs[Double]("mean_q") == sum.toDouble / n)
    }
  }

  test("q64 navigation windows: lag/lead/first_value over a controlled fixture") {
    import spark.implicits._
    val dir = Files.createTempDirectory("nav").toString
    // user 1: events at t=10,20,50 (ns = us*1000); user 2: single event
    Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 50L, 1L, "purchase"),
      (4L, 30L, 2L, "view"))
      .map { case (id, us, u, t) => (id, us * 1000, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.ops.Temporal.eventNavigation(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("prev_type")))
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("gap_us")))
    assert(byId(1L).getAs[Long]("next_gap_us") == 10L)
    assert(byId(1L).getAs[Long]("since_first_us") == 0L)
    assert(byId(2L).getAs[String]("prev_type") == "view")
    assert(byId(2L).getAs[Long]("gap_us") == 10L)
    assert(byId(2L).getAs[Long]("next_gap_us") == 30L)
    assert(byId(2L).getAs[Long]("since_first_us") == 10L)
    assert(byId(3L).getAs[String]("prev_type") == "click")
    assert(byId(3L).getAs[Long]("gap_us") == 30L)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("next_gap_us")))
    assert(byId(3L).getAs[Long]("since_first_us") == 40L)
    // single-event user: every offset null, since_first = 0
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("prev_type")))
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("gap_us")))
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("next_gap_us")))
    assert(byId(4L).getAs[Long]("since_first_us") == 0L)
  }

  /** The q65 relative-error contract vs the exact q43/q49 twins,
    * parameterized by scale — since round 13 the DOCUMENTATION of the
    * band the graded query itself asserts (approxProfile reduces the
    * sketches to band booleans that the DuckDB oracle replays with its
    * own sketches — VERDICT r12 #1), measured here on the RAW form at
    * the fixture SF and at the BENCH SF, where the HLL/t-digest merge
    * trees are corpus-deep. Measured (the `info` line): sf0.1 vocab
    * rel-err < 0.01%, percentiles within ±4 chars of exact. */
  private def q65AccuracyBand(dir: String): Unit = {
    import spark.implicits._
    val approx = Relational.approxProfileRaw(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // exact twins, independently computed the q43/q49 way (the raw
    // form's own exact_* columns must agree with these witnesses)
    val docs = graft.ops.Tables.documents(spark, dir)
    val exactVocab = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("source").agg(countDistinct(col("token")).as("v"))
      .as[(String, Long)].collect().toMap
    val exactPcts = Relational.corpusProfile(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("median_chars"), r.getAs[Double]("p90_chars"))).toMap
    assert(approx.keySet == exactVocab.keySet)
    var (maxVocabErr, maxPctErr) = (0.0, 0L)
    approx.foreach { case (src, r) =>
      val av = r.getAs[Long]("approx_vocab").toDouble
      val ev = exactVocab(src).toDouble
      assert(r.getAs[Long]("exact_vocab") == exactVocab(src))
      maxVocabErr = math.max(maxVocabErr, math.abs(av - ev) / ev)
      assert(math.abs(av - ev) / ev <= 0.10, s"$src vocab: approx $av vs exact $ev")
      // percentile_approx with accuracy 10000 on these group sizes is
      // near-exact: allow one length-value of slack either side
      val (em, ep) = exactPcts(src)
      assert(r.getAs[Double]("exact_median") == em && r.getAs[Double]("exact_p90") == ep)
      maxPctErr = math.max(maxPctErr, math.max(
        math.abs(r.getAs[Long]("approx_median") - em).round,
        math.abs(r.getAs[Long]("approx_p90") - ep).round))
      assert(math.abs(r.getAs[Long]("approx_median") - em) <= em * 0.05 + 2,
        s"$src median: ${r.getAs[Long]("approx_median")} vs $em")
      assert(math.abs(r.getAs[Long]("approx_p90") - ep) <= ep * 0.05 + 2,
        s"$src p90: ${r.getAs[Long]("approx_p90")} vs $ep")
    }
    // the graded reduction: every band boolean true, schema as gated
    val graded = Relational.approxProfile(spark, dir)
    assert(graded.columns.toSeq == Seq("source", "n_docs", "exact_vocab",
      "exact_median", "exact_p90", "vocab_in_band", "p50_in_band", "p90_in_band"))
    val g = graded.collect()
    assert(g.length == approx.size)
    g.foreach { r =>
      assert(r.getAs[Boolean]("vocab_in_band") && r.getAs[Boolean]("p50_in_band")
        && r.getAs[Boolean]("p90_in_band"), s"band false for ${r.getAs[String]("source")}")
    }
    info(f"$dir: max vocab rel-err $maxVocabErr%.4f, max percentile abs-err $maxPctErr chars")
  }

  test("q65 sketches: approx vocab/percentiles within bounds of the exact twins") {
    q65AccuracyBand(SfDir)
  }

  test("q65 sketches: the accuracy band holds at the graded bench scale (sf0.1)") {
    assume(new java.io.File("/root/testdata/sf0.1").isDirectory, "sf0.1 testdata not present")
    q65AccuracyBand("/root/testdata/sf0.1")
  }

  test("q66 exact-moment stats: agrees with Spark's streaming corr/stddev to FP tolerance") {
    val got = Relational.priceStats(spark, SfDir).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    // Spark's own streaming aggregates as an independent witness: the
    // exact-decimal derivation must land within FP-drift distance
    val ref = graft.ops.Tables.lineitem(spark, SfDir)
      .groupBy(col("l_returnflag"))
      .agg(stddev_pop(col("l_quantity")).as("sd_q"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (flag, r) =>
      assert(math.abs(r.getAs[Double]("stddev_q") - ref(flag).getAs[Double]("sd_q")) < 1e-6)
      val c = r.getAs[Double]("corr_qp")
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - ref(flag).getAs[Double]("c")) < 1e-6)
    }
  }

  test("q67 grouping sets: exactly the two marginals, no totals or cross cells") {
    val rows = Relational.orderMarginals(spark, SfDir).collect()
    // every row is one of the two marginals: exactly one dimension null
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("o_orderstatus")) ^
      r.isNullAt(r.fieldIndex("o_orderpriority"))))
    // each marginal's counts sum to the table size
    val total = graft.ops.Tables.orders(spark, SfDir).count()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(1L, 2L)) // status kept (gid=1), priority kept (gid=2)
    byGid.values.foreach(g => assert(g.map(_.getAs[Long]("n")).sum == total))
  }

  test("q63 set ops: intersect-then-except over a controlled fixture") {
    import spark.implicits._
    val dir = Files.createTempDirectory("setops").toString
    // thresholds: purchase/click qualify at value > 50, error excludes
    // at value > 90. user 1: big purchase+click (in); 2: + severe
    // error (excluded); 3: purchase only; 4: click only; 5: two big
    // purchases + click (distinct semantics — appears once); 6: click
    // below threshold (out); 7: error below threshold (kept)
    Seq(
      (1L, "purchase", 60.0), (1L, "click", 60.0),
      (2L, "purchase", 60.0), (2L, "click", 60.0), (2L, "error", 95.0),
      (3L, "purchase", 60.0), (4L, "click", 60.0),
      (5L, "purchase", 60.0), (5L, "purchase", 70.0), (5L, "click", 60.0),
      (6L, "purchase", 60.0), (6L, "click", 40.0),
      (7L, "purchase", 60.0), (7L, "click", 60.0), (7L, "error", 50.0))
      .zipWithIndex
      .map { case ((u, t, v), i) => (i.toLong, i.toLong * 1000000000L, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.engagedPurchasers(spark, dir).as[Long].collect().toSeq
    assert(got == Seq(1L, 5L, 7L))
  }
}
