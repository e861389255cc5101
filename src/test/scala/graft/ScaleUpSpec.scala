package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The scaling-measurement methodology itself (bench/SCALING_r07.md):
  * a ScaleUp federation must scale ROW COUNTS by the factor while
  * preserving the DISTRIBUTION — referential closure per copy, exact
  * within-copy duplication structure, disjoint cross-copy shingles,
  * norm-preserving embedding scrambles. A regression here would make
  * every future decade measurement measure the wrong thing. */
class ScaleUpSpec extends SparkSpec {

  private val Src = "/root/testdata/sf0.001"

  test("2x federation: counts double, copies are closed, distributions are preserved") {
    assume(new java.io.File(Src).isDirectory, "testdata not present")
    val dst = Files.createTempDirectory("scaleup").toString
    ScaleUp.run(spark, Src, dst, 2)

    def cnt(dir: String, t: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    // facts scale by the factor; fixed dims don't
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(cnt(dst, t) == 2 * cnt(Src, t), s"$t row count")
    for (t <- Seq("region", "nation"))
      assert(cnt(dst, t) == cnt(Src, t), s"$t must not replicate")

    // referential closure: no orphans across the shifted keys
    val o = spark.read.parquet(s"$dst/orders.parquet")
    val c = spark.read.parquet(s"$dst/customer.parquet")
    val l = spark.read.parquet(s"$dst/lineitem.parquet")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)

    // duplication structure preserved EXACTLY: exact-dup pair count
    // scales by the factor (cross-copy texts are disjoint)
    def dups(dir: String): Long = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      d.count() - d.select(col("text")).distinct().count()
    }
    assert(dups(dst) == 2 * dups(Src), "within-copy duplication must scale exactly")
    // n_chars invariant holds on the suffixed copies too
    assert(spark.read.parquet(s"$dst/documents.parquet")
      .filter(col("n_chars") =!= length(col("text"))).count() == 0)

    // embeddings: the sign scramble preserves norms bit-for-bit
    // (|±x|² = |x|²) while shifting ids — so quantizer geometry stats
    // (norms) are the source's, per copy
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
      .select(col("vec_id"),
        aggregate(transform(col("embedding"), x => x.cast("double") * x),
          lit(0.0), (acc, v) => acc + v).as("nrm2"))
    val base = e.filter(col("vec_id") < 10000000L)
      .withColumnRenamed("nrm2", "base_nrm2")
    val copy = e.filter(col("vec_id") >= 10000000L)
      .withColumn("vec_id", col("vec_id") - 10000000L)
    assert(copy.join(base, Seq("vec_id"))
      .filter(col("nrm2") =!= col("base_nrm2")).count() == 0,
      "sign scramble must preserve norms exactly")
    // and the scramble is real: copy vectors differ from their base
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val b2 = emb.filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), col("embedding").as("base_emb"))
    val c2 = emb.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"), col("embedding").as("copy_emb"))
    assert(c2.join(b2, Seq("vec_id"))
      .filter(col("copy_emb") === col("base_emb")).count() == 0,
      "copies must not be verbatim clones")
  }
}
