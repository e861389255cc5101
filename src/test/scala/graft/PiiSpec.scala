package graft

import graft.ops.Pii
import org.apache.spark.sql.Row

/** The PII redaction operator (q99) on real-world-shaped fixtures —
  * the conformance query runs over planted PII (the corpus carries
  * none), so THIS is where the operator's own laws are certified:
  * per-class detection at string edges and adjacency, the masking
  * order (SSN is never half-eaten by the phone pattern), the
  * PII-free identity, and masking idempotence. */
class PiiSpec extends SparkSpec {

  private def redact(rows: Seq[(Long, String)]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    Pii.piiRedactDocs(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def counts(r: Row): (Long, Long, Long, Long, Long) =
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"), r.getAs[Long]("n_ssns"),
      r.getAs[Long]("n_phones"), r.getAs[Long]("n_pii"))

  test("each detector class: counts and masks, at edges and adjacent") {
    val got = redact(Seq(
      1L -> "mail me at a.b+c@sub.example.org today",
      2L -> "192.168.0.1",                             // whole string = one IP
      3L -> "ssn 123-45-6789 and phone 555-123-4567",  // both shapes in one doc
      4L -> "x@y.zz p@q.rr",                           // two adjacent emails
      5L -> "version 1.2.3 is not an ip, 10.0.0.300 is (broad shape)",
      6L -> "dot phone 555.123.4567 works too"))
    assert(counts(got(1L)) == (1L, 0L, 0L, 0L, 1L))
    assert(got(1L).getAs[String]("text_masked") == "mail me at <EMAIL> today")
    assert(counts(got(2L)) == (0L, 1L, 0L, 0L, 1L))
    assert(got(2L).getAs[String]("text_masked") == "<IP>")
    // the 3-2-4 SSN must mask as <SSN>, the 3-3-4 phone as <PHONE> —
    // the masking-order contract
    assert(counts(got(3L)) == (0L, 0L, 1L, 1L, 2L))
    assert(got(3L).getAs[String]("text_masked") == "ssn <SSN> and phone <PHONE>")
    assert(counts(got(4L)) == (2L, 0L, 0L, 0L, 2L))
    assert(got(4L).getAs[String]("text_masked") == "<EMAIL> <EMAIL>")
    // the deliberately-broad IPv4 shape (Dolma trade): 1.2.3 has only
    // three octet groups and stays; 10.0.0.300 matches the shape
    assert(counts(got(5L)) == (0L, 1L, 0L, 0L, 1L))
    assert(got(5L).getAs[String]("text_masked") ==
      "version 1.2.3 is not an ip, <IP> is (broad shape)")
    assert(counts(got(6L)) == (0L, 0L, 0L, 1L, 1L))
    assert(got(6L).getAs[String]("text_masked") == "dot phone <PHONE> works too")
  }

  test("PII-free text passes through bit-identically; masking is idempotent") {
    val clean = "the quick brown fox has no contact information at all"
    val dirty = "reach user1@example.com at 10.1.2.3 or 555-000-1234, ssn 987-65-4321"
    val first = redact(Seq(1L -> clean, 2L -> dirty))
    assert(counts(first(1L)) == (0L, 0L, 0L, 0L, 0L))
    assert(first(1L).getAs[String]("text_masked") == clean,
      "a PII-free doc must pass through unchanged")
    assert(counts(first(2L)) == (1L, 1L, 1L, 1L, 4L))
    // idempotence: the mask tokens are digit- and @-free, so a masked
    // text re-masks to itself with zero counts
    val again = redact(Seq(2L -> first(2L).getAs[String]("text_masked")))
    assert(counts(again(2L)) == (0L, 0L, 0L, 0L, 0L),
      "mask tokens must not re-trigger any detector")
    assert(again(2L).getAs[String]("text_masked") ==
      first(2L).getAs[String]("text_masked"), "masking must be idempotent")
  }

  test("the planted conformance fixture is non-vacuous and covers every class") {
    // the graded q99 plants PII because the synthetic corpus has no
    // digits — this pins that the plant actually fires all four
    // detectors at oracle SF (a regression to a vacuous gate fails
    // here, not silently in the oracle)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, "testdata not present")
    val rows = Pii.piiRedact(spark, dir).collect()
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("n_emails") > 0 && tot("n_ips") > 0 &&
      tot("n_ssns") > 0 && tot("n_phones") > 0,
      "the planted fixture no longer exercises every detector class")
    assert(rows.exists(_.getAs[Long]("n_pii") == 0L),
      "the fixture must also carry PII-free docs (the identity path)")
    val all4 = rows.filter(r => r.getAs[Long]("n_emails") > 0 &&
      r.getAs[Long]("n_ips") > 0 && r.getAs[Long]("n_ssns") > 0 &&
      r.getAs[Long]("n_phones") > 0)
    assert(all4.nonEmpty, "doc_id % 210 == 0 docs must carry all four classes")
    // determinism across runs (the oracle-gate prerequisite)
    val again = Pii.piiRedact(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
