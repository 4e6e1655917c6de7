package graft

import org.apache.spark.sql.functions._

import graft.text.Redact

class RedactSpec extends SparkSpec {

  private def one(text: String): (String, Int, Int, Int, Int) = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    val counts = Redact.piiCounts(col("text"))
    val out = counts.foldLeft(df.withColumn("red", Redact.redact(col("text")))) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    out.select(col("red"), col("n_emails"), col("n_ssns"), col("n_ips"), col("n_phones"))
      .as[(String, Int, Int, Int, Int)].collect().head
  }

  test("redact: each PII type is detected and replaced with its tag") {
    val (red, e, s, i, p) = one(
      "mail a.b+c@ex-ample.co.uk, call +1 (555) 123-4567, host 192.168.0.1, id 123-45-6789 end")
    assert((e, s, i, p) == (1, 1, 1, 1))
    assert(red == "mail [EMAIL], call [PHONE], host [IP], id [SSN] end")
  }

  test("redact: ordering protects SSNs and IPs from the greedy phone pattern") {
    // an SSN or IP adjacent to digits must not be swallowed as a phone
    val (red, e, s, i, p) = one("ssn 123-45-6789 then ip 10.0.27.1 no phone here")
    assert((e, s, i, p) == (0, 1, 1, 0))
    assert(red == "ssn [SSN] then ip [IP] no phone here")
    // a phone needs the leading +; bare digit runs stay untouched
    assert(one("order 123456789 total 42")._1 == "order 123456789 total 42")
  }

  test("redact: multiple hits per type, idempotence, clean text unchanged") {
    val (red, e, _, _, _) = one("a@b.co and c@d.org wrote")
    assert(e == 2 && red == "[EMAIL] and [EMAIL] wrote")
    val clean = "perfectly ordinary prose with the number 12 in it"
    assert(one(clean)._1 == clean)
    // redacting redacted text changes nothing (tags match no pattern)
    assert(one(one("a@b.co +1 555-123-4567")._1)._1 == one("a@b.co +1 555-123-4567")._1)
  }

  test("ipv4: octets are range-checked — version-ish dotted numbers don't count as IPs") {
    assert(one("see 999.999.999.999 and 1.2.3.456 and 256.1.1.1 here") == (
      "see 999.999.999.999 and 1.2.3.456 and 256.1.1.1 here", 0, 0, 0, 0))
    val (red, _, _, i, _) = one("edges 0.0.0.0 and 255.255.255.255 mid 10.0.255.1 ok")
    assert(i == 3 && red == "edges [IP] and [IP] mid [IP] ok")
    // zero-padded octets are REAL IP notation (syslog exports) and must
    // still scrub — the range check may not shrink redaction recall
    val (red2, _, _, i2, _) = one("src 192.168.001.001 dst 010.000.000.255 end")
    assert(i2 == 2 && red2 == "src [IP] dst [IP] end")
  }

  test("containsPii: filter predicate matches the counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to x@y.io"), (2L, "nothing here"), (3L, "+1 555-000-1111 call")
    ).toDF("doc_id", "text")
    val flagged = df.where(Redact.containsPii(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
  }
}
