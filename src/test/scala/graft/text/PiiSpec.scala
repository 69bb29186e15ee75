package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("pii scrub: full driver recompute (inject, count, mask, fingerprint) " +
      "matches row-for-row; masked text is clean") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = Pii.scrub(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == docs.length)
    val email = Pii.EmailRe.r
    val ip = Pii.IpRe.r
    val phone = Pii.PhoneRe.r
    var planted = 0
    docs.foreach { case (id, text) =>
      val h = graft.core.PortableHash.pHashJvm(s"PII|$id")
      val dirty = (h % 5) match {
        case 0 => s"$text contact user$id@example.com now"
        case 1 => s"$text from 10.${h % 250}.${h % 199}.${h % 97} logged"
        case 2 => s"$text call 555-${h % 900 + 100}-${h % 9000 + 1000} now"
        case _ => text
      }
      if (h % 5 <= 2) planted += 1
      val masked = phone.replaceAllIn(
        ip.replaceAllIn(email.replaceAllIn(dirty, "[EMAIL]"), "[IP]"),
        "[PHONE]")
      val (_, nE, nI, nP, dLen, cLen, cMd5) = got(id)
      assert(nE == email.findAllIn(dirty).size.toLong)
      assert(nI == ip.findAllIn(dirty).size.toLong)
      assert(nP == phone.findAllIn(dirty).size.toLong)
      // the planted span is found: exactly one match of the planted kind
      (h % 5) match {
        case 0 => assert(nE == 1 && nI == 0 && nP == 0)
        case 1 => assert(nI == 1 && nE == 0 && nP == 0)
        case 2 => assert(nP == 1 && nE == 0 && nI == 0)
        case _ => assert(nE == 0 && nI == 0 && nP == 0)
      }
      assert(dLen == dirty.length.toLong && cLen == masked.length.toLong)
      assert(cMd5 == md5hex(masked))
      // scrubbed output carries no residual PII of any kind
      assert(email.findFirstIn(masked).isEmpty)
      assert(ip.findFirstIn(masked).isEmpty)
      assert(phone.findFirstIn(masked).isEmpty)
      // untouched docs pass through bit-identically
      if (h % 5 > 2) assert(cMd5 == md5hex(text) && cLen == text.length.toLong)
    }
    assert(planted > 0, "the hash classes must plant some PII")
  }
}
