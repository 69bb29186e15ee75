package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** #190: PII detection + scrubbing — the redaction pass every
  * training-data pipeline runs before a corpus ships: find
  * email/IP/phone spans, count them per document, and emit the masked
  * text's fingerprint so downstream stages provably consume the CLEAN
  * copy.
  *
  * The synthetic corpus carries no PII (measured: zero matches for all
  * three patterns), so the operator INJECTS it deterministically first
  * — a pHash-selected fifth of the documents each gets one email, one
  * IPv4 or one phone number derived from the hash (the same
  * derive-the-fixture-from-the-data trick the MERGE op uses for its
  * change batch). That makes the scrub MEASURABLE: the spec can assert
  * every planted span is found, masked, and nothing else changed — on
  * a real corpus the injection stage is dropped and the scrubber is
  * unchanged.
  *
  * Masking order is fixed (email → ip → phone) and counts are taken on
  * the dirty text BEFORE masking, so the report is independent of mask
  * overlap pathologies. Patterns stay in the Java∩RE2 dialect both
  * engines parse identically (character classes + bounded repeats, no
  * lookaround, no \\b).
  *
  * Scale: map-only — per-row regex work, zero shuffles, scan-speed at
  * any corpus size; the masked text would be written back partitioned
  * exactly like the input (the md5 column here pins its content without
  * moving it).
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Deterministic dirty text: one planted PII span for 3 of 5 hash
    * classes (email / ip / phone), the other two untouched.
    */
  private def dirty(h: Column): Column = {
    val sel = h % 5
    when(sel === 0, concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com now")))
      .when(sel === 1, concat(col("text"), lit(" from 10."),
        (h % 250).cast("string"), lit("."), (h % 199).cast("string"),
        lit("."), (h % 97).cast("string"), lit(" logged")))
      .when(sel === 2, concat(col("text"), lit(" call 555-"),
        (h % 900 + 100).cast("string"), lit("-"),
        (h % 9000 + 1000).cast("string"), lit(" now")))
      .otherwise(col("text"))
  }

  def scrub(spark: SparkSession, dir: String): DataFrame = {
    val h = PortableHash.pHash(concat(lit("PII|"), col("doc_id").cast("string")))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), dirty(h).as("dt"))
    def n(re: String) = size(regexp_extract_all(col("dt"), lit(re), lit(0))).cast("long")
    val masked = regexp_replace(
      regexp_replace(
        regexp_replace(col("dt"), EmailRe, "[EMAIL]"),
        IpRe, "[IP]"),
      PhoneRe, "[PHONE]")
    d.select(col("doc_id"),
      n(EmailRe).as("n_email"), n(IpRe).as("n_ip"), n(PhoneRe).as("n_phone"),
      length(col("dt")).cast("long").as("dirty_len"),
      length(masked).cast("long").as("clean_len"),
      md5(masked).as("clean_md5"))
  }

  val scrubSql: String = {
    val h = PortableHash.duck("'PII|' || doc_id")
    val dirty =
      s"""CASE $h % 5
         |  WHEN 0 THEN text || ' contact user' || doc_id || '@example.com now'
         |  WHEN 1 THEN text || ' from 10.' || ($h % 250) || '.' || ($h % 199) || '.' || ($h % 97) || ' logged'
         |  WHEN 2 THEN text || ' call 555-' || ($h % 900 + 100) || '-' || ($h % 9000 + 1000) || ' now'
         |  ELSE text END""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, $dirty AS dt FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(dt, '$EmailRe', 0)) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(dt, '$IpRe', 0)) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all(dt, '$PhoneRe', 0)) AS BIGINT) AS n_phone,
       |  CAST(length(dt) AS BIGINT) AS dirty_len,
       |  CAST(length(regexp_replace(regexp_replace(regexp_replace(dt,
       |    '$EmailRe', '[EMAIL]', 'g'), '$IpRe', '[IP]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g')) AS BIGINT) AS clean_len,
       |  md5(regexp_replace(regexp_replace(regexp_replace(dt,
       |    '$EmailRe', '[EMAIL]', 'g'), '$IpRe', '[IP]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g')) AS clean_md5
       |FROM d""".stripMargin
  }
}
