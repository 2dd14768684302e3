package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy operators for a training-data pipeline: free-text PII redaction
  * (emails / phone numbers / IP addresses → placeholder tokens, with match
  * counts for audit) and structured-column anonymization (hash /
  * partial-mask of identifier columns), the two shapes every large-corpus
  * privacy pass runs before data leaves the curation boundary.
  *
  * == Scale design ==
  * Both operators are pure narrow scalar pipelines — regex match/replace
  * and hash functions inside whole-stage codegen, no shuffle, no UDFs —
  * so they scale linearly with input bytes exactly like [[TextAnalysis]].
  * The regex set is a compile-once constant per codegen'd plan, not
  * per-row work.
  *
  * The regexes use only syntax shared by Java's engine and RE2 (character
  * classes, bounded repetition, `\b`), so the DuckDB oracles run the
  * IDENTICAL patterns — the redaction is verified end-to-end, not
  * approximated.
  */
object Privacy {

  /** Shared Java/RE2 PII patterns. */
  val EmailPattern: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePattern: String = """\b\d{3}-\d{4}\b"""
  val IpPattern: String    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Redact PII from a text column: count matches per category (the audit
    * trail a compliance pass needs), then replace email → phone → IP with
    * placeholder tokens. Replacement order matters only in that earlier
    * placeholders must not re-match later patterns — `<EMAIL>`/`<PHONE>`
    * contain no digits, so they can't.
    */
  def redactText(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(PhonePattern), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(t, lit(IpPattern), lit(0))))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            PhonePattern, "<PHONE>"),
          IpPattern, "<IP>"))
  }

  /** The documents corpus is synthetic word-soup with no organic PII, so
    * the driver query plants a deterministic email / phone / IP derived
    * from `doc_id` into each document (identically in the oracle) and
    * redacts the result — the operator is exercised against text where
    * every pattern fires and the redacted output is exactly predictable.
    */
  def redactDocuments(docs: DataFrame): DataFrame = {
    val planted = docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string"))
        .as("text"))
    redactText(planted, "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("text")).as("redacted_fp"),
        length(col("text")).as("n_chars_redacted"))
  }

  /** Structured-column anonymization over the customer dimension, the
    * three standard treatments side by side: stable hashing (SHA-256 of
    * the name — referential integrity survives, identity doesn't),
    * format-preserving partial masking (every digit but the last four
    * becomes 'X'), and generalization (account balance coarsened to a
    * 1000-unit bucket, the k-anonymity move for numeric quasi-identifiers).
    */
  def maskCustomers(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      sha2(col("c_name"), 256).as("name_hash"),
      concat(
        regexp_replace(expr("substring(c_name, 1, length(c_name) - 4)"),
          "[0-9]", "X"),
        expr("substring(c_name, length(c_name) - 3, 4)")).as("name_masked"),
      floor(col("c_acctbal") / 1000).cast("long").as("acctbal_bucket"),
      col("c_mktsegment"))

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_redact_text" -> ((s, d) => redactDocuments(Tables.documents(s, d))),
    "pii_mask_customers" -> ((s, d) => maskCustomers(Tables.customer(s, d))),
  )

  /** DuckDB twins — same regexes (shared Java/RE2 subset), same plant. */
  def oracleSql: Map[String, String] = Map(
    "pii_redact_text" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@mail.example.com or call 555-'
        |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |              || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |           AS n_emails,
        |         len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS n_phones,
        |         len(regexp_extract_all(text,
        |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(text,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |               '<EMAIL>', 'g'),
        |             '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |           AS text
        |  FROM planted)
        |SELECT doc_id, n_emails, n_phones, n_ips,
        |       md5(text) AS redacted_fp,
        |       length(text) AS n_chars_redacted
        |FROM red""".stripMargin,
    "pii_mask_customers" ->
      """SELECT c_custkey,
        |       sha256(c_name) AS name_hash,
        |       regexp_replace(substring(c_name, 1, length(c_name) - 4),
        |                      '[0-9]', 'X', 'g')
        |         || substring(c_name, length(c_name) - 3, 4)
        |         AS name_masked,
        |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bucket,
        |       c_mktsegment
        |FROM customer""".stripMargin,
  )
}
