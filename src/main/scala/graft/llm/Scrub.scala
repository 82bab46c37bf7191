package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content scrubbing for training-data pipelines: PII redaction and
  * URL/domain policy filtering. Both are pure narrow maps (codegen'd
  * `regexp_replace`/`regexp_extract_all` — no UDFs), so they run at
  * input-scan speed on 100 TB; the only shuffle in the domain path is the
  * per-domain census aggregate, and the blocklist join is a broadcast
  * anti-join (a policy list is always tiny next to the corpus).
  *
  * Patterns stay in the RE2-compatible subset (no lookaround, no
  * backreferences) so the same regex means the same thing under Java's
  * engine here and RE2-based engines elsewhere.
  */
object Scrub {

  /** RFC-5322-lite email matcher — the pragmatic form every corpus
    * scrubber ships, not a full grammar. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (bounded runs; word-bounded so version strings like
    * 1.2.3.4.5 still match their first quad only, as scrubbers do). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone `NNN-NNN-NNNN`. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** `scheme://host` URL matcher; group 1 is the host/domain. */
  val UrlRe = "https?://([A-Za-z0-9.-]+)"

  /** Redact emails, then IPv4s, then phones (order matters: an email can
    * contain digit runs the narrower patterns would otherwise bite). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII census + redacted text — the auditable artifact a
    * compliance pass wants alongside the scrub itself. */
  def piiAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // coalesce: a null document has zero PII hits, not a null census
    def hits(re: String) =
      coalesce(size(regexp_extract_all(t, lit(re), lit(0))), lit(0))
    docs.select(col(idCol),
      hits(EmailRe).as("n_emails"),
      hits(Ipv4Re).as("n_ips"),
      hits(PhoneRe).as("n_phones"),
      scrubPii(t).as("redacted"))
  }

  /** All URL hosts mentioned in a document, in order. */
  def extractDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(1))

  /** 13-16 digit runs — payment-card CANDIDATES; Luhn decides. */
  val CardRe = "\\b\\d{13,16}\\b"

  /** Luhn checksum validation of a digit string, as pure codegen'd
    * higher-order functions (no UDF): double every second digit from the
    * right, subtract 9 above 9, sum mod 10 == 0. The standard way to keep
    * card-number PII detection from flagging every long number.
    * Digit access via substr, NOT split(d, "") — Spark's split keeps a
    * trailing empty element whose ANSI int-cast would throw. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val sum = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val v = digits.substr(i, lit(1)).cast("int")
        val fromRight = n - i // 0-based position from the right
        val doubled = v * 2
        acc + when(fromRight % 2 === 1,
          when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(v)
      })
    sum % 10 === 0
  }

  /** Per-document payment-card census: candidate digit runs, Luhn-valid
    * count, and the text with valid cards redacted. Everything is
    * codegen'd array/string functions — scan speed on 100 TB. */
  def cardAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = coalesce(
      regexp_extract_all(col(textCol), lit(CardRe), lit(0)),
      array().cast("array<string>"))
    docs.select(col(idCol), col(textCol).as("_t"), cands.as("_c"))
      // materialize the Luhn-filtered array ONCE: lambda subtrees defeat
      // common-subexpression elimination, so inlining the filter twice
      // would run the per-digit checksum over every candidate twice
      .select(col(idCol), col("_t"), col("_c"),
        filter(col("_c"), d => luhnValid(d)).as("_v"))
      .select(col(idCol),
        size(col("_c")).as("n_candidates"),
        size(col("_v")).as("n_valid"),
        aggregate(col("_v"), col("_t"),
          (acc, d) => replace(acc, d, lit("<CARD>"))).as("redacted"))
  }

  /** Canonicalize a URL the way crawl dedup does: strip the `#fragment`
    * and `utm_*` tracking params, lowercase the scheme and host (path and
    * query stay case-sensitive per RFC 3986), drop a bare trailing slash.
    * Pure codegen'd string ops — runs at scan speed over a 100 TB crawl,
    * and every step is RE2-compatible so the whole pipeline replicates in
    * oracle SQL. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // drop utm params: mid-list first, then a leading '?utm_...&' or a
    // lone '?utm_...' (order matters so the separator survives correctly)
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "&utm_[^&]*", ""),
        "\\?utm_[^&]*&", "?"),
      "\\?utm_[^&]*$", "")
    val scheme = lower(regexp_extract(noUtm, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(noUtm, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val rest = regexp_replace(noUtm, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    concat(scheme, lit("://"), host, regexp_replace(rest, "/$", ""))
  }

  /** Per-domain reference census over a corpus, with blocklisted domains
    * removed — the shape of a crawl-filtering pass. The corpus is scanned
    * once; explode is a narrow op; one hash aggregate on domain; the
    * blocklist is broadcast. */
  def domainCensus(docs: DataFrame, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = blocklist.toDF("domain")
    docs.select(explode(extractDomains(col(textCol))).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_refs"))
      .join(broadcast(blocked), Seq("domain"), "left_anti")
  }
}
