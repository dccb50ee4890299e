package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text cleaning: URL/email/phone detection, removal,
  * and PII masking — the standard pre-training cleanup pass between
  * ingest and dedup at 100 TB. Pure map-side regexp work (codegen'd
  * string expressions, no shuffle, scan speed); the patterns are
  * RE2-compatible (no backrefs/lookaround) so the DuckDB oracle runs
  * the identical regexes.
  */
object TextCleaning {

  /** Shared with the DuckDB oracle — keep RE2-safe. */
  val UrlRe = "https?://[^\\s]+"

  /** Capture group = the host of the FIRST url in the text. */
  val UrlHostRe = "https?://([^\\s/:?#]+)"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"
  val AnyRe = s"$UrlRe|$EmailRe|$PhoneRe"

  private def collapse(c: Column): Column =
    trim(regexp_replace(c, lit("\\s+"), lit(" ")))

  /** `clean_text` as a single-column expression (also the SQL surface
    * `graft_clean_text`): URL/email/phone spans removed, whitespace
    * collapsed.
    */
  def cleanText(c: Column): Column =
    collapse(regexp_replace(c, lit(AnyRe), lit(" ")))

  /** `masked_text` as a single-column expression (SQL surface
    * `graft_mask_pii`): email → url → phone placeholder substitution.
    */
  def maskText(c: Column): Column =
    collapse(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, lit(EmailRe), lit("<EMAIL>")),
          lit(UrlRe),
          lit("<URL>"),
        ),
        lit(PhoneRe),
        lit("<PHONE>"),
      )
    )

  /** Appends match counts and `clean_text` (all URL/email/phone spans
    * removed, whitespace collapsed).
    */
  def clean(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_urls", regexp_count(col(textCol), lit(UrlRe)))
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)))
      .withColumn("clean_text", cleanText(col(textCol)))

  /** Appends `masked_text`: URLs/emails/phones replaced by typed
    * placeholder tokens (document structure preserved — the masking
    * form a pipeline keeps when it wants the text, not the span).
    * Replacement order (email, url, phone) is part of the contract —
    * the oracle applies the same sequence.
    */
  def maskPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("masked_text", maskText(col(textCol)))

  /** Per-domain corpus statistics (the C4/RefinedWeb-style grouping
    * domain-level filtering decisions key on): docs bucket by the
    * host of their FIRST url (lowercased; "" = no url), then ONE
    * aggregation with exact/order-free statistics only — doc count,
    * Σ whitespace tokens (integer), min/max doc_id, and url density
    * as exact integer url-count sums. No order-sensitive double Σ:
    * mean-quality-per-domain style metrics belong to a second pass
    * joining a per-doc score, where the caller picks the fold.
    *
    * Scale: regexp_extract is a codegen'd map-side scan; the single
    * groupBy(domain) aggregation combines map-side. Domain skew
    * (one giant host) only skews one aggregation key — counters,
    * not row buffers.
    */
  def domainStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.operators.TextAnalysis
    docs
      .select(
        col(idCol).as("doc_id"),
        lower(regexp_extract(col(textCol), UrlHostRe, 1)).as("domain"),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("__toks"),
        regexp_count(col(textCol), lit(UrlRe)).cast("long").as("__urls"),
      )
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).cast("long").as("total_tokens"),
        sum(col("__urls")).cast("long").as("total_urls"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
      )
  }
}
