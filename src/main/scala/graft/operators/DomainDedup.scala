package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * URL/domain-level curation — the dedup stage that runs BEFORE any
 * content hashing in a web-scale pipeline (RefinedWeb §3.2, Penedo et
 * al. 2023; Dolma's URL dedup, Soldaini et al. 2024): a crawl carries
 * the same page under many URL spellings, and a handful of domains
 * (mirrors, link farms, SEO chaff) can dominate the token budget unless
 * capped per registrable domain.
 *
 * Three composable pieces:
 *  - [[normalizeUrl]] / [[registrableDomain]]: pure codegen'd string
 *    projections (no UDF, no shuffle) — scheme/userinfo/port/fragment/
 *    query stripped, `www.` dropped, trailing slashes removed; the
 *    registrable domain is the public-suffix-aware tail of the host.
 *  - [[dedupByUrl]]: exact first-wins dedup on the NORMALIZED URL —
 *    one hash-agg keyed by the url (map-side combinable) plus an
 *    id-keyed join to recover the survivor's row. The corpus never
 *    self-joins.
 *  - [[capPerDomain]]: per-domain token quotas via
 *    [[Selection.underBudgetPerStratum]] — admission in caller order
 *    while the domain's running token weight stays under ITS budget.
 *    That machinery range-shuffles on (domain, order) precisely so a
 *    mega-domain (the skew case this stage EXISTS for) never funnels
 *    through one task.
 *
 * Public-suffix handling: the real PSL is a ~10k-entry list; the
 * default here covers the common two-level country suffixes and callers
 * pass their full list via `multiLevelSuffixes` (it compiles to an
 * `isin` literal set — broadcast-free). This is the standard trade in
 * open pipelines (Dolma ships a vendored PSL snapshot the same way).
 */
object DomainDedup {

  /** Two-level public suffixes under which a THIRD label is needed to
    * name a registrable domain (bbc.co.uk, not co.uk). Extend per PSL. */
  val defaultMultiLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br", "co.in",
    "com.cn", "co.kr", "com.mx", "co.za", "com.tr", "com.ar")

  /** Canonical URL key: lowercase, scheme/userinfo/port/query/fragment
    * stripped, `www.` dropped, trailing slashes removed. Two spellings
    * of the same page map to one key; a pure string projection. */
  def normalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", "")
    val noQuery = regexp_replace(noScheme, "[#?].*$", "")
    val noUser = regexp_replace(noQuery, "^[^/@]*@", "")
    val noPort = regexp_replace(noUser, "^([^/:]*):[0-9]+", "$1")
    val noWww = regexp_replace(noPort, "^www\\.", "")
    regexp_replace(noWww, "/+$", "")
  }

  /** Host part of the normalized URL. */
  def hostOf(url: Column): Column =
    regexp_extract(normalizeUrl(url), "^([^/]*)", 1)

  /** Registrable domain of the URL's host: the last two labels, or the
    * last three when the two-label tail is a multi-level public suffix
    * (`news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` → `example.com`). */
  def registrableDomain(url: Column,
                        multiLevelSuffixes: Seq[String] =
                          defaultMultiLevelSuffixes): Column = {
    val h = hostOf(url)
    val labels = split(h, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(size(labels) >= 3 && last2.isin(multiLevelSuffixes: _*), last3)
      .when(size(labels) >= 2, last2)
      .otherwise(h)
  }

  /** First-wins exact URL dedup: per distinct normalized URL the
    * smallest-`idCol` document survives, carrying its original columns
    * plus `n_copies` (how many docs shared the URL) and the normalized
    * key as `norm_url`. Survivor selection is one url-keyed hash-agg;
    * the row recovery is an id-keyed equi-join — nothing quadratic. */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val winners = docs
      .select(col(idCol), normalizeUrl(col(urlCol)).as("norm_url"))
      .groupBy(col("norm_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
    docs.join(winners, Seq(idCol))
  }

  /** Per-domain token caps: admit rows in ascending `idCol` order while
    * the registrable domain's running `weight` total stays within its
    * budget (`budgets` for named domains, `defaultBudget` otherwise).
    * Output keeps the input columns plus `domain` and `n_tokens`.
    * Skew posture: the quota scan runs through
    * [[Selection.underBudgetPerStratum]]'s range-shuffled construction,
    * so the dominant domain is spread over contiguous partitions, never
    * a single task. */
  def capPerDomain(docs: DataFrame, idCol: String, urlCol: String,
                   weight: Column, budgets: Map[String, Long],
                   defaultBudget: Long,
                   multiLevelSuffixes: Seq[String] =
                     defaultMultiLevelSuffixes): DataFrame =
    Selection.underBudgetPerStratum(
        docs
          .withColumn("domain",
            registrableDomain(col(urlCol), multiLevelSuffixes))
          .withColumn("n_tokens", weight.cast("long")),
        "n_tokens", "domain", Seq(col(idCol).asc),
        budgets, defaultBudget)
      .drop("cum_before")
}
