package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for the training-data pipeline: PII
  * redaction, deterministic dataset splitting, and stratified sampling.
  *
  * All three are pure map-side projections/filters — no shuffle, no state —
  * so they scale linearly with input and compose with any scan. The
  * split/sample bucketing is content-addressed (md5 of the key), not
  * RNG-based: the assignment is stable across runs, engines, partitionings
  * and cluster sizes, which is what makes train/test splits reproducible
  * and leakage-auditable at 100 TB (a `rand(seed)` split changes with the
  * partitioning; a hash split never does).
  */
object Curation {

  /** Email pattern (no backrefs/lookaround — portable Java ∩ RE2 syntax,
    * so the DuckDB oracle runs the identical pattern). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: optional +, then 7+ digits with separators. */
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{5,}[0-9]"

  /** IPv4 pattern. */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact PII in `textCol`: emails → `<EMAIL>`, phones → `<PHONE>`,
    * IPv4s → `<IP>`. Adds `redacted` plus per-category match counts
    * (n_emails / n_phones / n_ips, counted before redaction). Order
    * matters: emails first (a phone pattern can match digit runs inside
    * nothing else here, but IPs could match inside no email — the fixed
    * order makes the composition deterministic and oracle-mirrorable). */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhonePattern), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))
  }

  /** Content-addressed bucket in [0, buckets): parse the first 4 hex chars
    * of md5(key) — 16 bits of uniform entropy, plenty for percent-level
    * split ratios. Engine-portable: DuckDB mirrors it with
    * `('0x' || substr(md5(k),1,4))::BIGINT % buckets`. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long") % buckets

  /** Deterministic weighted (importance) sampling: keep each row with
    * probability equal to its per-row weight in [0, 1] (clamped), decided
    * by the content-addressed 16-bit hash of the key — the quality-
    * proportional corpus downsampling every data-mixing recipe needs
    * ("keep high-quality docs, thin the boilerplate"), with the same
    * RNG-free reproducibility story as [[hashSplit]]: the same key at the
    * same weight survives identically across runs, engines and
    * partitionings (a `rand()` sample changes under repartition). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    df.filter(hashBucket(col(keyCol), 65536) < floor(w * 65536))
  }

  /** Deterministic train/val/test split on a stable key. `trainPct` +
    * `valPct` ≤ 100; the rest is test. Adds a `split` column. The same key
    * always lands in the same split — across runs, engines and data
    * layouts — so held-out data can never leak into training via a
    * repartition. */
  def hashSplit(df: DataFrame, keyCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(col(keyCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Deterministic source mixing: per-stratum sampling RATES (the
    * `df.stat.sampleBy` analog, minus the RNG). `rates` maps stratum value
    * → percentage kept; strata absent from the map are dropped. This is
    * how a training mix is composed from heterogeneous sources ("keep 100%
    * of wiki, 10% of crawl") — and because membership is content-hashed,
    * the mix is reproducible and auditable row-by-row. */
  def sampleByRates(df: DataFrame, stratumCol: String, keyCol: String,
                    rates: Map[String, Int]): DataFrame = {
    val rateExpr = rates.foldLeft(lit(-1)) { case (acc, (stratum, pct)) =>
      when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < rateExpr)
  }

  /** Deterministic stratified sample: keep ~`pct`% of rows per stratum,
    * chosen by content hash of the key (stable, engine-portable). The
    * stratum column only documents intent — the hash is uniform within
    * every stratum by construction, so each stratum is sampled at the same
    * rate without any per-stratum state or a second pass (contrast
    * `df.stat.sampleBy`, which needs per-stratum fractions and an RNG). */
  def stratifiedSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 100) < pct)
}
