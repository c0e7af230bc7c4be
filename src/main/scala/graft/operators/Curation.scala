package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization: benchmark decontamination,
  * deterministic (reproducible) sampling, domain-mixture accounting,
  * and repetition filtering. All pure column expressions or
  * single-shuffle aggregations — each would run as written over a
  * 100 TB corpus.
  */
object Curation {

  /** Documents sharing any word n-gram with a benchmark (evaluation)
    * set — the standard train/test decontamination check (n-gram
    * collision, as popularized by the GPT-3/C4 dataset reports).
    * Returns one row per CONTAMINATED corpus document with the count
    * of distinct colliding n-grams.
    *
    * 100 TB shape: the benchmark side is an evaluation suite —
    * thousands of documents, not billions — so its distinct shingle
    * set is broadcast-sized and AQE plans the join as a broadcast hash
    * join; the corpus side is ONE scan + map-side join + one shuffle
    * for the per-document aggregate. No pair table, no corpus
    * self-join.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, n: Int): DataFrame = {
    // project the token array BEFORE shingling: the shingle lambda
    // re-evaluates captured expressions per element, so tokenization
    // must be an attribute by then (see TextAnalysis.shinglesOfTokens)
    def grams(side: DataFrame) = side
      .select(col(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol),
        explode(TextAnalysis.shinglesOfTokens(col("__toks"), n)).as("g"))
    val benchGrams = grams(docs.filter(benchPred)).select("g").distinct()
    grams(docs.filter(!benchPred))
      .join(benchGrams, "g")
      .groupBy(col(idCol))
      .agg(count_distinct(col("g")).as("n_hits"))
  }

  /** Deterministic per-stratum downsampling: keep `perMille(stratum)`
    * of each stratum, keyed on a multiplicative hash of the id —
    * reproducible across runs and cluster sizes, no RNG state, no
    * shuffle (a pure filter that pushes into the scan). The Knuth
    * multiplier keeps the oracle SQL-expressible; a production corpus
    * with ids past 2^32 would use xxhash64(id) for the same contract.
    */
  def sampleStratified(docs: DataFrame, idCol: String,
      perMille: Column): DataFrame =
    docs.filter(pmod(col(idCol) * lit(2654435761L), lit(1000L)) < perMille)

  /** Deterministic mixture resampling: downsample each domain so the
    * SURVIVING corpus approaches the target mixture `targetPpm`
    * (parts-per-million of the ORIGINAL corpus size per domain;
    * domains absent from the map drop out). The acceptance rate per
    * domain is `min(1, target_count / n_domain)` in exact integer
    * ppm arithmetic — over-represented domains thin to their share,
    * under-represented ones pass whole (resampling never invents
    * rows), and the same multiplicative-hash acceptance as
    * [[sampleStratified]] keeps the pick reproducible across runs,
    * engines, and cluster sizes.
    *
    * 100 TB shape: ONE aggregation shuffle over the domain-count
    * table, a window over that aggregate only (domains, not rows), a
    * broadcast join of the tiny rate table back onto the corpus, and
    * a hash filter that stays map-side. Integer `div` end to end so
    * the DuckDB oracle reproduces every rate exactly.
    */
  def mixtureResample(docs: DataFrame, idCol: String, domainCol: String,
      targetPpm: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ppmOf = targetPpm.foldLeft(lit(0L)) { case (acc, (dom, ppm)) =>
      when(col(domainCol) === dom, lit(ppm)).otherwise(acc)
    }
    val rates = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__nl"))
      .withColumn("__n", sum(col("__nl")).over(Window.partitionBy()))
      .withColumn("__ppm", ppmOf)
      .withColumn("rate_ppm",
        // the multiply is widened to decimal(38,0): ppm up to 1e6 times
        // a corpus count overflows Long past ~9.2e12 rows — exactly the
        // 100 TB regime this operator targets. `div` on decimal operands
        // still returns the exact integral quotient as a Long, so the
        // DuckDB oracle (HUGEINT arithmetic) reproduces every rate.
        least(lit(1000000L),
          expr("cast(__ppm as decimal(38,0)) * __n div __nl")).cast("long"))
    // full surviving rows come back (same contract as sampleStratified
    // — a downstream consumer keeps its text/meta columns without
    // re-joining the corpus), plus the domain's applied rate
    docs.join(broadcast(rates.select(col(domainCol), col("rate_ppm"))),
        Seq(domainCol))
      .filter(pmod(col(idCol) * lit(2654435761L), lit(1000000L)) <
        col("rate_ppm"))
  }

  /** Per-domain mixture accounting: document and token counts plus
    * each domain's share of corpus tokens — the table a mixture
    * re-weighting step consumes. One shuffle (the groupBy); the share
    * window runs over the aggregated domain table (thousands of rows,
    * never the corpus).
    */
  def domainMixture(docs: DataFrame, textCol: String,
      domainCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = docs.groupBy(domainCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    agg.withColumn("token_share",
      round(col("n_tokens") / sum(col("n_tokens")).over(Window.partitionBy()), 6))
  }

  /** Token-repetition ratio (1 - distinct/total tokens): the standard
    * repetition quality filter — high values flag degenerate or
    * boilerplate text. Pure column expression, zero shuffles.
    */
  def repetitionRatio(text: Column): Column = {
    val t = TextAnalysis.tokens(lower(text))
    // tie-exact rounding (TextAnalysis.round4): this ratio feeds a
    // > 0.8 keep/drop decision — a library-round tie would flip
    // classification between engines
    TextAnalysis.round4(lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
  }

  /** Per-group EXACT token-length percentiles (p50/p90/p99) — the
    * distribution table a curation report reads before picking length
    * cutoffs. Exact `percentile` (not approx_percentile): the gate
    * demands engine-reproducible numbers, and the per-group sort it
    * costs runs inside one aggregation over the already-shuffled
    * groups. Rounded to 4dp — both engines interpolate linearly on
    * (n-1)p but may associate the arithmetic differently by one ulp.
    */
  def lengthPercentiles(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    val nt = TextAnalysis.tokenCount(col(textCol)).cast("long")
    docs.select(groupCols.map(col) :+ nt.as("__nt"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        round(percentile(col("__nt"), lit(0.5)), 4).as("p50"),
        round(percentile(col("__nt"), lit(0.9)), 4).as("p90"),
        round(percentile(col("__nt"), lit(0.99)), 4).as("p99"))
  }

  /** PII patterns kept deliberately inside the regex dialect both
    * Java (Spark codegen) and RE2 (the DuckDB oracle) agree on:
    * character classes, bounded repetition, word boundaries — no
    * lookarounds, no backreferences.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction: replace emails, IPv4 addresses, and phone-shaped
    * digit runs with typed placeholder tokens — the scrubbing pass a
    * corpus runs before anything ships to training. Pure chained
    * `regexp_replace` column expressions: zero shuffles, one scan,
    * whole-stage codegen. Order matters — emails first (their dots
    * would otherwise be eaten as IPv4 fragments), then IPs (dotted
    * digits, which the phone pattern would otherwise grab), then
    * phones.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** The composite keep/drop decision a filtering pass actually runs:
    * the C4/Gopher-style rule chain evaluated in order, keeping the
    * FIRST failing rule as the drop reason (the audit column a corpus
    * report aggregates). Pure column expressions, one scan, zero
    * shuffles — at 100 TB this is a map-only pass whose predicates
    * push into the scan.
    */
  def filterPipeline(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (TextAnalysis.tokenCount(t) < 5),
      "repetition" -> (repetitionRatio(t) > 0.8),
      "non_text" ->
        (TextAnalysis.round4(length(regexp_replace(t, "[^a-zA-Z]", ""))
          .cast("double") / length(t)) < 0.2))
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((name, failed), rest) => when(failed, name).otherwise(rest)
    }
    docs.select(col(idCol) +: carryCols.map(col) :+ reason.as("drop_reason"): _*)
      .withColumn("keep", col("drop_reason").isNull)
  }
}
