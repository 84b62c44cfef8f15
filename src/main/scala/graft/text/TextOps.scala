package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. All pure Column expressions (whole-stage codegen, no
  * UDFs) so they run at scan speed over 100 TB of documents.
  *
  * These extend the reference's purely numeric surface (SURVEY §2.2
  * notes it has no string functions) with the operations a pretraining
  * corpus pipeline needs.
  */
object TextOps {

  private val Dec = "decimal(38,0)"

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** PII/noise scrub patterns — deliberately restricted to regex
    * features with identical semantics in Java regex and RE2
    * (character classes, bounded repetition, \b, \s), so a SQL oracle
    * running another engine reproduces the scrub byte-for-byte.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpPattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9 ()-]{5,18}[0-9]"

  /** The scrub as a single Column expression: URLs → `<URL>`, then
    * emails → `<EMAIL>`, then IPv4 → `<IP>`, then phone-like digit
    * runs → `<PHONE>`. Order matters (URLs may contain '@'; IPv4
    * would otherwise be eaten as a phone run) and is part of the
    * operator contract.
    */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        IpPattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** PII / contact-info redaction over a documents frame — the
    * standard pre-release scrub of a training corpus. Pure codegen'd
    * Column expressions (scan-speed, no shuffle); per-category match
    * counts are evaluated on the progressively scrubbed text (each
    * category counted after the previous one is redacted, mirroring
    * the replacement order), so categories never double-count the
    * same span.
    *
    * @return (idCol, scrubbed, n_urls, n_emails, n_ips, n_phones)
    */
  def scrubPii(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val s1 = regexp_replace(t0, UrlPattern, "<URL>")
    val s2 = regexp_replace(s1, EmailPattern, "<EMAIL>")
    val s3 = regexp_replace(s2, IpPattern, "<IP>")
    val s4 = regexp_replace(s3, PhonePattern, "<PHONE>")
    def n(src: Column, pat: String) =
      size(regexp_extract_all(src, lit(pat), lit(0))).cast("long")
    docs.select(col(idCol), s4.as("scrubbed"),
      n(t0, UrlPattern).as("n_urls"),
      n(s1, EmailPattern).as("n_emails"),
      n(s2, IpPattern).as("n_ips"),
      n(s3, PhonePattern).as("n_phones"))
  }

  /** BPE-ish token count: alphabetic runs, digit runs, and single
    * punctuation marks each count as one token (a cheap proxy for
    * subword tokenizers when budgeting corpus sizes).
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Normalised text: lowercased, whitespace collapsed, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** md5 fingerprint of the normalised text — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Heuristic quality score in [0, 1]:
    *  0.4 · length component (saturating at 200 tokens)
    *  0.3 · (1 − punctuation ratio)
    *  0.3 · stopword presence (saturating at 10 hits)
    * Deterministic and cheap — the shape of C4/Gopher-style quality
    * filters, not a trained model.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("double")
    val punctRatio = punct / greatest(length(text).cast("double"), lit(1.0))
    val stop = stopwordHits(text, Seq("the", "a", "and", "of", "is")).cast("double")
    least(toks / 200.0, lit(1.0)) * 0.4 +
      (lit(1.0) - punctRatio) * 0.3 +
      least(stop / 10.0, lit(1.0)) * 0.3
  }

  /** Number of occurrences of any of `words` as whitespace-delimited
    * tokens: split the normalised text once and count membership hits
    * with an array filter. Exactly the token-occurrence count (ties out
    * with a padded-replace SQL formulation in any dialect), but the
    * expression tree stays SMALL: an earlier replace-chain variant
    * expanded the normalise/pad chain once per word per language, and
    * the resulting whole-stage-codegen method was so large that its
    * first execution spent ~10 s in C2 compilation/deopt before
    * settling (measured at sf0.1) — a per-executor tax a 1000-executor
    * job pays 1000 times. Runtime CSE shares the one split across the
    * quality and per-language scores.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    words.foreach(w =>
      require(w.matches("[a-z0-9]+"), s"stopword must be plain alphanumeric: $w"))
    val set = array(words.map(lit): _*)
    size(filter(split(normalize(text), " "), t => array_contains(set, t)))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, Table A1 —
    * the published heuristics, thresholds scaled to this corpus): per
    * document the rule inputs (word count, mean word length, stopword
    * hits) and one boolean verdict per rule, plus the conjunctive
    * `keep`. Everything derives from ONE normalise+split (runtime CSE
    * shares it), so the whole rule block is a scan-stage projection —
    * the filter runs at parquet-read parallelism on any corpus size.
    * Mean word length avoids a per-word fold entirely:
    * Σ len(wᵢ) = len(nt) − (n−1) separators, an identity both engines
    * compute from the same two integers.
    */
  def gopherRules(docs: DataFrame,
                  minWords: Long = 30L, maxWords: Long = 100000L,
                  minMwl: Double = 3.0, maxMwl: Double = 10.0,
                  minStopHits: Long = 2L,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val nt = normalize(col(textCol))
    val nWords = size(split(nt, " ")).cast("long")
    val mwl = (length(nt) - nWords + 1L).cast("double") /
      greatest(nWords.cast("double"), lit(1.0))
    val stops = stopwordHits(col(textCol), Seq("the", "a", "and", "of", "is"))
      .cast("long")
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMwl = mwl >= minMwl && mwl <= maxMwl
    val okStop = stops >= minStopHits
    docs.select(col(idCol),
      nWords.as("n_words"),
      round(mwl, 6).as("mean_word_len"),
      stops.as("stop_hits"),
      okWords.as("ok_words"),
      okMwl.as("ok_mwl"),
      okStop.as("ok_stop"),
      (okWords && okMwl && okStop).as("keep"))
  }

  /** Language-ID marker inventories: ~25 high-frequency function words
    * per language (ASCII-only — `stopwordHits` counts exact
    * whitespace-delimited tokens, so accented forms are deliberately
    * excluded rather than mangled). Larger inventories sharply reduce
    * `unknown` on short texts versus the original 3-word lists (see
    * ExtensionsSpec "expanded language inventories"), which directly
    * improves every downstream consumer of `lang_pred`: corpusFilter's
    * language gate, per-language vocab/corpus stats, and stratified
    * sampling. Some forms are shared across languages ("des" de/fr,
    * "es" de/es as a word) — the argmax over whole inventories absorbs
    * the overlap, and both engine and oracle derive from this single
    * constant so the heuristic stays bit-reproducible.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "that",
      "for", "it", "with", "as", "on", "be", "at", "by", "not", "are",
      "but", "from", "have", "they", "which", "you", "this"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit",
      "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine",
      "als", "auch", "werden", "aus", "hat", "dass", "nach", "wird"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "du", "une",
      "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
      "sur", "ne", "se", "ce", "il", "sont", "avec", "ont"),
    "es" -> Seq("el", "los", "y", "las", "una", "por", "con", "no",
      "su", "para", "es", "al", "lo", "como", "mas", "pero", "sus",
      "ha", "este", "si", "entre", "cuando", "muy", "sin", "sobre"),
  )

  /** Predicted language: argmax of marker-stopword hits with a fixed
    * tie-break order (en > de > fr > es > unknown). An n-gram/stopword
    * heuristic, not a model — deterministic and oracle-checkable.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val firstBest = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    firstBest
  }

  /** Standard quality/shape columns for a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe", tokenCountBpe(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
  }

  /** The composed corpus-preparation pipeline: exact-dedup (keep the
    * canonical doc per fingerprint), quality floor, language filter —
    * one declarative plan over the raw documents.
    */
  def corpusFilter(docs: DataFrame, minQuality: Double, lang: String,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Stage 1 — dedup on the cheap fingerprint alone (one normalise +
    // md5 per doc): canonical id per group via hash aggregation
    // (skew-safe: map-side partial combine, no per-group sort — see
    // Dedup.exact). A doc survives iff its id IS a canonical id —
    // each doc belongs to exactly one fingerprint group, so the
    // semi-join on id implements keep-the-canonical exactly.
    val canon = docs
      .select(fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
    val kept = docs.join(canon.select(col(idCol)), Seq(idCol), "left_semi")
    // Stage 2 — the expensive quality/language analysis runs only on
    // the deduplicated survivors, and must be evaluated exactly ONCE
    // per row. Left to itself, Catalyst pushes the quality/lang
    // predicate through the projection into a scan-side Filter (and
    // constraint inference re-derives deterministic copies even past a
    // nondeterministic-head "barrier" conjunct, the round-2 approach).
    // FilterExec evaluates each conjunct's tree without cross-conjunct
    // subexpression elimination, so every shared replace()/normalize()
    // chain re-runs per conjunct per row — measured ~20x the
    // single-pass scan cost at sf0.1. An OBJECT boundary
    // (mapPartitions(identity) over the 4 narrow analysis columns) is
    // a barrier Catalyst can neither push predicates through nor infer
    // constraints across: the wide trees evaluate exactly once, with
    // codegen CSE, in the Project below it; the filter above tests the
    // materialised scalars. The rows crossing the boundary carry only
    // (id, n_tokens, quality, lang_pred) — the ser/deser cost is
    // independent of document length.
    val analyzed = analyze(kept, textCol)
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"), col("lang_pred"))
    val barrier = analyzed.mapPartitions(identity(_))(
      org.apache.spark.sql.Encoders.row(analyzed.schema))
    barrier.filter(col("quality") >= minQuality && col("lang_pred") === lang)
  }

  /** Top-`k` TF-IDF keywords per document — the standard corpus
    * exploration / topic-tagging signal. idf = ln((N+1)/(df+1)) + 1
    * (smoothed, always positive), score = tf·idf, ties broken by token
    * ascending so the ranking is fully deterministic; the score is
    * rounded to 1e-6 in the output so the transcendental ln is
    * engine-reproducible (same discipline as bigramLmScore).
    *
    * Scale shape: tf is a map-side-combined (doc, token) aggregation;
    * df a token-keyed aggregation over per-doc distinct tokens; they
    * meet in a token-keyed equi-join (content-keyed shuffles only, no
    * corpus-sized broadcast), and the top-k window partitions by
    * document — bounded by per-doc vocabulary, never a global sort.
    *
    * @return (idCol, rank INT, token, tf BIGINT, df BIGINT, tfidf)
    */
  def tfidfKeywords(docs: DataFrame, k: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(col(idCol),
      explode(split(normalize(col(textCol)), " ")).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = docs.select(count(lit(1)).cast("double").as("__n"))
    val scored = tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("__score",
        col("tf").cast("double") *
          (log((col("__n") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("tok").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("tok").as("token"),
        col("tf").cast("long").as("tf"), col("df"),
        round(col("__score"), 6).as("tfidf"))
  }

  /** One-page corpus REPORT CARD — the numbers a dataset datasheet
    * leads with, as (metric, value) rows from the already-verified
    * component operators: doc/token volume, mean Flesch readability
    * (1e-6-fixed integer mean — layout-proof), the Zipf head fit
    * (slope ≈ −1 and its r for natural text), and top-100 vocabulary
    * coverage. Each row is a 1-row aggregate; the union is the report.
    *
    * @return (metric, value) — value DOUBLE
    */
  def corpusReport(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = "decimal(38,0)"
    def row(name: String, c: org.apache.spark.sql.Column) = (df: DataFrame) =>
      df.select(lit(name).as("metric"), c.cast("double").as("value"))
    val volume = docs.agg(count(lit(1)).as("__n"),
      sum(tokenCount(col(textCol)).cast("long")).as("__tok"))
    val nDocs = row("n_docs", col("__n"))(volume)
    val nTokens = row("total_tokens", col("__tok"))(volume)
    val meanFlesch = readability(docs, textCol = textCol)
      .agg(round(sum(round(col("flesch") * 1e6).cast("long").cast(d))
        .cast("double") / count(lit(1)) / 1e6, 6).as("__mf"))
      .select(lit("mean_flesch").as("metric"),
        col("__mf").cast("double").as("value"))
    val zipf = zipfFit(docs, topN = 200, textCol = textCol)
    val zSlope = row("zipf_slope", col("slope"))(zipf)
    val zR = row("zipf_r", col("r"))(zipf)
    val cov = vocabCoverage(docs, Seq(100), textCol)
      .select(lit("coverage_top100").as("metric"),
        col("coverage").cast("double").as("value"))
    nDocs.unionByName(nTokens).unionByName(meanFlesch)
      .unionByName(zSlope).unionByName(zR).unionByName(cov)
  }

  /** Vocabulary-coverage curve: the share of total token mass covered
    * by the top-k terms for each requested k — the "how head-heavy is
    * this corpus" budgeting number (a tokenizer's fixed vocab covers
    * exactly this mass). The head is a distributed top-maxK
    * (TakeOrderedAndProject on (count desc, token) — deterministic),
    * the cumulative mass a window over maxK rows on a constant
    * unfoldable key, and coverage divides exact integer masses.
    *
    * @return one row per k: (k, top_terms, head_mass, coverage)
    */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int],
                    textCol: String = "text"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"bad ks: $ks")
    val maxK = ks.max
    val counts = docs
      .select(explode(split(normalize(col(textCol)), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"),
      count(lit(1)).as("__nterms"))
    val wBase = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PlanLint.kBoundedKey(col("tok")))
      .orderBy(col("cnt").desc, col("tok"))
    val wCum = wBase.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val head = counts.orderBy(col("cnt").desc, col("tok")).limit(maxK)
      .select(row_number().over(wBase).as("__r"),
        sum(col("cnt")).over(wCum).as("__mass"))
    val kDf = docs.sparkSession.range(0, 1).select(
      explode(array(ks.map(lit): _*)).as("k"))
    kDf.join(head, col("__r") <= col("k"))
      .groupBy("k")
      .agg(max(col("__r")).cast("long").as("top_terms"),
        max(col("__mass")).as("head_mass"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("top_terms"), col("head_mass"),
        round(col("head_mass") / col("__tot"), 6).as("coverage"))
  }

  /** Flesch reading-ease readability per document — the classic
    * surface-form quality score next to [[qualityScore]]'s heuristics:
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    * with sentences counted as terminal-punctuation runs and syllables
    * approximated as vowel-group runs (the standard regex proxy — no
    * dictionary). All three counts are per-row integers (regex counts,
    * floored at 1 so a fragment without punctuation still scores), so
    * the formula is row-local and engine-exact.
    *
    * @return (idCol, n_words, n_sentences, n_syllables, flesch)
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = size(split(trim(t), "\\s+")).cast("long")
    val sentences = greatest(
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val syllables = greatest(
      size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
        .cast("long"), lit(1L))
    docs.select(col(idCol), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables") / col("n_words")), 6)
          .as("flesch"))
  }

  /** Zipf-law fit over the head of the term-frequency distribution —
    * the corpus-health diagnostic: natural text has log(freq) falling
    * roughly linearly in log(rank) with slope ≈ −1; a much flatter or
    * steeper head flags template spam or vocabulary collapse. OLS of
    * ln(freq) on ln(rank) over the top `topN` terms (count-desc,
    * token-asc tie-break — deterministic), with Pearson r as the
    * goodness-of-fit.
    *
    * Scale shape: one token aggregation, a distributed top-N
    * (TakeOrderedAndProject — never a global sort), then a window over
    * exactly topN rows on a constant-but-unfoldable pmod key.
    * Exactness: both logs are fixed to 1e-9 integers BEFORE the five
    * OLS sufficient statistics (exact DECIMAL sums — the corrMatrix
    * discipline); floats only in the closed forms, the slope rounded
    * 1e-9 before the intercept derives from it (the trendFit rule).
    *
    * @return one row (n_terms, slope, intercept, r)
    */
  def zipfFit(docs: DataFrame, topN: Int = 200,
              textCol: String = "text"): DataFrame = {
    require(topN >= 3, s"topN must be >= 3, got $topN")
    val d = "decimal(38,0)"
    val top = docs
      .select(explode(split(normalize(col(textCol)), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(topN)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PlanLint.kBoundedKey(col("tok")))
      .orderBy(col("cnt").desc, col("tok"))
    val fixed = top.withColumn("__r", row_number().over(wr))
      .select(
        round(log(col("__r").cast("double")) * 1e9).cast("long").as("__x"),
        round(log(col("cnt").cast("double")) * 1e9).cast("long").as("__y"))
    val s = fixed.agg(count(lit(1)).as("__n"),
      sum(col("__x").cast(d)).as("__sx"), sum(col("__y").cast(d)).as("__sy"),
      sum(col("__x").cast(d) * col("__x")).as("__sxx"),
      sum(col("__y").cast(d) * col("__y")).as("__syy"),
      sum(col("__x").cast(d) * col("__y")).as("__sxy"))
    val n = col("__n").cast(d)
    val num = (n * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val slope = round(num / dx, 9)
    s.select(col("__n").as("n_terms"),
      round(slope, 6).as("slope"),
      round((col("__sy").cast("double") - slope * col("__sx").cast("double"))
        / col("__n") / 1e9, 6).as("intercept"),
      when(dx <= 0.0 || dy <= 0.0, lit(null).cast("double"))
        .otherwise(round(num / sqrt(dx * dy), 6)).as("r"))
  }

  /** Pairwise vocabulary drift between sources: the Jensen–Shannon
    * divergence between every pair of source unigram distributions —
    * "which feeds actually differ in language" for mixture design,
    * the corpus-level twin of the numeric drift family (PSI/KS).
    *
    * Exactness + scale in one identity: against the midpoint
    * M = (P+Q)/2, a token EXCLUSIVE to one source contributes
    * analytically (q = 0 ⇒ m = p/2 ⇒ p·ln(p/m) = p·ln 2), so
    *   JS = ½[Σ_common p·ln(2p/(p+q)) + ln2·(1 − P_common)]
    *      + ½[Σ_common q·ln(2q/(p+q)) + ln2·(1 − Q_common)]
    * needs ONLY the tokens common to both sources — one token-keyed
    * equi-join, never a densified source × vocabulary product. Each
    * common term is fixed to 1e-9 integers before its unordered sum;
    * the exclusive masses are ratios of exact token counts; ln 2 is
    * the inlined double constant (an engine's own ln(2) may differ in
    * the last ULP).
    *
    * @return (source_a, source_b, n_a, n_b, n_common, js) per pair
    *   with source_a < source_b, all pairs present (no common tokens
    *   ⇒ the analytic maximum ln 2)
    */
  def vocabDrift(docs: DataFrame, sourceCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val ln2 = lit(0.6931471805599453)
    val cnts = docs.select(col(sourceCol).as("__s"),
        explode(split(normalize(col(textCol)), " ")).as("tok"))
      .groupBy(col("__s"), col("tok")).agg(count(lit(1)).as("__c"))
    val totals = cnts.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
    val a = cnts.select(col("__s").as("__sa"), col("tok"),
      col("__c").as("__ca"))
    val b = cnts.select(col("__s").as("__sb"), col("tok"),
      col("__c").as("__cb"))
    val ta = totals.select(col("__s").as("__sa"), col("__n").as("__na"))
    val tb = totals.select(col("__s").as("__sb"), col("__n").as("__nb"))
    val p = col("__ca").cast("double") / col("__na")
    val q = col("__cb").cast("double") / col("__nb")
    val perPair = a.join(b, Seq("tok")).filter(col("__sa") < col("__sb"))
      .join(broadcast(ta), "__sa").join(broadcast(tb), "__sb")
      .select(col("__sa"), col("__sb"), col("__ca"), col("__cb"),
        round(p * log(lit(2.0) * p / (p + q)) * 1e9).cast("long")
          .as("__ta9"),
        round(q * log(lit(2.0) * q / (p + q)) * 1e9).cast("long")
          .as("__tb9"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(sum(col("__ta9").cast(Dec)).as("__sta9"),
        sum(col("__tb9").cast(Dec)).as("__stb9"),
        sum(col("__ca")).as("__cca"), sum(col("__cb")).as("__ccb"),
        count(lit(1)).as("__ncom"))
    // densify to every source pair: sources are bounded, so the pair
    // frame is a broadcast product of two tiny totals tables
    val jsA = coalesce(col("__sta9"), lit(0L)).cast("double") / lit(1e9) +
      ln2 * (col("__na") - coalesce(col("__cca"), lit(0L))).cast("double") /
        col("__na")
    val jsB = coalesce(col("__stb9"), lit(0L)).cast("double") / lit(1e9) +
      ln2 * (col("__nb") - coalesce(col("__ccb"), lit(0L))).cast("double") /
        col("__nb")
    broadcast(ta).crossJoin(broadcast(tb))
      .filter(col("__sa") < col("__sb"))
      .join(perPair, Seq("__sa", "__sb"), "left")
      .select(col("__sa").as("source_a"), col("__sb").as("source_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        coalesce(col("__ncom"), lit(0L)).as("n_common"),
        round((jsA + jsB) / 2.0, 6).as("js"))
  }

  /** Per-source lexical health: token volume, distinct types,
    * type-token ratio and hapax share — the quick "is this feed
    * template spam or real language" screen (template-generated text
    * shows abnormally LOW TTR and hapax share; boilerplate-free prose
    * sits near Zipf-predicted levels). One (source, token) count
    * aggregation; every output is a ratio of exact integers.
    *
    * @return (source, n_tokens, n_types, ttr, hapax_share) per source
    */
  def lexicalStats(docs: DataFrame, sourceCol: String = "source",
                   textCol: String = "text"): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(split(normalize(col(textCol)), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col("source"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("__hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("__hapax").cast("double") / col("n_types"), 6)
          .as("hapax_share"))

  /** Corpus budgeting: token totals per predicted language. */
  def corpusStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    analyze(docs, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        avg(col("n_tokens").cast("double")).as("avg_tokens"))

  /** Per-language vocabulary stats with EXACT distinct counts — the
    * oracle-checkable baseline. Exact distinct is a shuffle of the
    * token stream; fine per language slice, expensive corpus-wide —
    * that is what [[vocabStatsApprox]] is for.
    */
  def vocabStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    tokensByLang(docs, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("tok")).cast("long").as("n_distinct"))

  /** The scale path: HyperLogLog++ distinct-token estimates
    * (`approx_count_distinct`) — one pass, fixed-size sketch per
    * group, no distinct shuffle; mergeable across partitions the way
    * a 1000-executor aggregation needs. Default rsd 2.3% — a relative
    * standard DEVIATION, not a bound: estimates are typically within
    * 5% of exact (and are on the pinned test data, which the
    * q_vocab_approx assertion checks), but no hard envelope is
    * guaranteed in general.
    */
  def vocabStatsApprox(docs: DataFrame, textCol: String = "text",
                       rsd: Double = 0.023): DataFrame =
    tokensByLang(docs, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        approx_count_distinct(col("tok"), rsd).as("n_distinct_est"))

  /** Exact AND approximate distinct counts from ONE tokenization pass:
    * the (lang, tok) pre-aggregation makes the exact distinct a group
    * count, and HLL is duplicate-insensitive so sketching the deduped
    * token stream yields the identical estimate — one corpus scan
    * where vocabStats + vocabStatsApprox would take two. This is the
    * error-check shape (q_vocab_approx) and the one-pass production
    * variant.
    */
  def vocabStatsBoth(docs: DataFrame, textCol: String = "text",
                     rsd: Double = 0.023): DataFrame =
    tokensByLang(docs, textCol)
      .groupBy(col("lang_pred"), col("tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col("lang_pred"))
      .agg(sum("__c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        approx_count_distinct(col("tok"), rsd).as("n_distinct_est"))

  /** Gopher-style repetition quality signals over the normalised token
    * stream: per document, the fraction of tokens taken by the single
    * most frequent token, the fraction of bigrams taken by the most
    * frequent bigram, and the distinct-token ratio — the standard
    * filters for pathological repetition (keyboard mashing, boilerplate
    * loops, degenerate generations) in LLM corpus curation.
    *
    * Shape: the token stats are two hash aggregations (map-side
    * combine, so a million-repeat token never lands on one reducer as
    * raw rows); bigram assembly is ROW-LOCAL — `arrays_zip` of the
    * words array against its own 1-shifted slice (native codegen'd
    * expressions, no window, no per-row id — the same row-local
    * discipline Dedup.shingles now uses). A
    * single-token document has no bigrams → top_bigram_frac 0.0.
    *
    * @return (idCol, n_tokens BIGINT, top_token_frac, top_bigram_frac,
    *   distinct_ratio — all DOUBLE)
    */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val words = split(normalize(col(textCol)), " ")
    val tokAgg = docs.select(col(idCol), explode(words).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").cast("long").as("n_tokens"), max("c").as("top_tok"),
        count(lit(1)).cast("long").as("n_distinct"))
    val bi = bigramsOf(docs, idCol, textCol).select(col(idCol), col("bigram"))
    val biAgg = bi.groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max("c").as("top_bi"), sum("c").as("n_bi"))
    tokAgg.join(biAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("top_tok").cast("double") / col("n_tokens")).as("top_token_frac"),
        coalesce(col("top_bi").cast("double") / col("n_bi"), lit(0.0))
          .as("top_bigram_frac"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"))
  }

  /** Sliding-window document chunking for context-length-bounded
    * training examples: the normalised token stream splits into chunks
    * of `maxTokens` tokens advancing by `maxTokens − overlap`, the last
    * chunk shorter if the tail runs out. Every token is covered, every
    * chunk introduces at least one new token
    * (nChunks = max(⌈(n − overlap)/step⌉, 1)).
    *
    * Scale shape: entirely row-local — one Generate in the scan stage,
    * NO shuffle — so it runs at file-split parallelism on any corpus
    * size. All array ops (sequence/slice/concat_ws) are native
    * codegen'd expressions, not interpreted lambdas.
    *
    * @return (idCol, chunk_id INT, chunk_text, n_tokens BIGINT)
    */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap,
      "need maxTokens > overlap >= 0 (a step of maxTokens - overlap must advance)")
    val step = maxTokens - overlap
    val words = split(normalize(col(textCol)), " ")
    docs.select(col(idCol), words.as("__ws"), size(words).as("__n"))
      .withColumn("__chunks", greatest(
        ceil((col("__n") - lit(overlap)).cast("double") / step).cast("int"),
        lit(1)))
      .withColumn("chunk_id", explode(sequence(lit(0), col("__chunks") - 1)))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__ws"), col("chunk_id") * step + 1, lit(maxTokens)))
          .as("chunk_text"),
        least(lit(maxTokens), col("__n") - col("chunk_id") * step).cast("long")
          .as("n_tokens"))
  }

  /** Out-of-vocabulary rate against the corpus' own top-`vocabSize`
    * tokens (by global frequency, ties broken lexicographically —
    * fully deterministic): per document, the fraction of token
    * instances outside the vocabulary. The standard signal for
    * vocabulary pruning and tokenizer-fit checks during corpus
    * curation.
    *
    * Scale shape: global token counts are one map-side-combined hash
    * aggregation; the top-N is `TakeOrderedAndProject` over the counted
    * VOCABULARY (not the token stream) and broadcasts back — vocabulary
    * cardinality, not corpus size, bounds the sort.
    *
    * @return (idCol, n_tokens BIGINT, n_oov BIGINT, oov_rate DOUBLE)
    */
  def oovRate(docs: DataFrame, vocabSize: Int,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(normalize(col(textCol)), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        count(lit(1)).minus(count(col("__in_vocab"))).cast("long").as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Row-local adjacent-word pairs: `arrays_zip` of the words array
    * against its own 1-shifted slice — native codegen'd expressions,
    * no window, no per-row id (the same row-local discipline
    * Dedup.shingles now uses). Docs with < 2 tokens yield no rows.
    *
    * @return (idCol, w1, bigram)
    */
  private def bigramsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(normalize(col(textCol)), " ")
    val nPairs = greatest(size(words) - 1, lit(0))
    docs.select(col(idCol),
        explode(arrays_zip(slice(words, lit(1), nPairs), slice(words, lit(2), nPairs)))
          .as("__z"))
      // coalesce makes w1 provably NON-NULL (arrays_zip marks struct
      // fields nullable even though the equal-length slices never pad
      // here), so joins keyed on w1 fold their isnotnull pushdown away
      // instead of injecting a Filter that desyncs otherwise-identical
      // aggregation subtrees from Reuse(d)Exchange sharing
      .select(col(idCol), coalesce(col("__z.0"), lit("")).as("w1"),
        concat_ws(" ", col("__z.0"), col("__z.1")).as("bigram"))
  }

  /** Self-trained bigram language-model score: per document, the mean
    * log-probability of its word transitions under the CORPUS' own
    * bigram model — avg over bigram instances of
    * ln(c(w1 w2) / c(w1 ·)), where both counts are corpus-global and
    * c(w1 ·) counts bigram instances starting with w1. Documents whose
    * transitions are common corpus-wide score near 0; keyboard mash
    * and shuffled-word text scores strongly negative. The KenLM-style
    * perplexity filter, with the corpus itself as the model — no
    * external LM artifact needed.
    *
    * The score is rounded to 1e-6 inside the query: the avg is a
    * float sum whose accumulation order differs across engines and
    * partitionings (~1e-15 relative noise); rounding makes the result
    * reproducible bit-for-bit without changing its 6 significant
    * decimals. Docs with < 2 tokens have no transitions and are absent
    * from the output.
    *
    * Scale shape: two map-side-combined global count aggregations and
    * two keyed equi-joins (bigram, then prefix) — everything shuffles
    * on content keys; no broadcast of corpus-sized state.
    *
    * @return (idCol, n_bigrams BIGINT, lm_score DOUBLE)
    */
  def bigramLmScore(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val bi = bigramsOf(docs, idCol, textCol)
    val cb = bi.groupBy(col("bigram")).agg(count(lit(1)).as("__cb"))
    val cp = bi.groupBy(col("w1")).agg(count(lit(1)).as("__cp"))
    bi.join(cb, "bigram").join(cp, "w1")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(log(col("__cb").cast("double") / col("__cp"))), 6).as("lm_score"))
  }

  /** The FUSED per-document signal stage: repetition (top_token_frac,
    * top_bigram_frac, distinct_ratio), OOV rate against the frame's own
    * top-`vocabSize` vocabulary, the corpus-self-trained bigram LM
    * score, and the word-`shingleN`-gram boilerplate ratio — the exact
    * column set the step chain `repetition → oov → lm_score →
    * boilerplate` appends, from ONE shared (doc, token) aggregation and
    * ONE shared (doc, bigram) aggregation instead of four independent
    * re-tokenizations of the corpus.
    *
    * Scale shape: the token stream is tokenized and aggregated once
    * (map-side combine); the vocabulary is a TakeOrdered over the
    * counted VOCABULARY and broadcasts back, so the per-doc aggregation
    * computes n_tokens / top-token / distinct / OOV in a single pass.
    * Likewise one (doc, bigram) aggregation feeds the repetition
    * bigram stats AND both global LM count tables. Exactly two
    * token-keyed shuffles exist in the whole plan (the (doc, token)
    * aggregation and the global vocabulary count) — PlanSpec pins this.
    *
    * Equivalence note: lm_score is the instance-weighted mean
    * Σ c·ln(cb/cp) / Σ c over per-(doc, bigram) counts, which equals
    * bigramLmScore's per-instance avg exactly in real arithmetic; both
    * round to 1e-6, absorbing the ~1e-15 float-order noise.
    *
    * @return (idCol, top_token_frac, top_bigram_frac, distinct_ratio,
    *   n_oov, oov_rate, n_bigrams, lm_score, n_shingles, n_common,
    *   boilerplate_ratio) — n_bigrams/lm_score NULL for docs with < 2
    *   tokens (mirroring the chain's left join), top_bigram_frac 0.0.
    */
  def signalStats(docs: DataFrame, vocabSize: Int, shingleN: Int,
                  minDocs: Long, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs.select(col(idCol),
      explode(split(normalize(col(textCol)), " ")).as("tok"))
    // the shared (doc, token) table — its aggregation subtree appears
    // under both consumers (vocabulary + per-doc stats) IDENTICALLY,
    // so ReuseExchange computes the tokenize+shuffle once and the
    // second consumer reads the shuffle files (no cache-manager churn)
    val tokCounts =
      toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val vocab = tokCounts.groupBy(col("tok")).agg(sum("c").as("__gc"))
      .orderBy(col("__gc").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in_vocab"))
    val perTok = tokCounts.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(sum("c").cast("long").as("__n_tokens"),
        max("c").as("__top_tok"),
        count(lit(1)).cast("long").as("__n_distinct"),
        coalesce(sum(when(col("__in_vocab").isNull, col("c"))), lit(0L))
          .cast("long").as("n_oov"))
    // the shared (doc, bigram) table — three identical consumers
    // (per-doc stats + both global LM count tables), same
    // ReuseExchange sharing; w1 in the grouping key is free (it is
    // the bigram's first word) and lets cp aggregate without
    // re-splitting the bigram string
    val biCounts =
      bigramsOf(docs, idCol, textCol)
        .groupBy(col(idCol), col("w1"), col("bigram")).agg(count(lit(1)).as("c"))
    val cb = biCounts.groupBy(col("bigram")).agg(sum("c").as("__cb"))
    val cp = biCounts.groupBy(col("w1")).agg(sum("c").as("__cp"))
    // LEFT joins throughout the assembly, deliberately: every key
    // matches by construction (cb/cp/bp all derive from the same
    // frame), so left ≡ inner — but an inner join would push an
    // isnotnull(key) filter into SOME duplicate aggregation subtrees
    // and not others, breaking the canonical-plan equality that
    // Reuse(d)Exchange needs to compute each shared table once
    val perBi = biCounts
      .join(cb, Seq("bigram"), "left").join(cp, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(max("c").as("__top_bi"),
        sum("c").cast("long").as("n_bigrams"),
        round(sum(col("c").cast("double") *
            log(col("__cb").cast("double") / col("__cp"))) /
          sum("c").cast("double"), 6).as("lm_score"))
    val bp = Contamination.boilerplateRatio(docs, shingleN, minDocs, idCol, textCol)
    perTok
      .join(perBi, Seq(idCol), "left")
      .join(bp, Seq(idCol), "left")
      .select(col(idCol),
        (col("__top_tok").cast("double") / col("__n_tokens")).as("top_token_frac"),
        coalesce(col("__top_bi").cast("double") / col("n_bigrams"), lit(0.0))
          .as("top_bigram_frac"),
        (col("__n_distinct").cast("double") / col("__n_tokens")).as("distinct_ratio"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("__n_tokens")).as("oov_rate"),
        col("n_bigrams"), col("lm_score"),
        col("n_shingles"), col("n_common"), col("boilerplate_ratio"))
  }

  private def tokensByLang(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("lang_pred", langId(col(textCol)))
      .select(col("lang_pred"),
        explode(split(normalize(col(textCol)), " ")).as("tok"))

  /** Exact top-k frequent tokens cross-checked against a
    * Count-Min sketch — the q_vocab_approx error-check shape for the
    * frequency sketch family.
    *
    * The production 100 TB path is the sketch alone: CMS is a one-pass
    * fixed-size mergeable aggregate (eps=1e-4, conf=0.99 → ~55 KB per
    * partition, merged associatively the way a 1000-executor
    * treeAggregate needs), probed for any candidate set without a
    * token-keyed shuffle. Here the exact top-k (a groupBy the pinned
    * test scale affords) supplies both the oracle values and the
    * per-token envelope check: CMS never undercounts, and overshoots
    * by at most eps·N with probability ≥ conf — `within_bound` going
    * false on the pinned data hash-mismatches the row.
    *
    * The k-row collect is bounded by construction; `seed` pins the
    * sketch's hash family so runs are deterministic.
    */
  /** Character-level Shannon entropy of the normalised text — the
    * compressibility proxy quality filters use to catch both extremes:
    * near-zero entropy (repeated characters / padding) and
    * near-maximal entropy (random strings, hashes, minified blobs).
    *
    * Shape: the doc's char total rides the row BEFORE the explode
    * (pure `length`), so the per-(doc, char) counts aggregate needs no
    * join back; per-doc entropy is then a sum over ≤ alphabet-size
    * rows. Each term is fixed to 1e-9 BIGINT units before summation
    * (the nb_score discipline) — order-independent exactly.
    *
    * @return (idCol, n_chars BIGINT, char_entropy) — entropy in nats
    */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // one codegen'd O(len) histogram per row
    // (functions.CharEntropyExpr) — the earlier explode-per-character
    // formulation shuffled #chars rows and was the bench outlier (13 s
    // vs ~1 s); identical 1e-9-term-fixed arithmetic, zero shuffle
    val nt = normalize(col(textCol))
    docs
      .select(col(idCol), length(nt).cast("long").as("n_chars"),
        graft.functions.CharEntropyExpr.charEntropy(nt).as("char_entropy"))
      .filter(col("n_chars") > 0L)
  }

  def heavyHittersChecked(docs: DataFrame, k: Int, eps: Double = 1e-4,
                          confidence: Double = 0.99, seed: Int = 42,
                          textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      explode(split(normalize(col(textCol)), " ")).as("tok"))
    val exact = toks.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
    val cms = toks.stat.countMinSketch("tok", eps, confidence, seed)
    val total = toks.count()
    val slack = math.ceil(eps * total).toLong
    val spark = docs.sparkSession
    val rows = exact.collect().map { r =>
      val t = r.getString(0); val c = r.getLong(1)
      val est = cms.estimateCount(t)
      (t, c, est >= c && est <= c + slack)
    }.toSeq
    spark.createDataFrame(rows).toDF("token", "cnt", "within_bound")
  }
}
