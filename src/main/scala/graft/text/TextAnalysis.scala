package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (token stats, quality
  * scoring, language-ID heuristic, fingerprinting).
  *
  * Extends the reference's tokenization machinery
  * (`src/pipeline/pipeline.py:169` whitespace-lowercase) with the
  * column-level analyses a training-data pipeline runs over every
  * document. Everything is a codegen'd string/array expression —
  * per-row, no shuffle, scales linearly with the scan.
  */
object TextAnalysis {

  def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text)).cast("long")

  /** BPE-ish subword count: alternating letter-runs / digit-runs /
    * single punctuation, the classic pre-tokenizer regex. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Distinct-token ratio (lexical diversity). */
  def distinctRatio(text: Column): Column =
    size(array_distinct(toks(text))).cast("double") /
      greatest(size(toks(text)), lit(1)).cast("double")

  /** Stopword ratio against a fixed English function-word list. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for")
  def stopwordRatio(text: Column): Column =
    size(array_intersect(toks(text), array(stopwords.map(lit): _*)))
      .cast("double") / greatest(size(toks(text)), lit(1)).cast("double")
  // NOTE: intersect loses duplicate stopword occurrences; occurrence-true
  // variant below counts every token.
  def stopwordOccurrenceRatio(text: Column): Column =
    size(filter(toks(text), t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks(text)), lit(1)).cast("double")

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    aggregate(toks(text), lit(0.0), (acc, t) => acc + length(t).cast("double")) /
      greatest(size(toks(text)), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length band + diversity +
    * moderate stopword mass (heuristics in the C4/Gopher style). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthScore = least(n / 64.0, lit(1.0))
    val diversity = distinctRatio(text)
    val stop = stopwordOccurrenceRatio(text)
    val stopScore = lit(1.0) - abs(stop - 0.4)
    round((lengthScore + diversity + stopScore) / 3.0, 4)
  }

  /** Language-ID: n-gram-profile heuristic. Scores each candidate
    * language by the fraction of the doc's character bigrams found in
    * that language's profile; returns the argmax language. Profiles
    * here are tiny built-in seeds — the operator shape (profile
    * broadcast + per-row argmax, no shuffle) is what scales. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "es" -> Seq("de", "la", "os", "ar", "es", "en", "el", "ra", "as", "ci"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "ou", "ur", "it"),
    "de" -> Seq("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"),
    "zh" -> Seq("zh", "sh", "ng", "ia", "ua", "uo", "ei", "ao", "an", "ji"))

  /** Per-language bigram-hit score for `text`. */
  def langScore(text: Column, lang: String): Column = {
    val grams = langProfiles(lang)
    val s = lower(text)
    grams.map(g => when(s.contains(g), 1.0).otherwise(0.0)).reduce(_ + _) / grams.size
  }

  /** Argmax language over the built-in profiles (deterministic
    * tiebreak: language name ascending). */
  def langId(text: Column): Column = {
    val scored = langProfiles.keys.toSeq.sorted.map { l =>
      struct(langScore(text, l).as("score"), lit(l).as("lang"))
    }
    // max_by over a small literal array: sort by (score desc, lang asc)
    element_at(
      array_sort(array(scored: _*),
        (a, b) =>
          when(a.getField("score") > b.getField("score"), -1)
            .when(a.getField("score") < b.getField("score"), 1)
            .otherwise(
              when(a.getField("lang") < b.getField("lang"), -1)
                .when(a.getField("lang") > b.getField("lang"), 1).otherwise(0))),
      1).getField("lang")
  }

  /** Whole-document fingerprint: MD5 of the normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style robust fingerprint: MIN MD5 over word 5-gram
    * shingles — stable under local edits, the standard dedup
    * fingerprint for near-identical detection. */
  def minShingleFingerprint(text: Column, n: Int): Column =
    array_min(transform(graft.dedup.Dedup.shingles(text, n), s => md5(s)))

  /** Rolling (Rabin–Karp polynomial) fingerprint over token hashes:
    * fp = fold(0, (acc, h) -> (acc·31 + h) mod (2^31−1)). ORDER
    * SENSITIVE — unlike the set-style fingerprints above, swapping
    * two tokens changes it, which is the property incremental /
    * chunked dedup pipelines key on. Intermediates stay < 2^37, so
    * the int64 arithmetic replays exactly in ANSI SQL. */
  def rollingFingerprint(text: Column): Column = {
    val hs = transform(toks(text),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    aggregate(hs, lit(0L), (acc, h) => (acc * 31L + h) % lit(2147483647L))
  }

  // ---------- PII redaction ----------

  /** PII patterns, written in the Java-regex ∩ RE2 dialect so the
    * same strings run verbatim in Spark (codegen'd regexp_replace)
    * and the DuckDB oracle. Conservative by design: redaction
    * pipelines prefer false positives over leaked identifiers. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val phoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Redact emails, then URLs, then phone numbers to typed
    * placeholder tokens — the standard pre-training scrub. Email runs
    * first so an address is never half-eaten by the URL pass; all
    * three are per-row codegen'd regexp_replace calls, so redaction
    * scales with the scan. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        urlRe, "<URL>"),
      phoneRe, "<PHONE>")

  /** Per-kind PII match counts (the audit side of redaction). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(emailRe)).cast("long").as("n_email"),
    regexp_count(text, lit(urlRe)).cast("long").as("n_url"),
    regexp_count(text, lit(phoneRe)).cast("long").as("n_phone"))
}
