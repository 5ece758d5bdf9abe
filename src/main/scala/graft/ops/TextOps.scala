package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a `documents`
  * table (doc_id, text, lang, source, n_chars). All built-ins — no UDFs on
  * these paths, so whole-stage codegen applies end-to-end.
  */
object TextOps {

  /** Token count: whitespace tokenization (documents are single-spaced). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_m"))
      .orderBy("doc_id")

  /** BPE-ish subword count estimate: whitespace tokens plus extra splits on
    * character-class boundaries (letters vs digits, lower->UPPER camel
    * humps, and before each punctuation char) — the cheap proxy for
    * tokenizer load used when the real tokenizer is not on the cluster.
    * Letter classes include uppercase: an acronym like "NASA" is ONE
    * subword, not one per capital (the lower-case-only classes of the first
    * cut split it into letters and missed "A1"-style boundaries entirely).
    * The DuckDB oracle (q_subword_count) reproduces the identical boundary
    * set by inserting spaces with capture-group replaces — RE2 has no
    * lookarounds, so the oracle can't share this regex verbatim. */
  def subwordCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"),
        "[\\s]+|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])|(?<=[a-z])(?=[A-Z])|(?=[^A-Za-z0-9\\s])"),
        t => length(t) > 0)).cast("long").as("n_subwords"))
      .orderBy("doc_id")

  /** Quality signals: integer-exact components (ratios are derived by the
    * consumer; keeping integers makes results engine-portable bit-for-bit). */
  def qualitySignals(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("long").as("n_punct"),
      size(filter(split(col("text"), " "), t => t.isin("the", "a", "of", "and", "to")))
        .cast("long").as("n_stopwords"))
      .orderBy("doc_id")

  /** Quality score from the signals (a lightweight Gopher-rules-style
    * heuristic): penalize very short docs, high punctuation density, and
    * stopword-free text. Emitted as basis points (floor(q * 10000), BIGINT)
    * rather than a rounded double: the DuckDB oracle evaluates the identical
    * IEEE-754 expression tree, and integer outputs compare bit-for-bit where
    * engine round() tie-break rules would not. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("double")
    val punct = length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double")
    val stop = size(filter(split(col("text"), " "),
      t => t.isin("the", "a", "of", "and", "to"))).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0))
    val stopScore = least(stop * 20.0 / greatest(nTok, lit(1.0)), lit(1.0))
    docs.select(col("doc_id"),
      floor((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3) * 10000.0)
        .cast("long").as("quality_bp"))
      .orderBy("doc_id")
  }

  /** Language ID by stopword-profile voting (n-gram-heuristic class; the
    * reference's codec/audio metadata filter analog). Pure expressions. */
  def langId(docs: DataFrame): DataFrame = {
    def hits(words: Seq[String]): Column =
      size(filter(split(lower(col("text")), " "), t => t.isin(words.map(lit): _*)))
    val en = hits(Seq("the", "a", "of", "and", "to", "is", "in"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "nicht"))
    val fr = hits(Seq("le", "la", "et", "les", "des", "est"))
    val es = hits(Seq("el", "los", "las", "es", "y", "una"))
    docs.select(col("doc_id"), col("lang").as("lang_declared"),
      when(en >= greatest(de, fr, es) && en > 0, "en")
        .when(de >= greatest(fr, es) && de > 0, "de")
        .when(fr >= es && fr > 0, "fr")
        .when(es > 0, "es")
        .otherwise("und").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: md5 content hash per doc plus position-sensitive
    * window fingerprints — 64-char windows sampled every 64 chars
    * (winnowing-style), one ROW per (doc, window) — the content-identity
    * column family (db.cpp:22-30 analog). Windows hash with md5 so the
    * DuckDB oracle reproduces every value (round 1 emitted an
    * ARRAY<xxhash64> column, which no SQL oracle could check and which the
    * harness's pandas compare could not even hash). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(to_binary(col("text"), lit("utf-8"))).as("content_md5"),
      posexplode(transform(
        sequence(lit(0L),
          greatest(floor((length(col("text")) - 1) / 64).cast("long"), lit(0L))),
        i => md5(to_binary(
          col("text").substr((i * 64 + 1).cast("int"), lit(64)), lit("utf-8"))))))
      .select(col("doc_id"), col("content_md5"),
        col("pos").cast("long").as("win_idx"), col("col").as("win_md5"))
      .orderBy("doc_id", "win_idx")
}
