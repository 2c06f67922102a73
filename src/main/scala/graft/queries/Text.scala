package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** SURVEY.md §2.C (#27-31) — text analysis + exact dedup over `documents`.
  *
  * All token work stays inside codegen'd higher-order functions (no UDFs);
  * the tokenizer and every formula have identical DuckDB twins. At 100 TB the
  * per-doc ops are embarrassingly parallel scans; dedup_exact is a single
  * hash-shuffle on the normalized-text hash. Tokenization/normalization is
  * the shared memoized pass in [[Docs]] — computed once per session, not
  * once per operator.
  */
object Text extends QueryModule {

  private val toksDuck = Docs.toksDuck

  private[queries] val StopEn = Seq("the", "and", "of", "to", "in", "is", "it", "that", "for", "on")
  private val StopFr = Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "dans")
  private val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf")
  private val StopEs = Seq("el", "los", "las", "y", "es", "como", "para", "por", "con", "una")

  private[queries] def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The shared cached (doc_id, text, toks, norm) pass — see [[Docs]]. */
  private def docs(s: SparkSession, dir: String): DataFrame = Docs.enriched(s, dir)

  // ------------------------------------------------- text_token_count
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      expr("cast(size(toks) as bigint)").as("n_words"),
      regexp_count(lower(col("text")), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_m"))
      .orderBy("doc_id")

  private val tokenCountSql = s"""
    SELECT doc_id,
      CAST(len($toksDuck) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(lower(text), '$BpePattern')) AS BIGINT) AS n_bpe_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_m
    FROM documents ORDER BY doc_id"""

  // ----------------------------------------------------- text_quality
  /** Row-local quality columns over any frame carrying `toks` — ONE
    * definition shared by the batch text_quality op and the streaming
    * admission gate (Streams.curateGateStream), so the stream's verdicts
    * are bit-identical to the batch pipeline's by construction.
    */
  private[graft] def withQualityCols(df: DataFrame): DataFrame =
    df.withColumn("n_words", expr("cast(size(toks) as bigint)"))
      .withColumn("n_stop", expr(s"cast(size(filter(toks, x -> x IN ${inList(StopEn)})) as bigint)"))
      .withColumn("sum_len", expr("cast(aggregate(toks, 0, (a, x) -> a + length(x)) as bigint)"))
      .withColumn("stop_ratio", expr("cast(n_stop as double) / greatest(n_words, 1)"))
      .withColumn("mean_word_len", expr("cast(sum_len as double) / greatest(n_words, 1)"))
      .withColumn("quality_score", expr(
        "0.4 * stop_ratio + 0.3 * least(1.0, cast(n_words as double)/100.0) " +
          "+ 0.3 * (1.0 - least(1.0, abs(mean_word_len - 4.7)/10.0))"))

  private[queries] def quality(s: SparkSession, dir: String): DataFrame = {
    withQualityCols(docs(s, dir))
      .select("doc_id", "n_words", "n_stop", "stop_ratio", "mean_word_len", "quality_score")
      .orderBy("doc_id")
  }

  private[queries] val qualitySql = s"""
    WITH t AS (
      SELECT doc_id, $toksDuck AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(len(list_filter(toks, x -> x IN ${inList(StopEn)})) AS BIGINT) AS n_stop,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
      FROM t),
    r AS (
      SELECT doc_id, n_words, n_stop,
        CAST(n_stop AS DOUBLE) / greatest(n_words, 1) AS stop_ratio,
        CAST(sum_len AS DOUBLE) / greatest(n_words, 1) AS mean_word_len
      FROM m)
    SELECT doc_id, n_words, n_stop, stop_ratio, mean_word_len,
      0.4 * stop_ratio + 0.3 * least(1.0, CAST(n_words AS DOUBLE)/100.0)
        + 0.3 * (1.0 - least(1.0, abs(mean_word_len - 4.7)/10.0)) AS quality_score
    FROM r ORDER BY doc_id"""

  // ----------------------------------------------------- text_lang_id
  /** Row-local language-ID columns over any frame carrying `toks` — the
    * [[withQualityCols]] twin for the streaming admission gate.
    */
  private[graft] def withLangCols(df: DataFrame): DataFrame = {
    def hits(set: Seq[String]) = s"cast(size(filter(toks, x -> x IN ${inList(set)})) as bigint)"
    df.withColumn("hits_en", expr(hits(StopEn)))
      .withColumn("hits_fr", expr(hits(StopFr)))
      .withColumn("hits_de", expr(hits(StopDe)))
      .withColumn("hits_es", expr(hits(StopEs)))
      .withColumn("predicted_lang", expr(
        """CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
          |     WHEN hits_fr >= hits_de AND hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
          |     WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
          |     WHEN hits_es > 0 THEN 'es'
          |     ELSE 'unknown' END""".stripMargin))
  }

  private[queries] def langId(s: SparkSession, dir: String): DataFrame = {
    withLangCols(docs(s, dir))
      .withColumn("is_match", when(col("predicted_lang") === col("lang"), 1).otherwise(0))
      .select("doc_id", "lang", "hits_en", "hits_fr", "hits_de", "hits_es", "predicted_lang", "is_match")
      .orderBy("doc_id")
  }

  // ------------------------------------------------ text_lang_confusion
  // Language-ID QA: the (true lang x predicted lang) confusion matrix with
  // per-true-lang shares - the observability table that says WHERE the
  // classifier fails (zh has no stopword list -> predicted 'unknown';
  // short docs cross-fire between latin languages). Aggregation over the
  // language-pair key space (bounded by the language vocabulary, never the
  // corpus); the share window runs on the same compact axis. Integer
  // micro-unit shares - nothing floating to hash.
  private def langConfusion(s: SparkSession, dir: String): DataFrame = {
    langId(s, dir)
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_micros", expr("n_docs * 1000000 div sum(n_docs) over (partition by lang)"))
      .withColumn("is_correct", when(col("lang") === col("predicted_lang"), 1L).otherwise(0L))
      .select("lang", "predicted_lang", "n_docs", "share_micros", "is_correct")
      .orderBy("lang", "predicted_lang")
  }

  // def, not val: langIdSql is declared below — a val here would capture
  // null during object init (the Dedup lesson)
  private def langConfusionSql = s"""
    WITH l AS (SELECT lang, predicted_lang FROM ($langIdSql)),
    g AS (
      SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM l GROUP BY lang, predicted_lang)
    SELECT lang, predicted_lang, n_docs,
           n_docs * 1000000 // CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS share_micros,
           CASE WHEN lang = predicted_lang THEN 1 ELSE 0 END AS is_correct
    FROM g ORDER BY lang, predicted_lang"""

  private[queries] val langIdSql = {
    def hits(set: Seq[String]) = s"CAST(len(list_filter(toks, x -> x IN ${inList(set)})) AS BIGINT)"
    s"""
    WITH t AS (SELECT doc_id, lang, $toksDuck AS toks FROM documents),
    h AS (
      SELECT doc_id, lang,
        ${hits(StopEn)} AS hits_en, ${hits(StopFr)} AS hits_fr,
        ${hits(StopDe)} AS hits_de, ${hits(StopEs)} AS hits_es
      FROM t)
    SELECT doc_id, lang, hits_en, hits_fr, hits_de, hits_es,
      CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
           WHEN hits_fr >= hits_de AND hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
           WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
           WHEN hits_es > 0 THEN 'es'
           ELSE 'unknown' END AS predicted_lang,
      CASE WHEN (CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
           WHEN hits_fr >= hits_de AND hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
           WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
           WHEN hits_es > 0 THEN 'es'
           ELSE 'unknown' END) = lang THEN 1 ELSE 0 END AS is_match
    FROM h ORDER BY doc_id"""
  }

  // ------------------------------------------------- text_fingerprint
  private val normDuck = Docs.normDuck

  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      expr("sha2(norm, 256)").as("norm_sha256"),
      md5Long64(col("norm")).as("fp64"))
      .orderBy("doc_id")

  private val fingerprintSql = s"""
    SELECT doc_id,
      sha256($normDuck) AS norm_sha256,
      ${md5Long64Sql(normDuck)} AS fp64
    FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------- text_winnow
  /** Winnow-lite sketch: per doc, the minimum token hash in each of 8
    * residue buckets — a compact locality-sensitive fingerprint (long form).
    * Per-doc token dedup happens inside the array (array_distinct BEFORE
    * explode), so the only shuffle is the final 8-bucket aggregation — no
    * full-corpus distinct over exploded token occurrences.
    */
  private def winnow(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
      .select(col("doc_id"), md5Long64(col("tok")).as("th"))
      .groupBy(col("doc_id"), (col("th") % 8).as("bucket"))
      .agg(min("th").as("min_hash"), count(lit(1)).as("n_toks"))
      .orderBy("doc_id", "bucket")

  private val winnowSql = s"""
    WITH toks AS (SELECT DISTINCT doc_id, unnest($toksDuck) AS tok FROM documents),
    h AS (SELECT doc_id, ${md5Long64Sql("tok")} AS th FROM toks)
    SELECT doc_id, th % 8 AS bucket, min(th) AS min_hash, count(*) AS n_toks
    FROM h GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket"""

  // ------------------------------------------------ text_rolling_fp
  /** Rabin-Karp rolling min-hash fingerprint via the native
    * graft_rolling_min expression (O(n) per doc inside codegen); the
    * oracle recomputes each window as a direct weighted sum — identical
    * exact integer arithmetic.
    */
  private def rollingFp(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) >= graft.functions.RollingHashMin.W)
      .select(col("doc_id"),
        (length(col("text")) - (graft.functions.RollingHashMin.W - 1)).cast("long").as("n_windows"),
        graft.functions.GraftColumns.graftRollingMin(col("text")).as("min_rh"))
      .orderBy("doc_id")

  private val rollingFpSql = {
    import graft.functions.RollingHashMin.{M, W, weights}
    val terms = weights.zipWithIndex
      .map { case (w, j) => s"CAST(ord(substr(text, i+$j, 1)) AS BIGINT) * ${w}" }
      .mkString(" + ")
    s"""
    SELECT doc_id,
      CAST(length(text) - ${W - 1} AS BIGINT) AS n_windows,
      list_min(list_transform(generate_series(1, length(text) - ${W - 1}),
        i -> ($terms) % $M)) AS min_rh
    FROM documents
    WHERE length(text) >= $W
    ORDER BY doc_id"""
  }

  // ---------------------------------------------------- dedup_exact
  /** Distinct corpus norm-hashes — the static side of the streaming
    * exact-dup gate (Streams.curateGateStream); at scale a bucketed
    * hash-keyed table maintained by the batch dedup pass.
    */
  private[graft] def normHashes(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(expr("sha2(norm, 256)").as("norm_sha256")).distinct()

  private[queries] def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), expr("sha2(norm, 256)").as("norm_sha256"))
      .groupBy("norm_sha256")
      .agg(min("doc_id").as("survivor_doc_id"), count(lit(1)).as("n_copies"))
      .select("survivor_doc_id", "n_copies", "norm_sha256")
      .orderBy("survivor_doc_id")

  private[queries] val dedupExactSql = s"""
    SELECT min(doc_id) AS survivor_doc_id, count(*) AS n_copies,
           sha256($normDuck) AS norm_sha256
    FROM documents
    GROUP BY norm_sha256
    ORDER BY survivor_doc_id"""

  // ------------------------------------------------ text_repetition
  // Gopher-style repetition filter: the fraction of a document's word
  // 3-grams that are duplicates (1 − distinct/total). Highly repetitive
  // docs (boilerplate, keyword stuffing, generation loops) score high and
  // get flagged. Everything happens inside array expressions before any
  // shuffle — per-doc work, embarrassingly parallel at any scale. The
  // ratio is one exact integer division per doc (engine-stable boundary).
  private val RepetitionFlagPct = 2L // flag when dup 3-grams > 2% (corpus-tuned, as the Gopher rules are)

  private[queries] def repetition(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(size(col("toks")) >= 3)
      .withColumn("g3", expr(
        "transform(sequence(1, size(toks)-2), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2)))"))
      .select(col("doc_id"),
        expr("cast(size(g3) as bigint)").as("n_grams"),
        expr("cast(size(array_distinct(g3)) as bigint)").as("n_distinct"))
      .withColumn("dup_pct", expr("(n_grams - n_distinct) * 100L div n_grams"))
      .withColumn("flagged", when(col("dup_pct") > RepetitionFlagPct, 1L).otherwise(0L))
      .orderBy("doc_id")

  private[queries] val repetitionSql = s"""
    WITH g AS (
      SELECT doc_id,
             list_transform(range(1, len(toks)-1), k -> toks[k] || ' ' || toks[k+1] || ' ' || toks[k+2]) AS g3
      FROM (SELECT doc_id, $toksDuck AS toks FROM documents)
      WHERE len(toks) >= 3),
    m AS (
      SELECT doc_id, CAST(len(g3) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(g3)) AS BIGINT) AS n_distinct
      FROM g)
    SELECT doc_id, n_grams, n_distinct,
           (n_grams - n_distinct) * 100 // n_grams AS dup_pct,
           CASE WHEN (n_grams - n_distinct) * 100 // n_grams > $RepetitionFlagPct
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS flagged
    FROM m ORDER BY doc_id"""

  // ---------------------------------------------------- text_tfidf
  // Top-3 characteristic terms per document, ranked by an integer-scaled
  // tf/df score (tf * 1e6 div df). No ln(): transcendental libm results
  // are not bit-identical across engines, integer division is — and the
  // ranking it induces is the same monotone tf·idf order for fixed tf.
  // Shape at scale: one explode->groupBy for tf, one distinct-token
  // groupBy for df (vocabulary-sized), an equi-join on the token, and a
  // per-doc top-k window — every shuffle is on a compact key.
  private val TfIdfTopK = 3

  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = docs(s, dir)
      .select(explode(array_distinct(col("toks"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000L div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TfIdfTopK)
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  private val tfidfSql = s"""
    WITH t AS (SELECT doc_id, unnest($toksDuck) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * 1000000 // df.df AS score,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf * 1000000 // df.df DESC, tf.term) AS rank
      FROM tf JOIN df ON tf.term = df.term)
    SELECT doc_id, rank, term, tf, df, CAST(score AS BIGINT) AS score
    FROM scored WHERE rank <= $TfIdfTopK
    ORDER BY doc_id, rank"""

  /** PII detection + redaction — the document-content side of the
    * reference's sensitive-data concern (its classifier splits SENSITIVE
    * descriptors into their own satellite; a training corpus needs the
    * same gate INSIDE the text). The synthetic corpus carries no PII, so
    * the op first plants deterministic emails (doc_id % 5) and phone
    * numbers (doc_id % 7) — the same simulation pattern the DV drift and
    * status ops use — then detects and redacts them with patterns in the
    * Java-regex ∩ RE2 common dialect. The redacted-text sha256 is the
    * cross-engine proof the redaction produced byte-identical output;
    * shuffle-free scan, no UDFs.
    */
  private[graft] val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private[graft] val PhoneRe = "555-[0-9]{4}"

  private[queries] def piiScrub(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .withColumn("inj", concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today"))).otherwise(lit(""))))
      .select(col("doc_id"),
        regexp_count(col("inj"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("inj"), lit(PhoneRe)).cast("long").as("n_phones"),
        sha2(regexp_replace(regexp_replace(col("inj"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"), 256).as("redacted_hash"))
      .orderBy("doc_id")
  }

  private[queries] val piiScrubSql =
    s"""WITH inj AS (
       |  SELECT doc_id,
       |    text
       |    || CASE WHEN doc_id % 5 = 0
       |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |            ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0
       |            THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
       |            ELSE '' END AS inj
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(inj, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(inj, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  sha256(regexp_replace(regexp_replace(inj, '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_hash
       |FROM inj ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- text_feature_hash
  // Hashing-trick featurization (the Weinberger-et-al. shape): each token
  // hashes into a fixed 256-bin space, per-doc term frequencies become the
  // sparse feature vector a downstream classifier/quality model consumes.
  // No vocabulary pass, no driver state — one scan + one keyed aggregation,
  // dimensionality constant at any corpus size. The shared md5-long64 hash
  // (always positive, 60 bits) keeps bins identical cross-engine; a
  // deterministic doc sample (doc_id % 29) keeps the checked output
  // row-bounded while exercising the full pipeline shape.
  private val FhBins = 256

  private def featureHash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.md5Long64
    Docs.enriched(s, dir)
      .filter(pmod(col("doc_id"), lit(29L)) === 0L)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), pmod(md5Long64(col("tok")), lit(FhBins.toLong)).as("dim"))
      .agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "dim")
  }

  private val featureHashSql = {
    import graft.functions.GraftFunctions.md5Long64Sql
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Docs.toksDuck}) AS tok
       |  FROM documents WHERE doc_id % 29 = 0)
       |SELECT doc_id, CAST(${md5Long64Sql("tok")} % $FhBins AS BIGINT) AS dim,
       |       CAST(count(*) AS BIGINT) AS tf
       |FROM toks GROUP BY doc_id, dim
       |ORDER BY doc_id, dim""".stripMargin
  }

  // ------------------------------------------- text_quality_calibration
  // Does the quality score PREDICT anything? Per quality decile: doc
  // count, exact token totals, the unknown-language rate, and the
  // near-dup drop rate (from the quality-aware survivorship) — the
  // calibration table that justifies (or indicts) a quality threshold
  // before curation gates on it. The decile is floor(score·10) on the
  // bit-identical cross-engine double; rates are exact integer
  // micro-units. One pass over the memoized quality+lang columns joined
  // with the memoized survivorship — aggregation on a 10-row key.
  private def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val base = withLangCols(withQualityCols(docs(s, dir)))
      .select(col("doc_id"), col("n_words"),
        least(floor(col("quality_score") * 10), lit(9)).cast("long").as("decile"),
        when(col("predicted_lang") === "unknown", 1L).otherwise(0L).as("lang_unknown"))
    base
      .join(Dedup.dedupKeepBest(s, dir)
        .select(col("doc_id"), (lit(1L) - col("keep_ind")).as("near_dup_drop")), "doc_id")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"),
        sum("lang_unknown").as("n_lang_unknown"), sum("near_dup_drop").as("n_near_dup_drop"))
      .select(col("decile"), col("n_docs"), col("n_tokens"),
        col("n_lang_unknown"), col("n_near_dup_drop"),
        expr("n_lang_unknown * 1000000 div n_docs").as("lang_unknown_micro"),
        expr("n_near_dup_drop * 1000000 div n_docs").as("near_dup_micro"))
      .orderBy("decile")
  }

  private def qualityCalibrationSql =
    s"""WITH q AS (
       |  SELECT doc_id, n_words, quality_score FROM ($qualitySql)),
       |l AS (
       |  SELECT doc_id, predicted_lang FROM ($langIdSql)),
       |kb AS (
       |  SELECT doc_id, CAST(1 - keep_ind AS BIGINT) AS near_dup_drop
       |  FROM (${Dedup.dedupKeepBestSql})),
       |base AS (
       |  SELECT q.doc_id,
       |    least(CAST(floor(q.quality_score * 10) AS BIGINT), 9) AS decile,
       |    q.n_words,
       |    CASE WHEN l.predicted_lang = 'unknown' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS lang_unknown,
       |    kb.near_dup_drop
       |  FROM q JOIN l ON l.doc_id = q.doc_id JOIN kb ON kb.doc_id = q.doc_id),
       |agg AS (
       |  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |         CAST(sum(lang_unknown) AS BIGINT) AS n_lang_unknown,
       |         CAST(sum(near_dup_drop) AS BIGINT) AS n_near_dup_drop
       |  FROM base GROUP BY decile)
       |SELECT decile, n_docs, n_tokens, n_lang_unknown, n_near_dup_drop,
       |  n_lang_unknown * 1000000 // n_docs AS lang_unknown_micro,
       |  n_near_dup_drop * 1000000 // n_docs AS near_dup_micro
       |FROM agg ORDER BY decile""".stripMargin

  // --------------------------------------------- text_char_diversity
  // Character-level diversity — the garbage detector UNDER the token
  // layer (binary spew, key-mash, single-char floods tokenize into few
  // "words" and slip past token-ratio rules). Shannon entropy is the
  // textbook form but log2 is libm — banned by the cross-engine
  // determinism rules (SURVEY §5) — so the op reports the EXACT-rational
  // diversity family instead: collision probability Σ(c_i/n)² (Rényi-2's
  // argument — low = diverse) and the top-char share (Gopher's
  // max-frequency discipline applied to characters), both as exact
  // integer micro/percent units, plus the distinct-char count. A doc is
  // flagged when its character mass concentrates: top char ≥ 30% or
  // fewer than 10 distinct characters.
  //
  // Scale shape: one corpus scan explodes to total-chars rows (the same
  // linear volume every token op pays), partial-aggregated on the
  // compact (doc_id, ch) key, then a doc-keyed final agg — two shuffles,
  // both map-side-combined; no windows, no joins. Empty docs are filtered
  // out on both sides (see the sequence-descend note below), which also
  // makes every divisor strictly positive.
  private val DiversityTopPct = 30L
  private val DiversityMinDistinct = 10L

  private def charDiversity(s: SparkSession, dir: String): DataFrame = {
    // length > 0 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
    // DuckDB's generate_series(1, 0) is empty — filter empty docs out
    // explicitly so both engines drop them the same way.
    //
    // SCAN-LOCAL histogram (r14, guide §2.4 "remove shuffles outright"):
    // the old shape exploded every character into a (doc_id, ch) row and
    // paid TWO corpus-chars-scale exchanges (hist keyed (doc, ch), then a
    // doc-keyed rollup). Every statistic is per-document, so the whole
    // histogram folds inside the row: sort the same per-char array the
    // explode produced, then one run-length aggregate pass threads
    // (prev char, run, distinct, max-run, Σrun²) — no shuffle anywhere
    // but the final ORDER BY. Counts are the same integers grouped the
    // same way, so both engines' values are unchanged; the DECIMAL(38,0)
    // overflow routing on Σc²·1e6 is kept verbatim.
    // loadBalanced: the run-length kernel (array_sort over one row per
    // character) is heavy per-row work running scan-locally with no cached
    // intermediate — the one measured case where balancing the single-row-
    // group gate scan wins big (0.86 s vs 5.53 s raw at sf0.1)
    Tables.loadBalanced(s, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_t"),
        expr(
          """aggregate(
            |  array_sort(transform(sequence(1, length(text)), i -> substring(text, i, 1))),
            |  named_struct('prev', cast(null as string), 'run', 0L,
            |               'dc', 0L, 'mx', 0L, 'ss', 0L),
            |  (st, ch) -> if(st.prev is null or st.prev != ch,
            |    named_struct('prev', ch, 'run', 1L, 'dc', st.dc + 1L,
            |                 'mx', greatest(st.mx, st.run),
            |                 'ss', st.ss + st.run * st.run),
            |    named_struct('prev', ch, 'run', st.run + 1L, 'dc', st.dc,
            |                 'mx', st.mx, 'ss', st.ss)),
            |  st -> named_struct('dc', st.dc, 'mx', greatest(st.mx, st.run),
            |                     'ss', st.ss + st.run * st.run))""".stripMargin).as("h"))
      .select(col("doc_id"), col("n_chars_t"),
        col("h.dc").as("distinct_chars"),
        expr("cast(h.ss as decimal(38,0)) * 1000000 div (cast(n_chars_t as decimal(38,0)) * n_chars_t)")
          .as("collision_micro"),
        expr("h.mx * 100L div n_chars_t").as("top_char_pct"))
      .withColumn("flagged",
        when(col("top_char_pct") >= DiversityTopPct ||
            col("distinct_chars") < DiversityMinDistinct, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  private val charDiversitySql = s"""
    WITH ch AS (
      SELECT doc_id, substr(text, CAST(g.d AS INT), 1) AS ch
      FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS d) g),
    hist AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY doc_id, ch),
    agg AS (
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_chars_t,
        CAST(count(*) AS BIGINT) AS distinct_chars,
        CAST((sum(c*c) * 1000000) // (sum(c) * sum(c)) AS BIGINT) AS collision_micro,
        CAST((max(c) * 100) // sum(c) AS BIGINT) AS top_char_pct
      FROM hist GROUP BY doc_id)
    SELECT doc_id, n_chars_t, distinct_chars, collision_micro, top_char_pct,
      CAST(CASE WHEN top_char_pct >= $DiversityTopPct
                  OR distinct_chars < $DiversityMinDistinct
           THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM agg ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("text_quality_calibration", qualityCalibration, Some(qualityCalibrationSql)),
    QueryDef("text_char_diversity", charDiversity, Some(charDiversitySql)),
    QueryDef("text_feature_hash", featureHash, Some(featureHashSql)),
    QueryDef("text_pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("text_token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("text_tfidf", tfidf, Some(tfidfSql)),
    QueryDef("text_quality", quality, Some(qualitySql)),
    QueryDef("text_lang_id", langId, Some(langIdSql)),
    QueryDef("text_lang_confusion", langConfusion, Some(langConfusionSql)),
    QueryDef("text_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("text_winnow", winnow, Some(winnowSql)),
    QueryDef("text_repetition", repetition, Some(repetitionSql)),
    QueryDef("text_rolling_fp", rollingFp, Some(rollingFpSql)),
    QueryDef("dedup_exact", dedupExact, Some(dedupExactSql))
  )
}
