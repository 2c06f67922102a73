package graft.queries

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + application over `documents` —
  * the "train the tokenizer on the corpus" step of a large-scale
  * pretraining pipeline (the reference has no tokenizer; this is part of
  * the training-data surface graft adds, like dedup and sharding).
  *
  * Shape at 100 TB: the ONLY corpus-scale work is the word-frequency
  * aggregation — one shuffle with map-side combine, after which every
  * merge round runs on the compact vocabulary table (bounded by the
  * language, millions of rows at web scale — exactly how production BPE
  * trainers work: they never re-scan the corpus per merge). Each round is
  * a vocab-scale pair-count aggregation plus a ONE-ROW argmax collect
  * (bounded by construction, like the IVF centroid aggregates), and the
  * merge application is a scan-local `aggregate()` fold over each word's
  * symbol list. Per-round `localCheckpoint` truncates the iterative
  * lineage (SURVEY §6: iterative frames must checkpoint, not cache).
  *
  * Determinism: merge selection ties break on (count DESC, lhs ASC,
  * rhs ASC) — pure integer counts and ASCII string order, identical in
  * both engines. The fold applies a merge left-to-right non-overlapping
  * (standard greedy BPE): 'a a a' + (a,a) -> 'aa a', proven equal to the
  * classic scan in BpeSpec. The DuckDB oracle replays the SAME ten
  * rounds as chained CTEs (pair counts, argmax, `list_reduce` fold), so
  * the hash-match checks the whole training trajectory, not just shapes.
  */
object Bpe extends QueryModule {

  private[graft] val Merges = 10

  // ------------------------------------------------------- fold expression
  // Apply one merge (l, r) to a space-joined symbol string, left-to-right
  // non-overlapping. The accumulator is the rebuilt symbol string; the
  // "last symbol == l" test is a suffix check (symbols never contain
  // spaces, so ' '||l matches exactly one trailing symbol).
  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private[graft] def foldSpark(l: String, r: String): String = {
    val (lq, rq) = (sq(l), sq(r))
    s"aggregate(slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1), " +
      s"element_at(split(syms, ' '), 1), (acc, x) -> " +
      s"CASE WHEN (acc = $lq OR endswith(acc, ' ' || $lq)) AND x = $rq THEN " +
      s"CASE WHEN acc = $lq THEN $lq || $rq " +
      s"ELSE left(acc, length(acc) - ${l.length} - 1) || ' ' || $lq || $rq END " +
      s"ELSE acc || ' ' || x END)"
  }

  // DuckDB twin: same fold via list_reduce (init = first element), with
  // the merge pair arriving as correlated columns from the argmax CTE.
  private def foldDuck(l: String, r: String): String =
    s"list_reduce(string_split(syms, ' '), (acc, x) -> " +
      s"CASE WHEN (acc = $l OR ends_with(acc, ' ' || $l)) AND x = $r THEN " +
      s"CASE WHEN acc = $l THEN $l || $r " +
      s"ELSE left(acc, length(acc) - length($l) - 1) || ' ' || $l || $r END " +
      s"ELSE acc || ' ' || x END)"

  // ------------------------------------------------------- training loop
  /** Initial vocabulary: word, corpus frequency, chars as symbol string. */
  private def vocab0(s: SparkSession, dir: String): DataFrame =
    Docs.enriched(s, dir)
      .select(explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat_ws(" ", expr("filter(split(word, ''), x -> x != '')")))

  /** Adjacent-pair corpus counts over the current vocabulary. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(split(col("syms"), " ")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(split(syms, ' ')) - 1), i -> " +
          "struct(element_at(split(syms, ' '), i) AS l, " +
          "element_at(split(syms, ' '), i + 1) AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("pc"))

  private[graft] final case class Merge(step: Int, lhs: String, rhs: String, pc: Long)

  // Driver-side memo of (merge table, final vocab) per (session, corpus):
  // bpe_tokenize reuses the training result, and the memo lives exactly
  // as long as the session's context (the centroid-memo lifecycle).
  private val trainMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Seq[Merge], DataFrame)]

  private[graft] def trained(s: SparkSession, dir: String): (Seq[Merge], DataFrame) = {
    SessionCache.onSessionEnd(s, "bpe_train") {
      trainMemo.keys.filter(_._1 eq s).toSeq.foreach(trainMemo.remove)
    }
    trainMemo.getOrElseUpdate((s, dir), {
      // Checkpoint EVERY round, not just vocab0: foldSpark references
      // `syms` three times, so CollapseProject inlines the previous
      // round's expression ~3x into the next — without truncation the
      // plan grows geometrically (measured 1.3→33.6 MiB task binaries
      // over ten rounds). The cost is Merges copies of the compact
      // vocab table in block storage — bounded and cheap.
      var vocab = vocab0(s, dir).localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var exhausted = false
      for (k <- 1 to Merges if !exhausted) {
        // bounded one-row collect: the argmax drives the next round
        val best = pairCounts(vocab)
          .orderBy(col("pc").desc, col("l"), col("r")).take(1)
        if (best.isEmpty) {
          // vocabulary fully merged before Merges rounds: stop — the
          // oracle's later-round CTEs go empty the same way (best_k has
          // no row, the LEFT JOIN carries vocab_k forward unchanged)
          exhausted = true
        } else {
          val (l, r) = (best(0).getString(0), best(0).getString(1))
          merges += Merge(k, l, r, best(0).getLong(2))
          vocab = vocab.withColumn("syms", expr(foldSpark(l, r))).localCheckpoint()
        }
      }
      (merges.toSeq, vocab)
    })
  }

  // ------------------------------------------------------------ bpe_train
  private def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trained(s, dir)._1
      .toDF("step", "lhs", "rhs", "pair_count")
      .select(col("step"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
      .orderBy("step")
  }

  // The oracle replays training as chained CTEs: vocab_k -> pair counts ->
  // deterministic argmax -> fold-applied vocab_{k+1}; ten rounds unioned.
  private def trainCtes: Seq[String] = {
    val first =
      s"""vocab1 AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         |         array_to_string(string_split(word, ''), ' ') AS syms
         |  FROM (SELECT unnest(${Docs.toksDuck}) AS word FROM documents)
         |  GROUP BY word)""".stripMargin
    val rounds = (1 to Merges).flatMap { k =>
      val pairs =
        s"""pairs$k AS (
           |  SELECT p[1] AS l, p[2] AS r, CAST(sum(cnt) AS BIGINT) AS pc
           |  FROM (SELECT cnt, unnest(list_zip(string_split(syms, ' '),
           |                string_split(syms, ' ')[2:])) AS p FROM vocab$k) t
           |  WHERE p[2] IS NOT NULL GROUP BY p[1], p[2])""".stripMargin
      val best =
        s"""best$k AS (
           |  SELECT l, r, pc FROM pairs$k ORDER BY pc DESC, l, r LIMIT 1)""".stripMargin
      // LEFT JOIN ON TRUE: when best_k is empty (vocabulary exhausted
      // before Merges rounds) the round is an identity pass instead of
      // annihilating the vocab — mirroring the Spark loop's early stop
      val next =
        s"""vocab${k + 1} AS (
           |  SELECT word, cnt,
           |         CASE WHEN b.l IS NULL THEN syms
           |              ELSE ${foldDuck("b.l", "b.r")} END AS syms
           |  FROM vocab$k LEFT JOIN best$k b ON TRUE)""".stripMargin
      Seq(pairs, best, next)
    }
    first +: rounds
  }

  private def bpeTrainSql: String = {
    val union = (1 to Merges).map { k =>
      s"SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged, pc AS pair_count FROM best$k"
    }.mkString("\nUNION ALL\n")
    "WITH " + trainCtes.mkString(",\n") + "\nSELECT * FROM (\n" + union + "\n) ORDER BY step"
  }

  // --------------------------------------------------------- bpe_tokenize
  // Tokenize the corpus with the learned merges: per-word BPE lengths come
  // from the final vocabulary (computed once, broadcast — a production
  // tokenizer's precomputed word cache), so the corpus pass is one explode
  // + broadcast join + one doc_id shuffle. A scan-local alternative (the
  // ten folds inlined per word occurrence) would shuffle nothing but
  // recompute merges per occurrence instead of per distinct word.
  private def bpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val vocabF = trained(s, dir)._2
    val wordLens = vocabF.select(col("word"),
      size(split(col("syms"), " ")).cast("long").as("n_syms"))
    Docs.enriched(s, dir)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .join(broadcast(wordLens), "word")
      .groupBy("doc_id").agg(sum("n_syms").as("n_tokens_bpe"))
      .orderBy("doc_id")
  }

  private def bpeTokenizeSql: String =
    "WITH " + trainCtes.mkString(",\n") + ",\n" +
      s"""vocab_final AS (
         |  SELECT word, cnt,
         |         CASE WHEN b.l IS NULL THEN syms
         |              ELSE ${foldDuck("b.l", "b.r")} END AS syms
         |  FROM vocab$Merges LEFT JOIN best$Merges b ON TRUE),
         |word_lens AS (
         |  SELECT word, CAST(len(string_split(syms, ' ')) AS BIGINT) AS n_syms
         |  FROM vocab_final),
         |doc_words AS (
         |  SELECT doc_id, unnest(${Docs.toksDuck}) AS word FROM documents)
         |SELECT doc_id, CAST(sum(n_syms) AS BIGINT) AS n_tokens_bpe
         |FROM doc_words JOIN word_lens USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- bpe_fertility
  // Tokenizer fertility by language — BPE tokens per word, the multilingual
  // fairness metric tokenizer teams track: a vocabulary trained on a
  // mostly-English mix fragments other languages into more pieces, which
  // inflates their effective sequence length and training cost. Same
  // corpus pass as bpe_tokenize (explode + broadcast word-length cache),
  // aggregated on the bounded language axis; fertility in exact integer
  // milli-units.
  private def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    val wordLens = trained(s, dir)._2.select(col("word"),
      size(split(col("syms"), " ")).cast("long").as("n_syms"))
    Docs.enriched(s, dir)
      .select(col("lang"), explode(col("toks")).as("word"))
      .join(broadcast(wordLens), "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        expr("(n_bpe_tokens * 1000) div n_words").as("fertility_milli"))
      .orderBy("lang")
  }

  private def bpeFertilitySql: String =
    "WITH " + trainCtes.mkString(",\n") + ",\n" +
      s"""vocab_final AS (
         |  SELECT word, cnt,
         |         CASE WHEN b.l IS NULL THEN syms
         |              ELSE ${foldDuck("b.l", "b.r")} END AS syms
         |  FROM vocab$Merges LEFT JOIN best$Merges b ON TRUE),
         |word_lens AS (
         |  SELECT word, CAST(len(string_split(syms, ' ')) AS BIGINT) AS n_syms
         |  FROM vocab_final),
         |doc_words AS (
         |  SELECT lang, unnest(${Docs.toksDuck}) AS word FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
         |       (CAST(sum(n_syms) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS fertility_milli
         |FROM doc_words JOIN word_lens USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("bpe_fertility", bpeFertility, Some(bpeFertilitySql)),
    QueryDef("bpe_train", bpeTrain, Some(bpeTrainSql)),
    QueryDef("bpe_tokenize", bpeTokenize, Some(bpeTokenizeSql))
  )
}
