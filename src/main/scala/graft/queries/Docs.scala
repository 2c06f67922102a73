package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One shared tokenization + normalization pass over `documents`, memoized
  * per (session, sf-dir) and cached: the text/dedup operators all consume
  * the derived `toks` / `norm` columns, so the regex work runs once per
  * session instead of once per operator. This is the "materialize the
  * normalized corpus once" pattern a 100 TB pipeline uses — one scan-bound
  * map amortized across every downstream dedup/analysis pass (the cache is
  * the local stand-in for that materialized table).
  */
object Docs {
  /** Shared tokenizer: lowercase, split on non-alphanumeric, drop empties. */
  val toksSpark = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
  val toksDuck = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Whitespace normalization shared by fingerprint + exact dedup. */
  val normSpark = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
  val normDuck = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private val cache = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** `documents` + (`toks` array, `norm` text), computed once and cached. */
  def enriched(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(s).toString, dir),
      Tables.load(s, dir, "documents")
        .withColumn("toks", expr(toksSpark))
        .withColumn("norm", expr(normSpark))
        .cache())
}
