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

  /** `documents` + (`toks` array, `norm` text), computed once and cached. */
  def enriched(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "docs", dir) {
      Tables.load(s, dir, "documents")
        .withColumn("toks", expr(toksSpark))
        .withColumn("norm", expr(normSpark))
    }
}

/** Session-scoped DataFrame memo behind every per-corpus cache (docs,
  * shingles, bigrams, frames, cluster labels). Keyed by the session OBJECT
  * — identity-hash string keys could collide with a GC'd session and hand
  * back a DataFrame bound to a stopped context. Entries live for the
  * session (they ARE the session's materialized derived corpus) and are
  * dropped automatically when the session's SparkContext ends. The
  * listener fires on CONTEXT stop, not session close: a process cycling
  * many SparkSessions over one long-lived context still accumulates
  * per-session entries and should call clear() between sessions — only
  * the common one-context-per-process lifecycle is fully automatic.
  */
private[graft] object SessionCache {
  import org.apache.spark.sql.SparkSession
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val scalars =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Any]
  private val cleanups =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), () => Unit]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]

  // One end-of-application listener per session: when the underlying
  // context stops, every entry for that session is dropped (no unpersist —
  // the context's storage is gone with it; this releases the heap refs)
  // and registered companion cleanups run.
  private def hook(s: SparkSession): Unit =
    hooked.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          entries.keys.filter(_._1 eq s).foreach(entries.remove)
          degradedEntries.keys.filter(_._1 eq s).foreach(degradedEntries.remove)
          scalars.keys.filter(_._1 eq s).foreach(scalars.remove)
          buildTimes.keys.filter(_._1 eq s).foreach(buildTimes.remove)
          cleanups.keys.filter(_._1 eq s).toSeq
            .foreach(k => cleanups.remove(k).foreach(f => f()))
          hooked.remove(s)
        }
      })
      true
    })

  /** Wall-clock of every memo/memoVal build, keyed like the entry —
    * the r14 verdict's accounting fix: a one-time session-cache build
    * lands inside whichever query triggers it first, so Bench reports
    * these times on a separate `memo_builds` line and per-query values
    * become interpretable (value − its memo builds = the operator).
    */
  private val buildTimes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Double]

  private[graft] def buildLog(s: SparkSession): Seq[(String, Double)] =
    buildTimes.toSeq.collect { case ((ss, tag, dir), t) if ss eq s => (s"$tag@$dir", t) }

  def memo(s: SparkSession, tag: String, dir: String)(build: => DataFrame): DataFrame = {
    hook(s)
    entries.getOrElseUpdate((s, tag, dir), {
      val t0 = System.nanoTime()
      val df = build.cache()
      // Materialize the cache NOW so the recorded build time covers the
      // real work (cache() alone is lazy — the cost would otherwise hide
      // inside the first consumer's first action, unattributed). The first
      // consumer's full pass materialized every partition anyway.
      df.count()
      buildTimes.put((s, tag, dir), (System.nanoTime() - t0) / 1e9)
      df
    })
  }

  /** Driver-side SCALAR memo on the same session lifecycle — for corpus
    * metadata (e.g. the embeddings row count that sizes the blocked dedup
    * kernel) that would otherwise re-run a count job per invocation.
    */
  def memoVal[T](s: SparkSession, tag: String, dir: String)(build: => T): T = {
    hook(s)
    scalars.getOrElseUpdate((s, tag, dir), {
      val t0 = System.nanoTime()
      val v = build
      buildTimes.put((s, s"val:$tag", dir), (System.nanoTime() - t0) / 1e9)
      v
    }).asInstanceOf[T]
  }

  /** memo() that only RETAINS results `keep` accepts: a degraded build
    * (e.g. a transformer sweep run during an endpoint outage) is returned
    * to the caller — correct for THIS call — but only pinned for a short
    * TTL, so the next status call retries instead of serving the outage
    * forever, while a PERSISTENTLY degraded endpoint doesn't re-bill the
    * full sweep on every call within the window (ADVICE r9). Rejected and
    * race-losing frames are unpersisted — memoIf never strands a cache.
    */
  private val degradedEntries = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (DataFrame, Long)]
  private val DegradedTtlMs = 30000L

  def memoIf(s: SparkSession, tag: String, dir: String)(build: => DataFrame)(
      keep: DataFrame => Boolean): DataFrame = {
    hook(s)
    val key = (s, tag, dir)
    entries.get(key) match {
      case Some(df) => df
      case None =>
        val now = System.currentTimeMillis()
        degradedEntries.get(key) match {
          case Some((df, at)) if now - at < DegradedTtlMs => df
          case stale =>
            stale.foreach { case (df, _) => degradedEntries.remove(key); df.unpersist() }
            val df = build.cache()
            if (keep(df)) entries.putIfAbsent(key, df) match {
              case Some(winner) => df.unpersist(); winner
              case None => df
            }
            else degradedEntries.putIfAbsent(key, (df, now)) match {
              // mirror the entries race handling (ADVICE r10): a
              // concurrent degraded build for the same key must not be
              // overwritten-and-leaked — the loser unpersists its frame
              // and adopts the winner's
              case Some((winner, _)) => df.unpersist(); winner
              case None => df
            }
        }
    }
  }

  /** Expire every degraded-result memo NOW — the maintenance/test face of
    * the TTL (a production bgw loop's naptime plays the same role: the
    * next cycle past the window re-sweeps).
    */
  private[graft] def expireDegraded(): Unit = {
    val stale = degradedEntries.values.toSeq
    degradedEntries.clear()
    stale.foreach(_._1.unpersist())
  }

  /** Run `f` when this session's context ends — lets sibling driver-side
    * memos (e.g. trained centroids) share the same lifecycle instead of
    * re-growing their own never-evicted maps.
    */
  def onSessionEnd(s: SparkSession, tag: String)(f: => Unit): Unit = {
    hook(s)
    cleanups.putIfAbsent((s, tag), () => f)
  }

  /** Manual eviction for the many-sessions-per-context lifecycle: drops the
    * cached frames AND runs every registered companion cleanup (e.g. the
    * IVF centroid memo), so nothing session-pinned survives.
    */
  def clear(): Unit = {
    entries.values.foreach(_.unpersist())
    entries.clear()
    degradedEntries.values.foreach(_._1.unpersist())
    degradedEntries.clear()
    scalars.clear()
    buildTimes.clear()
    cleanups.keys.toSeq.foreach(k => cleanups.remove(k).foreach(f => f()))
  }
}
