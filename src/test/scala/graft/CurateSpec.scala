package graft

import org.apache.spark.sql.functions._

/** Specs for the curation composites, dedup clustering, link increment,
  * and int8 quantization added after round-2 close.
  */
class CurateSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("corpus_zipf_check: contiguous ranks, perfect head ratio, driver-side recount parity") {
    val rows = run("corpus_zipf_check").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L, s"rank gap at ${i + 1}") }
    val freqs = rows.map(_.getAs[Long]("freq"))
    freqs.zip(freqs.tail).foreach { case (a, b) => assert(a >= b, "freq not non-increasing") }
    assert(rows.head.getAs[Long]("zipf_ratio_micro") == 1000000L,
      "rank-1 ratio must be exactly 1e6 by construction")
    // full parity with a driver-side recount of the token stream
    val counts = graft.queries.Docs.enriched(spark, sfDir)
      .select(explode(col("toks")).as("t")).groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val expect = counts.sortBy { case (t, c) => (-c, t) }.take(50)
    val f1 = expect.head._2
    rows.zip(expect).zipWithIndex.foreach { case ((r, (t, c)), i) =>
      assert(r.getString(1) == t && r.getAs[Long]("freq") == c, s"rank ${i + 1} term/freq")
      assert(r.getAs[Long]("zipf_ratio_micro") ==
        (BigInt(c) * (i + 1) * 1000000 / f1).toLong, s"rank ${i + 1} ratio")
    }
  }

  test("dedup_cluster: canonical is the component min and pairs land in one cluster") {
    val assign = run("dedup_cluster").cache()
    // canonical id never exceeds the member id (min-label semantics)
    assert(assign.filter(col("canon_id") > col("doc_id")).count() == 0)
    // exactly one canonical member per cluster, and it labels itself
    val canons = assign.groupBy("canon_id").agg(
      sum("is_canonical").as("n_canon"), count(lit(1)).as("n"))
    assert(canons.filter(col("n_canon") =!= 1).count() == 0)
    assert(assign.filter(col("is_canonical") === 1 && col("doc_id") =!= col("canon_id")).count() == 0)
    // every near-dup pair's endpoints resolve to the same canonical doc
    val pairs = run("dedup_minhash_lsh").select("doc_a", "doc_b")
    val joined = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("canon_id").as("ca")), "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"), col("canon_id").as("cb")), "doc_b")
    assert(joined.filter(col("ca") =!= col("cb")).count() == 0)
    // clusters exist (the corpus plants near-dups) and sizes add up
    assert(assign.filter(col("cluster_size") > 1).count() > 0)
    val total = assign.count()
    assert(assign.groupBy("canon_id").count().agg(sum("count")).head.getLong(0) == total)
  }

  test("corpus_health: every metric equals its standalone derivation, signals non-zero") {
    val h = run("corpus_health").collect()
      .map(r => (r.getAs[String]("area"), r.getAs[String]("metric")) -> r.getAs[Long]("value")).toMap
    assert(h.size == 8)
    val docs = Tables.load(spark, sfDir, "documents")
    assert(h(("corpus", "n_docs")) == docs.count())
    assert(h(("corpus", "n_langs")) == docs.select("lang").distinct().count())
    assert(h(("dedup", "near_dup_pairs")) == run("dedup_minhash_lsh").count())
    assert(h(("dedup", "exact_dup_docs")) == docs.count() - run("dedup_exact").count())
    assert(h(("quality", "low_quality_docs")) ==
      run("text_quality").filter(col("quality_score") < 0.5).count())
    assert(h(("quality", "high_repetition_docs")) ==
      run("text_repetition").filter(col("flagged") === 1L).count())
    assert(h(("pii", "docs_with_pii")) ==
      run("text_pii_scrub").filter(col("n_emails") + col("n_phones") > 0).count())
    // a health report whose signals are all zero is hollow — the corpus
    // plants near-dups and the pii demo injection guarantees hits
    assert(h(("dedup", "near_dup_pairs")) > 0)
    assert(h(("pii", "docs_with_pii")) > 0)
    assert(h(("corpus", "n_tokens")) > h(("corpus", "n_docs")))
  }

  test("dedup_keep_best: one keeper per cluster, keeper maximizes quality, not min-id") {
    val kb = run("dedup_keep_best").collect()
    val clus = run("dedup_cluster").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon_id")).toMap
    assert(kb.length == clus.size) // every doc decided
    kb.foreach(r => assert(clus(r.getAs[Long]("doc_id")) == r.getAs[Long]("canon_id")))
    kb.groupBy(_.getAs[Long]("canon_id")).foreach { case (_, rs) =>
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length))
      val keepers = rs.filter(_.getAs[Long]("keep_ind") == 1L)
      assert(keepers.length == 1, "exactly one survivor per cluster")
      val k = keepers.head
      rs.foreach { m =>
        val cmp = java.lang.Double.compare(
          k.getAs[Double]("quality_score"), m.getAs[Double]("quality_score"))
        assert(cmp > 0 || (cmp == 0 && k.getAs[Long]("doc_id") <= m.getAs[Long]("doc_id")),
          s"keeper ${k.getAs[Long]("doc_id")} not quality-maximal in its cluster")
      }
    }
    // quality survivorship is a real decision, not min-id relabeled: some
    // multi-doc cluster keeps a doc that is NOT its canonical label
    assert(kb.exists(r => r.getAs[Long]("keep_ind") == 1L &&
      r.getAs[Long]("cluster_size") > 1 && r.getAs[Long]("doc_id") != r.getAs[Long]("canon_id")))
  }

  test("dedup_incremental: exactly the cross-split slice of the full pair set, never old-old") {
    val incr = run("dedup_incremental").collect()
    assert(incr.nonEmpty, "the corpus plants near-dups crossing the 20% batch split")
    // every returned pair crosses the split, oriented new-first
    incr.foreach { r =>
      assert(r.getAs[Long]("new_id") % 5 == 0 && r.getAs[Long]("old_id") % 5 != 0)
    }
    // restricting candidate generation to new↔old loses NOTHING: the
    // result is exactly the cross-split slice of the full self-join pass
    val expected = run("dedup_minhash_lsh").collect().flatMap { r =>
      val (a, b, j) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))
      if (a % 5 == 0 && b % 5 != 0) Some((a, b, j))
      else if (b % 5 == 0 && a % 5 != 0) Some((b, a, j))
      else None
    }.toSet
    val got = incr.map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id"),
      r.getAs[Double]("jaccard"))).toSet
    assert(got == expected)
  }

  test("pipeline_curate: kept docs pass every gate and survive exact dedup") {
    val kept = run("pipeline_curate").cache()
    assert(kept.count() > 0)
    assert(kept.filter(col("n_words") < 20 || col("quality_score") < 0.40 ||
      col("predicted_lang") === "unknown").count() == 0)
    val survivors = run("dedup_exact").select(col("survivor_doc_id").as("doc_id"))
    assert(kept.join(survivors, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("sample_stratified: bounded per stratum and reproducible") {
    val a = run("sample_stratified").cache()
    assert(a.groupBy("stratum").count().filter(col("count") > 10).count() == 0)
    // deterministic: a second run returns the identical sample
    val b = run("sample_stratified")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("emb_quantize: int8 range with the max element hitting +127") {
    val q = run("emb_quantize").cache()
    assert(q.filter(col("q_max") > 127 || col("q_min") < -128).count() == 0)
    // for every vector some element attains max|e|, so q_max = 127 or
    // q_min = -127/-128 (sign of the extremal element)
    assert(q.filter(col("q_max") === 127 || col("q_min") <= -127).count() == q.count())
  }

  test("text_lm_score: scaled conditional probabilities stay in [0, 1e6]") {
    val lm = run("text_lm_score").cache()
    // p_scaled = C(w1,w2)*1e6 div C(w1) <= 1e6, so the per-doc mean is too
    assert(lm.filter(col("lm_score") < 0 || col("lm_score") > 1000000L).count() == 0)
    assert(lm.filter(col("n_bigrams") <= 0).count() == 0)
    assert(lm.count() ==
      run("text_token_count").filter(col("n_words") >= 2).count())
  }

  test("pipeline_curate_full: every gate agrees with its standalone operator, keep is the product") {
    val full = run("pipeline_curate_full").cache()
    try {
      // one row per document, keep partitions the corpus
      assert(full.count() == Tables.load(spark, sfDir, "documents").count())
      assert(full.filter(col("keep") === 1).count() > 0)
      assert(full.filter(col("keep") === 0).count() > 0)
      // keep is exactly the conjunction of the seven gates
      assert(full.filter(col("keep") =!=
        col("not_benchmark") * col("pass_quality") * col("pass_lang") *
          col("exact_survivor") * col("neardup_survivor") *
          col("not_contaminated") * col("pii_clean")).count() == 0)
      // each gate agrees with the standalone operator it composes
      val fz = run("decontaminate_fuzzy").select(col("doc_id"), lit(1L).as("c"))
      assert(full.join(fz, Seq("doc_id"), "left")
        .filter((col("c").isNotNull && col("not_contaminated") === 1) ||
          (col("c").isNull && col("not_contaminated") === 0)).count() == 0)
      val inferior = run("dedup_minhash_lsh").select(col("doc_b").as("doc_id")).distinct()
        .withColumn("inf", lit(1L))
      assert(full.join(inferior, Seq("doc_id"), "left")
        .filter((col("inf").isNotNull && col("neardup_survivor") === 1) ||
          (col("inf").isNull && col("neardup_survivor") === 0)).count() == 0)
      val pii = run("text_pii_scrub")
      assert(full.join(pii, "doc_id")
        .filter((col("n_emails") + col("n_phones") === 0) =!= (col("pii_clean") === 1))
        .count() == 0)
      val pc = run("pipeline_curate").select(col("doc_id"), lit(1L).as("kept3"))
      // the three original gates embed unchanged: pipeline_curate's kept set
      // == docs passing quality+lang+exact here
      assert(full.join(pc, Seq("doc_id"), "left")
        .filter((col("kept3").isNotNull) =!=
          (col("pass_quality") === 1 && col("pass_lang") === 1 &&
            col("exact_survivor") === 1)).count() == 0)
    } finally full.unpersist()
  }

  test("decontaminate_fuzzy: jaccard recomputes exactly, exact cross-set copies always caught") {
    val fz = run("decontaminate_fuzzy").cache()
    try {
      assert(fz.count() >= 1, "fuzzy contamination signal is hollow at this SF")
      // strictly cross-set: corpus doc vs benchmark match
      assert(fz.filter(col("doc_id") < 40 || col("match_doc") >= 40).count() == 0)
      // every reported jaccard recomputes exactly from the raw shingle sets
      val sh = queries.Docs.enriched(spark, sfDir)
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks)-2), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2)))"))
          .as("s")).distinct()
      val involved = fz.select(col("doc_id")).union(fz.select(col("match_doc"))).distinct()
      val shSets = sh.join(involved, "doc_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
      fz.collect().foreach { r =>
        val (d, m, nc, nd, nb, j) = (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))
        val (sa, sb) = (shSets(d), shSets(m))
        assert(nc == (sa & sb).size && nd == sa.size && nb == sb.size)
        assert(j == nc.toDouble / (nd + nb - nc))
        assert(j >= 0.5)
      }
      // the guarantee: an exact cross-set copy collides in EVERY band, so
      // each corpus doc sharing a normalized text with a benchmark doc
      // MUST be reported with jaccard 1.0 — restricted to docs that HAVE
      // shingles (>= 3 tokens), the same precondition the pipeline applies
      val norm = queries.Docs.enriched(spark, sfDir)
        .filter(size(col("toks")) >= 3).select("doc_id", "norm")
      val exactCross = norm.filter(col("doc_id") >= 40)
        .join(norm.filter(col("doc_id") < 40).select(col("norm"), lit(1).as("hit")),
          "norm").select("doc_id").distinct()
      val missed = exactCross.join(fz.filter(col("jaccard") === 1.0), Seq("doc_id"), "left_anti")
      assert(missed.count() == 0, "an exact benchmark copy escaped fuzzy decontamination")
    } finally fz.unpersist()
  }

  test("decontaminate: benchmark docs excluded, flag consistent with hits") {
    val d = run("decontaminate").cache()
    assert(d.filter(col("doc_id") < 20).count() == 0)
    assert(d.filter(col("n_hits") > col("n_grams")).count() == 0)
    assert(d.filter((col("contaminated") === 1) =!= (col("n_hits") > 0)).count() == 0)
  }

  test("text_repetition: dup ratio bounded and flag consistent") {
    val r = run("text_repetition").cache()
    assert(r.filter(col("n_distinct") > col("n_grams")).count() == 0)
    assert(r.filter(col("dup_pct") < 0 || col("dup_pct") > 100).count() == 0)
    assert(r.filter((col("flagged") === 1) =!= (col("dup_pct") > 2)).count() == 0)
  }

  test("vocab_growth: cumulative vocabulary is monotone and totals match") {
    val v = run("vocab_growth").collect()
    assert(v.length > 1) // the bigram vocabulary must not saturate in one block
    val cum = v.map(_.getAs[Long]("cum_vocab"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b > a })
    assert(cum.last == v.map(_.getAs[Long]("new_units")).sum)
  }

  test("dv_link_incr: appended links are new relationships only") {
    val incr = run("dv_link_incr").cache()
    val o = Tables.load(spark, sfDir, "orders")
    val pre = o.filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
      .select(col("o_custkey").cast("string").as("o_custkey_bk"),
        col("o_orderkey").cast("string").as("o_orderkey_bk")).distinct()
    assert(incr.join(pre, Seq("o_custkey_bk", "o_orderkey_bk")).count() == 0)
    assert(incr.select("link_orders_hk").distinct().count() == incr.count())
    assert(incr.count() > 0)
    // the increment's hash keys must be the canonical link_orders keys —
    // a different bk part order would anti-join against nothing
    val canonical = SparkEntry.queries("dv_link_orders")(spark, sfDir)
      .select("link_orders_hk")
    assert(incr.select("link_orders_hk").except(canonical).count() == 0)
  }

  test("corpus_shards: two-phase prefix sum packs every token into budgeted shards") {
    import org.apache.spark.sql.functions._
    val shards = run("corpus_shards").cache()
    try {
      val budget = 2048L
      val docs = graft.queries.Docs.enriched(spark, sfDir)
        .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
      val totalDocs = docs.count()
      val totalToks = docs.agg(sum("n")).head.getLong(0)
      val maxDoc = docs.agg(max("n")).head.getLong(0)
      val rows = shards.collect()
      // conservation: every doc and every token lands in exactly one shard
      assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
      // shard ids are contiguous from zero
      assert(rows.map(_.getAs[Long]("shard_id")).sorted.sameElements(0L until rows.length))
      // every non-final shard holds ~budget tokens: its span is exactly
      // [k*B, (k+1)*B) in start positions, so only boundary docs can push
      // the sum off the budget by less than one document
      val nonFinal = rows.sortBy(_.getAs[Long]("shard_id")).dropRight(1)
      assert(nonFinal.forall { r =>
        val t = r.getAs[Long]("n_tokens"); t >= budget - maxDoc && t <= budget + maxDoc
      })
      // the bucketed two-phase prefix equals a naive single-window cumsum
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("b"), col("h"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val naive = docs
        .withColumn("h", graft.functions.GraftFunctions.md5Long64(col("doc_id").cast("string")))
        .withColumn("b", col("h") % 64)
        .withColumn("start", coalesce(sum("n").over(w), lit(0L)))
        .withColumn("shard_id", expr(s"start div $budget"))
        .groupBy("shard_id").agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      assert(naive.exceptAll(shards).isEmpty && shards.exceptAll(naive).isEmpty)
    } finally shards.unpersist()
  }

  test("corpus_pack: starts tile the token stream, spans consistent, shard parity") {
    val pack = run("corpus_pack").collect()
    assert(pack.nonEmpty)
    // the doc starts tile the global token stream with no gap or overlap:
    // sorted by start, every doc begins exactly where the previous ended
    val byStart = pack.sortBy(_.getAs[Long]("start"))
    assert(byStart.head.getAs[Long]("start") == 0L)
    byStart.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start") == a.getAs[Long]("start") + a.getAs[Long]("n_tokens"))
      case _ => ()
    }
    // span arithmetic is internally consistent
    val L = 2048L
    pack.foreach { r =>
      val (start, n) = (r.getAs[Long]("start"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("offset_in_seq") == start % L)
      assert(r.getAs[Long]("seq_first") == start / L)
      assert(r.getAs[Long]("seq_last") == (start + n - 1) / L)
      assert(r.getAs[Long]("n_seqs") == r.getAs[Long]("seq_last") - r.getAs[Long]("seq_first") + 1)
    }
    // mutual pin: seq_first IS corpus_shards' shard_id (same order, same
    // budget), so re-aggregating the pack map reproduces the shard table
    val reagg = pack.groupBy(_.getAs[Long]("seq_first")).map { case (s0, rs) =>
      s0 -> ((rs.length.toLong, rs.map(_.getAs[Long]("n_tokens")).sum))
    }
    val shards = run("corpus_shards").collect().map(r =>
      r.getAs[Long]("shard_id") -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(reagg == shards)
    // the packing is non-trivial: some doc crosses a sequence boundary
    assert(pack.exists(_.getAs[Long]("n_seqs") > 1))
  }

  test("corpus_pack_write: token conservation, full windows, idempotent re-append") {
    val first = run("corpus_pack_write").collect()
    assert(first.nonEmpty)
    // CONSERVATION: every kept token lands in exactly one sequence slot —
    // the sequence totals reproduce the span map's token mass
    val packTotal = run("corpus_pack").collect().map(_.getAs[Long]("n_tokens")).sum
    assert(first.map(_.getAs[Long]("n_tokens")).sum == packTotal)
    // doc-contiguous split packing fills every slot: all sequences carry
    // exactly 2048 tokens except (possibly) the last, and ids are the
    // contiguous range the span map promised
    val L = 2048L
    val ids = first.map(_.getAs[Long]("seq_id")).sorted
    assert(ids.head == 0L && ids.last == (packTotal - 1) / L)
    assert(ids.toSeq == (0L to ids.last))
    first.sortBy(_.getAs[Long]("seq_id")).init.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == L,
        s"sequence ${r.getAs[Long]("seq_id")} not full: ${r.getAs[Long]("n_tokens")}")
    }
    // n_docs agrees with the span map's per-sequence doc coverage
    val spanDocs = run("corpus_pack").collect().flatMap { r =>
      (r.getAs[Long]("seq_first") to r.getAs[Long]("seq_last")).map(_ -> r.getAs[Long]("doc_id"))
    }.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).distinct.length.toLong }
    first.foreach { r =>
      assert(r.getAs[Long]("n_docs") == spanDocs(r.getAs[Long]("seq_id")))
    }
    // INSERT-ONLY discipline: a second run anti-joins on seq_id and
    // appends nothing — same rows, same hashes
    val second = run("corpus_pack_write").collect()
    assert(second.map(r => (r.getAs[Long]("seq_id"), r.getAs[String]("seq_sha"))).sorted.toSeq ==
      first.map(r => (r.getAs[Long]("seq_id"), r.getAs[String]("seq_sha"))).sorted.toSeq)
    // the surfaced op plan is a read-back scan (eager build), so audit the
    // BUILD plan here the way GoSpec audits the vault builds: equi-joins
    // only (span map on doc_id), no cartesian/BNLJ
    val buildPlan = graft.queries.Curate.packedSeqBuild(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!buildPlan.contains("CartesianProduct"))
    assert(!buildPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus_pack_segments: windows tile contiguously, per-doc fragments match the span map") {
    val segs = run("corpus_pack_segments").collect()
    assert(segs.nonEmpty)
    val L = 2048L
    // each window's fragments tile it: first at 0, each next exactly where
    // the previous ended (this is also why ORDER BY seg_start is
    // deterministic — starts are unique within a window)
    val byWindow = segs.groupBy(_.getAs[Long]("seq_id"))
    byWindow.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("seg_idx"))
      assert(ordered.head.getAs[Long]("seg_start") == 0L)
      assert(ordered.map(_.getAs[Long]("seg_idx")).toSeq == (1L to ordered.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("seg_start") ==
            a.getAs[Long]("seg_start") + a.getAs[Long]("seg_len"))
        case _ => ()
      }
    }
    // window token mass reproduces the writer's reduction (2048 everywhere
    // but possibly the final window)
    val winTokens = run("corpus_pack_write").collect()
      .map(r => r.getAs[Long]("seq_id") -> r.getAs[Long]("n_tokens")).toMap
    byWindow.foreach { case (w, rs) =>
      assert(rs.map(_.getAs[Long]("seg_len")).sum == winTokens(w))
    }
    assert(byWindow.keySet == winTokens.keySet)
    // per-doc agreement with corpus_pack: fragment count == n_seqs, token
    // mass conserved, first fragment enters seq_first at offset_in_seq
    val pack = run("corpus_pack").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    segs.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      val p = pack(d)
      assert(rs.length.toLong == p.getAs[Long]("n_seqs"))
      assert(rs.map(_.getAs[Long]("seg_len")).sum == p.getAs[Long]("n_tokens"))
      val first = rs.minBy(_.getAs[Long]("seq_id"))
      assert(first.getAs[Long]("seq_id") == p.getAs[Long]("seq_first"))
      assert(first.getAs[Long]("seg_start") == p.getAs[Long]("offset_in_seq"))
      // fragments occupy consecutive windows, all full-width except the ends
      assert(rs.map(_.getAs[Long]("seq_id")).sorted.toSeq ==
        (p.getAs[Long]("seq_first") to p.getAs[Long]("seq_last")))
    }
    // non-trivial: some window holds >1 doc and some doc crosses a boundary
    assert(byWindow.exists(_._2.length > 1))
    assert(segs.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1))
  }

  test("corpus_mix: kept set is exactly the integer-threshold filter, binding lang survives whole") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        (graft.functions.GraftFunctions.md5Long64(col("doc_id").cast("string")) % 1048576L).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // recompute the thresholds independently with the same integer math
    val weights = Map("en" -> 40L, "zh" -> 25L, "de" -> 15L, "fr" -> 10L, "es" -> 10L)
    val cnts = docs.groupBy(_._2).map { case (l, d) => l -> d.size.toLong }
    val nTotal = cnts.map { case (l, c) => c * 100L / weights(l) }.min
    val thr = cnts.map { case (l, c) => l -> (nTotal * weights(l) / 100L) * 1048576L / c }
    val expected = docs.filter { case (_, l, h) => h < thr(l) }.map(_._1).toSet
    val kept = run("corpus_mix").collect().map(_.getLong(0)).toSet
    assert(kept == expected)
    // the binding lang's threshold saturates the hash space EXACTLY when
    // its weight divides cnt*100 (the floor chain is lossless then); in
    // general it sits within one hash-quantum of saturation
    val binding = cnts.minBy { case (l, c) => c * 100L / weights(l) }._1
    if (cnts(binding) * 100L % weights(binding) == 0L) {
      assert(thr(binding) == 1048576L)
      assert(docs.count(_._2 == binding) == kept.count(id => docs.exists(d => d._1 == id && d._2 == binding)))
    }
    assert(thr(binding) > 1048576L - 1048576L / cnts(binding) - 1L,
      s"binding $binding threshold ${thr(binding)} far from saturation")
    // the mixture really partitions: a strict subset overall, nonempty per lang
    assert(kept.nonEmpty && kept.size < docs.length)
    weights.keys.foreach { l =>
      assert(docs.exists(d => d._2 == l && kept(d._1)), s"no kept docs for $l") }
    // broadcast threshold join, no nested-loop anywhere
    val plan = run("corpus_mix").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("curate_prune_quality: per-source upper-median cut, kept scores dominate dropped") {
    val dq = graft.queries.Curate.docsQInt(spark, sfDir)
      .select("doc_id", "source", "q_int").cache()
    try {
      val kept = run("curate_prune_quality").cache()
      val all = dq.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val keptIds = kept.collect().map(_.getLong(0)).toSet
      all.groupBy(_._2).foreach { case (src, rows) =>
        val (k, d) = rows.partition(r => keptIds(r._1))
        // upper median: at least half of every source survives...
        assert(k.size >= (rows.size + 1) / 2, s"$src kept ${k.size}/${rows.size}")
        // ...and drops nothing exactly when the bottom score bucket holds
        // at least half the source (then the upper median IS the minimum)
        val nMin = rows.count(_._3 == rows.map(_._3).min)
        assert(d.nonEmpty || rows.size - nMin < (rows.size + 1) / 2,
          s"$src dropped nothing but bottom bucket holds only $nMin/${rows.size}")
        // the cut is clean: every kept score >= every dropped score
        if (d.nonEmpty) assert(k.map(_._3).min > d.map(_._3).max, s"$src cut not clean")
      }
      // scores are the micro-scaled integer quality: bounded by 10^6
      assert(dq.filter(col("q_int") < 0 || col("q_int") > 1000000L).count() == 0)
      kept.unpersist()
    } finally dq.unpersist()
  }

  test("corpus_source_stats: totals conserve the corpus, shares sum to ~1e6, mean bounded") {
    val st = run("corpus_source_stats").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(st.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val shareSum = st.map(_.getAs[Long]("share_micros")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - st.length, s"share sum $shareSum")
    // per-source doc counts match a direct groupBy, means sit inside [0, 1e6]
    val direct = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    st.foreach { r =>
      assert(r.getAs[Long]("n_docs") == direct(r.getAs[String]("source")))
      val m = r.getAs[Long]("mean_q_micros")
      assert(m > 0L && m < 1000000L)
      assert(r.getAs[Long]("n_tokens") > r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
    // the mixture signal is real: sources differ in mean quality
    assert(st.map(_.getAs[Long]("mean_q_micros")).distinct.length > 1)
  }

  test("corpus_length_hist: buckets partition the corpus, shares and totals conserve") {
    val h = run("corpus_length_hist").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(h.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = docs
      .select(expr(s"cast(size(${queries.Docs.toksSpark}) as bigint)").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(h.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    val ds = h.map(_.getAs[Long]("doc_share_micros")).sum
    assert(ds <= 1000000L && ds > 1000000L - h.length)
    // buckets are genuine power-of-two lower bounds and the corpus spreads
    h.foreach(r => assert(Seq(0L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L, 4096L)
      .contains(r.getAs[Long]("bucket_lo"))))
    assert(h.length >= 3, "length distribution collapsed to fewer than 3 buckets")
  }

  test("dedup_threshold_curve: bins re-derive exactly, cum at bin>=6 equals the tau=0.6 op") {
    val curve = run("dedup_threshold_curve").collect()
      .map(r => r.getAs[Long]("bin_decile") -> (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_pairs_ge"))).toMap
    val jaccards = queries.Dedup.scoredCandidatePairs(spark, sfDir)
      .select("jaccard").collect().map(_.getDouble(0))
    val expected = jaccards.groupBy(j => math.floor(j * 10).toLong).view.mapValues(_.length.toLong).toMap
    assert(curve.view.mapValues(_._1).toMap == expected)
    // cumulative-from-top arithmetic
    curve.foreach { case (b, (_, ge)) =>
      assert(ge == expected.filter(_._1 >= b).values.sum)
    }
    // tau = 0.6 cutoff consistency: pairs in bins >= 6 ARE the minhash op's output
    val opCount = run("dedup_minhash_lsh").count()
    assert(expected.filter(_._1 >= 6L).values.sum == opCount)
    // the curve genuinely separates: candidates exist below the threshold too
    assert(expected.keys.exists(_ < 6L), "no sub-threshold candidates — curve degenerate")
  }

  test("corpus_token_budget: selection is the exact greedy prefix under the 30% budget") {
    val rows = SparkEntry.queries("corpus_token_budget")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("q_int"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("selected")))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    // cum_tokens really is the inclusive prefix sum in (q desc, doc_id) order
    val ranked = rows.sortBy { case (id, q, _, _, _) => (-q, id) }
    var cum = 0L
    ranked.foreach { case (id, _, n, c, _) =>
      cum += n
      assert(c == cum, s"doc $id: cum_tokens $c != recomputed $cum")
    }
    // selection = the exact greedy prefix: selected iff cum*1000 <= total*300,
    // so the selected set is a PREFIX of the ranking and maximal under the budget
    rows.foreach { case (id, _, _, c, sel) =>
      assert(sel == (if (c * 1000L <= total * 300L) 1L else 0L), s"doc $id selection wrong")
    }
    val sel = ranked.takeWhile { case (_, _, _, c, _) => c * 1000L <= total * 300L }
    assert(sel.nonEmpty && sel.length < rows.length, "degenerate budget: all or nothing selected")
    assert(sel.map(_._3).sum * 1000L <= total * 300L)
    // maximality: the next-ranked doc would blow the budget
    val next = ranked(sel.length)
    assert((sel.map(_._3).sum + next._3) * 1000L > total * 300L)
  }

  test("corpus_epoch_plan: integer epoch math re-derives from raw token counts") {
    val plan = SparkEntry.queries("corpus_epoch_plan")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // independent re-derivation: per-lang whitespaceish token counts
    val avail = Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        expr("cast(size(filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')) as bigint)").as("n"))
      .groupBy("lang").agg(sum("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = avail.values.sum
    assert(plan.keySet == avail.keySet, s"langs: ${plan.keySet} vs ${avail.keySet}")
    plan.foreach { case (lang, r) =>
      val av = r.getAs[Long]("avail_tokens")
      val tg = r.getAs[Long]("target_tokens")
      val ep = r.getAs[Long]("full_epochs")
      val rp = r.getAs[Long]("residual_permille")
      val pl = r.getAs[Long]("planned_tokens")
      val df = r.getAs[Long]("deficit_tokens")
      assert(av == avail(lang), s"$lang avail $av != ${avail(lang)}")
      // the exact integer plan, recomputed driver-side
      val wt = Map("en" -> 40L, "zh" -> 25L, "de" -> 15L, "fr" -> 10L, "es" -> 10L)(lang)
      assert(tg == total * 2 * wt / 100, s"$lang target")
      assert(ep == math.min(4L, tg / av), s"$lang epochs")
      val expRp = if (ep < 4) math.min(1000L, (tg - ep * av) * 1000 / av) else 0L
      assert(rp == expRp, s"$lang residual $rp != $expRp")
      assert(pl == ep * av + av * rp / 1000 && df == tg - pl, s"$lang planned/deficit")
      // plan invariants: never over-serves, repetition capped, residual a rate
      assert(pl <= tg && df >= 0 && ep <= 4 && rp >= 0 && rp <= 1000)
      assert(pl <= 4 * av + av, s"$lang plan exceeds the repetition cap class")
    }
    // non-hollow: the gate corpus genuinely differentiates languages
    val eps = plan.values.map(_.getAs[Long]("full_epochs")).toSet
    assert(eps.size > 1, s"every language planned the same epochs ($eps) — hollow signal")
  }
}
