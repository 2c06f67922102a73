package graft

import org.apache.spark.sql.functions._

/** Specs for the exact-substring duplication ops and the corpus n-gram
  * statistics (Spans module). The substring check is semantic, not
  * structural: a reported span is re-verified by actually slicing both
  * documents' token arrays and comparing them.
  */
class SpansSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def toksOf: Map[Long, Seq[String]] =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(queries.Docs.toksSpark).as("toks"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[String]]("toks").toVector)
      .toMap

  test("dedup_substring: every reported span is a real exact token-slice match") {
    val spans = run("dedup_substring").collect()
    assert(spans.nonEmpty)
    val toks = toksOf
    spans.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val n = r.getAs[Long]("span_tokens").toInt
      val (sa, sb) = (r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      assert(n >= 20, s"span below MinSpan for ($a,$b)")
      val sliceA = toks(a).slice(sa - 1, sa - 1 + n)
      val sliceB = toks(b).slice(sb - 1, sb - 1 + n)
      assert(sliceA == sliceB && sliceA.length == n,
        s"reported span ($a,$b,$sa,$sb,$n) is not an exact token match")
    }
  }

  test("dedup_substring: reported span is MAXIMAL (extending either end breaks the match)") {
    val spans = run("dedup_substring").collect()
    val toks = toksOf
    spans.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val n = r.getAs[Long]("span_tokens").toInt
      val (sa, sb) = (r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      val (ta, tb) = (toks(a), toks(b))
      // one token earlier on both sides must mismatch (or run off an edge)
      val leftExtends = sa >= 2 && sb >= 2 && ta(sa - 2) == tb(sb - 2)
      val rightExtends = sa - 1 + n < ta.length && sb - 1 + n < tb.length &&
        ta(sa - 1 + n) == tb(sb - 1 + n)
      assert(!leftExtends, s"span ($a,$b) extends left")
      assert(!rightExtends, s"span ($a,$b) extends right")
    }
  }

  test("dedup_span_mask: intervals are disjoint, sorted, in-bounds, and cover exactly the victim spans") {
    val mask = run("dedup_span_mask").collect()
    assert(mask.nonEmpty)
    val toks = toksOf
    // disjoint + sorted per doc, and inside the document
    mask.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rows) =>
      val iv = rows.map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).sortBy(_._1)
      iv.foreach { case (s, e) =>
        assert(s >= 1 && e <= toks(d).length && s <= e, s"interval out of bounds for doc $d")
      }
      iv.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 > e1, s"overlapping mask intervals in doc $d")
        case _ =>
      }
    }
    // the mask is exactly the merged victim-side runs: re-derive driver-side
    val runs = queries.Spans.spanRuns(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_b"), r.getAs[Long]("start_b"),
        r.getAs[Long]("start_b") + r.getAs[Long]("span_tokens") - 1))
    val expected = runs.groupBy(_._1).flatMap { case (d, rs) =>
      val sorted = rs.map(t => (t._2, t._3)).distinct.sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((ps, pe) :: tail), (s, e)) =>
          if (s <= pe) (ps, math.max(pe, e)) :: tail else (s, e) :: acc
        case (Nil, (s, e)) => List((s, e))
      }.reverse
      merged.map { case (s, e) => (d, s, e) }
    }.toSet
    val got = mask.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    assert(got == expected, "mask differs from driver-side interval merge")
  }

  test("corpus_ngrams: ranks consecutive, tf ordered and consistent with a direct count") {
    val top = run("corpus_ngrams").collect()
    assert(top.length == 50)
    assert(top.map(_.getAs[Long]("rank")).toSeq == (1L to 50L))
    val tfs = top.map(_.getAs[Long]("tf")).toSeq
    assert(tfs == tfs.sortBy(-_), "tf not non-increasing by rank")
    top.foreach(r => assert(r.getAs[Long]("tf") >= r.getAs[Long]("df")))
    // spot-check the head gram against an independent direct count
    val head = top.head
    val direct = Tables.load(spark, sfDir, "documents")
      .select(expr(queries.Docs.toksSpark).as("toks"))
      .select(explode(expr(
        "transform(sequence(1, greatest(size(toks)-2, 0)), k -> concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2)))")).as("g"))
      .filter(col("g") === head.getAs[String]("gram")).count()
    assert(direct == head.getAs[Long]("tf"))
  }
}
