package graft

import org.apache.spark.sql.functions._

/** BPE tokenizer training/application: the distributed trainer must equal
  * the classic sequential algorithm exactly — merge trajectory, greedy
  * left-to-right application, and per-doc token counts.
  */
class BpeSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** Classic sequential BPE on (word -> count), the textbook reference. */
  private def referenceBpe(words: Map[String, Long], steps: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, Seq[String]] = words.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (k <- 1 to steps) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1)); pc(key) = pc.getOrElse(key, 0L) + words(w)
        }
      }
      val ((l, r), c) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      merges += ((k, l, r, c))
      vocab = vocab.map { case (w, syms) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> out.toSeq
      }
    }
    (merges.toSeq, vocab)
  }

  private lazy val corpusWords: Map[String, Long] =
    Tables.load(spark, sfDir, "documents")
      .select(explode(expr(graft.queries.Docs.toksSpark)).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("bpe_train reproduces the sequential reference trajectory") {
    val (expected, _) = referenceBpe(corpusWords, queries.Bpe.Merges)
    val got = run("bpe_train").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expected)
    // merged column is lhs || rhs
    assert(run("bpe_train").filter(col("merged") =!= concat(col("lhs"), col("rhs")))
      .count() == 0)
  }

  test("fold expression applies merges greedily left-to-right (aaa + (a,a) -> [aa, a])") {
    import spark.implicits._
    val got = Seq("a a a", "a b a b", "x a b y", "a", "b a").toDF("syms")
      .select(col("syms"), expr(queries.Bpe.foldSpark("a", "b")).as("ab"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a b a b") == "ab ab")
    assert(got("x a b y") == "x ab y")
    assert(got("a") == "a")
    assert(got("b a") == "b a")
    val aa = Seq("a a a").toDF("syms")
      .select(expr(queries.Bpe.foldSpark("a", "a"))).head.getString(0)
    assert(aa == "aa a")
  }

  test("bpe_tokenize equals the reference tokenizer on every document") {
    val (_, vocabF) = referenceBpe(corpusWords, queries.Bpe.Merges)
    val wordLen = vocabF.map { case (w, syms) => w -> syms.size.toLong }
    val expected = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(graft.queries.Docs.toksSpark).as("toks")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).map(wordLen).sum).toMap
    val got = run("bpe_tokenize").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // conservation bounds: merges only shrink, tokens >= words
    val joined = run("bpe_tokenize").join(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), size(expr(graft.queries.Docs.toksSpark)).as("n_words"),
          length(col("text")).as("n_chars")), "doc_id")
    assert(joined.filter(col("n_tokens_bpe") < col("n_words") ||
      col("n_tokens_bpe") > col("n_chars")).count() == 0)
  }

  test("training stops early when the vocabulary exhausts, without crashing") {
    import spark.implicits._
    // only one merge is learnable: 'ab' contributes pair (a,b) once; after
    // merging, every word is a single symbol and pair counts go empty
    val dir = java.nio.file.Files.createTempDirectory("bpe_tiny").toString
    Seq((0L, "a b ab", "en", "src0", 6L), (1L, "a b a", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (merges, vocabF) = queries.Bpe.trained(spark, dir)
    assert(merges.size == 1 && merges.size < queries.Bpe.Merges)
    assert(merges.head.lhs == "a" && merges.head.rhs == "b" && merges.head.pc == 1L)
    // the final vocab is the fully-merged state, not an annihilated frame
    val syms = vocabF.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(syms == Map("a" -> "a", "b" -> "b", "ab" -> "ab"))
    // and the registered ops run end-to-end on the degenerate corpus
    assert(SparkEntry.queries("bpe_train")(spark, dir).count() == 1)
    assert(SparkEntry.queries("bpe_tokenize")(spark, dir).count() == 2)
  }

  test("bpe_tokenize plan: vocab arrives as a broadcast join, no shuffle on word") {
    val plan = run("bpe_tokenize").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bpe_fertility: conserves bpe_tokenize totals, exact integer fertility") {
    val f = SparkEntry.queries("bpe_fertility")(spark, sfDir).collect()
    assert(f.length == 5)
    f.foreach { r =>
      assert(r.getAs[Long]("fertility_milli") ==
        r.getAs[Long]("n_bpe_tokens") * 1000 / r.getAs[Long]("n_words"))
      // BPE genuinely splits words (fertility > 1 token/word)
      assert(r.getAs[Long]("fertility_milli") > 1000L)
    }
    // language totals conserve the corpus-wide tokenization
    val totalBpe = SparkEntry.queries("bpe_tokenize")(spark, sfDir)
      .agg(sum("n_tokens_bpe")).head.getLong(0)
    assert(f.map(_.getAs[Long]("n_bpe_tokens")).sum == totalBpe)
    val totalWords = Tables.load(spark, sfDir, "documents")
      .select(expr(s"cast(size(${"filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"}) as bigint)").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(f.map(_.getAs[Long]("n_words")).sum == totalWords)
  }
}
