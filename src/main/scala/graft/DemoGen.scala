package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demonstration-corpus generators (r9, verdict #5). The driver's
  * testdata is read-only AND adversarial for two operator families by
  * construction: its embeddings are near-orthogonal (exact top-3 cosine
  * 0.33-0.42 — no index can prune noise, so ann_cosine_ivf's honest
  * operating point scans half the corpus), and its documents share one
  * vocabulary across language labels (so bpe_fertility's cross-language
  * gap is flat). Neither is an operator defect, but neither lets the
  * operator DEMONSTRATE its value. These generators produce the corpora
  * that do — deterministic (md5-derived, no RNG), schema-identical to the
  * testdata tables, consumed by IvfClusteredSpec / BpeMultilingualSpec
  * and by tools/ivf_sweep.py pointed at the generated dir.
  *
  *   sbt "runMain graft.DemoGen /tmp/graft_demo"
  */
object DemoGen {

  /** Planted-cluster embeddings: `n` vectors in `c` clusters, dim 64.
    * Centroid components are uniform[-1,1] (md5 of (cluster, dim)); each
    * vector adds per-(vec, dim) uniform noise scaled by `sigma`. At
    * sigma 0.55 the expected intra-cluster cosine is ~0.75 and the
    * inter-cluster cosine ~0 — real neighbor structure, the production
    * ANN shape. Schema matches testdata embeddings exactly
    * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT = planted cluster).
    */
  def clusteredEmbeddings(s: SparkSession, n: Long, c: Int, sigma: Double = 0.55): DataFrame = {
    def u(tag: String, of: String) = // deterministic uniform in [-1, 1]
      s"(pmod(cast(conv(substring(md5(concat('$tag', $of, '_', d)), 1, 8), 16, 10) as bigint), 2001) - 1000) / 1000.0"
    s.range(n).selectExpr(
      "id as vec_id",
      s"""transform(sequence(1, 64), d -> cast(
         |  ${u("cent_", s"id % $c")} + $sigma * ${u("nz_", "id")}
         |as float)) as embedding""".stripMargin,
      s"cast(id % $c as int) as label")
  }

  /** Multilingual documents with per-language vocabularies AND
    * per-language word lengths: language `i` draws from its own pool of
    * `8 * 4^i` distinct words of `3 * (i + 1)` characters. A BPE trained
    * on the mix spends its merge budget where pairs are frequent, so
    * tokens-per-word (fertility) genuinely differs by language — the
    * fairness signal the flat shared-vocab testdata cannot show. Schema
    * matches testdata documents (doc_id, text, lang, source, n_chars).
    */
  def multilingualDocs(s: SparkSession, docsPerLang: Int = 100): DataFrame = {
    import s.implicits._
    val syll = Vector("ba", "de", "ki", "mo", "ru", "ta", "ne", "po", "si", "lu",
      "va", "go", "fe", "zi", "ch", "qu")
    def h(parts: Any*): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString("_").getBytes("UTF-8"))
      math.abs(((md(0) & 0xff) << 24) | ((md(1) & 0xff) << 16) | ((md(2) & 0xff) << 8) | (md(3) & 0xff))
    }
    val langs = Seq("aa", "bb", "cc", "dd")
    def word(lang: String, li: Int, w: Int): String = {
      val vocab = 8 * math.pow(4, li).toInt
      val widx = h("w", lang, w) % vocab
      val nSyll = (3 * (li + 1) + 1) / 2 // ~3*(i+1) chars at 2 chars/syllable
      (0 until nSyll).map(p => syll(h("s", lang, widx, p) % syll.length)).mkString
    }
    val rows = for {
      (lang, li) <- langs.zipWithIndex
      d <- 0 until docsPerLang
    } yield {
      val nWords = 30 + h("n", lang, d) % 21
      val text = (0 until nWords).map(p => word(lang, li, h("p", lang, d, p))).mkString(" ")
      (li.toLong * 1000000L + d, text, lang, "demo", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    clusteredEmbeddings(spark, 20000L, 32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    multilingualDocs(spark)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[demogen] wrote clustered embeddings + multilingual documents to $out")
    spark.stop()
  }
}
