package graft

import graft.queries.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  private def run(name: String) = Text.defs.find(_.name == name).get.run(spark, sfDir)

  test("token counts are positive and bpe >= words") {
    val df = run("text_token_count")
    assert(df.filter(col("n_words") <= 0).count() == 0)
    assert(df.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
  }

  test("text_char_diversity: exact integer stats match a driver-side histogram") {
    val df = run("text_char_diversity")
    val docs = Tables.load(spark, sfDir, "documents")
    assert(df.count() == docs.filter(length(col("text")) > 0).count())
    // re-derive every column from a plain Scala char histogram on a slice
    val texts = docs.orderBy("doc_id").limit(25).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = df.filter(col("doc_id").isin(texts.keys.toSeq: _*)).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val hist = text.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = text.length.toLong
      val r = got(id)
      assert(r.getLong(1) == n, s"doc $id n_chars_t")
      assert(r.getLong(2) == hist.size.toLong, s"doc $id distinct_chars")
      assert(r.getLong(3) == hist.values.map(c => c * c).sum * 1000000L / (n * n),
        s"doc $id collision_micro")
      assert(r.getLong(4) == hist.values.max * 100L / n, s"doc $id top_char_pct")
      assert(r.getLong(5) == (if (r.getLong(4) >= 30L || r.getLong(2) < 10L) 1L else 0L),
        s"doc $id flagged")
    }
    // uniform word-soup corpus: a lower collision than any single-char
    // flood (1e6) and the space char dominating below the flag threshold
    assert(df.filter(col("collision_micro") >= 1000000L).count() == 0)
  }

  test("quality score in [0,1]") {
    val df = run("text_quality")
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("lang_id emits a prediction for every doc") {
    val df = run("text_lang_id")
    assert(df.filter(col("predicted_lang").isNull).count() == 0)
    assert(df.count() == Tables.load(spark, sfDir, "documents").count())
  }

  test("corpus is single-byte text (the multimodal oracle's encoding assumption)") {
    // the DuckDB twins index text by CHARACTER while the Spark side works
    // on payload BYTES — Multimodal's scaladoc pins this to an ASCII corpus
    val docs = Tables.load(spark, sfDir, "documents")
    assert(docs.filter(length(col("text")) =!= octet_length(col("text"))).count() == 0)
  }

  test("multimodal: REAL PNG encode→decode round-trips bit-exactly; resize + frames hold") {
    import graft.queries.Multimodal._
    // r12 verdict #4: the decode path exercises real bytes. Encode→decode
    // bit-parity over adversarial payloads: empty (space-guarded), one
    // char, exact-raster-length, cycling, and multi-KB.
    val cases = Seq("", "x", "a" * 200, "The quick brown fox! 123", "qz" * 4000)
    cases.foreach { t =>
      val bytes = payloadBytes(t)
      val n = bytes.length
      val expW = 8 + n % PngWMod
      val expH = 8 + ((n.toLong * 7) % PngHMod).toInt
      val expected = Array.tabulate(expW * expH)(i => bytes(i % n))
      val payload = pngEncode(t)
      // real PNG magic on the wire
      assert(payload.take(4).map(b => f"${b & 0xff}%02X").mkString == "89504E47")
      val (w, h, raster, fmt) = pngDecode(payload)
      assert(fmt == "png", s"JDK reader identified '$fmt'")
      assert(w == expW && h == expH, s"dims ($w,$h) != ($expW,$expH) for n=$n")
      assert(java.util.Arrays.equals(raster, expected),
        s"decoded raster diverges from the encoded bytes (n=$n)")
    }
    // nearest-neighbor resample: known 4×2 → 2×1 picks floor-division sources
    val (w2, h2, small) = nearestResize(4, 2, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 2, 1)
    assert(w2 == 2 && h2 == 1 && small.toSeq == Seq[Byte](1, 3))
    // and a resized re-encode round-trips too (the mm_resize pipeline body)
    val reenc = pngEncodeRaster(2, 1, Array[Byte](9, 10))
    val (rw, rh, rr, rfmt) = pngDecode(reenc)
    assert(rw == 2 && rh == 1 && rr.toSeq == Seq[Byte](9, 10) && rfmt == "png")
    val frames = sampleFrames(DocBlob(7, ("x" * 200).getBytes("UTF-8"))).toSeq
    assert(frames.map(_.offset) == Seq(0, 64, 128))
    assert(frames.map(_.frame_no) == Seq(0, 1, 2))
    // the end-to-end operators decode real bytes on every row: dimensions
    // within the derivation range, the bounding box honored, the pixel sha
    // equal to an ImageIO-FREE recomputation from the text (so a decoder
    // that returned anything but the true raster would fail here)
    val meta = SparkEntry.queries("mm_meta_extract")(spark, sfDir).collect()
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(meta.length == texts.size)
    meta.foreach { r =>
      val bytes = payloadBytes(texts(r.getAs[Long]("doc_id")))
      val exp = Array.tabulate(r.getAs[Int]("width") * r.getAs[Int]("height"))(
        i => bytes(i % bytes.length))
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(exp).map(b => f"$b%02x").mkString
      assert(r.getAs[String]("pixel_sha") == sha,
        s"doc ${r.getAs[Long]("doc_id")}: decoded pixel sha diverges from the text-derived raster")
      assert(r.getAs[String]("magic_hex") == "89504E47" && r.getAs[String]("format") == "png")
    }
    val resized = SparkEntry.queries("mm_resize")(spark, sfDir)
    assert(resized.filter(col("width") > ResizeMaxW || col("height") > ResizeMaxH).count() == 0)
    assert(resized.count() == texts.size)
    // the box bites at this SF (some docs shrink) AND some pass untouched —
    // a scale formula stuck at 1.0 or always-shrinking would be hollow
    val joined = resized.select(col("doc_id"), col("width").as("w2"))
      .join(SparkEntry.queries("mm_meta_extract")(spark, sfDir)
        .select(col("doc_id"), col("width").as("w1")), "doc_id")
    assert(joined.filter(col("w2") < col("w1")).count() > 0)
    assert(joined.filter(col("w2") === col("w1")).count() > 0)
  }

  test("dedup_exact: survivors <= docs, copies sum to docs") {
    val df = run("dedup_exact")
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() <= docs)
    val total = df.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == docs)
  }

  test("text_boilerplate: counts recompute from the df>=5 gram set and the signal partitions") {
    val bp = SparkEntry.queries("text_boilerplate")(spark, sfDir).cache()
    try {
      // bounds: the boilerplate subset never exceeds the doc's gram set
      assert(bp.filter(col("n_boiler") > col("n_grams") ||
        col("boiler_micros") < 0 || col("boiler_micros") > 1000000L).count() == 0)
      // independent recomputation: distinct 3-grams, df over docs, df >= 5
      val sh = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), expr(graft.queries.Docs.toksSpark).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(toks)-2), k -> " +
            "concat_ws(' ', element_at(toks,k), element_at(toks,k+1), element_at(toks,k+2))))"))
          .as("gram"))
      val boiler = sh.groupBy("gram").count().filter(col("count") >= 5).select("gram")
      val expected = sh.join(boiler, "gram").groupBy("doc_id")
        .agg(count(lit(1)).as("exp_boiler"))
      val cmp = bp.join(expected, Seq("doc_id"), "left")
        .withColumn("exp_boiler", coalesce(col("exp_boiler"), lit(0L)))
      assert(cmp.filter(col("n_boiler") =!= col("exp_boiler")).count() == 0)
      // the signal is non-degenerate at this SF: both flagged and clean docs
      assert(bp.filter(col("n_boiler") > 0).count() > 0)
      assert(bp.filter(col("n_boiler") === 0).count() > 0)
    } finally bp.unpersist()
  }

  test("text_pii_scrub: counts follow the injection schedule, redaction is clean") {
    val out = SparkEntry.queries("text_pii_scrub")(spark, sfDir).cache()
    try {
      // detection exactly matches the deterministic injection schedule
      assert(out.filter((col("doc_id") % 5 === 0) && col("n_emails") =!= 1).count() == 0)
      assert(out.filter((col("doc_id") % 5 =!= 0) && col("n_emails") =!= 0).count() == 0)
      assert(out.filter((col("doc_id") % 7 === 0) && col("n_phones") =!= 1).count() == 0)
      assert(out.filter((col("doc_id") % 7 =!= 0) && col("n_phones") =!= 0).count() == 0)
      // non-hollow: the corpus splits into PII and clean docs both ways
      assert(out.filter(col("n_emails") === 1).count() > 0)
      assert(out.filter(col("n_emails") === 0).count() > 0)
      // redaction leaves no live pattern behind: rebuild the redacted text
      // with the same expressions and re-scan it
      val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val phoneRe = "555-[0-9]{4}"
      val redacted = Tables.load(spark, sfDir, "documents")
        .withColumn("inj", concat(col("text"),
          when(col("doc_id") % 5 === 0, concat(lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today"))).otherwise(lit(""))))
        .withColumn("red", regexp_replace(regexp_replace(col("inj"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      assert(redacted.filter(regexp_count(col("red"), lit(emailRe)) > 0 ||
        regexp_count(col("red"), lit(phoneRe)) > 0).count() == 0)
      // and the planted tokens really do appear pre-redaction
      assert(redacted.filter(col("red").contains("<EMAIL>")).count() ==
        out.filter(col("n_emails") === 1).count())
    } finally out.unpersist()
  }

  test("text_lang_confusion: conserves the corpus, shares sum per lang, zh never self-predicts") {
    val cm = SparkEntry.queries("text_lang_confusion")(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(cm.map(_.getAs[Long]("n_docs")).sum == docs.count())
    cm.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val s = rows.map(_.getAs[Long]("share_micros")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$lang share sum $s")
    }
    // signal: zh has no stopword list, so it can never be predicted 'zh' —
    // the matrix MUST show it as misclassified (that is what QA would flag)
    assert(!cm.exists(r => r.getAs[String]("lang") == "zh" &&
      r.getAs[String]("predicted_lang") == "zh"))
    assert(cm.exists(r => r.getAs[String]("lang") == "zh" && r.getAs[Long]("n_docs") > 0))
    // and the diagonal is non-trivial somewhere (the classifier does work)
    assert(cm.exists(r => r.getAs[Long]("is_correct") == 1L && r.getAs[Long]("share_micros") > 500000L))
    cm.foreach(r => assert((r.getAs[String]("lang") == r.getAs[String]("predicted_lang")) ==
      (r.getAs[Long]("is_correct") == 1L)))
  }
}
