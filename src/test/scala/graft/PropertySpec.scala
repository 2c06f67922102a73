package graft

import graft.dv.DvPlanner
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the deterministic primitives the oracle parity
  * depends on: the engine-side expressions must agree with their
  * driver-side (plain-JVM) definitions on arbitrary inputs.
  */
class PropertySpec extends SparkSpec {

  private def md5Long64Jvm(x: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def sha256Jvm(x: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  /** sample() is Option-typed and can transiently fail under suchThat
    * filters — retry so the specs never flake on generator luck.
    */
  private def sampleOf[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  test("md5Long64 expression equals the JVM-side derivation on arbitrary tokens") {
    import spark.implicits._
    val samples = sampleOf(Gen.listOfN(200, token)).distinct
    val fromSpark = samples.toDF("t")
      .select(col("t"), GraftFunctions.md5Long64(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(t => assert(fromSpark(t) == md5Long64Jvm(t), s"mismatch for '$t'"))
  }

  test("dvHash equals sha256 of comma-joined parts, with null -> empty") {
    import spark.implicits._
    val samples = sampleOf(Gen.listOfN(100, Gen.zip(token, Gen.option(token))))
    // dvHash carries BINARY(32) (r12); the hex edge must render the exact
    // reference contract, and the binary form must BE those bytes
    val fromSpark = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        lower(hex(GraftFunctions.dvHash(Seq(col("a"), col("b"))))).as("h"),
        GraftFunctions.dvHashHex(Seq(col("a"), col("b"))).as("hx"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))) -> (r.getString(2), r.getString(3)))
      .toMap
    samples.foreach { case (a, b) =>
      val (h, hx) = fromSpark((a, b))
      assert(h == sha256Jvm(s"$a,${b.getOrElse("")}"))
      assert(hx == h, "binary and hex dvHash forms diverge")
    }
  }

  test("interval-join time binning finds exactly the direct window pairs") {
    // the range_join_events decomposition: a [t-W, t) window spans at most
    // two W-wide bins, so binned candidates ⊇ window pairs, and the exact
    // filter recovers equality — checked on arbitrary timestamps, not just
    // the events corpus
    import spark.implicits._
    val W = 600000L
    val ts = Gen.chooseNum(0L, 10L * W)
    val probes = sampleOf(Gen.listOfN(60, ts)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val events = sampleOf(Gen.listOfN(200, ts)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = probes.toDF("pid", "pt")
      .withColumn("bin", explode(array_distinct(array(
        expr(s"(pt - $W) div $W"), expr(s"pt div $W")))))
    val e = events.toDF("eid", "vt").withColumn("bin", expr(s"vt div $W"))
    val binned = p.join(e, Seq("bin"))
      .filter(col("vt") >= col("pt") - W && col("vt") < col("pt"))
      .select("pid", "eid").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = (for {
      (pid, pt) <- probes
      (eid, vt) <- events
      if vt >= pt - W && vt < pt
    } yield (pid, eid)).toSet
    assert(binned == direct, s"binned ${binned.size} vs direct ${direct.size}")
  }

  test("fkForm strips only short prefixes") {
    val pairs = sampleOf(Gen.listOfN(500, Gen.zip(token, token)))
    pairs.foreach { case (p, rest) =>
      val name = s"${p}_$rest"
      val expected = if (p.length <= 2) rest else name
      assert(DvPlanner.fkForm(name) == expected, name)
    }
  }

  test("rolling min-hash: codegen path equals a plain-JVM direct windowed sum") {
    import spark.implicits._
    import graft.functions.RollingHashMin.{B, M, W}
    def direct(s: String): Option[Long] =
      if (s.length < W) None
      else Some((0 to s.length - W).map { i =>
        s.substring(i, i + W).foldLeft(0L)((h, c) => (h * B + c) % M)
      }.min)
    val strGen = Gen.listOfN(40, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString)
    val samples = (sampleOf(Gen.listOfN(100, strGen)) ++ Seq("", "short", "exactly16chars!!")).distinct
    val rows = samples.toDF("text")
      .select(col("text"), graft.functions.GraftColumns.graftRollingMin(col("text")).as("rh"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    samples.foreach(t => assert(rows(t) == direct(t), s"'$t'"))
  }

  test("tms normalization: nanos-LONG, NTZ, and LTZ agree on arbitrary instants") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // arbitrary epoch-millis across 1970..2100, sub-second precision —
    // every physical shape of events.ts must normalize to the SAME tms
    // (the round-5 drift class: the driver re-types ts between rounds)
    val ms = Gen.chooseNum(0L, 4102444800000L)
    val samples = sampleOf(Gen.listOfN(300, ms)).distinct
    val df = samples.toDF("ms")
    // evaluate each branch against its own physical representation
    val nanos = df.select(col("ms"), (col("ms") * 1000000L).as("ts"))
      .select(col("ms"), Tables.tmsFromTs(LongType).as("tms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ntz = df.select(col("ms"), timestamp_millis(col("ms")).cast(TimestampNTZType).as("ts"))
      .select(col("ms"), Tables.tmsFromTs(TimestampNTZType).as("tms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ltz = df.select(col("ms"), timestamp_millis(col("ms")).as("ts"))
      .select(col("ms"), Tables.tmsFromTs(org.apache.spark.sql.types.TimestampType).as("tms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    samples.foreach { m =>
      assert(nanos(m) == m, s"nanos branch: $m -> ${nanos(m)}")
      assert(ntz(m) == m, s"ntz branch: $m -> ${ntz(m)}")
      assert(ltz(m) == m, s"ltz branch: $m -> ${ltz(m)}")
    }
  }

  test("canon renders money doubles exactly like a scale-2 BigDecimal") {
    import spark.implicits._
    val cents = Gen.chooseNum(-10000000L, 10000000L)
    val samples = sampleOf(Gen.listOfN(200, cents)).distinct
    val doubles = samples.map(c => c / 100.0)
    val rendered = doubles.toDF("d")
      .select(col("d"), GraftFunctions.canon(col("d"), "double").as("s"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    samples.foreach { c =>
      val d = c / 100.0
      val expected = new java.math.BigDecimal(c).movePointLeft(2).setScale(2).toPlainString
      assert(rendered(d) == expected, s"cents=$c")
    }
  }

  test("interval merge: window formulation equals a driver-side merge on arbitrary inputs") {
    import spark.implicits._
    val iv = for {
      doc <- Gen.chooseNum(0L, 5L)
      s0 <- Gen.chooseNum(1L, 200L)
      len <- Gen.chooseNum(0L, 40L)
    } yield (doc, s0, s0 + len)
    val samples = sampleOf(Gen.listOfN(300, iv)).distinct
    val got = graft.queries.Spans.mergeIntervals(
        samples.toDF("doc_id", "s", "e"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
      .toSet
    // reference merge: sort, fold, join overlapping (NOT merely adjacent)
    val expected = samples.groupBy(_._1).flatMap { case (d, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).distinct.sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((ps, pe) :: tail), (s, e)) =>
          if (s <= pe) (ps, math.max(pe, e)) :: tail else (s, e) :: acc
        case (Nil, (s, e)) => List((s, e))
      }.reverse
      merged.map { case (s, e) => (d, s, e) }
    }.toSet
    assert(got == expected)
    // invariants: disjoint and coverage-preserving per doc
    got.groupBy(_._1).foreach { case (_, ivs) =>
      val ss = ivs.toSeq.sortBy(_._2)
      ss.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
    val coveredGot = got.toSeq.map { case (d, s, e) => (d, s, e) }
      .flatMap { case (d, s, e) => (s to e).map(d -> _) }.toSet
    val coveredIn = samples.flatMap { case (d, s, e) => (s to e).map(d -> _) }.toSet
    assert(coveredGot == coveredIn, "merge changed the covered token set")
  }

  test("saltedTopK equals a driver-side top-K on arbitrary inputs, any k and bucket count") {
    import spark.implicits._
    // arbitrary candidate sets: duplicate scores (ties broken by id),
    // skewed keys, k occasionally larger than a key's candidate count
    val rowGen = for {
      key <- Gen.choose(0L, 4L)
      id <- Gen.choose(0L, 400L)
      score <- Gen.choose(0L, 30L) // small range -> heavy ties
    } yield (key, id, score)
    (1 to 4).foreach { round =>
      val rows = sampleOf(Gen.listOfN(300, rowGen))
        .distinctBy(r => (r._1, r._2)) // (key, id) unique — total order holds
      val k = sampleOf(Gen.choose(1, 12))
      val buckets = sampleOf(Gen.oneOf(1, 2, 7, 32))
      val df = rows.toDF("key", "id", "score")
      val got = graft.dv.Scale.saltedTopK(df, Seq("key"),
          Seq(col("score").desc, col("id")), col("id"), k, saltBuckets = buckets)
        .select("key", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (key, vs) =>
        vs.sortBy(v => (-v._3, v._2)).take(k).zipWithIndex
          .map { case ((_, id, score), i) => (key, i + 1, id, score) }
      }.toSet
      assert(got == want, s"round $round diverged (k=$k, buckets=$buckets)")
    }
  }

  test("stableDouble equals the direct decimal cast below 2^53 and a JVM re-derivation everywhere") {
    import spark.implicits._
    // arbitrary scale-6 decimals spanning both sides of the 2^53 unscaled
    // boundary (9.0e15): below it the stable path must EQUAL the direct
    // decimal->double cast (correct rounding both ways); everywhere it
    // must equal the plain-JVM long->double / 1e6 — the cross-engine
    // determinism claim is exactly "both engines run those two IEEE ops"
    val gen = for {
      unscaled <- Gen.oneOf(
        Gen.choose(0L, 9007199254740992L),            // below/at 2^53
        Gen.choose(9007199254740993L, Long.MaxValue / 4)) // far above
      sign <- Gen.oneOf(1L, -1L)
    } yield sign * unscaled
    val vals = sampleOf(Gen.listOfN(200, gen)).distinct
    val df = vals.map(v => new java.math.BigDecimal(java.math.BigInteger.valueOf(v), 6))
      .toDF("d").select(col("d").cast("decimal(38,6)").as("d"))
    val out = df.select(col("d"),
        graft.queries.Money.stableDouble(col("d"), 6).as("stable"),
        col("d").cast("double").as("direct"))
      .collect()
    out.foreach { r =>
      val d = r.getDecimal(0); val stable = r.getDouble(1); val direct = r.getDouble(2)
      val unscaled = d.unscaledValue().longValueExact()
      val jvm = unscaled.toDouble / 1000000.0
      assert(stable == jvm, s"stable($d) = $stable != jvm $jvm")
      if (math.abs(unscaled) <= 9007199254740992L)
        assert(stable == direct, s"below 2^53, stable($d) = $stable != direct $direct")
    }
    // non-vacuous: the generator really exercised the above-2^53 regime
    assert(vals.exists(v => math.abs(v) > 9007199254740992L))
  }

  test("streaming probe kernel is bit-identical to the batch blocked kernel's math") {
    // r12: the packed band word died with the banded stream gate; what
    // must stay pinned instead is that the ASYMMETRIC probe kernel
    // (stream_semantic_dedup's per-row body) reproduces the exact cosine
    // arithmetic — index-ordered double dot, own-length norms — on
    // synthetic vectors spanning signs and magnitudes.
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 64).map(d => ((((i * 131 + d * 17) % 97) - 48) / 48.0).toFloat))
    }
    val items = vecs.map { case (id, e) => (id, e) }
    vecs.take(5).foreach { case (pid, pe) =>
      val got = graft.queries.Similarity
        .probeBlockKernel(pid, pe, items, -2.0).toSeq
      assert(got.size == vecs.size - 1, "self-pair not skipped or rows lost")
      got.foreach { case (a, b, c) =>
        assert(a == pid && b != pid)
        val eb = vecs(b.toInt)._2
        def dot(x: Seq[Float], y: Seq[Float]) =
          x.zip(y).foldLeft(0.0) { case (acc, (u, v)) => acc + u.toDouble * v.toDouble }
        val expect = dot(pe, eb) / (math.sqrt(dot(pe, pe)) * math.sqrt(dot(eb, eb)))
        assert(c == expect, s"probe cosine $c != reference $expect for ($a,$b)")
      }
    }
  }
}
