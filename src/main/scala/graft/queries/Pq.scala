package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the third tier of the vector-storage stack
  * (fp32 → int8 [emb_quantize] → PQ codes), SURVEY §2.C extension.
  *
  * emb_pq_codes: each vector is split into M subvectors; a per-subspace
  * codebook (K centroids, one deterministic Lloyd iteration seeded by the
  * first K vectors) encodes every subvector as a code in [0,K) — 64 floats
  * become M bytes. Training is one scan-local literal-argmin assignment +
  * one groupBy per subspace (K·Dsub integer partials to the driver, the
  * same shape as IVF); encoding is a single scan-local pass.
  *
  * ann_l2_pq: asymmetric-distance search (ADC) over the codes — each query
  * precomputes a (M×K) table of exact integer L2 distances from its
  * subvectors to every codebook centroid; a vector's approximate distance
  * is the sum of M table lookups selected by its codes. The scan touches
  * only the codes (M small ints per vector), never the floats — the
  * memory-bound trick PQ exists for. Search cost is linear in n by design
  * (ADC is a full scan); IVF covers the pruned regime.
  *
  * Determinism (Spark ↔ DuckDB): the same floor(e·2^12) fixed-point as
  * IVF; centroids are floor(sum/n) per dimension — sums stay below 2^40,
  * so the double division is exact and floor matches in both engines; all
  * distances are exact BIGINT sums of squared integer differences; ties
  * break on code / vec_id. The oracle unrolls the same single Lloyd
  * iteration as SQL CTEs per subspace.
  */
object Pq extends QueryModule {

  private val Dim = 64
  private[graft] val M = 4 // subspaces
  private val Dsub = Dim / M
  private[graft] val K = 8 // codes per subspace
  // ALIAS of the IVF fixed-point scale, not an independent constant: the
  // Spark side quantizes through Similarity.qVecs, so the oracle SQL and
  // the spec ground truth must follow that definition by construction.
  private[graft] val Scale: Long = Similarity.IvfScale
  private[graft] val PqQueries = 50
  private[graft] val PqTopK = 5

  // ONE quantized-vector cache for IVF and PQ: the fixed-point definition
  // (floor(e·2^12) bigint) is shared with Similarity, so both op families
  // pin a single materialization instead of two identical copies.
  private def qVecs(s: SparkSession, dir: String): DataFrame = Similarity.qVecs(s, dir)

  // ---------------------------------------------------------- training
  /** Squared L2 between subvector m of `qCol` and a literal centroid. */
  private def d2Expr(qCol: String, m: Int, c: Seq[Long]): String = {
    val arr = c.map(v => s"${v}L").mkString(", ")
    s"""aggregate(sequence(1, $Dsub), cast(0 as bigint),
       |  (acc, d) -> acc + (element_at($qCol, ${m * Dsub} + d) - element_at(array($arr), d))
       |                  * (element_at($qCol, ${m * Dsub} + d) - element_at(array($arr), d)))""".stripMargin
  }

  /** Argmin code for subspace m against literal centroids (ties → lowest
    * cell id), via the same sorted-struct trick as IVF. Cells are labeled
    * by the seed vector's ACTUAL vec_id — the same labeling the oracle's
    * `vec_id AS k` uses — so the two engines agree by construction, not by
    * the accident of dense 0-based ids (and a corpus with fewer than K
    * low ids just trains fewer cells on both sides instead of crashing).
    */
  private def codeExpr(qCol: String, m: Int, cents: Seq[(Long, Seq[Long])]): String = {
    val entries = cents.map { case (cid, c) =>
      s"named_struct('d2', ${d2Expr(qCol, m, c)}, 'k', ${cid}L)"
    }.mkString("array(", ", ", ")")
    s"element_at(array_sort($entries, (l, r) -> " +
      "case when l.d2 < r.d2 then -1 when l.d2 > r.d2 then 1 " +
      "when l.k < r.k then -1 when l.k > r.k then 1 else 0 end), 1).k"
  }

  private val codebookMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[Seq[(Long, Seq[Long])]]]

  /** Per-subspace codebooks `[m] -> (cell_id, centroid)` after one Lloyd
    * iteration.
    */
  def pqCodebooks(s: SparkSession, dir: String): Seq[Seq[(Long, Seq[Long])]] = {
    SessionCache.onSessionEnd(s, "pq_codebooks") {
      codebookMemo.keys.filter(_._1 eq s).toSeq.foreach(codebookMemo.remove)
    }
    codebookMemo.getOrElseUpdate((s, dir), trainCodebooks(s, dir))
  }

  private def trainCodebooks(s: SparkSession, dir: String): Seq[Seq[(Long, Seq[Long])]] = {
    val vecs = qVecs(s, dir)
    // seeds: subvectors of the vectors with vec_id < K, labeled by vec_id
    val seedRows: Seq[(Long, Seq[Long])] = vecs.filter(col("vec_id") < K).orderBy("vec_id")
      .select("vec_id", "q").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    (0 until M).map { m =>
      val seeds = seedRows.map { case (cid, q) => (cid, q.slice(m * Dsub, (m + 1) * Dsub)) }
      // one assignment pass + per-cell integer sums (K·Dsub partials)
      val assigned = vecs.select(col("q"), expr(codeExpr("q", m, seeds)).as("cell"))
      val dimSums = (1 to Dsub).map(d =>
        sum(expr(s"element_at(q, ${m * Dsub} + $d)")).as(s"s$d"))
      val rows = assigned.groupBy("cell")
        .agg(dimSums.head, (dimSums.tail :+ count(lit(1)).as("n")): _*)
        .collect()
      val updated = rows.map { r =>
        val n = r.getAs[Long]("n")
        r.getAs[Long]("cell") ->
          (1 to Dsub).map(d => math.floor(r.getAs[Long](s"s$d").toDouble / n).toLong)
      }.toMap
      // a seed cell that captured no vectors keeps its seed centroid
      seeds.map { case (cid, sc) => (cid, updated.getOrElse(cid, sc)) }
    }
  }

  // ---------------------------------------------------------- encoding
  /** Encode `base` (needs a `q` column) with the trained codebooks —
    * shared by emb_pq_codes and ann_ivf_pq, BOTH over the memoized qVecs.
    * ann_ivf_pq's self-join hazard (corpus and probe sides sharing the
    * cached frame's attribute ids) is defused not here but in the
    * ivfpq_codes memo: its localCheckpoint + createDataFrame rebuild
    * scrubs the constraints and mints fresh attribute ids.
    */
  private def codesFrom(base: DataFrame, books: Seq[Seq[(Long, Seq[Long])]]): DataFrame = {
    val codeCols = (0 until M).map(m => expr(codeExpr("q", m, books(m))).cast("int"))
    base
      .select(col("vec_id"), array(codeCols: _*).as("codes"))
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
  }

  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    codesFrom(qVecs(s, dir), pqCodebooks(s, dir)).orderBy("vec_id", "m")

  // ------------------------------------------------------------ oracle
  private def dotList(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $Dsub), d -> ($a[d] - $b[d]) * ($a[d] - $b[d])))"

  /** Per-subspace training + encode CTEs (the Spark training unrolled). */
  private def subspaceCtes(m: Int): String = {
    val sub = s"list_transform(generate_series(1, $Dsub), d -> q[${m * Dsub} + d])"
    s"""s$m AS (
       |  SELECT vec_id AS k, $sub AS c FROM qv WHERE vec_id < $K),
       |a$m AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT v.vec_id, v.sub, c.k AS cell,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${dotList("v.sub", "c.c")}, c.k) AS rk
       |    FROM (SELECT vec_id, $sub AS sub FROM qv) v CROSS JOIN s$m c) t WHERE rk = 1),
       |c$m AS (
       |  SELECT s.k,
       |         coalesce(u.c, s.c) AS c
       |  FROM s$m s LEFT JOIN (
       |    SELECT cell AS k, list(cv ORDER BY d) AS c FROM (
       |      SELECT a.cell, dd.d,
       |             CAST(floor(CAST(CAST(sum(a.sub[dd.d]) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |      FROM a$m a CROSS JOIN (SELECT unnest(generate_series(1, $Dsub)) AS d) dd
       |      GROUP BY a.cell, dd.d) g GROUP BY cell) u ON u.k = s.k),
       |e$m AS (
       |  SELECT vec_id, $m AS m, CAST(cell AS INT) AS code FROM (
       |    SELECT v.vec_id, c.k AS cell,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${dotList("v.sub", "c.c")}, c.k) AS rk
       |    FROM (SELECT vec_id, $sub AS sub FROM qv) v CROSS JOIN c$m c) t WHERE rk = 1)""".stripMargin
  }

  private def pqCodesSql: String = {
    val ctes = (0 until M).map(subspaceCtes).mkString(",\n")
    val unions = (0 until M).map(m => s"SELECT * FROM e$m").mkString("\nUNION ALL\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * $Scale) AS BIGINT)) AS q
       |  FROM embeddings),
       |$ctes
       |SELECT vec_id, m, code FROM (
       |$unions
       |) u
       |ORDER BY vec_id, m""".stripMargin
  }

  // ----------------------------------------------------------- ADC search
  private def annPq(s: SparkSession, dir: String): DataFrame = {
    val books = pqCodebooks(s, dir)
    // query side: a constant-size set, each row exploded into its M×K
    // distance-table entries (exact integer d2 to every centroid)
    val tableEntries = (0 until M).flatMap { m =>
      books(m).map { case (cid, c) =>
        struct(lit(m).as("m"), lit(cid.toInt).as("code"),
          expr(d2Expr("q", m, c)).as("d2"))
      }
    }
    val queries = qVecs(s, dir).filter(col("vec_id") < PqQueries)
      .select(col("vec_id").as("query_id"),
        explode(array(tableEntries: _*)).as("t"))
      .select(col("query_id"), col("t.m").as("m"), col("t.code").as("code"), col("t.d2").as("d2"))
    // scan side: only the codes — the approximate distance is the sum of M
    // table lookups (an equi-join on (m, code) against the broadcast table)
    val codes = pqCodes(s, dir)
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2"), col("neighbor_id"))
    codes.join(broadcast(queries), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("d2"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("d2").as("approx_d2")) // exactly M rows per pair by construction
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "rank", "neighbor_id", "approx_d2")
      .orderBy("query_id", "rank")
  }

  private def annPqSql: String = {
    val ctes = (0 until M).map(subspaceCtes).mkString(",\n")
    val unions = (0 until M).map(m => s"SELECT * FROM e$m").mkString("\nUNION ALL\n")
    val tblUnions = (0 until M).map { m =>
      s"""SELECT query_id, $m AS m, c.k AS code, ${dotList("sub", "c.c")} AS d2
         |FROM (SELECT vec_id AS query_id,
         |             list_transform(generate_series(1, $Dsub), d -> q[${m * Dsub} + d]) AS sub
         |      FROM qv WHERE vec_id < $PqQueries) v CROSS JOIN c$m c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * $Scale) AS BIGINT)) AS q
       |  FROM embeddings),
       |$ctes,
       |codes AS (
       |$unions
       |),
       |dtable AS (
       |$tblUnions
       |),
       |dist AS (
       |  SELECT t.query_id, c.vec_id AS neighbor_id, CAST(sum(t.d2) AS BIGINT) AS approx_d2
       |  FROM codes c JOIN dtable t ON t.m = c.m AND t.code = c.code
       |  WHERE c.vec_id <> t.query_id
       |  GROUP BY t.query_id, c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, approx_d2,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY approx_d2, neighbor_id) AS rank
       |  FROM dist)
       |SELECT query_id, rank, neighbor_id, approx_d2
       |FROM ranked WHERE rank <= $PqTopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------- ann_ivf_pq
  // The PRODUCTION composition (the FAISS IVFPQ shape): IVF routing
  // prunes the corpus to the query's NProbe cells, then the ADC table
  // scan scores ONLY the codes of those cells' members — neither tier
  // alone is how a billion-vector index actually runs. Reuses the
  // trained IVF centroids (Similarity.ivfCentroids — same training, same
  // assignment) and the PQ codebooks/codes verbatim, so this op adds
  // routing glue, not a third quantizer. Scale: probe cells and ADC
  // tables are constant broadcasts; the candidate set is cell-member-
  // scale (the whole point); distances are the same exact-BIGINT table
  // sums ann_l2_pq hash-proves.
  private def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val cents = Similarity.ivfCentroids(s, dir)
    val books = pqCodebooks(s, dir)
    // the annPq query shape — collected below, so it never joins
    val queries = qVecs(s, dir).filter(col("vec_id") < PqQueries)
    // Constant query-side artifacts, MATERIALIZED driver-side (the IVF
    // centroid precedent — 50×NProbe and 50×M·K rows): computed by the
    // same Spark expressions as everywhere else, but collected and
    // re-broadcast as plain data so the lambda-heavy argmax/d2 projections
    // never sit on two sides of a join (Catalyst's self-join attribute
    // rewrite loses HOF lambda references → INTERNAL_ERROR otherwise).
    import s.implicits._
    // q is carried through the select (the ann_cosine_ivf probe shape):
    // a Generate whose child projects NOTHING but the generator input
    // trips a column-pruning binding bug on these lambda-heavy exprs.
    // Memoized per session: the collects (and their heavyweight codegen
    // compilations) are index-BUILD work — re-running the op reuses the
    // materialized artifacts like a real index would.
    val probeCells = broadcast(SessionCache.memo(s, "ivfpq_probes", dir) {
      queries.select(col("vec_id").as("query_id"), col("q"),
          explode(expr(Similarity.topCellsExpr(cents, "q", Similarity.NProbe))).as("cell"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(2)))
        .toDF("query_id", "cell")
    })
    val tableEntries = (0 until M).flatMap { m =>
      books(m).map { case (cid, c) =>
        struct(lit(m).as("m"), lit(cid.toInt).as("code"), expr(d2Expr("q", m, c)).as("d2"))
      }
    }
    val dtable = broadcast(SessionCache.memo(s, "ivfpq_dtable", dir) {
      queries.select(col("vec_id").as("query_id"), explode(array(tableEntries: _*)).as("t"))
        .select(col("query_id"), col("t.m").as("m"), col("t.code").as("code"), col("t.d2").as("d2"))
        .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toDF("query_id", "m", "code", "d2")
    })
    // Corpus side: cell assignment routes, codes score — floats never
    // read. The assignment is MATERIALIZED (what a real IVFPQ index does —
    // the assignment IS the index structure) and then rebuilt from its raw
    // RDD: Spark 4's localCheckpoint preserves the ORIGIN plan's
    // constraints on the LogicalRDD, so the giant cell-defining argmax
    // (over the cached q attribute, which the RDD no longer outputs)
    // would otherwise leak through InferFiltersFromConstraints onto the
    // probe-cell side of the join and crash binding (INTERNAL_ERROR
    // ATTRIBUTE_NOT_FOUND). createDataFrame(rdd, schema) keeps the
    // materialized rows and drops the haunted constraints.
    val assignments = SessionCache.memo(s, "ivfpq_assign", dir) {
      val assignCk = Similarity.ivfAssignments(s, dir).localCheckpoint()
      s.createDataFrame(assignCk.rdd, assignCk.schema)
    }
    val candidates = assignments
      .join(probeCells, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2"), col("neighbor_id"))
    // The codes are ALSO a materialized index artifact (constraint-
    // scrubbed like the assignment): leaving the lambda-heavy encode
    // projection live in this plan both risks the self-join rewrite bug
    // (HOF lambda refs lost when two such projections share a cached
    // relation) and re-pays its heavyweight codegen compilation on every
    // run — measured 8-10s/run at sf0.1 vs sub-second over the
    // materialized table. A real IVFPQ index stores codes, not floats.
    val codes = SessionCache.memo(s, "ivfpq_codes", dir) {
      val ck = codesFrom(qVecs(s, dir), books).localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    candidates
      .join(codes, Seq("vec_id"))
      .join(dtable, Seq("query_id", "m", "code"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .groupBy("query_id", "neighbor_id", "cell")
      .agg(sum("d2").as("approx_d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "rank", "neighbor_id", "cell", "approx_d2")
      .orderBy("query_id", "rank")
  }

  private def annIvfPqSql: String = {
    val pqctes = (0 until M).map(subspaceCtes).mkString(",\n")
    val unions = (0 until M).map(m => s"SELECT * FROM e$m").mkString("\nUNION ALL\n")
    val tblUnions = (0 until M).map { m =>
      s"""SELECT query_id, $m AS m, c.k AS code, ${dotList("sub", "c.c")} AS d2
         |FROM (SELECT vec_id AS query_id,
         |             list_transform(generate_series(1, $Dsub), d -> q[${m * Dsub} + d]) AS sub
         |      FROM qv WHERE vec_id < $PqQueries) v CROSS JOIN c$m c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * $Scale) AS BIGINT)) AS q
       |  FROM embeddings),
       |$pqctes,
       |codes AS (
       |$unions
       |),
       |dtable AS (
       |$tblUnions
       |),
       |${Similarity.ivfChainCtes("iv")},
       |probes AS (${Similarity.ivfProbesDuck("iv", s"v.vec_id < $PqQueries")}),
       |cand AS (
       |  SELECT p.query_id, a.vec_id, a.cell
       |  FROM probes p JOIN ivassigned a ON a.cell = p.cell AND a.vec_id <> p.query_id),
       |dist AS (
       |  SELECT cd.query_id, cd.vec_id AS neighbor_id, any_value(cd.cell) AS cell,
       |         CAST(sum(t.d2) AS BIGINT) AS approx_d2
       |  FROM cand cd
       |  JOIN codes c ON c.vec_id = cd.vec_id
       |  JOIN dtable t ON t.query_id = cd.query_id AND t.m = c.m AND t.code = c.code
       |  GROUP BY cd.query_id, cd.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cell, approx_d2,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY approx_d2, neighbor_id) AS BIGINT) AS rank
       |  FROM dist)
       |SELECT query_id, rank, neighbor_id, cell, approx_d2
       |FROM ranked WHERE rank <= $PqTopK
       |ORDER BY query_id, rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("emb_pq_codes", pqCodes, Some(pqCodesSql)),
    QueryDef("ann_l2_pq", annPq, Some(annPqSql)),
    QueryDef("ann_ivf_pq", annIvfPq, Some(annIvfPqSql))
  )
}
