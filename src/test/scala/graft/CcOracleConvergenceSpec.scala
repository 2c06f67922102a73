package graft

/** Pins the fixed-round unrolled CC ORACLES (Similarity.EmbedCcRounds /
  * Dedup.TextCcRounds) against the pair graphs the driver gate actually
  * feeds them. Round 8's lesson: the recall-1.0 embed kernel made the
  * pair graph bigger and chainier, the 6-round unrolled oracle stopped
  * converging at sf0.1 (needs 10), and the gate hash-failed even though
  * the Spark fixpoint engine was provably right. The "diameter ≤
  * 2^rounds" bound the constant was derived from is false on these label
  * topologies, so the constants are now measured-with-margin and THIS
  * spec is the measurement: it replays the oracle's EXACT propagate+jump
  * algorithm driver-side on the real sf0.1 graphs, computes the rounds
  * each needs, and asserts the unrolled constants carry ≥ 2 rounds of
  * slack — plus that the replay at the constant equals union-find ground
  * truth. Any kernel change that re-shapes the pair graph re-runs this
  * measurement automatically.
  *
  * Driver-side is safe here: the pair sets are answer-sized (≤ a few
  * thousand rows at sf0.1), not corpus-sized.
  *
  * SF EXPOSURE (ADVICE r9): this spec measures margin on the sf0.1 gate
  * graphs only, but the same unrolled constants back the DuckDB oracles
  * at sf1 dry-runs, where a bigger pair graph could need more rounds —
  * the exact failure mode r8 hit. Under-convergence fails LOUDLY (hash
  * mismatch), and the sf1/sf10 procedure now re-measures on the actual
  * graph: `tools/scale_oracle_cluster.py <sf> <out> --rounds-const N`
  * replays the identical propagate+jump driver-side and fails unless the
  * constant keeps ≥ 2 rounds of margin at that SF (run it before trusting
  * any fixed-round unrolled oracle past the gate SFs).
  */
class CcOracleConvergenceSpec extends SparkSpec {
  private val GateDir = "/root/testdata/sf0.1"

  /** Exact replay of the unrolled oracle SQL. Each round k:
    *   p_k: lbl ← least(own prev lbl, min over edges of prev neighbor lbl)
    *   j_k: lbl ← p_k(lbl)   (labels are node ids, all present in p_k)
    * Returns the smallest round count after which labels stop changing
    * AND equal the union-find component minimum (Int.MaxValue if maxRounds
    * was insufficient), plus a closure that evaluates labels at a given
    * round count for the ground-truth equality check.
    */
  private def roundsNeeded(edges: Seq[(Long, Long)], maxRounds: Int = 40): (Int, Int => Map[Long, Long]) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toArray }

    // union-find ground truth: component minimum per node
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val target: Map[Long, Long] = nodes.map(n => n -> find(n)).toMap

    def step(prev: Map[Long, Long]): Map[Long, Long] = {
      val p = prev.map { case (id, l) =>
        val nb = adj.getOrElse(id, Array.empty[Long])
        id -> (if (nb.isEmpty) l else math.min(l, nb.iterator.map(prev).min))
      }
      p.map { case (id, l) => id -> p.getOrElse(l, l) } // pointer jump
    }
    def labelsAt(rounds: Int): Map[Long, Long] =
      (1 to rounds).foldLeft(nodes.map(n => n -> n).toMap)((m, _) => step(m))

    var lbl = nodes.map(n => n -> n).toMap
    var k = 0
    while (lbl != target && k < maxRounds) { lbl = step(lbl); k += 1 }
    (if (lbl == target) k else Int.MaxValue, labelsAt)
  }

  private def collectPairs(name: String, a: String, b: String): Seq[(Long, Long)] =
    SparkEntry.queries(name)(spark, GateDir)
      .select(a, b).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))

  test("EmbedCcRounds exceeds the rounds the sf0.1 embed pair graph needs by >= 2") {
    val pairs = collectPairs("dedup_embed_cosine", "vec_a", "vec_b")
    assert(pairs.nonEmpty, "embed pair graph is empty — gate data missing?")
    val (needed, labelsAt) = roundsNeeded(pairs)
    val const = _root_.graft.queries.Similarity.EmbedCcRounds
    assert(needed <= const - 2,
      s"sf0.1 embed graph needs $needed propagate+jump rounds; EmbedCcRounds=$const leaves < 2 rounds margin")
    // the unrolled oracle at the shipped constant equals union-find truth
    assert(needed != Int.MaxValue && labelsAt(const) == labelsAt(needed))
  }

  test("TextCcRounds exceeds the rounds the sf0.1 minhash pair graph needs by >= 2") {
    val pairs = collectPairs("dedup_minhash_lsh", "doc_a", "doc_b")
    assert(pairs.nonEmpty, "minhash pair graph is empty — gate data missing?")
    val (needed, labelsAt) = roundsNeeded(pairs)
    val const = _root_.graft.queries.Dedup.TextCcRounds
    assert(needed <= const - 2,
      s"sf0.1 minhash graph needs $needed propagate+jump rounds; TextCcRounds=$const leaves < 2 rounds margin")
    val atConst = labelsAt(const)
    assert(needed != Int.MaxValue && atConst == labelsAt(needed))
  }
}
