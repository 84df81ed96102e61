package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (the output of
  * every [[Dedup]] strategy) into connected components, so a corpus
  * keeps ONE representative per duplicate cluster instead of dropping
  * only directly-linked pairs. Absent in the reference (which never
  * goes beyond scan/filter — SURVEY §2); in a real training-data
  * pipeline this is the step between candidate pairs and the deduped
  * corpus: near-dup similarity is not transitive, so A~B and B~C with
  * A!~C must still collapse to one kept document.
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) — the standard shared-nothing CC algorithm. Each round is
  * two narrow shuffles over (long, long) edge rows; convergence is
  * O(log^2 n) rounds worst-case and 2-3 rounds on real dup graphs
  * (near-cliques of diameter <= 2). Chosen over single-label
  * min-propagation (rounds = graph DIAMETER — a pathological dup
  * chain of truncations makes that O(n)) and over driver-side
  * union-find (collects every edge — dead at 100 TB, where the pair
  * set can be a double-digit percentage of the corpus).
  *
  * Scale notes (100 TB):
  *   - state between rounds is ONLY the edge set — no adjacency lists
  *     are ever materialized per node (no collect_list: a hot node —
  *     one document duplicated a million times — would buffer an
  *     unbounded group). Neighborhood minima come from a map-side-
  *     combined groupBy.min, O(1) agg state per key;
  *   - each round `localCheckpoint`s the new edge set: iterative plans
  *     otherwise double in depth per round, and round k would replay
  *     every prior round's shuffles k times (checkpointing is how
  *     GraphFrames' CC survives iteration too);
  *   - convergence is detected by a (count, hash-xor) signature of the
  *     edge set — one cheap aggregate over the already-materialized
  *     checkpoint, no extra shuffle. A false convergence needs a
  *     64-bit hash-xor collision at identical edge count
  *     (~2^-64 per round); the alternative exact check (`except` of
  *     consecutive edge sets) costs a full extra SMJ per round.
  */
object Clusters {

  /** Connected components over undirected near-dup pairs.
    *
    * Input: one row per pair (src, dst) — direction and duplicates
    * irrelevant; self-loops dropped. Output: `(id, cluster)` for every
    * node that appears in a pair, where `cluster` is the component's
    * minimum id (roots label themselves). Nodes in no pair are not
    * emitted — [[dedupByCluster]] treats them as singleton keepers.
    */
  def dupClusters(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // canonical directed edges u > v (the star ops preserve this
    // orientation: every emitted target is a strict neighborhood min)
    var e = pairs
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // bit_xor, not sum: order-independent like sum but cannot overflow
    // under ANSI arithmetic; the edge set is distinct so XOR's
    // pair-cancellation is harmless
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // LARGE-STAR: for each node u, link every strictly-LARGER
      // neighbor to m = min(N(u) ∪ {u}). Runs on the bidirected view
      // so both endpoints contribute their neighborhoods.
      val bi = e.unionByName(
        e.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = bi.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR: edges now point strictly downward (u > v); for
      // each u, link u and every neighbor except the minimum to
      // mn = min(N(u)). v > mn holds for the kept neighbors, so the
      // downward orientation is preserved.
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("mn"))
      val ss = ls.join(mins2, "u")
        .where(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v"))
        .unionByName(mins2.select(col("u"), col("mn").as("v")))
        .distinct()
      e = ss.localCheckpoint(true)
      val next = signature(e)
      converged = next == sig
      sig = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          s"(${sig._1} edges) — raise maxIter")
    // fixed point is a star per component: one (member, root) edge per
    // non-root member, root = component minimum; roots label themselves
    e.select(col("u").as("id"), col("v").as("cluster"))
      .unionByName(
        e.select(col("v").as("id"), col("v").as("cluster")).distinct())
  }

  /** Keep one representative per duplicate cluster: the minimum-id
    * member survives, every other cluster member is dropped, and
    * documents that appear in no pair pass through untouched. The
    * doomed set is an equi anti-join on the id — NOT a broadcast: on
    * a heavily-duplicated corpus (web crawls run 30-50% near-dup) the
    * doomed side is a large fraction of the corpus.
    */
  def dedupByCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 25): DataFrame = {
    val doomed = dupClusters(pairs, srcCol, dstCol, maxIter)
      .where(col("id") =!= col("cluster"))
      .select(col("id"))
    docs.join(doomed, docs(idCol) === doomed("id"), "left_anti")
  }
}
