package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over plain DataFrames — the
  * GraphX/Pregel shape without the RDD detour, shared by the document
  * dup-cluster family ([[DedupOps.dupClustersOf]]) and the vector
  * SemDeDup components ([[VectorOps.semDedupClusters]]).
  */
object GraphOps {

  /** Converged min-label propagation: (id, lbl = min reachable id)
    * over an undirected edge list. Only edge-connected ids appear;
    * singletons are the caller's implicit clusters.
    *
    * Rounds = graph diameter (tiny for dup/near-dup graphs);
    * `localCheckpoint` truncates the plan per round so lineage never
    * grows with iterations, and each superseded round's blocks are
    * unpersisted eagerly (waiting for the ContextCleaner lets them
    * pile up across bench iterations). Convergence rides the
    * label-sum invariant: min-propagation only ever decreases labels,
    * so the sum strictly decreases until the fixpoint — one scalar
    * aggregate per round instead of a prev-vs-next join. Fails loudly
    * past 64 rounds rather than return partially-propagated labels (a
    * deeper chain would otherwise split one component silently).
    *
    * `edges`: (src, dst) id pairs, any direction, duplicates fine.
    */
  def propagateMinLabels(edges: DataFrame): DataFrame = {
    // undirected: propagate both ways; checkpoint once so the
    // iterative joins run over a materialized edge list, not the
    // caller's candidate-generation pipeline. r15: materialize the
    // DIRECTED list first — symmetrizing the lazy frame put the whole
    // candidate-generation subtree in the plan TWICE (edges ∪
    // edges.reversed), so every caller paid its exact-star/LSH/
    // containment derivation double inside this one checkpoint job.
    // Both frames are dup-edge-list-sized (LSH-cap bounded), within
    // the bounded-frames checkpoint discipline.
    // r15 latency discipline (guide §1.2: the loop's cost at bench
    // scale is SEQUENTIAL ACTIONS, not data): every checkpoint is
    // LAZY (plan truncation is immediate; the data materializes as a
    // side effect of the next action over it), and the convergence
    // probe is ONE agg(sum, count) per round that doubles as that
    // round's materializing action — down from two actions per round
    // plus three up-front (e0/eb/lbl eager checkpoints, the sum, the
    // isEmpty). count==0 replaces isEmpty: sum alone can't (id 0 is a
    // legal label, so sum 0 ≠ empty).
    val e0 = edges.localCheckpoint(false)
    val eb = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(false)
    var lbl = eb.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(false)
    // sum over an empty frame is null → 0 (an edge-free graph must
    // yield an empty label table, not an NPE)
    def sumCount(df: DataFrame): (Long, Long) = {
      val v = df.agg(sum("lbl"), count(lit(1))).head()
      (if (v.isNullAt(0)) 0L else v.getLong(0), v.getLong(1))
    }
    val (sum0, n0) = sumCount(lbl)
    var prevSum = sum0
    var converged = n0 == 0L
    var round = 0
    val maxRounds = 64
    while (!converged && round < maxRounds) {
      val prop = eb.join(lbl, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = lbl.unionByName(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(false)
      val (nextSum, _) = sumCount(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      lbl.unpersist(false)
      lbl = next
      round += 1
    }
    e0.unpersist(false)
    eb.unpersist(false)
    require(converged,
      s"label propagation did not converge within $maxRounds rounds")
    lbl
  }
}
