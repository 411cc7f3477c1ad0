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
    // caller's candidate-generation pipeline
    val eb = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var lbl = eb.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    // sum over an empty frame is null → 0 (an edge-free graph must
    // yield an empty label table, not an NPE)
    def lblSum(df: DataFrame): Long = {
      val v = df.agg(sum("lbl")).head()
      if (v.isNullAt(0)) 0L else v.getLong(0)
    }
    var prevSum = lblSum(lbl)
    var converged = lbl.isEmpty
    var round = 0
    val maxRounds = 64
    while (!converged && round < maxRounds) {
      val prop = eb.join(lbl, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = lbl.unionByName(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val nextSum = lblSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      lbl.unpersist(false)
      lbl = next
      round += 1
    }
    eb.unpersist(false)
    require(converged,
      s"label propagation did not converge within $maxRounds rounds")
    lbl
  }
}
