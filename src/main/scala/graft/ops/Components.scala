package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * clustering stage that turns near-duplicate PAIRS (minhash/simhash
  * output) into duplicate GROUPS with a canonical representative
  * (min id), so "keep one per cluster" is a single groupBy.
  *
  * Algorithm: every node starts labeled with its own id; each round,
  * a node takes the min of its label and its neighbors' labels; stop
  * when a round changes nothing. Each round is two shuffles (join +
  * min-aggregate) over the EDGE list — never all-pairs — and rounds
  * needed = graph diameter, which for dedup clusters (small, dense
  * clumps) is single digits. Labels persist per round and the loop
  * checks a count, so lineage stays bounded. This is the DataFrame
  * form of the classic label-propagation CC (cf. GraphX's
  * ConnectedComponents, which does the same over RDDs).
  */
object Components {

  /** `edges`: (src, dst) undirected pairs; `nodes`: one column of ids
    * (isolated nodes keep their own label). Returns (id, component)
    * where component = min node id in the component. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val sym = edges.toDF("src", "dst")
      .unionByName(edges.toDF("dst", "src").select(col("src"), col("dst")))
      .distinct().persist()
    // localCheckpoint (eager), NOT just persist: each round's plan nests
    // the previous round's, so after k rounds the un-truncated logical
    // plan is exponential in k — analysis/codegen OOMs the driver long
    // before the (tiny) label table does. Checkpointing materializes the
    // round and cuts the lineage to a leaf.
    var labels = nodes.toDF("id").distinct()
      .select(col("id"), col("id").as("component")).localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // neighbor-min pass: each node adopts min(own, neighbors') label.
      // The previous label rides along as `old`, so the convergence
      // check is a scan of the (already materialized) checkpoint —
      // no extra join job per round.
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("component")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = next.where(col("component") =!= col("old")).limit(1).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
