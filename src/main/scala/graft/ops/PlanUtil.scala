package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-hygiene helpers shared by the iterative operators. */
private[graft] object PlanUtil {

  /** Eager `localCheckpoint` that PRESERVES the frame's physical
    * partitioning (and in-partition sort order) in the resulting
    * LogicalRDD.
    *
    * Under AQE (default since Spark 3.2) a checkpoint records
    * `UnknownPartitioning`: `Dataset.checkpoint` copies
    * `executedPlan.outputPartitioning`, and with `AdaptiveSparkPlanExec`
    * at the root that is unknown until runtime. Every later join or
    * aggregation against the checkpointed frame then RE-SHUFFLES it —
    * measured on `pagerank_topk`, where the src-hash-partitioned edge
    * table was re-exchanged per iteration, exactly the cost
    * `Graph.materialize` exists to avoid (plans/r18/
    * pagerank_topk_before.txt: `Scan ExistingRDD ...
    * UnknownPartitioning(0)` under per-iteration `Exchange` nodes).
    *
    * Running the ONE checkpoint job with AQE off keeps the declared
    * layout: `repartition(k).sortWithinPartitions(k)` checkpoints to
    * `LogicalRDD(hashpartitioning(k, P), k ASC)`, and downstream
    * equi-joins/aggregations on `k` need no exchange and no sort at any
    * scale. AQE stays on for every other query — only the materialize
    * job itself (a deliberate full-width shuffle) gives up runtime
    * coalescing, which is the point: the partition count must stay
    * P = spark.sql.shuffle.partitions so later AQE-on consumers
    * co-partition against it.
    */
  def checkpointKeepPartitioning(df: DataFrame): DataFrame =
    // the AQE toggle is session-global conf: serialize the toggle window
    // so two concurrent calls cannot read each other's "false" as the
    // restore value and leave AQE off for the session (r19 ADVICE; the
    // engine's gates run single-threaded today — this is cheap insurance)
    synchronized {
      val spark = df.sparkSession
      val key = "spark.sql.adaptive.enabled"
      val was = spark.conf.get(key)
      spark.conf.set(key, "false")
      try df.localCheckpoint()
      finally spark.conf.set(key, was)
    }
}
