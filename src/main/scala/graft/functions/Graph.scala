package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small graph algebra for dedup pipelines: near-dup detection emits
  * PAIRS, but the keep-one-representative decision needs the transitive
  * closure — two docs are duplicates of each other through a chain even
  * if no band/gram ever put them in the same bucket.
  */
object Graph {

  /** Connected components by iterative min-label propagation: every
    * vertex of the `(aCol, bCol)` edge list gets `component` = the
    * minimum vertex id reachable from it. The loop is a driver-side
    * fixpoint over DataFrames — each pass is one join + one min
    * aggregate (both on the vertex key), and the driver sees only the
    * changed-row COUNT, never data. Passes needed = graph diameter;
    * near-dup clusters are dense (diameter ≤ ~2), so the loop converges
    * in 2-3 passes on real corpora — for adversarially long chains cap
    * `maxIter` and the final labels are still a valid refinement
    * (documented below). At 100 TB each pass shuffles O(E) compact
    * (id, label) pairs; nothing vertex- or edge-shaped ever reaches the
    * driver.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions, in ONE scan of `pairs` (a
    // union of two selects would execute the caller's pair pipeline —
    // often a full LSH candgen — twice before the persist catches it);
    // min-aggregation semantics make duplicate edges harmless, so no
    // distinct() exchange
    val edges = pairs.select(explode(array(
      struct(col(aCol).as("u"), col(bCol).as("v")),
      struct(col(bCol).as("u"), col(aCol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Stages.matTruncating (eager), NOT bare persist: each pass derives
    // from the previous labels, so without lineage truncation the
    // logical plan doubles per iteration — planning itself becomes the
    // bottleneck (and eventually OOMs building plan strings). Truncating
    // per pass is the standard shape for iterative DataFrame algorithms;
    // `spark.graft.materialize = reliable` swaps in reliable
    // checkpoint() against the session's checkpoint dir when executor
    // loss must be recoverable mid-algorithm.
    //
    // Smart init: distance-1 minima come straight off the edge list (one
    // aggregate, no join) — the first propagation pass for free.
    var labels = Stages.matTruncating(edges
      .groupBy(col("u").as("id"))
      .agg(min(col("v")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("component")))
    // The convergence signal rides an ACCUMULATOR inside the checkpoint
    // materialization itself — one Spark job per pass, not two (the
    // former separate `count()` action doubled the driver round trips on
    // the bench's slowest query). Task retries can only over-count rows
    // that DID change; a converged pass has nothing to add, so the
    // `== 0` test stays exact.
    val changedAcc = pairs.sparkSession.sparkContext.longAccumulator("graft.cc.changed")
    val markChanged = udf { (component: Long, old: Long) =>
      if (component != old) changedAcc.add(1L)
      component
    }
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      changedAcc.reset()
      val next = Stages.matTruncating(propagateOnce(edges, labels)
        .select(col("id"), markChanged(col("component"), col("old")).as("component")))
      // the superseded round's checkpoint blocks are dead the moment
      // `next` is materialized — release them now instead of letting
      // them accumulate one labels-copy per pass in the block manager
      Stages.release(labels)
      labels = next
      converged = changedAcc.value == 0L
      iter += 1
    }
    edges.unpersist()
    // the RETURNED labels stay checkpointed (callers read them); those
    // final blocks are freed by the ContextCleaner when the caller drops
    // the frame. localCheckpoint blocks do not survive executor loss —
    // `spark.graft.materialize = reliable` (Stages.matTruncating) swaps
    // in reliable checkpoint() when a deployment must recover executors
    // mid-algorithm.
    labels
  }

  /** One propagation + pointer-jump pass — the plan the fixpoint loop
    * checkpoints each round, exposed so plan contracts can assert its
    * join strategy (PlanContractSpec: key joins, never a cartesian).
    *
    * Neighbor minimum: for each vertex, the smallest label among its
    * neighbors and itself; the previous label rides along as `old` so
    * the convergence check scans the checkpointed result instead of
    * running another join job. Then pointer jump (path doubling): follow
    * the fresh label one hop through itself, so distance-to-minimum
    * halves per pass and the loop converges in O(log diameter) passes
    * instead of O(diameter) — chain-shaped near-dup graphs (cosine
    * neighbors) otherwise force a pass per link. Labels only decrease
    * (component(x) ≤ x invariant), so least() keeps correctness.
    */
  private[graft] def propagateOnce(edges: DataFrame, labels: DataFrame): DataFrame = {
    val prop = edges
      .join(labels.withColumnRenamed("id", "v"), "v")
      .groupBy(col("u").as("id"))
      .agg(min(col("component")).as("nbr"))
      .join(labels, "id")
      .select(col("id"), least(col("component"), col("nbr")).as("component"),
        col("component").as("old"))
    prop
      .join(prop.select(col("id").as("component"), col("component").as("cc")),
        Seq("component"), "left")
      .select(col("id"),
        least(col("component"), coalesce(col("cc"), col("component"))).as("component"),
        col("old"))
  }

  /** Exact connected components for an edge list whose edges NEVER span
    * `keyCol` groups — the semantic-dedup shape, where pairs only ever
    * connect cell-mates of a bounded-size quantizer cell. Instead of the
    * O(log diameter)-pass driver fixpoint of [[connectedComponents]]
    * (each pass a checkpoint + several exchanges — pure scheduling
    * overhead when groups are small), ONE aggregation collects each
    * group's edges and a per-group union-find labels every vertex with
    * its component's MINIMUM id (identical labels to the fixpoint /
    * recursive-SQL closure). Per-task state is the group's edge set —
    * bounded by construction when the group key is an adaptive-nlist
    * cell (≤ ~targetCellSize² gate-passing pairs ≈ a few MB worst case,
    * and real gates pass far fewer); do NOT use this for unbounded
    * groups — that's what [[connectedComponents]] is for.
    * Returns (id, component), vertices of `pairs` only.
    */
  def groupedComponents(
      pairs: DataFrame, keyCol: String, aCol: String, bCol: String): DataFrame = {
    val uf = udf { (es: Seq[org.apache.spark.sql.Row]) =>
      // union-find, min-id root: parent maps only NON-root vertices, so
      // find() of an unseen vertex is itself; union points the larger
      // root at the smaller, keeping "root = min of set" invariant
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      es.foreach { e =>
        val ra = find(e.getLong(0)); val rb = find(e.getLong(1))
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      es.flatMap(e => Seq(e.getLong(0), e.getLong(1))).distinct
        .map(v => (v, find(v)))
    }
    pairs.groupBy(col(keyCol))
      .agg(collect_list(struct(col(aCol).cast("long"), col(bCol).cast("long"))).as("es"))
      .select(explode(uf(col("es"))).as("e"))
      .select(col("e._1").as("id"), col("e._2").as("component"))
  }

  /** DuckDB twin of [[connectedComponents]] over a CTE named `pairs`
    * with columns (aCol, bCol): recursive transitive closure, then
    * component = min reachable vertex. Exact for any graph the closure
    * fits; the Spark side scales where this cannot.
    */
  def connectedComponentsSql(aCol: String, bCol: String): String =
    s"""e AS (SELECT $aCol AS u, $bCol AS v FROM pairs
       |      UNION SELECT $bCol, $aCol FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v)
       |SELECT u AS id, least(u, min(v)) AS component
       |FROM reach GROUP BY u""".stripMargin.replace("\n", " ")
}
