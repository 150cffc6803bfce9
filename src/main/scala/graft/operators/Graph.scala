package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iterative graph analytics over the relational fixtures — the
  * link-quality side of a crawl/curation pipeline (rank web hosts by
  * link structure before sampling documents from them). The reference
  * has no graph operator; this extends the engine surface the same way
  * the dedup clustering (d10) does, but with a *converging iterative*
  * computation rather than a single transitive closure.
  *
  * PageRank here is FIXED-POINT INTEGER PageRank: ranks are carried as
  * scaled BIGINTs (SCALE = 1e12 per node) and every step uses integer
  * division, so the computation is bit-reproducible on any engine and
  * any partitioning — no order-dependent float sums. That is what makes
  * q82 fully oracle-checkable (DuckDB runs the same unrolled algebra)
  * where textbook double-precision PageRank would only ever be
  * rows-only. Reproducible integer ranking is also what you want at
  * 100 TB: a re-run on a different cluster layout must not reorder the
  * sampled corpus.
  *
  * Scale shape: each iteration is one shuffle — join(ranks ⋈ edges on
  * src, broadcast-free, both sides hash-partitioned by the join key) →
  * groupBy(dst).sum with map-side partial aggregation → left join back
  * onto the node list to re-inject teleport mass for dangling nodes.
  * The edge list and degree table are computed once and reused across
  * iterations; on a real cluster you'd persist + checkpoint them per
  * ~5 iterations to cut lineage. Dangling-node outflow is dropped (not
  * redistributed) — documented, and mirrored exactly by the oracle.
  */
object Graph {

  /** Per-node rank scale: 1e12 integer units per node keeps three
    * iterations of 85%-damped mass for graphs up to ~9e5 nodes inside
    * BIGINT (mass ≤ n·SCALE·0.85·degree-free bound < 9.2e18). Beyond
    * that, widen the rank column to DECIMAL(38,0) — the algebra is
    * unchanged.
    */
  val Scale: Long = 1000000000000L
  val DampNum = 85L // damping 0.85 as an exact rational 85/100
  val DampDen = 100L
  val Teleport: Long = Scale * (DampDen - DampNum) / DampDen // floor(0.15·SCALE)

  /** The customer↔supplier trading graph, DIRECTED half: one
    * (customer, supplier) pair per pair sharing at least one order
    * line. Supplier node ids are offset by 1e6 to keep the id spaces
    * disjoint. Symmetrized (both directions) by the caller.
    */
  private def tradingEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
  }

  /** q82: `iters` fixed-point PageRank sweeps over the trading graph,
    * top `k` nodes by final rank. rank_fp is the scaled integer rank.
    */
  def pageRank(spark: SparkSession, dir: String,
               iters: Int = 3, k: Int = 20): DataFrame = {
    // Materialize the symmetrized edge list ONCE (localCheckpoint: one
    // eager job; an unpersisted lineage re-derives the orders⋈lineitem
    // distinct ~10× over 3 sweeps). outdeg travels INSIDE the ranks
    // table — ranks is deg plus a rank column — so a sweep needs no
    // separate degree join and no separate node list: each sweep is
    // exactly one broadcast join against the stationary edge table plus
    // a partially-aggregated node-sized groupBy. On a real cluster:
    // same shape with persist-to-storage, checkpoint every ~5
    // iterations to truncate lineage, and the broadcast hint dropped
    // once |nodes| outgrows the driver (the join then degrades to a
    // shuffle join against this already-partitioned edge table).
    val directed = tradingEdges(spark, dir)
    val edges = directed.union(
      directed.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    var ranks = deg.withColumn("r", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(broadcast(ranks.withColumnRenamed("node", "rnode")),
          col("src") === col("rnode"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      // deg is the node list: left join re-seeds teleport mass for
      // nodes receiving no inbound contribution in an iteration
      ranks = deg.join(contrib, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(Teleport) +
            expr(s"(${DampNum}L * coalesce(inflow, 0L)) div ${DampDen}L")).as("r"))
    }
    ranks.orderBy(col("r").desc, col("node"))
      .limit(k)
      .select(col("node"), col("r").as("rank_fp"))
  }

  /** q83: multi-source BFS hop distance over the trading graph — the
    * reachability/radius side of graph curation (how far does a seed
    * host set propagate?). Seeds = customer nodes with id < 10; three
    * frontier sweeps; output = (node, hops) for every node reached
    * within 3 hops, min hop count. All-integer (hop counts), so — like
    * q82 — the full iterative computation hash-checks against unrolled
    * DuckDB CTEs.
    *
    * Scale shape: each sweep is one join(dist ⋈ edges on src) + one
    * min-groupBy — the same stationary-edge-table pattern as
    * [[pageRank]] (broadcast hint on the frontier; drop it once the
    * reached set outgrows the driver and it degrades to a shuffle join
    * against the already-partitioned edge table). Bounded-hop BFS is
    * the 100 TB-sane formulation: unbounded label propagation needs
    * O(diameter) rounds, bounded-hop needs exactly `maxHops`.
    */
  def bfsHops(spark: SparkSession, dir: String, maxHops: Int = 3): DataFrame = {
    val directed = tradingEdges(spark, dir)
    val edges = directed.union(
      directed.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var dist = edges.select(col("src").as("node")).distinct()
      .filter(col("node") < 10L)
      .withColumn("hops", lit(0L))
    for (_ <- 1 to maxHops) {
      val next = edges
        .join(broadcast(dist.withColumnRenamed("node", "dnode")),
          col("src") === col("dnode"))
        .select(col("dst").as("node"), (col("hops") + 1L).as("hops"))
      dist = dist.union(next).groupBy("node").agg(min(col("hops")).as("hops"))
    }
    dist.orderBy(col("node"))
  }

  /** The three BFS sweeps unrolled for the DuckDB oracle — each sweep
    * is the same union + min-group the Spark loop runs.
    */
  val bfsHopsOracleSql: String = {
    def sweep(prev: String, out: String): String =
      s"""$out AS (
         | SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM (
         |  SELECT bi.dst AS node, d.hops + 1 AS hops
         |  FROM bi JOIN $prev d ON bi.src = d.node
         |  UNION ALL SELECT node, hops FROM $prev)
         | GROUP BY node)""".stripMargin
    s"""WITH e AS (
       | SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
       | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |bi AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS hops
       |       FROM bi WHERE src < 10),
       |${sweep("d0", "d1")},
       |${sweep("d1", "d2")},
       |${sweep("d2", "d3")}
       |SELECT node, hops FROM d3 ORDER BY node""".stripMargin
  }

  /** The same three iterations unrolled as ANSI SQL for the DuckDB
    * oracle. `//` is DuckDB integer division (≡ Spark `div` on the
    * positive BIGINTs used here); sums are cast back to BIGINT because
    * DuckDB widens sum(BIGINT) to HUGEINT.
    */
  val pageRankOracleSql: String = {
    def iter(prev: String, out: String): String =
      s"""c$out AS (
         | SELECT bi.dst AS node,
         |  CAST(sum(r.r // d.outdeg) AS BIGINT) AS inflow
         | FROM bi JOIN $prev r ON bi.src = r.node
         |   JOIN deg d ON bi.src = d.node
         | GROUP BY bi.dst),
         |$out AS (
         | SELECT n.node,
         |  $Teleport + ($DampNum * COALESCE(c.inflow, 0)) // $DampDen AS r
         | FROM nodes n LEFT JOIN c$out c ON n.node = c.node)""".stripMargin
    s"""WITH e AS (
       | SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
       | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |bi AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |deg AS (SELECT src AS node, count(*) AS outdeg FROM bi GROUP BY 1),
       |nodes AS (SELECT node FROM deg),
       |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, r AS rank_fp FROM r3
       |ORDER BY rank_fp DESC, node LIMIT 20""".stripMargin
  }

  /** The part co-purchase graph: one undirected edge (canonical
    * `src < dst`) per pair of parts co-occurring in at least
    * `minSupport` orders. Pair fan-out per order is C(items, 2) —
    * bounded by the basket size, so the pair stream is linear in
    * lineitem with a small constant; the support threshold (the
    * A-Priori min-support rule) is what keeps the PROJECTED graph
    * sparse: a quasi-random bipartite projection is quadratically
    * dense in single co-occurrences (sf0.1: 1.2M support-1 edges vs
    * 3.6k support-2 — single co-occurrence is noise, not signal, in
    * any basket analysis), and every downstream graph cost is edge-
    * bounded.
    */
  private def coPurchaseEdges(spark: SparkSession, dir: String,
                              minSupport: Long = 2L): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val a = op.select(col("ok"), col("pk").as("src"))
    val b = op.select(col("ok").as("ok2"), col("pk").as("dst"))
    a.join(b, col("ok") === col("ok2") && col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("src"), col("dst"))
  }

  /** q87: triangle count over the support-≥2 part co-purchase graph —
    * the clustering-density probe of a link/citation graph (how
    * cliquish is the co-occurrence structure a crawl sampler would
    * follow?). Output is one fully integer row: nodes, edges,
    * triangles of the supported graph.
    *
    * Scale shape — DEGREE-ORIENTED wedge join (the classic
    * MapReduce-triangles design): every undirected edge is oriented
    * from its (degree, id)-smaller endpoint, so wedges are enumerated
    * only at each triangle's (degree, id)-minimum vertex. The
    * wedge-join fan-out per vertex is then out-degree², and
    * orientation bounds out-degree by O(√m) on any graph (arboricity
    * bound) — a hub with a million undirected neighbors enumerates
    * none of its wedge pairs; its low-degree neighbors each enumerate
    * a few. The naive id-ordered join (what the DuckDB oracle runs)
    * has unbounded deg² blowup at hubs and dies at scale; both count
    * each triangle exactly once, which is the cross-check.
    * Three shuffles total: degree agg, orientation join, wedge join +
    * closing-edge semi-join.
    */
  def triangleCount(spark: SparkSession, dir: String,
                    checkpoint: Boolean = true): DataFrame = {
    // the edge table feeds four consumers (degree agg, orientation
    // join, closing-edge join, edge count) — materialize it once;
    // checkpoint=false keeps the build lazy for plan dumps
    val built = coPurchaseEdges(spark, dir)
    val edges = if (checkpoint) built.localCheckpoint() else built
    val deg = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

    // orient by (deg, id): u -> w where u is the smaller endpoint
    val ds = deg.select(col("v").as("src"), col("deg").as("deg_s"))
    val dd = deg.select(col("v").as("dst"), col("deg").as("deg_d"))
    val oriented = edges.join(ds, "src").join(dd, "dst")
      .select(
        when(col("deg_s") < col("deg_d") ||
          (col("deg_s") === col("deg_d") && col("src") < col("dst")),
          col("src")).otherwise(col("dst")).as("u"),
        when(col("deg_s") < col("deg_d") ||
          (col("deg_s") === col("deg_d") && col("src") < col("dst")),
          col("dst")).otherwise(col("src")).as("w"))

    // wedges centered at u (the minimum vertex of any triangle they
    // close); canonicalize the open pair for the closing-edge lookup
    val e1 = oriented.select(col("u"), col("w").as("w1"))
    val e2 = oriented.select(col("u").as("u2"), col("w").as("w2"))
    // wedge rows are distinct per (center, pair) and a triangle has
    // exactly ONE (deg, id)-minimum vertex, so the inner join against
    // the deduped edge list matches each wedge at most once and each
    // triangle exactly once — a plain count, no dedup needed
    val wedges = e1.join(e2, col("u") === col("u2") && col("w1") < col("w2"))
      .select(col("w1").as("src"), col("w2").as("dst"))
    val triCount = wedges.join(edges, Seq("src", "dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(triCount)
  }

  /** q90: association rules over the part co-purchase baskets —
    * support / confidence / lift for every part pair bought together
    * in ≥ `minSupport` orders (the 2-itemset core of market-basket /
    * co-occurrence mining; at corpus scale, the same shape ranks
    * "documents cited together" or "tokens co-occurring in a window").
    *
    * Portability: all counts are exact integers off one basket table;
    * `confidence = pair/cnt_a` and `lift = pair·N/(cnt_a·cnt_b)` are
    * each ONE double division of exact int64 products — deterministic
    * IEEE bits on any engine, so the gate hash-checks.
    *
    * Scale shape: the pair enumeration joins the basket table to
    * itself ON THE ORDER KEY — co-partitioned by basket, fan-out
    * C(items-per-basket, 2), never cross-basket; per-part counts are
    * one map-side-combined groupBy; the scalar basket count rides in
    * as a broadcast single row (no driver collect); the two count
    * lookups are key joins on the (much smaller) pair table.
    */
  def assocRules(spark: SparkSession, dir: String,
                 minSupport: Long = 2L): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint() // feeds pair join (twice), counts, and N
    val cnt = baskets.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val nOrders = baskets.agg(countDistinct(col("ok")).as("n_orders"))
    val x = baskets.select(col("ok"), col("pk").as("part_a"))
    val y = baskets.select(col("ok").as("ok2"), col("pk").as("part_b"))
    val pairs = x.join(y, col("ok") === col("ok2") &&
                          col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
    pairs
      .join(cnt.select(col("pk").as("part_a"), col("c").as("cnt_a")), "part_a")
      .join(cnt.select(col("pk").as("part_b"), col("c").as("cnt_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        (col("pair_cnt").cast("double") / col("cnt_a")).as("confidence"),
        ((col("pair_cnt") * col("n_orders")).cast("double") /
          (col("cnt_a") * col("cnt_b"))).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }
}
