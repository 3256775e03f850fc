package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Graph analytics over a derived co-occurrence graph (SURVEY.md §2b
  * "Graph analytics" family, added round 8).
  *
  * The graph: two parts are connected when they ship together in at
  * least MinSupport orders — the classic market-basket projection of a
  * fact table onto an item-item graph, support-thresholded as every
  * production co-occurrence graph is (see MinSupport). Edge derivation
  * is a distinct-project + equi self-join on the order key feeding one
  * hash aggregate on the pair; the self-join shuffles once on the order
  * key, the `a < b` orientation halves the pair space, and the
  * per-order fanout is bounded by lines-per-order. The derived graph
  * persists as a fingerprinted layout shared by all three queries.
  *
  * PageRank runs a FIXED number of power iterations (deterministic, so it
  * oracles against an unrolled-CTE DuckDB query). Each iteration is one
  * shuffle-hash join (edges ⋈ ranks on the source vertex) plus one hash
  * aggregate (sum of contributions per destination) — the canonical
  * distributed PageRank shape; the vertex-count scalar rides a 1-row
  * broadcast (BNLJ-allowlisted), never a driver-side collect. Nodes are
  * defined FROM the edge list, so every vertex has degree ≥ 1: no
  * dangling-mass redistribution term is needed and the per-iteration
  * aggregate covers every vertex.
  */
object Graph {

  /** Damping factor and iteration count — fixed so results are exact. */
  private val Damping = 0.85
  private val Iters = 5

  /** Minimum co-occurrence support for an edge (the market-basket
    * support threshold): a pair must ship together in ≥ MinSupport
    * orders. Without it the edge set is dominated by combinatorial
    * noise that GROWS with scale (sf0.1: 1.196M pairs, of which only
    * 3,573 repeat); with it the graph is the scale-STABLE signal set
    * (2.3k / 3.4k / 3.6k edges across the three fixture SFs), and every
    * downstream traversal runs on signal, not noise — exactly why
    * production co-occurrence graphs always threshold support. */
  private val MinSupport = 2

  /** Undirected edge set, oriented src < dst, deduplicated — PERSISTED
    * as a fingerprinted layout shared by all three graph queries.
    *
    * Two materialization layers, each load-bearing:
    *  - the parquet layout makes the derived graph a per-dataset
    *    artifact (the fact-table projection runs once, not once per
    *    query — pagerank, triangles, and degree-dist all consume it);
    *  - localCheckpoint on the read cuts lineage WITHIN a query: every
    *    consumer references the edge table several times (self-joins,
    *    per-iteration joins), and without the cut Catalyst inlines the
    *    scan subtree at every reference — the round-8 first plan
    *    carried 131 planned shuffles for PageRank. Materializing the
    *    graph before iterating is the Pregel discipline; both layers
    *    are O(edges), the thing iterated over. */
  private def undirectedEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sfx = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"/tmp/graft_graph/$sfx"
    graft.llm.Layouts.parquetLayout(path, path,
        graft.llm.Layouts.fingerprint(
          Tables.lineitem(s, dir), "l_orderkey", "l_partkey")) {
      val lp = Tables.lineitem(s, dir)
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      lp.as("a").join(lp.as("b"),
          $"a.o" === $"b.o" && $"a.p" < $"b.p")
        .groupBy($"a.p".as("src"), $"b.p".as("dst"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= MinSupport)
        .select($"src", $"dst")
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path).localCheckpoint()
  }

  /** Both directions — the form PageRank and degree queries consume.
    * Built on the checkpointed undirected set, so the union body is two
    * scans of the materialized edges, not two re-derivations. */
  private def directedEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = undirectedEdges(s, dir)
    e.union(e.select($"dst".as("src"), $"src".as("dst")))
  }

  private val edgeCte =
    s"""lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       e0 AS (SELECT a.p AS src, b.p AS dst
              FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p HAVING count(*) >= $MinSupport),
       e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""

  /** Fixed-iteration PageRank; see object scaladoc for the plan shape. */
  val pagerank: GraftQuery = GraftQuery(
    "graph_pagerank",
    (s, dir) => {
      import s.implicits._
      val e = directedEdges(s, dir)
      // (src, deg) one row per vertex; checkpointed — referenced by the
      // weighted edges, the vertex count, and the initial ranks.
      val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      // (src, dst, deg(src)) — materialized once, scanned every iteration.
      val weighted = e.join(deg.hint("shuffle_hash"), "src")
        .localCheckpoint()
      val nRow = deg.agg(count(lit(1)).as("n")) // 1-row vertex count
      var ranks = deg.crossJoin(broadcast(nRow))
        .select($"src".as("v"), (lit(1.0) / $"n").as("r"))
      for (_ <- 1 to Iters) {
        val contrib = weighted.join(ranks.hint("shuffle_hash"), $"src" === $"v")
          .groupBy($"dst").agg(sum($"r" / $"deg").as("c"))
        ranks = contrib.crossJoin(broadcast(nRow))
          .select($"dst".as("v"),
            (lit(1 - Damping) / $"n" + lit(Damping) * $"c").as("r"))
      }
      ranks.select($"v".as("part_id"), round($"r", 4).as("rank"))
        .orderBy($"part_id")
    },
    Some {
      // Unrolled power iterations: r1..r5 each re-state the same
      // join+aggregate the Spark loop builds.
      val iters = (1 to Iters).map { i =>
        s"""r$i AS (SELECT e.dst AS v,
                           (1 - $Damping) / (SELECT n FROM n)
                             + $Damping * sum(p.r / deg.deg) AS r
                    FROM e JOIN r${i - 1} p ON e.src = p.v
                           JOIN deg ON e.src = deg.src
                    GROUP BY e.dst)"""
      }.mkString(",\n")
      s"""WITH $edgeCte,
            deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
            n AS (SELECT count(*) AS n FROM deg),
            r0 AS (SELECT src AS v, 1.0 / (SELECT n FROM n) AS r FROM deg),
            $iters
          SELECT v AS part_id, round(r, 4) AS rank FROM r$Iters
          ORDER BY part_id"""
    }
  )

  /** Triangle count via the oriented (src<dst) edge list: enumerate wedges
    * a<b<c with edges ab, bc and probe ac. Two equi self-joins — the
    * degree-bounded enumeration every distributed triangle counter uses;
    * the a<b<c orientation means each triangle is found exactly once. At
    * skew, production systems orient by degree instead of id; the id
    * orientation keeps the oracle trivially identical. */
  val triangles: GraftQuery = GraftQuery(
    "graph_triangles",
    (s, dir) => {
      import s.implicits._
      val e = undirectedEdges(s, dir)
      val tri = e.as("ab")
        .join(e.as("bc"), $"ab.dst" === $"bc.src")
        .join(e.as("ac"),
          $"ab.src" === $"ac.src" && $"bc.dst" === $"ac.dst")
        .agg(count(lit(1)).as("n_triangles"))
      val stats = e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(e.select($"src").union(e.select($"dst"))
          .distinct().agg(count(lit(1)).as("n_nodes")))
      tri.crossJoin(stats).select($"n_triangles", $"n_edges", $"n_nodes")
    },
    Some(s"""WITH $edgeCte,
               tri AS (SELECT count(*) AS n_triangles
                       FROM e0 ab JOIN e0 bc ON ab.dst = bc.src
                            JOIN e0 ac ON ab.src = ac.src AND bc.dst = ac.dst),
               st AS (SELECT count(*) AS n_edges FROM e0),
               nd AS (SELECT count(DISTINCT v) AS n_nodes FROM (
                        SELECT src AS v FROM e0 UNION ALL SELECT dst FROM e0))
             SELECT n_triangles, n_edges, n_nodes FROM tri, st, nd""")
  )

  /** Degree distribution: how many vertices have each degree — the first
    * diagnostic run on any production graph (skew detection before a
    * traversal). Two hash aggregates, no joins. */
  val degreeDist: GraftQuery = GraftQuery(
    "graph_degree_dist",
    (s, dir) => {
      import s.implicits._
      directedEdges(s, dir)
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .groupBy($"deg").agg(count(lit(1)).as("n_vertices"))
        .orderBy($"deg")
    },
    Some(s"""WITH $edgeCte,
               deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
             SELECT deg, count(*) AS n_vertices FROM deg
             GROUP BY deg ORDER BY deg""")
  )

  def all: Seq[GraftQuery] = Seq(pagerank, triangles, degreeDist)
}
