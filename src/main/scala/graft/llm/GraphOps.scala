package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.{Materialize, QueryDef, QueryGroup}

/** Graph analytics over the near-duplicate similarity graph (the corpus
  * graph the dedup family already builds): PageRank as the second
  * iterative-propagation operator next to [[Dedup]]'s connected
  * components.
  *
  * Determinism: floating-point PageRank sums are partition-order
  * dependent, so the whole computation runs in 1e12-scaled BIGINT
  * fixed-point — integer sums are exact and order-independent, and
  * truncating integer division (`div` / DuckDB `//`) is bit-identical in
  * both engines, so the oracle replays the iterations as plain CTEs.
  *
  * Scale shape: each iteration is one join (ranks ⋈ edges on an 8-byte
  * key) + one aggregation — the standard distributed PageRank step; the
  * iteration COUNT is fixed (3), so lineage stays bounded without
  * checkpointing. Edges reuse the stop-shingle-capped Jaccard pipeline,
  * so the graph build is linear, not all-pairs.
  */
object GraphOps extends QueryGroup {

  private val Scale = 1000000000000L // 1e12 fixed-point
  private val Iters = 3

  /** Session-scoped materialization of the thresholded dup-graph edge
    * set all three `graph_*` queries start from: the capped-Jaccard
    * shingle pipeline is the dominant shared cost of the family
    * (re-derived per query, it was ~60% of each), so the FIRST family
    * query in a session pays one parquet write of the (doc_a, doc_b)
    * pairs and the rest read it back — a derived-dataset cache, the
    * in-session analogue of the persisted `IvfIndex`/`PostingsIndex`
    * artifacts. Keyed by the SOURCE FILE STATE (name/size/mtime walk of
    * `documents.parquet`), never the path alone: a rewritten fixture at
    * the same path re-derives (and sweeps the stale materialization),
    * so no spec or re-generated corpus can read stale edges
    * (`GraphPackSpec` asserts both the equality and the invalidation).
    * Disk, not cache: `Release.storage` between bench queries drops
    * every block, and the memo must survive it. Cold-vs-warm cost is
    * disclosed in SCALING.md — the bench board's pagerank time carries
    * the build, the other two family members read warm. */
  private[llm] object PairsMemo
      extends graft.core.DerivedFixture("graph_pairs_memo", "documents") {
    // the memo keeps the SCORE so every >= 0.3 consumer can slice its
    // own threshold: the graph family reads the whole set, the clusters
    // family (dedup_clusters / dedup_keep_best) filters >= 0.5 —
    // identical rows to a direct derivation either way. DerivedFixture
    // supplies the source fingerprinting, the staged atomic build, and
    // the stale-sibling sweep — so a JVM restart no longer orphans the
    // previous fingerprint's directory (it is swept on the next
    // re-derive of the same source-dir key), and a crashed build can
    // never be mistaken for a complete memo.
    // layered on JaccardPairsMemo (r15 — the build is now its ≥ 0.3
    // slice, whose own tag composes ShingleHashMemo's): the composed
    // tag re-derives this fixture on an upstream bump at either layer
    override protected[graft] def layoutTag: String =
      s"v2-jp${Dedup.JaccardPairsMemo.layoutTag}"

    override protected def build(s: SparkSession, dir: String,
        target: String): Unit =
      Dedup.jaccardPairs(s, dir).filter(col("jaccard") >= 0.3)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .write.mode("overwrite").parquet(target)

    def pairs(s: SparkSession, d: String): DataFrame =
      s.read.parquet(ensure(s, d)).select(col("doc_a"), col("doc_b"))

    /** The >= `minJaccard` slice of the memoized pair set (minJaccard must
      * be >= the memo's own 0.3 floor or the slice would silently miss
      * pairs the memo never stored). */
    def pairsAtLeast(s: SparkSession, d: String, minJaccard: Double): DataFrame = {
      require(minJaccard >= 0.3, s"memo stores jaccard >= 0.3 only; got $minJaccard")
      scoredPairsAtLeast(s, d, minJaccard).select(col("doc_a"), col("doc_b"))
    }

    /** Same slice WITH the stored exact-Jaccard score — the raw double
      * [[Dedup.jaccardPairs]] computed (parquet round-trips it exactly),
      * for consumers that grade or rank on the value (`dedup_minhash_ml`'s
      * exact side). */
    def scoredPairsAtLeast(s: SparkSession, d: String,
        minJaccard: Double): DataFrame = {
      require(minJaccard >= 0.3, s"memo stores jaccard >= 0.3 only; got $minJaccard")
      s.read.parquet(ensure(s, d)).filter(col("jaccard") >= minJaccard)
    }
  }

  /** The >= 0.3 dup-graph edge set derived INLINE (r16 memo policy:
    * graded paths never read persisted fixtures; [[PairsMemo]] stays
    * for tests/tools), CACHED because every family query reads it 2-3
    * times (both-orientation unions / degree + edge builds) before its
    * Materialize.cut — an in-plan cache the harness releases after the
    * query. */
  private def pairsInline(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairsDirect(s, d).filter(col("jaccard") >= 0.3)
      .select(col("doc_a"), col("doc_b")).cache()

  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = pairsInline(s, d)
    // read 3× (outdeg + every iteration); materialize the pair pipeline
    // once — reliably checkpointed in cluster mode (Materialize.cut)
    val edges = Materialize.cut(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = outdeg.select(col("src").as("node"), col("outdeg"))
    val nNodes = nodes.count() // one scalar, like the IVF centroid collect
    if (nNodes == 0) {
      // degenerate corpus with no near-dup pairs: empty result, stable schema
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("node", LongType, nullable = false)
          .add("rank_scaled", LongType, nullable = false))
    }
    val base = (Scale / nNodes) * 15L / 100L
    var ranks = nodes.select(col("node"),
      lit(Scale / nNodes).as("rank"))
    for (_ <- 1 to Iters) {
      val contrib = ranks
        .join(nodes, Seq("node"))
        .withColumn("c", expr("rank div outdeg"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.select(col("node")).join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("rank"))
    }
    ranks.select(col("node"), col("rank").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node"))
  }

  private val pagerankSql =
    s"""${Dedup.jaccardCte},
       |pairs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_common AS DOUBLE) >= 0.3),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |n AS (SELECT COUNT(*) AS nn FROM deg),
       |r0 AS (SELECT node, outdeg, CAST($Scale AS BIGINT) // nn AS rank FROM deg, n),
       |i1 AS (SELECT d.node, d.outdeg,
       |         CAST((CAST($Scale AS BIGINT) // nn) * 15 // 100
       |           + COALESCE(SUM(r.rank // r.outdeg), 0) * 85 // 100
       |           AS BIGINT) AS rank
       |       FROM deg d CROSS JOIN n
       |       LEFT JOIN edges e ON e.dst = d.node
       |       LEFT JOIN r0 r ON r.node = e.src
       |       GROUP BY d.node, d.outdeg, nn),
       |i2 AS (SELECT d.node, d.outdeg,
       |         CAST((CAST($Scale AS BIGINT) // nn) * 15 // 100
       |           + COALESCE(SUM(r.rank // r.outdeg), 0) * 85 // 100
       |           AS BIGINT) AS rank
       |       FROM deg d CROSS JOIN n
       |       LEFT JOIN edges e ON e.dst = d.node
       |       LEFT JOIN i1 r ON r.node = e.src
       |       GROUP BY d.node, d.outdeg, nn),
       |i3 AS (SELECT d.node,
       |         CAST((CAST($Scale AS BIGINT) // nn) * 15 // 100
       |           + COALESCE(SUM(r.rank // r.outdeg), 0) * 85 // 100
       |           AS BIGINT) AS rank
       |       FROM deg d CROSS JOIN n
       |       LEFT JOIN edges e ON e.dst = d.node
       |       LEFT JOIN i2 r ON r.node = e.src
       |       GROUP BY d.node, nn)
       |SELECT node, rank AS rank_scaled FROM i3
       |ORDER BY rank_scaled DESC, node""".stripMargin

  // ---- graph_triangles: degree-ordered triangle counting ----------------
  // Per-node triangle counts over the same similarity graph as PageRank —
  // the local-clustering signal (a doc in many triangles sits in a dense
  // near-dup community; one in none is a chance pairing). Exact integer
  // counts, so cross-engine determinism is free.
  //
  // Scale shape — the MapReduce triangle-counting design (Suri &
  // Vassilvitskii 2011, WWW): orient every undirected edge from its
  // lower-(degree, id) endpoint to the higher one. The orientation makes
  // the edge set a DAG whose max out-degree is O(√m), so the wedge join
  // (e ⋈ e on the source) generates O(m^1.5) candidates TOTAL instead of
  // Σ deg² — a hub with a million neighbors contributes nothing from its
  // own wedge list because all its edges point INTO it. Each triangle
  // then closes exactly once, at its minimum corner. Three joins on
  // 8-byte ids; the edge pipeline itself is the stop-shingle-capped
  // linear build shared with PageRank (never all-pairs), and the oriented
  // edge set is materialized once ([[Materialize.cut]]) since the wedge
  // join reads it from both sides plus the closing probe.
  private def triangles(s: SparkSession, d: String): DataFrame = {
    val pairs = pairsInline(s, d)
    val deg = pairs.select(col("doc_a").as("node"))
      .union(pairs.select(col("doc_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val e = Materialize.cut(pairs
      .join(deg.select(col("node").as("doc_a"), col("dg").as("da")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("dg").as("db")), Seq("doc_b"))
      .select(
        when(lowFirst, col("doc_a")).otherwise(col("doc_b")).as("u"),
        when(lowFirst, col("doc_b")).otherwise(col("doc_a")).as("v")))
    // wedges at u close iff (x, y) is itself an oriented edge; exactly one
    // of the (x, y)/(y, x) wedge orders can match, so each triangle counts
    // once — no /3, no distinct
    val wedges = e.select(col("u"), col("v").as("x"))
      .join(e.select(col("u"), col("v").as("y")), Seq("u"))
      .filter(col("x") =!= col("y"))
    val tri = wedges.join(e.select(col("u").as("x"), col("v").as("y")),
      Seq("x", "y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
  }

  private val trianglesSql =
    s"""${Dedup.jaccardCte},
       |prs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_common AS DOUBLE) >= 0.3),
       |deg AS (SELECT node, COUNT(*) AS dg FROM (
       |  SELECT doc_a AS node FROM prs UNION ALL SELECT doc_b FROM prs) GROUP BY node),
       |e AS (SELECT
       |  CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND doc_a < doc_b)
       |    THEN doc_a ELSE doc_b END AS u,
       |  CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND doc_a < doc_b)
       |    THEN doc_b ELSE doc_a END AS v
       |  FROM prs
       |  JOIN deg da ON da.node = doc_a
       |  JOIN deg db ON db.node = doc_b),
       |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.u = e1.u AND e1.v <> e2.v
       |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
       |corners AS (SELECT a AS node FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri)
       |SELECT node, COUNT(*) AS n_tri FROM corners
       |GROUP BY node ORDER BY n_tri DESC, node""".stripMargin

  // ---- graph_degree_dist: degree distribution of the similarity graph ---
  // The graph-shape diagnostic read before ANY iterative graph op: the
  // degree histogram (with cumulative share) is what says whether the
  // dup graph is a scatter of small cliques (dedup-friendly) or has a
  // giant hub (the skew that blows up pair joins and CC diameter). Runs
  // on the SAME capped-Jaccard edge set as PageRank/CC, so it profiles
  // exactly the graph those operators will see.
  //
  // Scale shape: the edge build is the linear shingle pipeline; degrees
  // are one count agg on 8-byte node ids; the histogram collapses to
  // |distinct degrees| rows, so its global cum-share window is over a
  // broadcast-sized frame — the corpus never feeds a global sort.
  private def degreeDist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // each undirected pair contributes one degree to EACH endpoint, so a
    // single explode over both ids replaces the pairs ∪ swapped-pairs
    // union — which would recompute the whole shingle pipeline twice
    // (measured 5.3 s vs 4.7 s at sf0.1 — the saving grows with the
    // shingle pipeline's share of the cost)
    val deg = pairsInline(s, d)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tot = deg.agg(count(lit(1)).as("n_nodes"))
    val wc = Window.orderBy(col("degree"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deg.groupBy(col("degree")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .withColumn("share",
        col("n").cast("double") / col("n_nodes").cast("double"))
      .withColumn("cum_share",
        sum(col("n")).over(wc).cast("double") / col("n_nodes").cast("double"))
      .select(col("degree"), col("n"), col("share"), col("cum_share"))
      .orderBy(col("degree"))
  }

  private val degreeDistSql =
    s"""${Dedup.jaccardCte},
       |pairs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_common AS DOUBLE) >= 0.3),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src),
       |h AS (SELECT degree, COUNT(*) AS n FROM deg GROUP BY degree),
       |t AS (SELECT COUNT(*) AS n_nodes FROM deg)
       |SELECT degree, n,
       |  CAST(n AS DOUBLE) / n_nodes AS share,
       |  CAST(CAST(SUM(n) OVER (ORDER BY degree ROWS BETWEEN UNBOUNDED
       |    PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE) / n_nodes
       |    AS cum_share
       |FROM h CROSS JOIN t ORDER BY degree""".stripMargin

  // ---- graph_kcore: k-core peeling of the similarity graph --------------
  // The density filter between "has a neighbor" and "sits in a clique":
  // iteratively remove nodes with degree < k until the k-core remains —
  // a chain of pairwise near-dups dissolves, a dup COMMUNITY survives.
  // Fixed at k=2, FOUR peeling rounds (the semantics is "4 rounds", so
  // both engines run the identical bounded computation whether or not
  // the fixture converges earlier — the pagerank fixed-iteration rule).
  // Each round is one degree agg + two semi-join filters on 8-byte ids;
  // Materialize.cut bounds lineage per round; all counts exact BIGINT.
  private def kcore(s: SparkSession, d: String): DataFrame = {
    val K = 2
    val Rounds = 4
    val pairs = pairsInline(s, d)
    var edges = Materialize.cut(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    for (_ <- 1 to Rounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= K).select(col("src").as("node"))
      edges = Materialize.cut(edges
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
    }
    edges.groupBy(col("src")).agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("node"), col("core_degree"))
      .orderBy(col("core_degree").desc, col("node"))
  }

  // every round's CTEs are MATERIALIZED: e_i references e_{i−1} three
  // times (degree agg + two IN filters), and inlined that re-plans the
  // whole shingle pipeline 3^rounds times — DuckDB ran out of memory at
  // sf0.1 before materialization forced each round to compute once
  private val kcoreSql = {
    val rounds = (1 to 4).map { i =>
      val prev = if (i == 1) "edges" else s"e${i - 1}"
      s"""k$i AS MATERIALIZED (
         |  SELECT src AS node FROM $prev GROUP BY src HAVING COUNT(*) >= 2),
         |e$i AS MATERIALIZED (
         |  SELECT src, dst FROM $prev
         |  WHERE src IN (SELECT node FROM k$i) AND dst IN (SELECT node FROM k$i))"""
        .stripMargin
    }.mkString(",\n")
    s"""${Dedup.jaccardCte},
       |prs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_common AS DOUBLE) >= 0.3),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM prs
       |  UNION ALL SELECT doc_b, doc_a FROM prs),
       |$rounds
       |SELECT src AS node, COUNT(*) AS core_degree FROM e4
       |GROUP BY src ORDER BY core_degree DESC, node""".stripMargin
  }

  // ---- graph_lpa_communities: synchronous label propagation --------------
  // Community detection over the near-dup graph — the structure
  // `dedup_clusters`' connected components can't see: CC merges anything
  // reachable, LPA splits a chained component into densely-linked
  // communities (the template-family signal: one boilerplate family =
  // one community even when a stray pair chains two families together).
  // Classic sync LPA (Raghavan et al. 2007) with every tie pinned: per
  // round each node adopts its neighbors' MOST FREQUENT label, ties by
  // (count DESC, label ASC); labels start as the node id; a FIXED 3
  // rounds, so the oracle unrolls exactly like pagerank's. Sync +
  // deterministic tie-break makes the result engine-independent (async
  // LPA is order-dependent and ungradable).
  //
  // Scale shape: per round ONE join of the label table into the edge
  // list (both keyed by 8-byte node ids) + a (node, label) hash agg + a
  // node-bounded rank window; per-round state is Materialize.cut (the
  // iterative-loop rule). Rounds are fixed, lineage bounded.
  private def lpaCommunities(s: SparkSession, d: String): DataFrame = {
    val pairs = pairsInline(s, d)
    val edges = Materialize.cut(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    if (edges.isEmpty) {
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("node", LongType, nullable = false)
          .add("community", LongType, nullable = false))
    }
    lpaOnEdges(edges)
  }

  /** The LPA loop on a both-directions (src, dst) edge set — split out so
    * the semantics are pinnable on hand-built graphs (`GraphPackSpec`
    * runs the barbell graph where LPA finds TWO communities in the ONE
    * component CC reports). */
  private[llm] def lpaOnEdges(edges: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("cnt").desc, col("label"))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      labels = Materialize.cut(edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label")))
    }
    labels.select(col("node"), col("label").as("community"))
      .orderBy(col("node"))
  }

  /** The shared LPA replay: jaccard pairs → both-direction edges → three
    * unrolled sync-LPA rounds, final labels in `l3`. The communities
    * query selects it directly; `graph_modularity` aggregates over it. */
  private val lpaCtes = {
    def round(prev: String, cur: String) =
      s"""$cur AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT e.dst AS node, l.label AS label, COUNT(*) AS cnt,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l.label) AS rn
         |    FROM edges e JOIN $prev l ON l.node = e.src
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1)""".stripMargin
    s"""${Dedup.jaccardCte},
       |pairs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.nsh + sb.nsh - n_common AS DOUBLE) >= 0.3),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")}""".stripMargin
  }

  private val lpaSql =
    s"""$lpaCtes
       |SELECT node, label AS community FROM l3 ORDER BY node""".stripMargin

  // ---- graph_modularity: Newman quality score of the LPA partition ------
  /** Per-community modularity terms Q_c = intra₂/m₂ − (d_c/m₂)² over the
    * directed (both-direction) edge count m₂ — Newman's Q is their sum,
    * computable here as exact long arithmetic over the q6-quantized
    * terms. Answers "did LPA find real structure or just split noise":
    * positive terms = denser-than-random communities. Shape: the LPA
    * labels (the fixed 3-round loop) + two label-keyed joins of the edge
    * list + three hash aggs, all on the near-dup subgraph; the 1-row m₂
    * is a broadcast. Each term is one fixed IEEE chain per community;
    * ties/order never matter (no cross-community arithmetic). */
  private def modularity(s: SparkSession, d: String): DataFrame = {
    val pairs = pairsInline(s, d)
    val edges = Materialize.cut(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    if (edges.isEmpty) {
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("community", LongType, nullable = false)
          .add("n_nodes", LongType, nullable = false)
          .add("intra2", LongType, nullable = false)
          .add("degree_sum", LongType, nullable = false)
          .add("q_term_q6", LongType, nullable = false))
    }
    modularityOnEdges(edges)
  }

  /** The modularity aggregation on a both-directions edge set — split out
    * (the lpaOnEdges rule) so `GraphPackSpec` can pin the exact terms on
    * the hand-traced barbell graph. */
  private[llm] def modularityOnEdges(edges: DataFrame): DataFrame = {
    val lab = Materialize.cut(lpaOnEdges(edges))
    val withA = edges
      .join(lab.select(col("node").as("src"), col("community").as("ca")),
        Seq("src"))
    val deg = withA.groupBy(col("ca")).agg(count(lit(1)).as("degree_sum"))
    val intra = withA
      .join(lab.select(col("node").as("dst"), col("community").as("cb")),
        Seq("dst"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca")).agg(count(lit(1)).as("intra2"))
    val nn = lab.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    val m2 = edges.agg(count(lit(1)).as("m2"))
    def dd(c: org.apache.spark.sql.Column) =
      c.cast(DoubleType) / col("m2").cast(DoubleType)
    nn.join(deg, col("community") === col("ca"))
      .join(intra.withColumnRenamed("ca", "cb"),
        col("community") === col("cb"), "left")
      .crossJoin(broadcast(m2))
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra2"), lit(0L)).as("intra2"), col("degree_sum"),
        ((dd(coalesce(col("intra2"), lit(0L)))
            - dd(col("degree_sum")) * dd(col("degree_sum")))
          .cast(DecimalType(18, 6)) * lit(1000000))
          .cast(LongType).as("q_term_q6"))
      .orderBy(col("community"))
  }

  private val modularitySql =
    s"""$lpaCtes,
       |lab AS (SELECT node, label AS community FROM l3),
       |m AS (SELECT COUNT(*) AS m2 FROM edges),
       |wa AS (SELECT e.dst, a.community AS ca FROM edges e
       |       JOIN lab a ON e.src = a.node),
       |deg AS (SELECT ca, COUNT(*) AS degree_sum FROM wa GROUP BY ca),
       |intra AS (
       |  SELECT wa.ca, COUNT(*) AS intra2
       |  FROM wa JOIN lab b ON wa.dst = b.node AND wa.ca = b.community
       |  GROUP BY wa.ca),
       |nn AS (SELECT community, COUNT(*) AS n_nodes FROM lab GROUP BY community)
       |SELECT nn.community, nn.n_nodes,
       |  COALESCE(intra.intra2, 0) AS intra2, deg.degree_sum,
       |  CAST(CAST(
       |    CAST(COALESCE(intra.intra2, 0) AS DOUBLE) / CAST(m.m2 AS DOUBLE)
       |    - (CAST(deg.degree_sum AS DOUBLE) / CAST(m.m2 AS DOUBLE))
       |      * (CAST(deg.degree_sum AS DOUBLE) / CAST(m.m2 AS DOUBLE))
       |    AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q_term_q6
       |FROM nn JOIN deg ON nn.community = deg.ca
       |LEFT JOIN intra ON nn.community = intra.ca
       |CROSS JOIN m
       |ORDER BY community""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "graph_modularity" -> QueryDef(modularity, Some(modularitySql)),
    "graph_pagerank" -> QueryDef(pagerank, Some(pagerankSql)),
    "graph_triangles" -> QueryDef(triangles, Some(trianglesSql)),
    "graph_degree_dist" -> QueryDef(degreeDist, Some(degreeDistSql)),
    "graph_kcore" -> QueryDef(kcore, Some(kcoreSql)),
    "graph_lpa_communities" -> QueryDef(lpaCommunities, Some(lpaSql)))
}
