"""Graded queries for co-occurrence PMI and similarity-graph triangles.

The triangle query chains two scale-shaped stages: SimHash fingerprints
(one 16-column hash aggregate) -> Hamming pairs -> degree-oriented
wedge join.  The oracle recomputes the identical graph with DuckDB's
bit_count/xor and a tuple-comparison orientation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..operators.graph import triangle_count
from ..operators.search import cooccurrence_pmi
from ..sources.tables import load_table
from . import register

_HEX = "0123456789abcdef"
_MIN_DF, _MAX_DF_RATIO, _MIN_PAIR = 2, 0.9, 3
_MAX_HAMMING = 2

_SIMHASH_CTE = f"""
    toks AS (
      SELECT doc_id AS doc, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    th AS (
      SELECT doc,
             (instr('{_HEX}', h[1]) - 1) * 4096 + (instr('{_HEX}', h[2]) - 1) * 256 +
             (instr('{_HEX}', h[3]) - 1) * 16   + (instr('{_HEX}', h[4]) - 1) AS th
      FROM (SELECT doc, md5(tok) AS h FROM toks)
    ),
    votes AS (
      SELECT doc, pos, sum(CASE WHEN (th >> pos) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS pos)
      GROUP BY doc, pos
    ),
    fp AS (
      SELECT doc, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << pos) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    )
"""


@register(
    "pmi_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    td AS (SELECT DISTINCT doc, term FROM tok WHERE term <> ''),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    dfs AS (SELECT term, count(*) AS df FROM td GROUP BY term),
    elig AS (
      SELECT term, df FROM dfs CROSS JOIN nd
      WHERE df >= {_MIN_DF} AND df <= {_MAX_DF_RATIO} * n_docs
    ),
    tdf AS (SELECT doc, td.term FROM td JOIN elig ON td.term = elig.term),
    pairs AS (
      SELECT x.term AS term_a, y.term AS term_b, count(*) AS n_ab
      FROM tdf x JOIN tdf y ON x.doc = y.doc AND x.term < y.term
      GROUP BY 1, 2 HAVING count(*) >= {_MIN_PAIR}
    )
    SELECT term_a, term_b, n_ab,
           round(ln((n_ab * n_docs) / (da.df * db.df)), 4) AS pmi
    FROM pairs
    JOIN elig da ON term_a = da.term
    JOIN elig db ON term_b = db.term
    CROSS JOIN nd
    """,
    doc="Document-level term co-occurrence with PMI. Frequency caps "
    "(min_df, max_df) run BEFORE the in-doc self-join — the skew control "
    "that keeps stopwords from pairing quadratically — and all counts "
    "are integers so the lone ln() is the only float op.",
)
def pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cooccurrence_pmi(
        docs, "doc_id", "text",
        min_df=_MIN_DF, max_df_ratio=_MAX_DF_RATIO, min_pair_n=_MIN_PAIR,
    )


@register(
    "sim_graph_triangles",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    edges AS (
      SELECT a.doc AS ea, b.doc AS eb
      FROM fp a JOIN fp b ON a.doc < b.doc
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MAX_HAMMING}
    ),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT ea AS node FROM edges UNION ALL SELECT eb FROM edges
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (x.deg, ea) < (y.deg, eb) THEN ea ELSE eb END AS src,
             CASE WHEN (x.deg, ea) < (y.deg, eb) THEN eb ELSE ea END AS dst
      FROM edges JOIN deg x ON ea = x.node JOIN deg y ON eb = y.node
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM o e1
      JOIN o e2 ON e1.dst = e2.src
      JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           n_triangles
    FROM tri
    """,
    doc="Triangle census of the SimHash near-dup graph (Hamming <= 2): "
    "degree-oriented wedge join (Suri-Vassilvitskii) counts each "
    "triangle exactly once with sqrt(m)-bounded fan-out — the "
    "clique-vs-chain diagnostic for near-dup neighborhoods.",
)
def sim_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # cache lifecycle (pagerank pattern): the fingerprint table is read
    # 3x by the pair build and the edge list ~6x by the wedge join —
    # without the persists each read re-runs the whole upstream text
    # pipeline (sf0.1, fresh session: 33.5 s -> 23.7 s cold, 22.4 s ->
    # 14.7 s steady; the remainder is the census itself — this graph is
    # DENSE, 540k edges / 26.7M triangles over 5k docs at hamming<=2).
    # Scaffolding is released as soon as its consumer materializes; the
    # 1-row result is the one cache entry the caller owns.
    sh = dedup.simhash16(docs, "doc_id", "text").persist()
    edges = (
        dedup.simhash_near_pairs(sh, max_hamming=_MAX_HAMMING)
        .select("doc_a", "doc_b")
        .persist()
    )
    edges.count()
    sh.unpersist(True)
    # eager checkpoint, not persist, for the returned frame: a persist
    # is CacheManager-pinned until explicit unpersist (r9 finding) and
    # would leak one entry per call; the checkpoint is releasable via
    # dedup.release_checkpoints
    out = dedup.truncate_lineage(triangle_count(edges, a="doc_a", b="doc_b"))
    edges.unpersist(True)
    return out


_PR_ITERS, _PR_DAMP = 5, 0.85


def _pagerank_oracle(iters: int) -> str:
    """Unrolled power iteration: one CTE per round, each a single
    join+aggregate — the SQL image of operators/graph.pagerank."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT dst AS node,
             {1.0 - _PR_DAMP}/(SELECT n FROM nn) +
             {_PR_DAMP}*sum(r.rank/g.deg) AS rank
      FROM g JOIN r{i - 1} r ON g.src = r.node
      GROUP BY dst
    )"""
        )
    return f"""
    WITH edges AS (
      SELECT DISTINCT x.l_partkey AS pa, y.l_partkey AS pb
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    sym AS (SELECT pa AS src, pb AS dst FROM edges
            UNION ALL SELECT pb, pa FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    g AS (SELECT sym.src, sym.dst, deg.deg
          FROM sym JOIN deg ON sym.src = deg.src),
    r0 AS (SELECT src AS node, 1.0/(SELECT n FROM nn) AS rank FROM deg),
    {", ".join(rounds)}
    SELECT r{iters}.node, deg.deg, round(r{iters}.rank, 6) AS pr
    FROM r{iters} JOIN deg ON r{iters}.node = deg.src
    ORDER BY pr DESC, node
    LIMIT 20
    """


@register(
    "pagerank_copurchase",
    oracle=_pagerank_oracle(_PR_ITERS),
    doc="Fixed-iteration PageRank over the part co-purchase graph "
    "(parts sharing an order; fan-out bounded by lines-per-order, so "
    "edge building stays linear in lineitem at any scale). Each round "
    "is one co-partitioned equi-join + one hash aggregate on the node "
    "id; 5 rounds, damping 0.85; top-20 by rounded rank compiles to "
    "TakeOrderedAndProject. Rank sums are doubles — the final 6dp "
    "round gives ~9 orders of magnitude of headroom over cross-engine "
    "float summation-order drift.",
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li, "l_orderkey", "l_partkey")
    pr = pagerank(edges, a="pa", b="pb", iterations=_PR_ITERS, damping=_PR_DAMP)
    return (
        pr.select("node", "deg", F.round("rank", 6).alias("pr"))
        .orderBy(F.desc("pr"), "node")
        .limit(20)
    )


_KCORE_K, _KCORE_ITERS = 2, 8


def _kcore_oracle(k: int, iters: int) -> str:
    rounds = []
    for r in range(1, iters + 1):
        # MATERIALIZED: each round reads the previous one three times;
        # inlined CTEs would expand 3^rounds scans of the base table
        rounds.append(
            f"""k{r} AS MATERIALIZED (SELECT src FROM (SELECT src, count(*) AS deg
                 FROM c{r - 1} GROUP BY src) WHERE deg >= {k}),
    c{r} AS MATERIALIZED (SELECT c.src, c.dst FROM c{r - 1} c
             JOIN k{r} x ON c.src = x.src JOIN k{r} y ON c.dst = y.src)"""
        )
    return f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb
          FROM p x JOIN p y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    c0 AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e
           UNION ALL SELECT pb, pa FROM e),
    {", ".join(rounds)}
    SELECT src AS node, count(*) AS deg FROM c{iters}
    GROUP BY src ORDER BY node
    """


@register(
    "kcore_copurchase",
    oracle=_kcore_oracle(_KCORE_K, _KCORE_ITERS),
    doc="Fixed-iteration 2-core of the repeat-co-purchase graph (parts "
    "co-bought in >= 2 orders): each round drops nodes whose current "
    "degree is below k via two semi-joins, 8 rounds — measured to be "
    "past convergence at every graded scale factor, and peeling is "
    "monotone so extra rounds are exact no-ops (the property that makes "
    "the fixed count unrollable as the DuckDB oracle, like PageRank). "
    "The edge set shrinks every round, so per-round cost falls; all "
    "joins hash on node ids.",
)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, kcore

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    return kcore(edges, k=_KCORE_K, iterations=_KCORE_ITERS, a="pa", b="pb").orderBy(
        "node"
    )


_LPA_ITERS = 4


def _lpa_oracle(iters: int) -> str:
    """Unrolled synchronous LPA: per round, one join+count plus a
    row_number argmax (count desc, label asc) — DuckDB's idiom for the
    Spark side's min(struct(-cnt, label)) tie-break."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""c{i} AS (
      SELECT s.dst AS node, l.label, count(*) AS cnt
      FROM sym s JOIN l{i - 1} l ON s.src = l.node
      GROUP BY s.dst, l.label
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )"""
        )
    return f"""
    WITH edges AS (
      SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS n
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY pa, pb HAVING count(*) >= 2
    ),
    sym AS (SELECT pa AS src, pb AS dst FROM edges
            UNION ALL SELECT pb, pa FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    {", ".join(rounds)}
    SELECT node, label AS community FROM l{iters}
    """


@register(
    "label_prop_communities",
    oracle=_lpa_oracle(_LPA_ITERS),
    doc="Deterministic synchronous label propagation (Raghavan et al. "
    "2007) over the repeat-co-purchase graph: 4 rounds, each one "
    "equi-join + two map-side-combining hash aggregates — the argmax "
    "is min(struct(-cnt, label)), NO window — with ties broken to the "
    "smallest label so the result is a pure function of the graph "
    "(what makes the unrolled-SQL oracle exact). Near-dup community "
    "assignment for dedup families is this exact plan over LSH edges.",
)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, label_propagation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    out = label_propagation(edges, iterations=_LPA_ITERS, a="pa", b="pb")
    return out.select("node", F.col("label").alias("community"))


@register(
    "hierarchy_closure",
    oracle="""
    WITH RECURSIVE r AS (
      SELECT p_partkey AS node, p_partkey AS anc, 0 AS depth FROM part
      UNION ALL
      SELECT node, CAST(anc // 3 AS BIGINT), depth + 1 FROM r WHERE anc >= 3
    )
    SELECT node, anc AS root, depth FROM r WHERE anc < 3
    """,
    doc="Forest flattening by pointer doubling: every part key hangs "
    "under parent k//3 (ternary forest, roots 0..2); after round r "
    "each link spans up to 2^r hops, so 5 rounds resolve any depth up "
    "to 2^5 (depth is ~log3(n): 11 even at sf1000). The oracle is the "
    "O(depth) recursive CTE — the sequential formulation Spark must "
    "NOT run; the doubling form does the same closure in O(log depth) "
    "hash self-joins, each localCheckpoint-truncated. Integer keys: "
    "bit-exact.",
)
def hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pointer_doubling_closure

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    nodes = part.select(
        k.cast("bigint").alias("node"),
        F.when(k < 3, F.lit(None)).otherwise(F.floor(k / 3)).cast("bigint").alias("parent"),
    )
    return pointer_doubling_closure(nodes, rounds=5)


_TC_PMI_T = 0.055
_TC_ITERS = 3


def _token_communities_oracle() -> str:
    rounds = []
    for i in range(1, _TC_ITERS + 1):
        rounds.append(
            f"""c{i} AS (
      SELECT s.dst AS node, l.label, count(*) AS cnt
      FROM sym s JOIN l{i - 1} l ON s.src = l.node
      GROUP BY s.dst, l.label
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )"""
        )
    return f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    td AS (SELECT DISTINCT doc, term FROM tok WHERE term <> ''),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    dfs AS (SELECT term, count(*) AS df FROM td GROUP BY term),
    elig AS (
      SELECT term, df FROM dfs CROSS JOIN nd
      WHERE df >= {_MIN_DF} AND df <= {_MAX_DF_RATIO} * n_docs
    ),
    tdf AS (SELECT doc, td.term FROM td JOIN elig ON td.term = elig.term),
    prs AS (
      SELECT x.term AS term_a, y.term AS term_b, count(*) AS n_ab
      FROM tdf x JOIN tdf y ON x.doc = y.doc AND x.term < y.term
      GROUP BY 1, 2 HAVING count(*) >= {_MIN_PAIR}
    ),
    edges AS (
      SELECT term_a, term_b
      FROM prs JOIN elig da ON term_a = da.term JOIN elig db ON term_b = db.term
      CROSS JOIN nd
      WHERE round(ln((n_ab * n_docs) / (da.df * db.df)), 4) >= {_TC_PMI_T}
    ),
    sym AS (SELECT term_a AS src, term_b AS dst FROM edges
            UNION ALL SELECT term_b, term_a FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    {", ".join(rounds)}
    SELECT node AS token, label AS community FROM l{_TC_ITERS}
    """


@register(
    "token_communities",
    oracle=_token_communities_oracle(),
    doc="Composition showcase: PMI co-occurrence edges (df-capped "
    "before the in-doc pair join) filtered at the p75 association "
    "strength, then 3 rounds of deterministic label propagation with "
    "STRING labels (argmax via min(struct(-cnt, label)) orders by "
    "count desc, token asc for any orderable label type). The whole "
    "topic-sketching pipeline -- counts, one ln(), label joins -- in "
    "one declarative plan; the oracle unrolls the identical rounds.",
)
def token_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents")
    pmi = cooccurrence_pmi(
        docs, "doc_id", "text",
        min_df=_MIN_DF, max_df_ratio=_MAX_DF_RATIO, min_pair_n=_MIN_PAIR,
    )
    edges = pmi.where(F.col("pmi") >= _TC_PMI_T).select("term_a", "term_b")
    out = label_propagation(edges, iterations=_TC_ITERS, a="term_a", b="term_b")
    return out.select(F.col("node").alias("token"), F.col("label").alias("community"))
