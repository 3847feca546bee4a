"""Registry of conformance queries + DuckDB oracle SQL.

Each query is a callable ``(sf_dir: str) -> ray.data.Dataset`` built
from etlray operators; ``ORACLES[name]`` is ANSI SQL DuckDB runs over
the same parquet tables (views: region nation customer supplier part
orders lineitem events documents embeddings). Column names match
between the two sides — the driver hash-compares values after sorting
columns by name.

Queries without an oracle entry (non-SQL-expressible: CDC replay,
MinHash-LSH, …) get a rows-only check; their correctness gates live in
tests/.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from etlray.sources import ParquetSource
from etlray.stages import (
    AggregateTransform,
    BroadcastJoinTransform,
    ComputedColumnTransform,
    ConvertTypesTransform,
    DistinctTransform,
    FilterTransform,
    GlobalAggregateTransform,
    HashJoinTransform,
    LimitTransform,
    RenameColumnsTransform,
    SelectColumnsTransform,
    SortTransform,
    UnionTransform,
)

QUERIES = {}
ORACLES = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _pq(sf_dir: str, table: str, columns=None, filter=None) -> ParquetSource:
    return ParquetSource(f"{sf_dir}/{table}.parquet", columns=columns, filter=filter)


def _scale_int_cols(ds, factors: dict[str, float], rename: dict[str, str]
                    | None = None):
    """Replace decimal columns with exact int64 ``round(col·factor)``
    (the scaled doubles sit within one ulp of integers, so the
    pc.round / SQL round() mode difference can never matter) — int
    sums are then associative: bit-deterministic at any block order
    and exactly comparable to SQL's integer aggregates. One shared
    helper so the scaling contract lives in ONE place (pricing /
    rollup / cube all compare money columns this way)."""
    rename = rename or {}

    def scaled(t: pa.Table) -> pa.Table:
        for col, factor in factors.items():
            q = pc.cast(pc.round(pc.multiply(t[col], factor)), pa.int64())
            if isinstance(q, pa.ChunkedArray):
                q = q.combine_chunks()
            out = rename.get(col, col)
            if out == col:
                t = t.set_column(t.column_names.index(col), col, q)
            else:
                t = t.append_column(out, q)
        return t

    return ds.map_batches(scaled, batch_format="pyarrow",
                          zero_copy_batch=True)


def _round3(t: pa.Table, col: str = "cosine") -> pa.Table:
    """Round a similarity column to the 3 decimals the SQL oracles pin
    (ONE definition — this body was copy-pasted four times)."""
    idx = t.column_names.index(col)
    return t.set_column(idx, col, pc.round(t.column(idx), 3))


def _gather_rounded(out, col: str = "cosine") -> pa.Table:
    """Gather a small pair Dataset to one Arrow table with the
    similarity column rounded — near-dup pairs ≪ corpus by contract,
    and Ray's to_pandas() drops the schema of an all-empty Dataset,
    which would break the driver's column compare on 0-pair fixtures."""
    import ray

    parts = [_round3(t, col) for t in ray.get(out.to_arrow_refs())]
    return pa.concat_tables(parts, promote_options="permissive")


# ---------------------------------------------------------------------------
# filter + projection + computed column (reference FilterTransform /
# MapTransform / SelectColumns, src/transform/common.rs:10-60,428-453)
# ---------------------------------------------------------------------------
@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05
    """,
)
def filter_project(sf_dir: str):
    src = _pq(sf_dir, "lineitem",
              columns=["l_orderkey", "l_linenumber", "l_quantity",
                       "l_extendedprice", "l_discount"],
              filter=(pc.field("l_quantity") > 30) & (pc.field("l_discount") < 0.05))
    ds = src.read()
    ds = ComputedColumnTransform(
        "revenue",
        lambda t: pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
    ).apply(ds)
    return SelectColumnsTransform(
        ["l_orderkey", "l_linenumber", "l_quantity", "revenue"]).apply(ds)


# ---------------------------------------------------------------------------
# group-by aggregate with reference {col}_{func} naming
# (AggregateTransform, src/transform/common.rs:258-371)
# ---------------------------------------------------------------------------
@register(
    "agg_events_by_type",
    """
    SELECT event_type,
           sum(value)   AS value_sum,
           avg(value)   AS value_average,
           min(value)   AS value_min,
           max(value)   AS value_max,
           count(*)     AS value_count
    FROM events
    GROUP BY event_type
    """,
)
def agg_events_by_type(sf_dir: str):
    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    return AggregateTransform(
        ["event_type"],
        [("value", "sum"), ("value", "average"), ("value", "min"),
         ("value", "max"), ("value", "count")],
    ).apply(ds)


# TPC-H Q1-shaped pricing summary.
# Money columns aggregate as EXACT decimal-scaled int64 (quantity and
# extendedprice carry 2 decimals → ×100; disc_price carries 4 → ×10000;
# the scaled doubles are within one ulp of integers, so the pc.round /
# SQL round() mode difference can never matter): integer addition is
# associative, the parallel sum is bit-deterministic at any block order,
# and the oracle compare is exact instead of pinned by an in-query
# ROUND whose half-boundary a sum can straddle (round-1 failure at
# sf0.1; boundary hit observed again at sf0.001 before this change).
# avg(l_quantity) stays float: quantities are integers, so their float64
# sum is exact in any order and the average is bit-equal across engines.
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
             AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
             AS sum_base_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT)) / 10000.0 AS sum_disc_price,
           avg(l_quantity)                                   AS avg_qty,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    import datetime as dt

    cutoff = dt.datetime(1998, 9, 2)
    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount", "l_shipdate"],
             filter=(pc.field("l_shipdate") <= cutoff)).read()

    def prep(t: pa.Table) -> pa.Table:
        # one fused pass: disc_price compute + the three ×100/×10000
        # int64 scalings (same contract as _scale_int_cols — the scaled
        # doubles sit within one ulp of integers, so round-mode can't
        # matter), projected down to exactly the aggregate's inputs so
        # no float intermediate or pruned column reaches the shuffle
        def q(col, factor):
            v = pc.cast(pc.round(pc.multiply(col, factor)), pa.int64())
            return v.combine_chunks() if isinstance(v, pa.ChunkedArray) \
                else v

        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "l_quantity": t["l_quantity"],
            "q_c": q(t["l_quantity"], 100.0),
            "bp_c": q(t["l_extendedprice"], 100.0),
            "dp_c": q(disc, 10000.0),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    # exact_int: the scaled int64 columns sum WITHOUT the reference's
    # float coercion — integer addition is associative, so the parallel
    # sum is bit-deterministic at any block order and exactly matches
    # DuckDB's integer aggregate (avg stays float: quantities are
    # integral, so its float64 sum is exact in any order too)
    agg = AggregateTransform(
        ["l_returnflag", "l_linestatus"],
        [("q_c", "sum"), ("bp_c", "sum"), ("dp_c", "sum"),
         ("l_quantity", "average"), ("l_quantity", "count")],
        exact_int=True,
    ).apply(ds)

    def unscale(t: pa.Table) -> pa.Table:
        for name, out, div in (("q_c_sum", "sum_qty", 100.0),
                               ("bp_c_sum", "sum_base_price", 100.0),
                               ("dp_c_sum", "sum_disc_price", 10000.0)):
            # safe=False: cents sums exceed 2^53 at scale; SQL CAST
            # rounds, Arrow's default safe cast would raise
            v = pc.divide(pc.cast(t[name], pa.float64(), safe=False),
                          div)
            t = t.append_column(
                out, v.combine_chunks()
                if isinstance(v, pa.ChunkedArray) else v)
            t = t.drop_columns([name])
        return t

    agg = agg.map_batches(unscale, batch_format="pyarrow")
    return RenameColumnsTransform({
        "l_quantity_average": "avg_qty",
        "l_quantity_count": "count_order",
    }).apply(agg)


# ---------------------------------------------------------------------------
# lenient type conversion (ConvertTypesTransform, common.rs:186-254)
# ---------------------------------------------------------------------------
@register(
    "convert_types",
    """
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS doc_id_str,
           CAST(n_chars AS DOUBLE) AS n_chars_f
    FROM documents
    """,
)
def convert_types(sf_dir: str):
    from etlray.coerce import as_float, as_string

    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"]).read()
    ds = ComputedColumnTransform("doc_id_str", lambda t: as_string(t["doc_id"])).apply(ds)
    ds = ComputedColumnTransform("n_chars_f", lambda t: as_float(t["n_chars"])).apply(ds)
    return SelectColumnsTransform(["doc_id", "doc_id_str", "n_chars_f"]).apply(ds)


# ---------------------------------------------------------------------------
# joins (declared Joiner surface, reference src/traits.rs:109-125)
# ---------------------------------------------------------------------------
@register(
    "join_broadcast_inner",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_nationkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_broadcast_inner(sf_dir: str):
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]).read()
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]).read()
    ds = BroadcastJoinTransform(cust, on="o_custkey", right_on="c_custkey",
                                how="inner").apply(orders)
    return SelectColumnsTransform(["o_orderkey", "o_totalprice", "c_name", "c_nationkey"]).apply(ds)


# bloom_prefilter: result-identical (no false negatives); the sketch
# drops probe rows with no partner BEFORE the all-to-all — the filter
# selects half the nations, so ~half the customer rows never shuffle
@register(
    "join_hash_inner_bloom",
    """
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM customer c
    JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12) n
      ON c.c_nationkey = n.n_nationkey
    """,
)
def join_hash_inner_bloom(sf_dir: str):
    from etlray.stages import PartitionedHashJoinTransform

    cust = _pq(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_nationkey"]).read()
    nat = _pq(sf_dir, "nation", columns=["n_nationkey", "n_name"],
              filter=(pc.field("n_nationkey") < 12)).read()
    ds = PartitionedHashJoinTransform(nat, on="c_nationkey",
                                      right_on="n_nationkey", how="inner",
                                      bloom_prefilter=True).apply(cust)
    return SelectColumnsTransform(["c_custkey", "c_name", "n_name"]).apply(ds)


@register(
    "join_hash_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_hash_left(sf_dir: str):
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"]).read()
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).read()
    from etlray.stages import PartitionedHashJoinTransform

    ds = PartitionedHashJoinTransform(orders, on="c_custkey", right_on="o_custkey",
                                      how="left").apply(cust)
    return SelectColumnsTransform(["c_custkey", "c_name", "o_orderkey"]).apply(ds)


# ---------------------------------------------------------------------------
# sort / limit / distinct / union (SURVEY.md §2.6)
# ---------------------------------------------------------------------------
@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topk(sf_dir: str):
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).read()
    ds = SortTransform(["o_totalprice", "o_orderkey"], descending=[True, False]).apply(ds)
    return LimitTransform(10).apply(ds)


@register(
    "distinct_flags",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(sf_dir: str):
    ds = _pq(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"]).read()
    return DistinctTransform(["l_returnflag", "l_linestatus"]).apply(ds)


@register(
    "union_all_events",
    """
    SELECT event_id, event_type, value FROM events WHERE value > 400
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'signup' AND value <= 400
    """,
)
def union_all_events(sf_dir: str):
    cols = ["event_id", "event_type", "value"]
    hi = _pq(sf_dir, "events", columns=cols, filter=(pc.field("value") > 400)).read()
    sg = _pq(sf_dir, "events", columns=cols,
             filter=(pc.field("event_type") == "signup") & (pc.field("value") <= 400)).read()
    return UnionTransform(sg).apply(hi)


@register(
    "global_agg",
    """
    SELECT sum(l_quantity)  AS l_quantity_sum,
           avg(l_quantity)  AS l_quantity_average,
           min(l_quantity)  AS l_quantity_min,
           max(l_quantity)  AS l_quantity_max,
           count(*)         AS l_quantity_count
    FROM lineitem
    """,
)
def global_agg(sf_dir: str):
    ds = _pq(sf_dir, "lineitem", columns=["l_quantity"]).read()
    return GlobalAggregateTransform(
        [("l_quantity", "sum"), ("l_quantity", "average"), ("l_quantity", "min"),
         ("l_quantity", "max"), ("l_quantity", "count")],
    ).apply(ds)


# ---------------------------------------------------------------------------
# CDC last-writer-wins upsert, SQL-checkable form: the same distributed
# reduce the CDC engine uses (etlray.cdc.apply.apply_changes), keyed on
# user_id with event_id as the LSN over the driver's events table.
# ---------------------------------------------------------------------------
@register(
    "cdc_lww_upsert",
    """
    SELECT user_id,
           max(event_id)               AS event_id,
           arg_max(event_type, event_id) AS event_type,
           arg_max(value, event_id)      AS value
    FROM events
    GROUP BY user_id
    """,
)
def cdc_lww_upsert(sf_dir: str):
    from etlray.cdc.apply import apply_changes

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]).read()

    def add_op(t: pa.Table) -> pa.Table:
        return t.append_column("op", pa.array(["insert"] * t.num_rows))
    ds = ds.map_batches(add_op, batch_format="pyarrow", zero_copy_batch=True)
    out = apply_changes(ds, keys=["user_id"], lsn_col="event_id", op_col="op",
                        num_buckets=16, sha_col=None)
    return SelectColumnsTransform(["user_id", "event_id", "event_type", "value"]).apply(out)


# ---------------------------------------------------------------------------
# training-data operators over documents/embeddings (SURVEY has no
# counterpart — these are the 100TB-pipeline additions the tier requires)
# ---------------------------------------------------------------------------
@register(
    "text_stats",
    r"""
    SELECT doc_id,
           CAST(length(text) AS DOUBLE)                                    AS char_count,
           CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE)         AS word_count,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1)                                   AS digit_ratio
    FROM documents
    """,
)
def text_stats(sf_dir: str):
    from etlray.functions.text import quality_features

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    ds = ds.map_batches(quality_features, batch_format="pyarrow", zero_copy_batch=True)
    return SelectColumnsTransform(["doc_id", "char_count", "word_count",
                                   "digit_ratio"]).apply(ds)


@register(
    "redact_pii_docs",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://\S+', '<URL>', 'g'),
             '\d{6,}', '<NUM>', 'g') AS text_redacted
    FROM documents
    """,
)
def redact_pii_docs(sf_dir: str):
    from etlray.functions.text import redact_pii

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    ds = ds.map_batches(redact_pii, batch_format="pyarrow", zero_copy_batch=True)
    return SelectColumnsTransform(["doc_id", "text_redacted"]).apply(ds)


# Gopher-style repetition filters (all-integer counts → exact SQL parity)
@register(
    "repetition_stats",
    r"""
    WITH l AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      FROM documents
    ), lf AS (
      SELECT doc_id, count(*) AS total, count(DISTINCT line) AS dn
      FROM l WHERE line <> '' GROUP BY doc_id
    ), w AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      FROM documents
    ), wc AS (
      SELECT doc_id, tok, count(*) AS c FROM w GROUP BY doc_id, tok
    ), wm AS (
      SELECT doc_id, max(c) AS mx, sum(c) AS n FROM wc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(lf.total, 0)::BIGINT AS n_lines,
           CASE WHEN lf.total > 0
                THEN 1.0 - lf.dn::DOUBLE / lf.total ELSE 0.0 END AS dup_line_frac,
           CASE WHEN wm.n > 0
                THEN wm.mx::DOUBLE / wm.n ELSE 0.0 END AS top_word_frac
    FROM documents d
    LEFT JOIN lf USING (doc_id)
    LEFT JOIN wm USING (doc_id)
    """,
)
def repetition_stats(sf_dir: str):
    from etlray.functions.text import repetition_features

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    ds = ds.map_batches(repetition_features, batch_format="pyarrow",
                        zero_copy_batch=True)
    return SelectColumnsTransform(["doc_id", "n_lines", "dup_line_frac",
                                   "top_word_frac"]).apply(ds)


@register(
    "exact_dedup_docs",
    """
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
      USING (doc_id)
    """,
)
def exact_dedup_docs(sf_dir: str):
    from etlray.functions.dedup import exact_dedup

    ds = _pq(sf_dir, "documents").read()
    return exact_dedup(ds, text_col="text", order_col="doc_id", num_buckets=16)


@register(
    "ann_brute_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT CAST(q.query_id AS INTEGER) AS query_id, e.vec_id,
             round(list_cosine_similarity(e.embedding, q.qe), 3) AS cosine,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
             ) AS rn
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine FROM scored WHERE rn <= 10
    """,
)
def ann_brute_topk(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    from etlray.functions.ann import brute_force_topk

    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qtab = qtab.filter(pc.less(qtab["vec_id"], 3)).sort_by("vec_id")
    queries = np.array(qtab["embedding"].to_pylist(), dtype=np.float32)
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"]).read()
    out = brute_force_topk(ds, queries, k=10)

    return out.map_batches(_round3, batch_format="pyarrow")


# The IVF path (driver k-means codebook on a bounded sample, cluster
# pruning in map_batches, exact re-rank of survivors) is the 100-TB
# ANN mode; its oracle is the same brute-force SQL — exact-match holds
# whenever the probed clusters contain every true top-k neighbor.
# The seeded fixtures are ISOTROPIC gaussian (no cluster structure),
# so neighbors spread almost uniformly over clusters and exactness
# needs a high probe fraction (nprobe=12/16, verified at every sf —
# the minimum is 12 at sf0.01/sf0.1). On real embedding corpora,
# which cluster heavily, nprobe/n_clusters runs far below 1; the
# approximate regime is recall-gated in tests/test_ann.py.
@register(
    "ann_ivf_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT CAST(q.query_id AS INTEGER) AS query_id, e.vec_id,
             round(list_cosine_similarity(e.embedding, q.qe), 3) AS cosine,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
             ) AS rn
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine FROM scored WHERE rn <= 10
    """,
)
def ann_ivf_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from etlray.functions.ann import ivf_topk

    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qtab = qtab.filter(pc.less(qtab["vec_id"], 3)).sort_by("vec_id")
    queries = np.array(qtab["embedding"].to_pylist(), dtype=np.float32)
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"]).read()
    out = ivf_topk(ds, queries, k=10, n_clusters=16, nprobe=12)

    return out.map_batches(_round3, batch_format="pyarrow")


# MinHash-LSH with exact verify emits the all-pairs contract of the
# exact shingle-Jaccard self-join, so the exact SQL baseline IS its
# oracle: precision is exact by construction (survivors are re-checked
# with true codepoint-shingle Jaccard), recall is the LSH guarantee
# (P(miss) ≈ (1-J^r)^bands ≤ 2e-4 at J=0.8 with r=4, b=16 — and the
# seeded pipeline is deterministic, so a verified-equal fixture stays
# equal). At 100 TB use per_doc_best=True (O(docs) output).
_MINHASH_SQL = r"""
WITH d AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS s
  FROM d, LATERAL unnest(range(1, greatest(length(norm) - 3, 2))) t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ib AS doc_id, ia AS dup_of,
       c::DOUBLE / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8
"""


@register("minhash_near_dups", _MINHASH_SQL)
def minhash_near_dups(sf_dir: str):
    from etlray.functions.dedup import minhash_lsh_candidates

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    return minhash_lsh_candidates(ds, jaccard_threshold=0.8)


# the SQL recomputes the EXACT SimHash: md5_number_lower is bit-equal
# to the engine's per-token md5-lower-64 (dedup._md5_token_hashes), the
# ±1 bit sums and sign threshold mirror simhash64_batch, and docs are
# grouped by the 64-bit sign pattern
_SIMHASH_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS t
  FROM documents WHERE text IS NOT NULL
), bits AS (
  SELECT doc_id, b AS bit,
         sum(CASE WHEN ((md5_number_lower(t)::UBIGINT >> b) & 1) = 1
                  THEN 1 ELSE -1 END) AS s
  FROM tok CROSS JOIN (SELECT unnest(range(64)) AS b) bb
  GROUP BY doc_id, b
), sig AS (
  SELECT doc_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS sg
  FROM bits GROUP BY doc_id
), g AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY sg) AS dup_of FROM sig
)
SELECT doc_id, dup_of FROM g WHERE doc_id <> dup_of
"""


@register("simhash_dups", _SIMHASH_SQL)
def simhash_dups(sf_dir: str):
    from etlray.functions.dedup import simhash_dup_groups

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    return simhash_dup_groups(ds)


# Fixture augmentation shared by the embedding near-dup queries: the
# seeded fixtures have NO natural pair above cosine ~0.6, which made
# the near-dup oracles vacuous (0-row green). For every vec_id
# divisible by 5, append a derived copy (id + 1_000_000) whose every
# 16th coordinate is doubled — doubling is an exponent increment, so
# the numpy-float32 and DuckDB values are bit-identical — yielding
# ~n/5 engineered pairs at cosine ≈ 0.945-0.999. Verified margins on
# every sf fixture: no pair (engineered or natural) within 7e-4 of the
# 0.95 near-dup threshold or within 7e-4 of the 0.4995 sim-join
# rounding edge, so float32-vs-double noise (~1e-6) can't flip a row.
_AUG_EMB_SQL = """
aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list(CASE WHEN (i - 1) % 16 = 0 THEN x * 2 ELSE x END
              ORDER BY i) AS embedding
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id % 5 = 0) u
  GROUP BY vec_id
)
"""


def _augmented_embeddings(sf_dir: str):
    """Ray side of ``_AUG_EMB_SQL``: embeddings ∪ derived near-dup
    copies, streamed per batch (no driver materialization)."""
    from etlray.functions.ann import vectors_to_numpy

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"]).read()

    def derive(t: pa.Table) -> pa.Table:
        emb_type = t.schema.field("embedding").type
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 5 == 0))
        if sub.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "embedding": pa.array([], type=emb_type)})
        V = vectors_to_numpy(sub["embedding"]).copy()
        V[:, ::16] *= 2.0
        n, d = V.shape
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            pa.array(V.reshape(-1)))
        return pa.table({"vec_id": pc.add(sub["vec_id"], 1_000_000),
                         "embedding": emb.cast(emb_type)})

    return ds.union(ds.map_batches(derive, batch_format="pyarrow",
                                   zero_copy_batch=True))


# in-bucket pairs are checked with EXACT cosine ≥ threshold, so
# precision is exact by construction; the brute-force SQL over the
# augmented table is the recall oracle (multi-band hyperplane LSH:
# P(miss) ≈ (1-p^8)^16 ≤ 1.4e-4 at cosine 0.95, and the seeded
# pipeline is deterministic on a given fixture)
@register(
    "embedding_near_dups",
    f"""
    WITH {_AUG_EMB_SQL}
    SELECT b.vec_id AS vec_id, a.vec_id AS dup_of,
           round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
)
def embedding_near_dups_q(sf_dir: str):
    import ray

    from etlray.functions.dedup import embedding_near_dups

    ds = _augmented_embeddings(sf_dir)
    out = embedding_near_dups(ds, cosine_threshold=0.95)

    return _gather_rounded(out)


# the wide-vector routing (code-only candidate rows + distributed
# vector-fetch verify) against the SAME brute-force oracle — the two
# paths must emit identical pair sets on any fixture
@register(
    "embedding_near_dups_code_only",
    f"""
    WITH {_AUG_EMB_SQL}
    SELECT b.vec_id AS vec_id, a.vec_id AS dup_of,
           round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
)
def embedding_near_dups_code_only_q(sf_dir: str):
    import ray

    from etlray.functions.dedup import embedding_near_dups

    ds = _augmented_embeddings(sf_dir)
    out = embedding_near_dups(ds, cosine_threshold=0.95,
                              candidates="code_only")

    return _gather_rounded(out)


# language-ID heuristic: Arrow's regex engine is RE2 and so is DuckDB's,
# so the EXACT stopword-ratio argmax is SQL-replicable — ratio counts are
# identical integers divided in float64 on both sides
_LANGID_SQL = r"""
WITH f AS (
  SELECT doc_id, text, lang,
         greatest(len(regexp_extract_all(text, '\S+')), 1)::DOUBLE AS words,
         greatest(length(text), 1)::DOUBLE AS chars,
         len(regexp_extract_all(text, '[一-鿿]'))::DOUBLE AS cjk,
         len(regexp_extract_all(text, '(?i)\b(?:the|and|is|of|to|that|with|for)\b'))::DOUBLE AS c_en,
         len(regexp_extract_all(text, '(?i)\b(?:der|die|und|das|ist|nicht|ein|mit)\b'))::DOUBLE AS c_de,
         len(regexp_extract_all(text, '(?i)\b(?:le|la|et|les|des|est|une|dans)\b'))::DOUBLE AS c_fr,
         len(regexp_extract_all(text, '(?i)\b(?:el|la|los|que|es|una|por|para)\b'))::DOUBLE AS c_es,
         len(regexp_extract_all(text, '(?i)\b(?:o|a|os|que|um|uma|não|para)\b'))::DOUBLE AS c_pt
  FROM documents
), s AS (
  SELECT doc_id, text, lang, cjk / chars AS cjk_ratio,
         c_en / words AS s_en, c_de / words AS s_de, c_fr / words AS s_fr,
         c_es / words AS s_es, c_pt / words AS s_pt
  FROM f
)
SELECT doc_id, text, lang,
  CASE WHEN cjk_ratio > 0.05 THEN 'zh'
       WHEN greatest(s_en, s_de, s_fr, s_es, s_pt) > 0.01 THEN
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_pt THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_pt THEN 'de'
              WHEN s_fr >= s_es AND s_fr >= s_pt THEN 'fr'
              WHEN s_es >= s_pt THEN 'es'
              ELSE 'pt' END
       ELSE 'unknown' END AS lang_pred
FROM s
"""


@register("langid_docs", _LANGID_SQL)
def langid_docs(sf_dir: str):
    from etlray.functions.text import LangIdStage

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"]).read()
    return ds.map_batches(LangIdStage, fn_constructor_args=("text",),
                          batch_format="pyarrow", concurrency=2)


# exact n-gram Jaccard similarity self-join (inverted index; the precise
# baseline that oracles the MinHash-LSH path). doc_id < 500 caps the
# inherently-quadratic-in-df cost identically at every sf.
_JACCARD_SQL = r"""
WITH d AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents WHERE doc_id < 500
), sh AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS s
  FROM d, LATERAL unnest(range(1, greatest(length(norm) - 3, 2))) t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ia AS doc_id_a, ib AS doc_id_b,
       c::DOUBLE / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8
"""


@register("ngram_jaccard_pairs", _JACCARD_SQL)
def ngram_jaccard_pairs_q(sf_dir: str):
    from etlray.functions.dedup import ngram_jaccard_pairs

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=(pc.field("doc_id") < 500)).read()
    return ngram_jaccard_pairs(ds, threshold=0.8)


# exact cosine similarity self-join (broadcast matmul; the precise
# baseline that oracles the hyperplane-LSH embedding_near_dups path)
@register(
    "embedding_sim_join",
    f"""
    WITH {_AUG_EMB_SQL}
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding, b.embedding), 3) >= 0.5
    """,
)
def embedding_sim_join(sf_dir: str):
    from etlray.functions.ann import cosine_sim_join

    ds = _augmented_embeddings(sf_dir)
    return cosine_sim_join(ds, threshold=0.5)


# ---------------------------------------------------------------------------
# streaming-shaped custom operators: tumbling-window aggregate + as-of
# join (SURVEY.md §2.9 — reference has none; Ray Data lacks them; built
# from map_batches + the explicit hash exchange)
# ---------------------------------------------------------------------------
# value carries 2 decimals → aggregate EXACT integer cents: int64
# addition is associative, so the parallel sum is deterministic at any
# block order / parallelism (a raw float64 Sum drifted past the 4-dp
# compare at sf0.1 — same failure class as round-1's pricing_summary)
@register(
    "windowed_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*)   AS n_events,
           sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def windowed_agg(sf_dir: str):
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"]).read()

    def trunc(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        t = t.append_column(
            "window_start", w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return t.append_column(
            "cents", cents.combine_chunks() if isinstance(cents, pa.ChunkedArray) else cents)
    ds = ds.map_batches(trunc, batch_format="pyarrow", zero_copy_batch=True)
    agg = AggregateTransform(["window_start", "event_type"],
                             [("value", "count"), ("cents", "sum")]).apply(ds)

    def to_value(t: pa.Table) -> pa.Table:
        vs = pc.divide(pc.cast(t["cents_sum"], pa.float64(),
                               safe=False), 100.0)
        t = t.append_column("value_sum",
                            vs.combine_chunks() if isinstance(vs, pa.ChunkedArray) else vs)
        return t.drop_columns(["cents_sum"])
    agg = agg.map_batches(to_value, batch_format="pyarrow", zero_copy_batch=True)
    return RenameColumnsTransform({"value_count": "n_events"}).apply(agg)


@register(
    "asof_join_purchase_click",
    """
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_purchase_click(sf_dir: str):
    from etlray.stages import AsofJoinTransform

    purchases = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"],
                    filter=(pc.field("event_type") == "purchase")).read() \
        .drop_columns(["event_type"])
    clicks = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"],
                 filter=(pc.field("event_type") == "click")).read() \
        .drop_columns(["event_type"])

    # merge_asof consumes the right side's `on` column — carry a copy
    def keep_ts(t: pa.Table) -> pa.Table:
        return t.append_column("click_ts", t["ts"].combine_chunks()
                               if isinstance(t["ts"], pa.ChunkedArray) else t["ts"])
    clicks = clicks.map_batches(keep_ts, batch_format="pyarrow", zero_copy_batch=True)
    ds = AsofJoinTransform(clicks, on="ts", by="user_id",
                           direction="backward", suffix="_r").apply(purchases)
    return SelectColumnsTransform(["event_id", "user_id", "ts", "click_ts"]).apply(ds)


@register(
    "interval_join_click_before_purchase",
    """
    SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
           c.event_id AS event_id_r, c.ts AS ts_r
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def interval_join_click_before_purchase(sf_dir: str):
    import numpy as np

    from etlray.stages import IntervalJoinTransform

    purchases = _pq(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    filter=(pc.field("event_type") == "purchase")).read() \
        .drop_columns(["event_type"])
    clicks = _pq(sf_dir, "events",
                 columns=["event_id", "user_id", "ts", "event_type"],
                 filter=(pc.field("event_type") == "click")).read() \
        .drop_columns(["event_type"])
    return IntervalJoinTransform(
        clicks, on="ts", by="user_id",
        lower=np.timedelta64(-3600, "s"), upper=np.timedelta64(0, "s"),
        suffix="_r").apply(purchases)


@register(
    "group_concat_nations",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS n_name_concat
    FROM nation GROUP BY n_regionkey
    """,
)
def group_concat_nations(sf_dir: str):
    from etlray.stages import GroupConcatTransform

    ds = _pq(sf_dir, "nation", columns=["n_regionkey", "n_name"]).read()
    return GroupConcatTransform("n_regionkey", "n_name").apply(ds)


@register(
    "moving_avg_user_value",
    """
    SELECT event_id, user_id, ts, value,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS value_mavg
    FROM events
    """,
)
def moving_avg_user_value(sf_dir: str):
    from etlray.stages import MovingAverageTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    return MovingAverageTransform("ts", "user_id", "value", window=3,
                                  order_tiebreak="event_id").apply(ds)


@register(
    "truncate_docs_tokens",
    r"""
    SELECT doc_id, array_to_string(
      (string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' '))[1:32], ' ') AS text_trunc
    FROM documents WHERE text IS NOT NULL
    """,
)
def truncate_docs_tokens(sf_dir: str):
    from etlray.functions.curation import truncate_tokens
    from etlray.stages import SelectColumnsTransform

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=pc.field("text").is_valid()).read()
    out = truncate_tokens(ds, max_tokens=32)
    return SelectColumnsTransform(["doc_id", "text_trunc"]).apply(out)


@register(
    "trim_docs_above_p95",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars <= (SELECT quantile_disc(n_chars, 0.95) FROM documents)
    """,
)
def trim_docs_above_p95(sf_dir: str):
    # the sketch-driven outlier trim: one zero-shuffle quantile pass
    # computes the cut (exact below sketch capacity — the oracle's
    # regime; bounded-error at 100 TB), the scalar broadcasts into a
    # parquet-pushdown filter on the second pass
    from etlray.functions.sketch import approx_quantiles

    stats = _pq(sf_dir, "documents", columns=["n_chars"]).read()
    cut = approx_quantiles(stats, "n_chars", qs=[0.95])["q95"][0].as_py()
    return _pq(sf_dir, "documents", columns=["doc_id", "n_chars"],
               filter=(pc.field("n_chars") <= cut)).read()


@register(
    "weighted_sample_docs",
    """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars, row_number() OVER (
        ORDER BY pow(md5_number_lower('ws1' || doc_id::VARCHAR)::DOUBLE
                     / 18446744073709551616.0, 1.0 / n_chars) DESC,
                 doc_id) AS rn
      FROM documents WHERE n_chars > 0) WHERE rn <= 50
    """,
)
def weighted_sample_docs(sf_dir: str):
    # Efraimidis–Spirakis: inclusion probability ∝ n_chars — the
    # importance-sampling primitive behind data-mixture weighting
    from etlray.functions.sampling import weighted_sample

    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"]).read()
    return weighted_sample(ds, "doc_id", "n_chars", k=50, salt="ws1")


@register(
    "explode_text_records",
    r"""
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '\stable\s')) AS record
    FROM documents WHERE doc_id < 50 AND text IS NOT NULL
    """,
)
def explode_text_records(sf_dir: str):
    # delimiter-regex record splitting (log lines / multi-record blobs
    # / sentence segmentation — the delimiter here is one that actually
    # occurs in the synthetic corpus); RE2 on both engines → identical
    # split points byte-for-byte, flat_map via ExplodeTransform
    from etlray.stages import ExplodeTransform

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=(pc.field("doc_id") < 50) & pc.field("text").is_valid()
             ).read()

    def split(t: pa.Table) -> pa.Table:
        s = pc.split_pattern_regex(
            pc.cast(t["text"].combine_chunks(), pa.string()),
            pattern=r"\stable\s")
        return pa.table({"doc_id": t["doc_id"],
                         "__recs": s if not isinstance(s, pa.ChunkedArray)
                         else s.combine_chunks()})

    ds = ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
    return ExplodeTransform("__recs", out_col="record").apply(ds)


@register(
    "rollup_lineitem_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS l_quantity_sum,
           count(*) AS l_quantity_count
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_flags(sf_dir: str):
    # quantity scaled to exact integer hundredths (see pricing_summary)
    # so subtotal sums are associative at every rollup level
    from etlray.stages import RollupTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"]).read()
    ds = _scale_int_cols(ds, {"l_quantity": 100.0})
    return RollupTransform(
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum"), ("l_quantity", "count")],
        exact_int=True).apply(ds)


@register(
    "cube_lineitem_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS l_quantity_sum,
           count(*) AS l_quantity_count
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(sf_dir: str):
    from etlray.stages import RollupTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"]).read()
    ds = _scale_int_cols(ds, {"l_quantity": 100.0})
    return RollupTransform(
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum"), ("l_quantity", "count")],
        mode="cube", exact_int=True).apply(ds)


@register(
    "heavy_hitters_event_type",
    """
    SELECT event_type AS value, count(*) AS cnt FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type ORDER BY cnt DESC, value LIMIT 5
    """,
)
def heavy_hitters_event_type(sf_dir: str):
    # exact while distinct event types ≤ capacity (the oracle's
    # regime); at 100 TB the same fold gives bounded-undercount
    # candidates with zero shuffle
    from etlray.functions.sketch import heavy_hitters

    ds = _pq(sf_dir, "events", columns=["event_type"]).read()
    return heavy_hitters(ds, "event_type", k=5, capacity=1024)


@register(
    "histogram_event_values",
    """
    WITH b AS (
      SELECT CAST(floor((value - 0.0) / (500.0 - 0.0) * 25) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL)
    SELECT bin, 0.0 + bin * ((500.0 - 0.0) / 25) AS lo_edge,
           count(*) AS cnt
    FROM b WHERE bin >= 0 AND bin < 25 GROUP BY bin
    """,
)
def histogram_event_values(sf_dir: str):
    from etlray.functions.sketch import histogram

    ds = _pq(sf_dir, "events", columns=["value"]).read()
    return histogram(ds, "value", lo=0.0, hi=500.0, nbins=25)


@register(
    "centroid_embeddings_by_label",
    """
    SELECT label, CAST(pos AS BIGINT) AS pos, avg(v) AS centroid_v,
           count(*) AS n_vecs
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def centroid_embeddings_by_label(sf_dir: str):
    from etlray.functions.ann import centroid_per_group

    ds = _pq(sf_dir, "embeddings", columns=["label", "embedding"]).read()
    return centroid_per_group(ds, "label")


@register(
    "approx_quantiles_value",
    """
    SELECT quantile_disc(value, 0.25) AS q25,
           quantile_disc(value, 0.50) AS q50,
           quantile_disc(value, 0.90) AS q90,
           quantile_disc(value, 0.99) AS q99
    FROM events
    """,
)
def approx_quantiles_value(sf_dir: str):
    # the sketch is EXACT below its capacity (what the oracle checks
    # here); at 100 TB the same code path degrades gracefully to
    # bounded-rank-error estimates with zero shuffle — the scale
    # companion to the exact QuantilePerGroupTransform
    from etlray.functions.sketch import approx_quantiles

    ds = _pq(sf_dir, "events", columns=["value"]).read()
    return approx_quantiles(ds, "value", qs=[0.25, 0.5, 0.9, 0.99],
                            names=["q25", "q50", "q90", "q99"])


@register(
    "approx_quantiles_value_by_type",
    """
    SELECT event_type,
           quantile_disc(value, 0.25) AS q25,
           quantile_disc(value, 0.50) AS q50,
           quantile_disc(value, 0.90) AS q90
    FROM events GROUP BY event_type
    """,
)
def approx_quantiles_value_by_type(sf_dir: str):
    # per-group sketch partials through the exchange — exact below
    # capacity (the oracle's regime), shuffle volume independent of
    # group size beyond it; the scale path beside the exact
    # QuantilePerGroupTransform (quantiles_value_by_type)
    from etlray.functions.sketch import approx_quantiles_per_group

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    return approx_quantiles_per_group(ds, "event_type", "value",
                                      qs=[0.25, 0.5, 0.9])


@register(
    "tfidf_top_terms_docs",
    """
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    toks AS (
      SELECT doc_id, unnest(string_split(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM d),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n FROM d),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n / df.df), 6) AS tfidf
      FROM tf, n JOIN df ON tf.term = df.term)
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def tfidf_top_terms_docs(sf_dir: str):
    from etlray.functions.curation import tfidf_top_terms

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=pc.field("text").is_valid()).read()
    return tfidf_top_terms(ds, k=5)


@register(
    "event_lag_gaps_per_user",
    """
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS value_lag,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           row_number() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def event_lag_gaps_per_user(sf_dir: str):
    from etlray.stages import WindowLagTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    return WindowLagTransform("ts", "user_id", "value",
                              order_tiebreak="event_id").apply(ds)


@register(
    "sample_docs_per_lang",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang, row_number() OVER (
        PARTITION BY lang
        ORDER BY md5_number_lower('s1' || doc_id::VARCHAR), doc_id) AS rn
      FROM documents) WHERE rn <= 3
    """,
)
def sample_docs_per_lang(sf_dir: str):
    from etlray.functions.sampling import sample_per_group

    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang"]).read()
    return sample_per_group(ds, "lang", "doc_id", k=3, salt="s1")


@register(
    "distinct_users_by_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS user_id_distinct
    FROM events GROUP BY event_type
    """,
)
def distinct_users_by_type(sf_dir: str):
    from etlray.stages import CountDistinctTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "user_id"]).read()
    return CountDistinctTransform("event_type", "user_id").apply(ds)


@register(
    "quantiles_value_by_type",
    """
    SELECT event_type,
           quantile_disc(value, 0.25) AS q25,
           quantile_disc(value, 0.50) AS q50,
           quantile_disc(value, 0.90) AS q90
    FROM events GROUP BY event_type
    """,
)
def quantiles_value_by_type(sf_dir: str):
    from etlray.stages import QuantilePerGroupTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    return QuantilePerGroupTransform("event_type", "value",
                                     qs=[0.25, 0.5, 0.9]).apply(ds)


@register(
    "explode_embeddings",
    """
    SELECT vec_id, unnest(embedding) AS value,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings WHERE vec_id < 5
    """,
)
def explode_embeddings(sf_dir: str):
    from etlray.stages import ExplodeTransform

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"],
             filter=(pc.field("vec_id") < 5)).read()
    return ExplodeTransform("embedding", out_col="value",
                            with_ordinality=True, ord_col="pos").apply(ds)


@register(
    "zip_docs_with_index",
    """
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS row_idx
    FROM documents
    """,
)
def zip_docs_with_index(sf_dir: str):
    from etlray.functions.sampling import zip_with_index

    ds = _pq(sf_dir, "documents", columns=["doc_id"]).read()
    return zip_with_index(ds, "row_idx")


# the composed LLM-corpus preprocessing chain: language-ID → quality
# gate → exact dedup, each stage an operator oracled on its own above;
# the composition is oracled end-to-end here
_CORPUS_CLEAN_SQL = (
    "WITH L AS (" + _LANGID_SQL + "), sel AS ("
    r"""
      SELECT doc_id, text FROM L
      WHERE lang_pred = 'en'
        AND len(regexp_extract_all(text, '\S+')) >= 20
    )
    SELECT doc_id, text FROM (
      SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS keeper
      FROM sel
    ) WHERE doc_id = keeper
    """)


@register("corpus_clean", _CORPUS_CLEAN_SQL)
def corpus_clean(sf_dir: str):
    from etlray.functions.dedup import exact_dedup
    from etlray.functions.text import LangIdStage, token_count

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"]).read()
    ds = ds.map_batches(LangIdStage, fn_constructor_args=("text",),
                        batch_format="pyarrow", concurrency=2)

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["lang_pred"], "en"),
                    pc.greater_equal(pc.cast(token_count(t["text"]),
                                             pa.int64()), 20))
        return t.filter(m).select(["doc_id", "text"])
    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return exact_dedup(ds, text_col="text", order_col="doc_id")


@register(
    "sample_docs_deterministic",
    """
    SELECT doc_id, lang, text FROM documents
    WHERE md5_number_lower('mix1' || doc_id::VARCHAR)::UBIGINT % 10000 < 2500
    """,
)
def sample_docs_deterministic(sf_dir: str):
    from etlray.functions.sampling import deterministic_sample

    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "text"]).read()
    return deterministic_sample(ds, "doc_id", rate=0.25, salt="mix1")


@register(
    "pack_token_shards_docs",
    """
    WITH t AS (
      SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           ((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // 1000)::BIGINT AS shard_idx
    FROM t
    """,
)
def pack_token_shards_docs(sf_dir: str):
    from etlray.functions.sampling import pack_token_shards
    from etlray.functions.text import token_count

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()

    def add_ntok(t: pa.Table) -> pa.Table:
        c = pc.cast(token_count(t["text"]), pa.int64())
        t = t.append_column("n_tokens",
                            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        return t.drop_columns(["text"])
    ds = ds.map_batches(add_ntok, batch_format="pyarrow", zero_copy_batch=True)
    return pack_token_shards(ds, "n_tokens", budget=1000)


# ---------------------------------------------------------------------------
# corpus curation (etlray/functions/curation.py): benchmark
# decontamination, chunking, stratified split, global n-gram stats
# ---------------------------------------------------------------------------
# benchmark = every 50th doc; a doc is contaminated if it shares any
# 4-token n-gram with a benchmark doc (Gopher/Llama-style n-gram
# decontamination). Gram strings compare byte-equal between engines.
_DECONTAM_SQL = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS t
  FROM documents
), g AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS gram
  FROM d, LATERAL unnest(range(1, greatest(len(t)-2, 1))) u(i)
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
)
SELECT g.doc_id, count(*) AS n_hits
FROM g JOIN bench USING (gram)
WHERE g.doc_id % 50 <> 0
GROUP BY g.doc_id
"""


@register("decontaminate_docs", _DECONTAM_SQL)
def decontaminate_docs(sf_dir: str):
    import ray as _ray

    from etlray.functions.curation import benchmark_grams, contamination_hits

    def split_mod(t: pa.Table, want_bench: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = (ids % 50 == 0) if want_bench else (ids % 50 != 0)
        return t.filter(pa.array(mask, pa.bool_()))

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    bench_ds = ds.map_batches(lambda t: split_mod(t, True), batch_format="pyarrow")
    ref = _ray.put(benchmark_grams(bench_ds, n=4))
    corpus = ds.map_batches(lambda t: split_mod(t, False), batch_format="pyarrow")
    return contamination_hits(corpus, ref, n=4)


@register(
    "chunk_docs",
    """
    SELECT doc_id, CAST((i-1)/400 AS BIGINT) AS chunk_idx,
           substring(text, CAST(i AS INT), 500) AS chunk
    FROM documents,
         LATERAL unnest(generate_series(1, greatest(length(text),1), 400)) u(i)
    """,
)
def chunk_docs(sf_dir: str):
    from etlray.functions.curation import chunk_documents

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    return chunk_documents(ds, size=500, stride=400)


@register(
    "split_train_val",
    """
    SELECT lang,
           CASE WHEN (CAST(doc_id AS UBIGINT) * 2654435761) % 10 = 0
                THEN 'val' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM documents GROUP BY 1, 2
    """,
)
def split_train_val(sf_dir: str):
    from etlray.functions.curation import assign_split

    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]).read()
    ds = ds.map_batches(lambda t: assign_split(t), batch_format="pyarrow")
    agg = AggregateTransform(["lang", "split"],
                             [("doc_id", "count"), ("n_chars", "sum")]).apply(ds)
    agg = RenameColumnsTransform(
        {"doc_id_count": "n_docs", "n_chars_sum": "chars_total"}).apply(agg)

    def as_int(t: pa.Table) -> pa.Table:
        # char totals are integral; undo the Sum aggregate's float coercion
        i = t.schema.get_field_index("chars_total")
        return t.set_column(i, "chars_total", t["chars_total"].cast(pa.int64()))
    return agg.map_batches(as_int, batch_format="pyarrow")


_TOP_NGRAMS_SQL = r"""
WITH d AS (
  SELECT string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS t
  FROM documents
), g AS (
  SELECT array_to_string(t[i:i+4], ' ') AS gram
  FROM d, LATERAL unnest(range(1, greatest(len(t)-3, 1))) u(i)
)
SELECT gram, count(*) AS cnt FROM g
GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
"""


@register("top_ngrams_docs", _TOP_NGRAMS_SQL)
def top_ngrams_docs(sf_dir: str):
    from etlray.functions.curation import top_ngrams

    ds = _pq(sf_dir, "documents", columns=["text"]).read()
    return top_ngrams(ds, n=5, k=20)


@register("approx_top_ngrams_docs", _TOP_NGRAMS_SQL)
def approx_top_ngrams_docs(sf_dir: str):
    # zero-shuffle Misra-Gries path; exact (same oracle as
    # top_ngrams_docs) while distinct grams ≤ capacity
    from etlray.functions.curation import approx_top_ngrams

    ds = _pq(sf_dir, "documents", columns=["text"]).read()
    return approx_top_ngrams(ds, n=5, k=20)


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase', 'error')
    GROUP BY user_id
    """,
)
def pivot_event_counts(sf_dir: str):
    from etlray.stages import PivotTransform

    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"]).read()
    return PivotTransform("user_id", "event_type",
                          values=["click", "view", "purchase", "error"]).apply(ds)


@register(
    "sessionize_events",
    """
    WITH w AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER win IS NULL
                  OR ts - lag(ts) OVER win > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
    FROM w
    """,
)
def sessionize_events(sf_dir: str):
    import numpy as np

    from etlray.stages import SessionizeTransform

    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"]).read()
    return SessionizeTransform(
        "ts", "user_id", gap=np.timedelta64(30, "m"),
        order_tiebreak="event_id").apply(ds)


@register(
    "topk_events_per_type",
    """
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 3
    """,
)
def topk_events_per_type(sf_dir: str):
    from etlray.stages import TopKPerGroupTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type", "value"]).read()
    return TopKPerGroupTransform(
        "event_type", [("value", True), ("event_id", False)], k=3).apply(ds)


# ---------------------------------------------------------------------------
# multimodal: REAL dependency-free decode (uncompressed 24-bit BMP via
# numpy, PCM WAV via stdlib) on self-synthesized valid payloads;
# strict=True so a silent fallback to the stub would fail the query
# ---------------------------------------------------------------------------

def _sliced(tbl, rows_per_block: int):
    """Split an in-memory synth table into multiple blocks — a single
    ``from_arrow(tbl)`` block caps an actor-pool map_batches at ONE
    task regardless of ``concurrency`` (Ray dispatches tasks per
    block, not per batch), serializing the whole decode on one actor."""
    import ray.data

    return ray.data.from_arrow(
        [tbl.slice(o, rows_per_block)
         for o in range(0, tbl.num_rows, rows_per_block)])


@register("multimodal_decode")
def multimodal_decode(sf_dir: str):
    import ray.data

    from etlray.functions.multimodal import ImageDecodeStage, synth_bmp_table

    # small batches/blocks: binary payloads are wide (memory-aware)
    ds = _sliced(synth_bmp_table(256), 32)
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs={"strict": True},
                          batch_format="pyarrow",
                          batch_size=32, concurrency=2) \
        .select_columns(["media_id", "decoded_width", "decoded_height"])


@register("multimodal_decode_png")
def multimodal_decode_png(sf_dir: str):
    """Strict-mode decode of REAL compressed payloads: every row is an
    8-bit truecolor PNG (filter types 0-4) decoded by the
    dependency-free zlib+numpy codec — stub fallback would raise."""
    import ray.data

    from etlray.functions.multimodal import ImageDecodeStage, synth_png_table

    ds = _sliced(synth_png_table(256), 32)
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs={"strict": True},
                          batch_format="pyarrow",
                          batch_size=32, concurrency=2) \
        .select_columns(["media_id", "decoded_width", "decoded_height"])


@register("multimodal_decode_jpeg")
def multimodal_decode_jpeg(sf_dir: str):
    """Strict-mode decode of REAL baseline-JPEG payloads (alternating
    4:4:4 / 4:2:0) by the dependency-free huffman+IDCT codec
    (etlray/functions/jpeg.py) — stub fallback would raise."""
    import ray.data

    from etlray.functions.multimodal import (ImageDecodeStage,
                                             synth_jpeg_table)

    # concurrency 8 / 8-row blocks: the bit-serial huffman loop is the
    # cost (a real deployment swaps PIL/turbojpeg into the same stage)
    # — 16 single-batch blocks over 8 actors keeps the strict decode in
    # the same wall-time band as the other multimodal queries
    ds = _sliced(synth_jpeg_table(128), 8)
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs={"strict": True},
                          batch_format="pyarrow",
                          batch_size=8, concurrency=8) \
        .select_columns(["media_id", "decoded_width", "decoded_height"])


@register("multimodal_features")
def multimodal_features(sf_dir: str):
    import ray.data

    from etlray.functions.multimodal import ImageFeatureStage, synth_bmp_table

    ds = _sliced(synth_bmp_table(256), 32)
    return ds.map_batches(ImageFeatureStage,
                          fn_constructor_kwargs={"dim": 32, "strict": True},
                          batch_format="pyarrow", batch_size=32, concurrency=2) \
        .select_columns(["media_id", "features"])


@register("multimodal_audio_features")
def multimodal_audio_features(sf_dir: str):
    import ray.data

    from etlray.functions.multimodal import AudioFeatureStage, synth_wav_table

    ds = _sliced(synth_wav_table(128), 32)
    return ds.map_batches(AudioFeatureStage,
                          fn_constructor_kwargs={"strict": True},
                          batch_format="pyarrow", batch_size=32, concurrency=2) \
        .select_columns(["media_id", "duration_sec", "rms", "zcr",
                         "spectral_centroid"])


@register("cdc_replay_flagship")
def cdc_replay_flagship(sf_dir: str):
    """The north-star pipeline itself as a registered query (rows-only:
    correctness is gated by tests/test_cdc.py's oracle + sha256)."""
    from etlray.cdc.engine import flagship_cdc_demo

    return flagship_cdc_demo(sf_dir)


@register("cdc_snapshot_diff")
def cdc_snapshot_diff(sf_dir: str):
    """Snapshot diff over the flagship replay (rows-only: classified
    added/deleted/changed keys are oracle-checked against the dict
    replay in tests/test_cdc.py::test_snapshot_diff_matches_oracle).
    Carry-forward buckets are skipped without reading a byte — diff
    cost ∝ touched buckets, like the apply path."""
    from etlray.cdc.engine import flagship_cdc_demo

    return flagship_cdc_demo(sf_dir, return_diff=True)


@register("cdc_incremental_view")
def cdc_incremental_view(sf_dir: str):
    """Materialized (language → n_rows, sum_lsn) view maintained
    INCREMENTALLY across the flagship's epochs from the change data
    feed — no rescan; equality with a full snapshot recompute is
    pytest-gated (tests/test_cdc.py::test_incremental_agg_view…).
    Rows-only by design."""
    from etlray.cdc.engine import flagship_cdc_demo

    return flagship_cdc_demo(sf_dir, return_view=True)


@register("cdc_delta_replay")
def cdc_delta_replay(sf_dir: str):
    """Flagship fixture replayed through the DELTA tier (per-bucket
    delta stacks instead of bucket rewrites) and read back through
    MERGE-ON-READ — rows-only; byte-equality with merge-mode replay
    and the single-process oracle is gated by tests/test_delta_mode.py."""
    from etlray.cdc.engine import flagship_cdc_demo

    return flagship_cdc_demo(sf_dir, mode="delta")


# connected components over the exact-verified MinHash pair list; the
# oracle recomputes the same exact-Jaccard pairs (same derivation as
# _MINHASH_SQL) and resolves components with a recursive reachability
# CTE — canonical = min doc_id per component, canonical maps to itself
_DUP_CLUSTER_SQL = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS s
  FROM d, LATERAL unnest(range(1, greatest(length(norm) - 3, 2))) t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), p AS (
  SELECT ia AS a, ib AS b
  FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8
), edges AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: edges is referenced inside the
  -- recursive member, and without it DuckDB re-executes the whole
  -- quadratic shingle self-join at EVERY recursion step (>25 min at
  -- sf0.1 vs ~20 s materialized; identical results)
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) s
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node
"""


@register("dup_cluster_canonical", _DUP_CLUSTER_SQL)
def dup_cluster_canonical(sf_dir: str):
    """Near-dup pairs → connected components → (doc_id, canonical_id)
    membership table. Pairs come from MinHash-LSH with exact verify
    (identical contract to the oracle's exact-Jaccard pair list), so
    the component structure matches deterministically."""
    from etlray.functions.dedup import dup_clusters, minhash_lsh_candidates

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()
    pairs = minhash_lsh_candidates(ds, jaccard_threshold=0.8)
    return dup_clusters(pairs)


# the end-to-end "dedup the corpus" story: detect near-dup pairs,
# resolve clusters, drop non-canonical members — corpus streams through
# a broadcast filter, never shuffled. Oracle: anti-join against the
# recursive-CTE cluster membership (same derivation as above).
_CANON_ONLY_SQL = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 5) AS s
  FROM d, LATERAL unnest(range(1, greatest(length(norm) - 3, 2))) t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), p AS (
  SELECT ia AS a, ib AS b
  FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8
), edges AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: edges is referenced inside the
  -- recursive member, and without it DuckDB re-executes the whole
  -- quadratic shingle self-join at EVERY recursion step (>25 min at
  -- sf0.1 vs ~20 s materialized; identical results)
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) s
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
), drops AS (
  SELECT node FROM reach GROUP BY node HAVING node <> min(r)
)
SELECT doc_id, lang FROM documents
WHERE doc_id NOT IN (SELECT node FROM drops)
"""


@register("corpus_canonical_only", _CANON_ONLY_SQL)
def corpus_canonical_only(sf_dir: str):
    """Detection → clustering → broadcast filter: the corpus minus
    non-canonical near-dup cluster members. The corpus is never
    shuffled — only the (small) drop set moves, via ray.put."""
    from etlray.functions.dedup import (dup_clusters, keep_canonical,
                                        minhash_lsh_candidates)

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"]).read()
    pairs = minhash_lsh_candidates(
        ds.select_columns(["doc_id", "text"]), jaccard_threshold=0.8)
    members = dup_clusters(pairs)
    return keep_canonical(ds, members).select_columns(["doc_id", "lang"])


@register(
    "percentile_cont_value_by_type",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90
    FROM events GROUP BY event_type
    """,
)
def percentile_cont_value_by_type(sf_dir: str):
    """SQL percentile_cont (linear interpolation at q·(n−1)) per group
    — the continuous companion to quantiles_value_by_type's
    quantile_disc; same (group, value, count)-collapsed exchange."""
    from etlray.stages import QuantilePerGroupTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    return QuantilePerGroupTransform(
        "event_type", "value", [0.5, 0.9], names=["p50", "p90"],
        interpolation="linear").apply(ds)


@register(
    "dense_rank_events_by_type",
    """
    SELECT event_id, event_type, value,
           dense_rank() OVER (PARTITION BY event_type ORDER BY value)
             AS dense_rank
    FROM events WHERE value IS NOT NULL
    """,
)
def dense_rank_events_by_type(sf_dir: str):
    """DENSE_RANK window: ties share a rank, the next distinct value
    increments by exactly 1 — one exchange on the partition key,
    vectorized change-mask + cumsum per bucket."""
    from etlray.stages import DenseRankTransform, FilterTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    return DenseRankTransform("event_type", "value").apply(ds)


@register(
    "ntile_events_by_type",
    """
    SELECT event_id, event_type, value,
           ntile(4) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS ntile
    FROM events WHERE value IS NOT NULL
    """,
)
def ntile_events_by_type(sf_dir: str):
    """NTILE(4) window — tie order pinned by event_id on both engines
    (SQL leaves it unspecified otherwise)."""
    from etlray.stages import NtileTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    return NtileTransform("event_type", "value", 4,
                          tiebreak="event_id").apply(ds)


@register(
    "mode_value_by_type",
    """
    SELECT event_type, v AS value_mode FROM (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, v ASC) AS rn
      FROM (SELECT event_type, value AS v, count(*) AS cnt
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, value))
    WHERE rn = 1
    """,
)
def mode_value_by_type(sf_dir: str):
    """Deterministic per-group MODE (smallest value wins ties) — the
    (group, value, count)-collapsed exchange shape of CountDistinct."""
    from etlray.stages import ModePerGroupTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    return ModePerGroupTransform("event_type", "value",
                                 out_col="value_mode").apply(ds)


@register(
    "except_click_value_floors",
    """
    SELECT CAST(floor(value) AS BIGINT) AS v FROM events
    WHERE event_type = 'click' AND value IS NOT NULL
    EXCEPT
    SELECT CAST(floor(value) AS BIGINT) FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
    """,
)
def except_click_value_floors(sf_dir: str):
    """SQL EXCEPT (distinct set difference) — distinct-collapsed anti
    join, no broadcast. Keyed on floor(value) rather than user_id so
    the fixture yields a NON-vacuous difference at every scale (every
    user performs every event type, so a user_id EXCEPT is always
    empty — the round-2 vacuous-oracle lesson). Gathered to one Arrow
    table for the driver compare (Ray's to_pandas() drops the schema
    of an all-empty Dataset and small-scale differences can be tiny)."""
    import ray

    from etlray.stages import SetOpTransform

    def floors(event_type: str):
        ds = _pq(sf_dir, "events", columns=["event_type", "value"],
                 filter=(pc.field("event_type") == event_type)
                 & pc.field("value").is_valid()).read()

        def f(t: pa.Table) -> pa.Table:
            v = pc.cast(pc.floor(t["value"]), pa.int64())
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return pa.table({"v": v})

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    out = SetOpTransform(floors("purchase"), op="except") \
        .apply(floors("click"))
    return pa.concat_tables(ray.get(out.to_arrow_refs()),
                            promote_options="permissive")


@register(
    "intersect_click_purchase_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def intersect_click_purchase_users(sf_dir: str):
    """SQL INTERSECT (distinct): users who both clicked and purchased."""
    from etlray.stages import SetOpTransform

    clicks = _pq(sf_dir, "events", columns=["user_id", "event_type"],
                 filter=(pc.field("event_type") == "click")).read() \
        .select_columns(["user_id"])
    buys = _pq(sf_dir, "events", columns=["user_id", "event_type"],
               filter=(pc.field("event_type") == "purchase")).read() \
        .select_columns(["user_id"])
    return SetOpTransform(buys, op="intersect").apply(clicks)


@register(
    "running_sum_value_by_user",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 10000) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS value_running_sum
    FROM events
    """,
)
def running_sum_value_by_user(sf_dir: str):
    """Running total per user in event order — SQL SUM OVER UNBOUNDED
    PRECEDING. The value is decimal-scaled to int64 FIRST (×10000) so
    the cumulative sum is associative and bit-equal to SQL's integer
    window sum at any block order (the pricing_summary exact-int rule
    applied to windows)."""
    from etlray.stages import RunningAggTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    ds = _scale_int_cols(ds, {"value": 10000.0})
    out = RunningAggTransform("user_id", "ts", "value", agg="sum",
                              tiebreak="event_id",
                              out_col="value_running_sum").apply(ds)
    return out.select_columns(["event_id", "user_id",
                               "value_running_sum"])


@register(
    "cross_join_region_nation",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def cross_join_region_nation(sf_dir: str):
    """Bounded cross join over the two smallest tables — driver-oracle
    evidence for the §2.5 cross-join operator (pytest-only before)."""
    from etlray.stages import CrossJoinTransform

    region = _pq(sf_dir, "region", columns=["r_name"]).read()
    nation = _pq(sf_dir, "nation", columns=["n_name"]).read()
    return CrossJoinTransform(nation).apply(region)


@register(
    "first_last_value_by_user",
    """
    SELECT event_id, user_id, ts, value,
           first_value(value) OVER w AS first_value,
           last_value(value)  OVER w AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def first_last_value_by_user(sf_dir: str):
    """FIRST_VALUE/LAST_VALUE over the FULL partition (the explicit
    frame — the default frame degenerates LAST_VALUE to the current
    row). Tie order pinned by event_id on both engines. One key
    exchange, one sort, one arrow take per output."""
    from etlray.stages import FirstLastValueTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    return FirstLastValueTransform("user_id", "ts", "value",
                                   tiebreak="event_id").apply(ds)


@register(
    "percent_rank_value_by_type",
    """
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value)
             AS percent_rank,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value)
             AS cume_dist
    FROM events WHERE value IS NOT NULL
    """,
)
def percent_rank_value_by_type(sf_dir: str):
    """PERCENT_RANK + CUME_DIST in one exchange pass — (rank-1)/(n-1)
    and tie-run-end/n are integer-derived then divided, so both
    engines produce bit-identical float64."""
    from etlray.stages import RankStatsTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    return RankStatsTransform("event_type", "value").apply(ds)


@register(
    "grouping_sets_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS l_quantity_sum,
           count(*) AS l_quantity_count
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_linestatus), ())
    """,
)
def grouping_sets_lineitem(sf_dir: str):
    """GROUP BY GROUPING SETS — the (l_linestatus) set is NOT a rollup
    prefix, so this exercises the mode='sets' generalization (every
    set still folds from the one finest aggregate; raw data scanned
    once)."""
    from etlray.stages import RollupTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"]).read()
    ds = _scale_int_cols(ds, {"l_quantity": 100.0})
    return RollupTransform(
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum"), ("l_quantity", "count")],
        mode="sets",
        grouping_sets=[("l_returnflag", "l_linestatus"),
                       ("l_linestatus",), ()],
        exact_int=True).apply(ds)


@register(
    "moving_minmax_user_value",
    """
    SELECT event_id, user_id, ts, value,
           min(value) OVER w AS value_wmin,
           max(value) OVER w AS value_wmax
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def moving_minmax_user_value(sf_dir: str):
    """Bounded-frame MIN/MAX window — min/max select existing values
    (no arithmetic), so the float64 columns are bit-equal to SQL by
    construction. events.value carries no NULLs in the generated
    testdata, so the empty-window/NaN paths are gated by the unit
    tests (tests/test_window_minmax_unpivot.py), not this oracle."""
    from etlray.stages import MovingMinMaxTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    return MovingMinMaxTransform("ts", "user_id", "value", window=4,
                                 order_tiebreak="event_id").apply(ds)


@register(
    "unpivot_event_counts",
    """
    WITH c AS (
      SELECT user_id, event_type AS name, count(*) AS value
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase', 'error')
      GROUP BY user_id, event_type
    )
    SELECT u.user_id, t.name, coalesce(c.value, 0) AS value
    FROM (SELECT DISTINCT user_id FROM events
          WHERE event_type IN ('click', 'view', 'purchase', 'error')) u
    CROSS JOIN (VALUES ('click'), ('view'), ('purchase'), ('error'))
      t(name)
    LEFT JOIN c ON c.user_id IS NOT DISTINCT FROM u.user_id
               AND c.name = t.name
    """,
)
def unpivot_event_counts(sf_dir: str):
    """pivot → unpivot round trip: the wide per-user count matrix
    stacked back to long form (zero cells kept — pivot fills 0, so the
    oracle densifies with a cross join; IS NOT DISTINCT FROM keeps a
    NULL user group joinable, matching pivot's dropna=False)."""
    from etlray.stages import PivotTransform, UnpivotTransform

    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"],
             filter=pc.field("event_type").isin(
                 ["click", "view", "purchase", "error"])).read()
    wide = PivotTransform("user_id", "event_type",
                          values=["click", "view", "purchase",
                                  "error"]).apply(ds)
    return UnpivotTransform("user_id",
                            ["click", "view", "purchase", "error"]
                            ).apply(wide)


@register(
    "corr_qty_discount_by_flag",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_discount * 100) AS BIGINT) AS y
      FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n,
           CASE WHEN (count(*) * sum(x*x) - sum(x) * sum(x)) = 0
                  OR (count(*) * sum(y*y) - sum(y) * sum(y)) = 0
                THEN NULL
                ELSE CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE)
                     / (sqrt(CAST(count(*) * sum(x*x)
                                  - sum(x) * sum(x) AS DOUBLE))
                        * sqrt(CAST(count(*) * sum(y*y)
                                    - sum(y) * sum(y) AS DOUBLE)))
           END AS corr,
           CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE)
             / CAST(count(*) * count(*) AS DOUBLE) AS covar_pop,
           CASE WHEN (count(*) * sum(x*x) - sum(x) * sum(x)) = 0 THEN NULL
                ELSE CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE)
                     / CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE)
           END AS regr_slope,
           CASE WHEN (count(*) * sum(x*x) - sum(x) * sum(x)) = 0 THEN NULL
                ELSE (CAST(sum(y) AS DOUBLE)
                      - (CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE)
                         / CAST(count(*) * sum(x*x)
                                - sum(x) * sum(x) AS DOUBLE))
                        * CAST(sum(x) AS DOUBLE))
                     / CAST(count(*) AS DOUBLE)
           END AS regr_intercept
    FROM s GROUP BY l_returnflag
    """,
)
def corr_qty_discount_by_flag(sf_dir: str):
    """Per-group Pearson corr + covar_pop + least-squares slope and
    intercept from exact int64 moments — every moment stays below 2^53
    at sf0.1 so each int→double cast is exact and the one-op-per-node
    closed forms are bit-equal to the SQL expressions over integer
    SUMs (see CorrStatsTransform)."""
    from etlray.stages import CorrStatsTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_discount"]).read()
    ds = _scale_int_cols(ds, {"l_quantity": 1.0, "l_discount": 100.0})
    return CorrStatsTransform(["l_returnflag"], "l_quantity", "l_discount",
                              with_regression=True).apply(ds)


@register(
    "date_parts_events",
    """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(isodow(ts) AS BIGINT) AS dow_iso,
           date_trunc('day', ts) AS day_ts
    FROM events
    """,
)
def date_parts_events(sf_dir: str):
    """Temporal scalar-function width — Arrow's temporal kernels
    against DuckDB's: component extraction plus day truncation. The
    one convention trap is day-of-week: Arrow counts Monday=0 by
    default while SQL isodow is Monday=1 — pinned explicitly with
    count_from_zero=False/week_start=1 rather than by adding 1."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "events", columns=["event_id", "ts"]).read()

    def parts(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        out = t.select(["event_id"])
        out = out.append_column("y", pc.cast(pc.year(ts), pa.int64()))
        out = out.append_column("m", pc.cast(pc.month(ts), pa.int64()))
        out = out.append_column("d", pc.cast(pc.day(ts), pa.int64()))
        out = out.append_column("h", pc.cast(pc.hour(ts), pa.int64()))
        out = out.append_column(
            "dow_iso",
            pc.cast(pc.day_of_week(ts, count_from_zero=False,
                                   week_start=1), pa.int64()))
        return out.append_column("day_ts", pc.floor_temporal(ts,
                                                             unit="day"))

    return BatchMapTransform(parts).apply(ds)


@register(
    "event_lag2_per_user",
    """
    SELECT event_id, user_id, ts, value,
           lag(value, 2, -1.0) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS value_lag,
           lead(value, 2, -1.0) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS value_lead,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
    """,
)
def event_lag2_per_user(sf_dir: str):
    """lag/lead with offset 2 and a non-NULL default — the general
    SQL lag(v, k, d) form; the default applies only past partition
    bounds (a lagged source NULL stays NULL, matching SQL)."""
    from etlray.stages import WindowLagTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    return WindowLagTransform(
        "ts", "user_id", "value", order_tiebreak="event_id",
        gap_col=None, with_lead=True, lag_offset=2,
        lag_default=-1.0).apply(ds)


@register(
    "ratio_to_report_value_by_user",
    """
    SELECT event_id, user_id, value,
           value / sum(value) OVER (PARTITION BY user_id) AS value_ratio
    FROM events WHERE value IS NOT NULL
    """,
)
def ratio_to_report_value_by_user(sf_dir: str):
    """Per-row share of its partition total (RATIO_TO_REPORT) — small
    per-user partitions keep the ratios well above the 4-dp agreement
    bar; division-by-zero partitions emit NULL, matching SQL."""
    from etlray.stages import RatioToReportTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "value"],
             filter=pc.field("value").is_valid()).read()
    return RatioToReportTransform("user_id", "value",
                                  out_col="value_ratio").apply(ds)


@register(
    "embedding_list_stats",
    """
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS embedding_dim,
           CAST(list_min(embedding) AS DOUBLE) AS embedding_min,
           CAST(list_max(embedding) AS DOUBLE) AS embedding_max,
           list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             AS embedding_sum
    FROM embeddings
    """,
)
def embedding_list_stats(sf_dir: str):
    """Per-row list aggregates over the embedding column — segmented
    numpy reduces over the flat child values, shuffle-free. min/max
    are exact float32 selections widened to float64 (exact); the sum
    accumulates in float64 on both engines (numpy's pairwise vs SQL's
    sequential order differ below the 4-dp agreement bar)."""
    from etlray.stages import ListStatsTransform

    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"]).read()
    return ListStatsTransform("embedding").apply(ds)


@register(
    "regex_extract_docs",
    r"""
    SELECT doc_id,
           regexp_extract(text, 'the ([a-z]+)', 1) AS after_the,
           regexp_matches(text, '[0-9]') AS has_digit,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked
    FROM documents WHERE text IS NOT NULL
    """,
)
def regex_extract_docs(sf_dir: str):
    """Regex scalar suite — both engines run RE2, so extraction,
    matching and global replacement are byte-equal; the one convention
    gap is no-match extraction (SQL returns '' where Arrow's
    extract_regex returns a NULL struct), closed with fill_null."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=pc.field("text").is_valid()).read()

    def rex(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out = t.select(["doc_id"])
        ex = pc.extract_regex(text, r"the (?P<w>[a-z]+)")
        out = out.append_column(
            "after_the", pc.fill_null(pc.struct_field(ex, "w"), ""))
        out = out.append_column(
            "has_digit", pc.match_substring_regex(text, "[0-9]"))
        return out.append_column(
            "digits_masked",
            pc.replace_substring_regex(text, "[0-9]+", "#"))

    return BatchMapTransform(rex).apply(ds)


@register(
    "string_funcs_docs",
    """
    SELECT doc_id,
           upper(substr(text, 1, 16)) AS head_upper,
           length(text) AS text_chars,
           replace(lang, '-', '_') AS lang_norm,
           contains(text, 'the') AS has_the,
           source || ':' || lang AS src_lang
    FROM documents WHERE text IS NOT NULL
    """,
)
def string_funcs_docs(sf_dir: str):
    """Scalar string-function width over Arrow's utf8 kernels —
    character-based slicing (utf8_slice_codeunits slices codepoints,
    matching SQL substr), unicode upper, codepoint length, literal
    replace, substring containment and separator concat; each kernel
    byte-equal to its DuckDB twin."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "documents",
             columns=["doc_id", "text", "lang", "source"],
             filter=pc.field("text").is_valid()).read()

    def funcs(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out = t.select(["doc_id"])
        out = out.append_column(
            "head_upper",
            pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 16)))
        out = out.append_column(
            "text_chars", pc.cast(pc.utf8_length(text), pa.int64()))
        out = out.append_column(
            "lang_norm", pc.replace_substring(t["lang"], "-", "_"))
        out = out.append_column("has_the", pc.match_substring(text, "the"))
        out = out.append_column(
            "src_lang",
            pc.binary_join_element_wise(t["source"], t["lang"], ":"))
        return out

    return BatchMapTransform(funcs).apply(ds)


# ---------------------------------------------------------------------------
# Round-5 width: NTH_VALUE, arg_max, conditional aggregates (the SQL
# FILTER clause as indicator columns), semi/anti joins.
# ---------------------------------------------------------------------------
@register(
    "nth_value_event_per_user",
    """
    SELECT event_id, user_id, value,
           nth_value(value, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_value
    FROM events
    """,
)
def nth_value_event_per_user(sf_dir: str):
    """Full-frame NTH_VALUE(v, 2): every row carries its user's
    second-earliest value (NULL for single-event users). Unique
    (ts, event_id) ordering makes the pick deterministic on both
    engines; NULL values are not skipped, matching SQL's default."""
    from etlray.stages import NthValueTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"]).read()
    ds = NthValueTransform("user_id", "ts", "value", n=2,
                           tiebreak="event_id",
                           out_col="second_value").apply(ds)
    return SelectColumnsTransform(
        ["event_id", "user_id", "value", "second_value"]).apply(ds)


@register(
    "argmax_event_per_user",
    """
    SELECT user_id, event_id, event_type, value
    FROM events
    WHERE value IS NOT NULL
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id) = 1
    """,
)
def argmax_event_per_user(sf_dir: str):
    """ARG_MAX / max_by: each user's single highest-value event row,
    ties broken by event_id ascending — the deterministic form QUALIFY
    row_number()=1 spells exactly. NULL-value rows never win and
    all-NULL users are absent (the transform's documented QUALIFY
    reading; the oracle's WHERE makes SQL agree). Partial-combine:
    each batch keeps at most one row per user before the exchange."""
    from etlray.stages import ArgMinMaxTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "event_type", "value"]).read()
    return ArgMinMaxTransform("user_id", "value",
                              tiebreak="event_id", mode="max").apply(ds)


@register(
    "conditional_agg_events",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(*) FILTER (WHERE value > 100) AS n_big,
           COALESCE(sum(value) FILTER (WHERE value > 100), 0.0)
               AS sum_big
    FROM events GROUP BY event_type
    """,
)
def conditional_agg_events(sf_dir: str):
    """SQL FILTER-clause aggregates as indicator columns: count FILTER
    is the sum of a 0/1 indicator (NULL predicate -> 0, matching
    FILTER's exclusion) and sum FILTER is the sum of the masked value
    with 0 elsewhere (matching the oracle's COALESCE(.., 0.0) — the
    engine's Sum-empty->0.0 reference semantics). One computed-column
    pass then the ordinary partial-combine aggregate; no extra
    shuffle beyond the groups-sized one."""
    from etlray.stages import AggregateTransform, BatchMapTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()

    def prep(t: pa.Table) -> pa.Table:
        big = pc.fill_null(pc.greater(t["value"], 100.0), False)
        out = t.select(["event_type"])
        out = out.append_column("big", pc.cast(big, pa.int64()))
        return out.append_column(
            "big_value",
            pc.if_else(big, pc.fill_null(t["value"], 0.0), 0.0))

    ds = BatchMapTransform(prep).apply(ds)
    ds = AggregateTransform(
        ["event_type"],
        [("event_type", "count"), ("big", "sum"), ("big_value", "sum")],
        exact_int=True,
    ).apply(ds)
    return RenameColumnsTransform({
        "event_type_count": "n_events", "big_sum": "n_big",
        "big_value_sum": "sum_big"}).apply(ds)


@register(
    "join_semi_customers_with_orders",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(sf_dir: str):
    """LEFT SEMI join (SQL EXISTS): customers with at least one order,
    left columns only, no duplication however many orders match. The
    partitioned hash join's semi mode — the right side ships only its
    join key through the exchange."""
    from etlray.stages import PartitionedHashJoinTransform

    cust = _pq(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_acctbal"]).read()
    orders = _pq(sf_dir, "orders", columns=["o_custkey"]).read()
    return PartitionedHashJoinTransform(
        orders, on="c_custkey", right_on="o_custkey",
        how="left_semi").apply(cust)


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
)
def join_anti_customers_without_orders(sf_dir: str):
    """LEFT ANTI join (SQL NOT EXISTS): customers with no big-ticket
    order (the o_totalprice floor keeps the result non-vacuous at
    every test scale — an unfiltered NOT EXISTS is empty at sf0.001).
    Same exchange shape as the semi join, right side pre-filtered at
    the scan; NULL keys on the left survive, matching NOT EXISTS."""
    from etlray.stages import PartitionedHashJoinTransform

    cust = _pq(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_acctbal"]).read()
    orders = _pq(sf_dir, "orders", columns=["o_custkey"],
                 filter=pc.field("o_totalprice") > 450000).read()
    return PartitionedHashJoinTransform(
        orders, on="c_custkey", right_on="o_custkey",
        how="left_anti").apply(cust)


@register(
    "array_agg_events_per_user",
    """
    SELECT user_id,
           array_to_string(list(event_id ORDER BY ts, event_id), ',')
               AS event_ids
    FROM events GROUP BY user_id
    """,
)
def array_agg_events_per_user(sf_dir: str):
    """Ordered per-group ARRAY_AGG: each user's event_ids as a real
    ``list<int64>`` column in (ts, event_id) order, then joined to a
    comma string — integer formatting is engine-identical, so the
    string form is the hashable oracle surface for a nested result
    (the list itself is pytest-gated). One sort + one
    LargeListArray.from_arrays per bucket, no per-row Python."""
    from etlray.stages import ArrayAggTransform, BatchMapTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id"]).read()
    ds = ArrayAggTransform("user_id", "event_id", order_col="ts",
                           tiebreak="event_id",
                           out_col="event_ids").apply(ds)

    def stringify(t: pa.Table) -> pa.Table:
        lst = t["event_ids"]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        joined = pc.binary_join(
            pc.cast(lst, pa.large_list(pa.string())), ",")
        return t.set_column(t.column_names.index("event_ids"),
                            "event_ids", joined)

    return BatchMapTransform(stringify).apply(ds)


@register(
    "range_window_sum_user_value",
    """
    SELECT event_id, user_id, ts, value,
           sum(value) OVER w AS sum_1h,
           count(value) OVER w AS cnt_1h
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """,
)
def range_window_sum_user_value(sf_dir: str):
    """Sliding time-RANGE window: per row, the sum/count of the same
    user's values in the trailing hour (peers included, SQL RANGE
    semantics; all-NULL windows emit NULL sum). The tumbling
    windowed_agg's sliding sibling — two vectorized searchsorted
    bounds + prefix-sum differences per bucket."""
    from etlray.stages import RangeWindowAggTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"],
             filter=pc.field("ts").is_valid()).read()
    return RangeWindowAggTransform(
        "user_id", "ts", "value", preceding=3_600_000_000,
        out_sum="sum_1h", out_count="cnt_1h").apply(ds)


@register(
    "gapfill_hourly_user_events",
    """
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS ts_bucket,
             count(*) AS n_rows, sum(value) AS value_sum
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT user_id, min(ts_bucket) AS mn, max(ts_bucket) AS mx
          FROM b GROUP BY 1),
    g AS (SELECT r.user_id,
                 unnest(generate_series(r.mn, r.mx, INTERVAL 1 HOUR))
                     AS ts_bucket
          FROM r)
    SELECT g.user_id, g.ts_bucket,
           COALESCE(b.n_rows, 0) AS n_rows, b.value_sum
    FROM g LEFT JOIN b USING (user_id, ts_bucket)
    """,
)
def gapfill_hourly_user_events(sf_dir: str):
    """Sparse→dense time series: every hour bucket between each
    user's first and last event, count 0 / NULL sum for the silent
    hours (and NULL sum for present-but-all-NULL buckets, SQL
    sum-of-nothing). One exchange keyed on user only — the per-bucket
    aggregate and the repeat/arange densify ride the same shuffle."""
    from etlray.stages import GapFillAggTransform

    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             filter=pc.field("ts").is_valid()).read()
    return GapFillAggTransform(
        "user_id", "ts", stride=3_600_000_000, value_col="value",
        out_sum="value_sum").apply(ds)


@register(
    "stddev_value_by_type",
    """
    SELECT event_type,
           var_pop(value) AS var_pop,
           var_samp(value) AS var_samp,
           stddev_samp(value) AS stddev_samp
    FROM events GROUP BY event_type
    """,
)
def stddev_value_by_type(sf_dir: str):
    """Per-group variance / stddev from float64 moments (n, Σx, Σx²)
    — the moments ride the ordinary partial-combine aggregate (one
    indicator-summed row per (group, block)), the closed forms run
    once per group. DuckDB evaluates Welford-style; both land ~1e-10
    relative on this data, far inside the 4-dp agreement bar. n=1
    groups emit var_pop 0 and NULL samp forms; negative rounding
    residue is clamped before the sqrt."""
    from etlray.stages import AggregateTransform, BatchMapTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()

    def prep(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t["value"])
        v = pc.fill_null(t["value"], 0.0)
        out = t.select(["event_type"])
        out = out.append_column("nv", pc.cast(valid, pa.int64()))
        out = out.append_column("s1", v)
        return out.append_column("s2", pc.multiply(v, v))

    ds = BatchMapTransform(prep).apply(ds)
    ds = AggregateTransform(
        ["event_type"],
        [("nv", "sum"), ("s1", "sum"), ("s2", "sum")],
        exact_int=True,
    ).apply(ds)

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        n = np.asarray(t["nv_sum"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        s1 = t["s1_sum"].to_numpy(zero_copy_only=False)
        s2 = t["s2_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1 / n
            vpop = np.maximum(s2 / n - mean * mean, 0.0)
            vsamp = np.maximum((s2 - n * mean * mean), 0.0) / (n - 1)
        out = t.select(["event_type"])
        out = out.append_column(
            "var_pop", pa.array(np.where(n == 0, 0.0, vpop),
                                mask=n == 0))
        m1 = n <= 1
        out = out.append_column(
            "var_samp", pa.array(np.where(m1, 0.0, vsamp), mask=m1))
        return out.append_column(
            "stddev_samp",
            pa.array(np.where(m1, 0.0, np.sqrt(np.maximum(vsamp, 0.0))),
                     mask=m1))

    return BatchMapTransform(finish).apply(ds)


@register(
    "locf_fill_user_value",
    """
    SELECT event_id, user_id, value,
           last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_locf
    FROM events
    """,
)
def locf_fill_user_value(sf_dir: str):
    """Last-observation-carried-forward: each NULL value takes its
    user's most recent non-NULL value in (ts, event_id) order; leading
    all-NULL prefixes stay NULL. One segmented maximum.accumulate over
    source indices + one arrow take per bucket — the value column
    never round-trips through numpy."""
    from etlray.stages import LocfFillTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"]).read()
    ds = LocfFillTransform("user_id", "ts", "value",
                           tiebreak="event_id",
                           out_col="value_locf").apply(ds)
    return SelectColumnsTransform(
        ["event_id", "user_id", "value", "value_locf"]).apply(ds)


@register(
    "json_extract_props_k",
    """
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_props_k(sf_dir: str):
    """Top-level scalar extraction from the JSON ``props`` column —
    one Arrow C++ extract_regex per batch, no per-row Python (the
    strict json.loads path is pytest-compared against this one)."""
    from etlray.stages import JsonScalarExtractTransform

    ds = _pq(sf_dir, "events", columns=["event_id", "props"]).read()
    ds = JsonScalarExtractTransform(
        "props", "k", out_col="k", out_type="int64").apply(ds)
    return SelectColumnsTransform(["event_id", "k"]).apply(ds)


@register(
    "levenshtein_text_chunks",
    """
    SELECT doc_id,
           levenshtein(substr(text, 1, 8), substr(text, 9, 8))
               AS edit_distance
    FROM documents
    """,
)
def levenshtein_text_chunks(sf_dir: str):
    """Byte-exact DuckDB ``levenshtein()`` between each document's
    first two 8-char chunks — the whole batch advances through ONE
    shared DP whose every cell update is a numpy op across all rows
    (the insertion recurrence collapses to a prefix-min), so cost is
    O(len²) numpy calls per batch, not per row."""
    from etlray.functions.text import add_levenshtein
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"]).read()

    def chunks(t: pa.Table) -> pa.Table:
        out = t.select(["doc_id"])
        out = out.append_column(
            "a", pc.utf8_slice_codeunits(t["text"], 0, 8))
        return out.append_column(
            "b", pc.utf8_slice_codeunits(t["text"], 8, 16))

    ds = BatchMapTransform(chunks).apply(ds)
    ds = BatchMapTransform(
        lambda t: add_levenshtein(t, "a", "b")).apply(ds)
    return SelectColumnsTransform(["doc_id", "edit_distance"]).apply(ds)


@register(
    "orc_roundtrip_agg",
    """
    SELECT event_type, count(*) AS n_rows, sum(value) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def orc_roundtrip_agg(sf_dir: str):
    """ORC format round trip, honestly oracled: the events table is
    written to a directory of ORC part files (one per block, inside
    the owning tasks) and read back stripe-streamed with column
    pruning; the aggregate over the round-tripped data must match the
    oracle computed on the original parquet — a full fidelity check of
    schema, values and NULLs through the foreign format."""
    import os

    from etlray.sinks import OrcSink
    from etlray.sources import OrcSource
    from etlray.stages import AggregateTransform, RenameColumnsTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    out = os.path.join(
        "/tmp", f"etlray_orc_rt_{os.path.basename(os.path.normpath(sf_dir))}")
    OrcSink(out, overwrite=True).write(ds)
    back = OrcSource(out).read()
    agg = AggregateTransform(
        ["event_type"], [("event_type", "count"), ("value", "sum")],
    ).apply(back)
    return RenameColumnsTransform(
        {"event_type_count": "n_rows", "value_sum": "value_sum"}).apply(agg)


@register(
    "csv_roundtrip_agg",
    """
    SELECT event_type, count(*) AS n_rows, sum(value) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def csv_roundtrip_agg(sf_dir: str):
    """CSV format round trip, honestly oracled like the ORC twin: the
    events table is written to a directory of CSV part files (one per
    block, inside the owning tasks) and read back typed; the aggregate
    over the round-tripped data must match the oracle computed on the
    original parquet. Arrow's CSV writer emits floats with
    round-trippable precision, so the sum is exact — a full fidelity
    check through the TEXT format (types survive via read inference)."""
    import os

    from etlray.sinks import CsvSink
    from etlray.sources import CsvSource
    from etlray.stages import AggregateTransform, RenameColumnsTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()
    out = os.path.join(
        "/tmp", f"etlray_csv_rt_{os.path.basename(os.path.normpath(sf_dir))}")
    CsvSink(out, overwrite=True).write(ds)
    back = CsvSource(out).read()  # directory read, like the ORC/Feather twins
    agg = AggregateTransform(
        ["event_type"], [("event_type", "count"), ("value", "sum")],
    ).apply(back)
    return RenameColumnsTransform(
        {"event_type_count": "n_rows", "value_sum": "value_sum"}).apply(agg)


@register(
    "feather_roundtrip_agg",
    """
    SELECT event_type, count(*) AS n_rows, sum(value) AS value_sum,
           min(ts) AS first_ts
    FROM events GROUP BY event_type
    """,
)
def feather_roundtrip_agg(sf_dir: str):
    """Arrow IPC (Feather v2) round trip, honestly oracled: written to
    a directory of IPC part files, read back batch-streamed, and the
    aggregate (including a timestamp column — IPC is Arrow's own
    layout, so types round-trip bit-exactly) must match the oracle on
    the original parquet."""
    import os

    from etlray.sinks import FeatherSink
    from etlray.sources import FeatherSource
    from etlray.stages import AggregateTransform, RenameColumnsTransform

    ds = _pq(sf_dir, "events",
             columns=["event_type", "value", "ts"]).read()
    out = os.path.join(
        "/tmp",
        f"etlray_feather_rt_{os.path.basename(os.path.normpath(sf_dir))}")
    FeatherSink(out, overwrite=True).write(ds)
    back = FeatherSource(out).read()

    # AggregateTransform keeps the reference's as_float coercion for
    # non-exact aggregates (a timestamp would NaN out) — min the ts as
    # its int64 microsecond payload via exact_int, restore the type
    # after; value_sum rides the same exact path scaled by 100
    from etlray.stages import BatchMapTransform

    def ts_as_int(t: pa.Table) -> pa.Table:
        i = t.column_names.index("ts")
        return t.set_column(i, "ts", pc.cast(t["ts"], pa.int64()))

    back = BatchMapTransform(ts_as_int).apply(back)
    back = _scale_int_cols(back, {"value": 100.0}, {})
    agg = AggregateTransform(
        ["event_type"],
        [("event_type", "count"), ("value", "sum"), ("ts", "min")],
        exact_int=True,
    ).apply(back)

    def finish(t: pa.Table) -> pa.Table:
        i = t.column_names.index("ts_min")
        t = t.set_column(
            i, "ts_min", pc.cast(t["ts_min"], pa.timestamp("us")))
        j = t.column_names.index("value_sum")
        return t.set_column(
            j, "value_sum", pc.divide(
                pc.cast(t["value_sum"], pa.float64(), safe=False),
                100.0))

    agg = BatchMapTransform(finish).apply(agg)
    return RenameColumnsTransform(
        {"event_type_count": "n_rows", "value_sum": "value_sum",
         "ts_min": "first_ts"}).apply(agg)


@register(
    "interp_fill_user_value",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             last_value(value IGNORE NULLS) OVER pb AS pv,
             last_value(CASE WHEN value IS NOT NULL THEN ts END
                        IGNORE NULLS) OVER pb AS pt,
             first_value(value IGNORE NULLS) OVER fb AS nv,
             first_value(CASE WHEN value IS NOT NULL THEN ts END
                         IGNORE NULLS) OVER fb AS nt
      FROM events WHERE ts IS NOT NULL
      WINDOW pb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id, value,
           CASE WHEN value IS NOT NULL THEN value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) * (epoch_us(ts) - epoch_us(pt))
                          / (epoch_us(nt) - epoch_us(pt))
           END AS value_interp
    FROM w
    """,
)
def interp_fill_user_value(sf_dir: str):
    """Linear-interpolation repair: each NULL value estimated from its
    user's surrounding non-NULL observations, time-weighted; edges
    (no earlier or no later observation) stay NULL, order ties carry
    the previous value. Completes the time-series repair family
    (gap-fill densify → LOCF carry → two-sided interpolate) on the
    same single key exchange."""
    from etlray.stages import InterpFillTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"],
             filter=pc.field("ts").is_valid()).read()
    ds = InterpFillTransform("user_id", "ts", "value",
                             tiebreak="event_id",
                             out_col="value_interp").apply(ds)
    return SelectColumnsTransform(
        ["event_id", "user_id", "value", "value_interp"]).apply(ds)


@register(
    "bitwise_bool_aggs_lineitem",
    """
    SELECT l_returnflag,
           bit_and(l_orderkey) AS key_bit_and,
           bit_or(l_orderkey) AS key_bit_or,
           bit_xor(l_orderkey) AS key_bit_xor,
           bool_and(l_discount < 0.1) AS low_disc_bool_and,
           bool_or(l_tax > 0.07) AS high_tax_bool_or
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bitwise_bool_aggs_lineitem(sf_dir: str):
    """Fold-family aggregates: bitwise AND/OR/XOR over the order keys
    and boolean ALL/ANY over derived predicates, per return flag. One
    argsort+reduceat collapse per block, one partial exchange — the
    UfuncAggTransform's six folds all compose across blocks."""
    from etlray.stages import BatchMapTransform, UfuncAggTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_orderkey", "l_discount",
                      "l_tax"]).read()

    def prep(t: pa.Table) -> pa.Table:
        out = t.select(["l_returnflag"])
        out = out.append_column("key", pc.cast(t["l_orderkey"],
                                               pa.int64()))
        out = out.append_column(
            "low_disc", pc.less(t["l_discount"], 0.1))
        return out.append_column(
            "high_tax", pc.greater(t["l_tax"], 0.07))

    ds = BatchMapTransform(prep).apply(ds)
    return UfuncAggTransform(
        "l_returnflag",
        [("key", "bit_and"), ("key", "bit_or"), ("key", "bit_xor"),
         ("low_disc", "bool_and"), ("high_tax", "bool_or")]).apply(ds)


@register(
    "product_discount_by_order",
    """
    SELECT l_orderkey,
           product(1.0 - l_discount ORDER BY 1.0 - l_discount)
             AS keep_product
    FROM lineitem GROUP BY l_orderkey
    """,
)
def product_discount_by_order(sf_dir: str):
    """Per-order compounded discount retention — SQL ``product()``
    with a pinned multiply order. The unordered form is ~1-ulp
    order-sensitive and sf0.1 has 29 orders whose exact-cent product
    lands ON a 4-dp rounding boundary (0.79515), so engine-vs-oracle
    rounding flips; the ordered fold (ascending value, sequential —
    ``OrderedProductTransform``) makes both engines perform the same
    rounding sequence and the result bit-equal at every sf."""
    from etlray.stages import BatchMapTransform, OrderedProductTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_discount"]).read()

    def prep(t: pa.Table) -> pa.Table:
        out = t.select(["l_orderkey"])
        return out.append_column(
            "keep", pc.subtract(pa.scalar(1.0),
                                pc.cast(t["l_discount"], pa.float64())))

    ds = BatchMapTransform(prep).apply(ds)
    return OrderedProductTransform(
        "l_orderkey", "keep", out_col="keep_product").apply(ds)


@register(
    "skew_kurt_value_by_type",
    """
    SELECT event_type, count(value) AS nv,
           skewness(value) AS skew, kurtosis(value) AS kurt
    FROM events GROUP BY event_type
    """,
)
def skew_kurt_value_by_type(sf_dir: str):
    """Per-group sample skewness and excess kurtosis from one pass of
    raw power sums (n, Σx..Σx⁴) riding the ordinary partial-combine
    aggregate; the bias-corrected closed forms (probed against DuckDB:
    skew = √(n(n-1))/(n-2)·g1, NULL under n<3; kurt =
    (n-1)/((n-2)(n-3))·((n+1)g2+6), NULL under n<4; both NULL for
    constant groups) run once per group. Cancellation loses ~3 of 16
    digits at this value range — measured ≤1e-13 vs DuckDB at sf0.1,
    far inside the 4-dp bar."""
    from etlray.stages import AggregateTransform, BatchMapTransform

    ds = _pq(sf_dir, "events", columns=["event_type", "value"]).read()

    def prep(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t["value"])
        v = pc.fill_null(pc.cast(t["value"], pa.float64()), 0.0)
        v2 = pc.multiply(v, v)
        out = t.select(["event_type"])
        out = out.append_column("nv", pc.cast(valid, pa.int64()))
        out = out.append_column("s1", v)
        out = out.append_column("s2", v2)
        out = out.append_column("s3", pc.multiply(v2, v))
        return out.append_column("s4", pc.multiply(v2, v2))

    ds = BatchMapTransform(prep).apply(ds)
    ds = AggregateTransform(
        ["event_type"],
        [("nv", "sum"), ("s1", "sum"), ("s2", "sum"), ("s3", "sum"),
         ("s4", "sum")],
        exact_int=True,
    ).apply(ds)

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["nv_sum"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        s1 = t["s1_sum"].to_numpy(zero_copy_only=False)
        s2 = t["s2_sum"].to_numpy(zero_copy_only=False)
        s3 = t["s3_sum"].to_numpy(zero_copy_only=False)
        s4 = t["s4_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s1 / n
            m2 = s2 - n * m * m
            m3 = s3 - 3.0 * m * s2 + 2.0 * n * m ** 3
            m4 = (s4 - 4.0 * m * s3 + 6.0 * m * m * s2
                  - 3.0 * n * m ** 4)
            sk = (np.sqrt(n * (n - 1.0)) / (n - 2.0)
                  * (m3 / n) / np.maximum(m2 / n, 0.0) ** 1.5)
            g2 = (m4 / n) / np.maximum(m2 / n, 0.0) ** 2 - 3.0
            ku = ((n - 1.0) / ((n - 2.0) * (n - 3.0))
                  * ((n + 1.0) * g2 + 6.0))
        sk_null = (n < 3) | (m2 <= 0.0)
        ku_null = (n < 4) | (m2 <= 0.0)
        out = t.select(["event_type"])
        out = out.append_column(
            "nv", pc.cast(t["nv_sum"], pa.int64()))
        out = out.append_column(
            "skew", pa.array(np.where(sk_null, 0.0, sk), mask=sk_null))
        return out.append_column(
            "kurt", pa.array(np.where(ku_null, 0.0, ku), mask=ku_null))

    return BatchMapTransform(finish).apply(ds)


@register(
    "entropy_event_type_by_user",
    """
    SELECT user_id, entropy(event_type) AS type_entropy
    FROM events WHERE event_type IS NOT NULL GROUP BY user_id
    """,
)
def entropy_event_type_by_user(sf_dir: str):
    """Shannon entropy (log2, DuckDB ``entropy()``) of each user's
    event-type distribution: one exchange keyed (user, type) counts
    the categories, a second keyed user folds Σc and Σc·log2 c, and
    entropy = log2 N − (Σc·log2 c)/N — exact 0.0 for single-category
    users. Both shuffles carry one row per (key, block)."""
    from etlray.stages import AggregateTransform, BatchMapTransform

    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"],
             filter=pc.field("event_type").is_valid()).read()
    ds = AggregateTransform(
        ["user_id", "event_type"], [("event_type", "count")],
        exact_int=True).apply(ds)

    def clogc(t: pa.Table) -> pa.Table:
        c = np.asarray(
            t["event_type_count"].to_numpy(zero_copy_only=False),
            dtype=np.float64)
        out = t.select(["user_id"])
        out = out.append_column("c", pa.array(c))
        return out.append_column("clogc", pa.array(c * np.log2(c)))

    ds = BatchMapTransform(clogc).apply(ds)
    ds = AggregateTransform(
        ["user_id"], [("c", "sum"), ("clogc", "sum")]).apply(ds)

    def finish(t: pa.Table) -> pa.Table:
        n = t["c_sum"].to_numpy(zero_copy_only=False)
        sc = t["clogc_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            ent = np.log2(n) - sc / n
        out = t.select(["user_id"])
        return out.append_column(
            "type_entropy",
            pa.array(np.where(n > 0, np.maximum(ent, 0.0), 0.0)))

    return BatchMapTransform(finish).apply(ds)


@register(
    "math_funcs_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7, 2) AS price_r2,
           ceil(l_discount * 100) AS disc_ceil,
           floor(l_tax * 100) AS tax_floor,
           abs(l_quantity - 25.0) AS qty_dev,
           sqrt(l_quantity) AS qty_sqrt,
           ln(l_extendedprice) AS price_ln,
           exp(l_discount) AS disc_exp,
           power(l_quantity, 2) AS qty_sq,
           sign(l_quantity - 25.0)::BIGINT AS qty_sign,
           (l_orderkey % 7)::BIGINT AS key_mod7
    FROM lineitem
    """,
)
def math_funcs_lineitem(sf_dir: str):
    """Scalar math-function width — round/ceil/floor/abs/sqrt/ln/exp/
    power/sign over Arrow kernels plus integer modulo (no Arrow kernel
    — one numpy op). ``round`` divergence note: DuckDB rounds doubles
    via decimal re-interpretation (``round(2.675::DOUBLE,2) = 2.68``)
    while Arrow's ``half_towards_infinity`` rounds the binary value
    (2.67); dividing by 7 first keeps every input off the tie
    boundary, so the modes agree on all representable inputs (verified
    0 mismatches over the full table at every test scale)."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax"]).read()

    def funcs(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.float64())
        out = t.select(["l_orderkey", "l_linenumber"])
        out = out.append_column(
            "price_r2",
            pc.round(pc.divide(t["l_extendedprice"], 7.0), 2,
                     round_mode="half_towards_infinity"))
        out = out.append_column(
            "disc_ceil", pc.ceil(pc.multiply(t["l_discount"], 100.0)))
        out = out.append_column(
            "tax_floor", pc.floor(pc.multiply(t["l_tax"], 100.0)))
        dev = pc.subtract(qty, 25.0)
        out = out.append_column("qty_dev", pc.abs(dev))
        out = out.append_column("qty_sqrt", pc.sqrt(qty))
        out = out.append_column("price_ln", pc.ln(t["l_extendedprice"]))
        out = out.append_column("disc_exp", pc.exp(t["l_discount"]))
        out = out.append_column("qty_sq", pc.power(qty, 2.0))
        out = out.append_column(
            "qty_sign", pc.cast(pc.sign(dev), pa.int64()))
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return out.append_column("key_mod7", pa.array(keys % 7))

    return BatchMapTransform(funcs).apply(ds)


@register(
    "date_arith_orders",
    """
    SELECT o_orderkey,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
               AS days_since_95,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           epoch(o_orderdate) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def date_arith_orders(sf_dir: str):
    """Temporal arithmetic width — calendar-day difference
    (``pc.days_between`` counts day boundaries exactly like DuckDB's
    ``date_diff('day', …)``, probed on intra-day timestamps), interval
    addition, epoch seconds (DuckDB ``epoch()`` returns DOUBLE) and
    strftime formatting, all Arrow C kernels."""
    import datetime

    from etlray.stages import BatchMapTransform

    anchor = pa.scalar(datetime.datetime(1995, 1, 1), pa.timestamp("us"))

    def funcs(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        out = t.select(["o_orderkey"])
        out = out.append_column(
            "days_since_95",
            pc.cast(pc.days_between(anchor, ts), pa.int64()))
        out = out.append_column(
            "due_ts", pc.add(ts, pa.scalar(
                datetime.timedelta(days=30), pa.duration("us"))))
        out = out.append_column(
            "epoch_s", pc.divide(
                pc.cast(pc.cast(ts, pa.int64()), pa.float64()), 1e6))
        return out.append_column("ym", pc.strftime(ts, format="%Y-%m"))

    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_orderdate"]).read()
    return BatchMapTransform(funcs).apply(ds)


@register(
    "rank_events_by_type",
    """
    SELECT event_id, event_type, value,
           rank() OVER (PARTITION BY event_type ORDER BY value)
               AS value_rank
    FROM events WHERE value IS NOT NULL
    """,
)
def rank_events_by_type(sf_dir: str):
    """Plain RANK() (gaps after tie runs) — DenseRankTransform's
    ``dense=False`` mode: each row carries its tie run's first
    position within the key, one exchange + one sort + two change
    masks, no per-key loop."""
    from etlray.stages import DenseRankTransform, SelectColumnsTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    ds = DenseRankTransform("event_type", "value", dense=False,
                            out_col="value_rank").apply(ds)
    return SelectColumnsTransform(
        ["event_id", "event_type", "value", "value_rank"]).apply(ds)


@register(
    "zscore_minmax_value_by_type",
    """
    SELECT event_id, event_type,
           (value - avg(value) OVER w)
               / NULLIF(stddev_pop(value) OVER w, 0) AS zscore,
           (value - min(value) OVER w)
               / NULLIF(max(value) OVER w - min(value) OVER w, 0)
               AS minmax
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def zscore_minmax_value_by_type(sf_dir: str):
    """Per-group feature scaling (the ML-prep normalize pass): one
    small aggregate computes each type's n/Σ/Σ²/min/max, the stats
    table broadcasts into a second streaming pass — the full table is
    never shuffled, the normalize stage is a pure map. Zero-variance
    or constant groups yield NULL (NULLIF semantics pinned in the
    oracle)."""
    from etlray.stages import (AggregateTransform, BatchMapTransform,
                               BroadcastJoinTransform,
                               SelectColumnsTransform)

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()

    def moments(t: pa.Table) -> pa.Table:
        v = pc.cast(t["value"], pa.float64())
        out = t.select(["event_type"])
        out = out.append_column("n1", pa.array(
            np.ones(t.num_rows, dtype=np.int64)))
        out = out.append_column("s1", v)
        out = out.append_column("s2", pc.multiply(v, v))
        return out.append_column("v", v)

    stats = BatchMapTransform(moments).apply(ds)
    stats = AggregateTransform(
        ["event_type"],
        [("n1", "sum"), ("s1", "sum"), ("s2", "sum"),
         ("v", "min"), ("v", "max")], exact_int=True).apply(stats)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n1_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1_sum"].to_numpy(zero_copy_only=False)
        s2 = t["s2_sum"].to_numpy(zero_copy_only=False)
        mean = s1 / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        out = t.select(["event_type"])
        out = out.append_column("_mean", pa.array(mean))
        out = out.append_column("_std", pa.array(np.sqrt(var)))
        out = out.append_column("_min", t["v_min"])
        return out.append_column("_max", t["v_max"])

    stats = BatchMapTransform(finish).apply(stats)
    ds = BroadcastJoinTransform(stats, on="event_type",
                                how="inner").apply(ds)

    def normalize(t: pa.Table) -> pa.Table:
        v = pc.cast(t["value"], pa.float64()).to_numpy(
            zero_copy_only=False)
        mean = t["_mean"].to_numpy(zero_copy_only=False)
        std = t["_std"].to_numpy(zero_copy_only=False)
        lo = t["_min"].to_numpy(zero_copy_only=False)
        hi = t["_max"].to_numpy(zero_copy_only=False)
        out = t.select(["event_id", "event_type"])
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (v - mean) / std
            mm = (v - lo) / (hi - lo)
        out = out.append_column(
            "zscore", pa.array(np.where(std == 0, 0.0, z),
                               mask=std == 0))
        return out.append_column(
            "minmax", pa.array(np.where(hi == lo, 0.0, mm),
                               mask=hi == lo))

    ds = BatchMapTransform(normalize).apply(ds)
    return SelectColumnsTransform(
        ["event_id", "event_type", "zscore", "minmax"]).apply(ds)


@register(
    "label_encode_event_type",
    """
    SELECT e.event_id, e.event_type, d.label
    FROM events e JOIN (
        SELECT event_type,
               row_number() OVER (ORDER BY event_type) - 1 AS label
        FROM (SELECT DISTINCT event_type FROM events
              WHERE event_type IS NOT NULL)
    ) d USING (event_type)
    """,
)
def label_encode_event_type(sf_dir: str):
    """Label/dictionary encoding of a categorical column: the distinct
    pass yields a tiny vocabulary (groups ≪ rows by contract), the
    sorted vocab broadcasts once, and the encode pass is ONE
    ``pc.index_in`` per batch — the corpus is never shuffled."""
    from etlray.stages import BatchMapTransform, DistinctTransform

    vocab_ds = _pq(sf_dir, "events", columns=["event_type"],
                   filter=pc.field("event_type").is_valid()).read()
    vocab_t = DistinctTransform(["event_type"]).apply(vocab_ds)
    vals = sorted(v for v in
                  vocab_t.to_pandas()["event_type"].tolist())
    value_set = pa.array(vals, pa.string())

    ds = _pq(sf_dir, "events", columns=["event_id", "event_type"],
             filter=pc.field("event_type").is_valid()).read()

    def encode(t: pa.Table) -> pa.Table:
        out = t.select(["event_id", "event_type"])
        return out.append_column(
            "label", pc.cast(pc.index_in(t["event_type"],
                                         value_set=value_set),
                             pa.int64()))

    return BatchMapTransform(encode).apply(ds)


@register(
    "onehot_event_types",
    """
    SELECT event_id,
           (event_type = 'click')::BIGINT AS is_click,
           (event_type = 'view')::BIGINT AS is_view,
           (event_type = 'purchase')::BIGINT AS is_purchase,
           (event_type = 'signup')::BIGINT AS is_signup,
           (event_type = 'error')::BIGINT AS is_error
    FROM events WHERE event_type IS NOT NULL
    """,
)
def onehot_event_types(sf_dir: str):
    """One-hot encoding over a known category set — one ``pc.equal`` +
    cast per category, shuffle-free streaming map."""
    from etlray.stages import BatchMapTransform

    cats = ["click", "view", "purchase", "signup", "error"]
    ds = _pq(sf_dir, "events", columns=["event_id", "event_type"],
             filter=pc.field("event_type").is_valid()).read()

    def encode(t: pa.Table) -> pa.Table:
        out = t.select(["event_id"])
        for c in cats:
            out = out.append_column(
                f"is_{c}",
                pc.cast(pc.equal(t["event_type"], c), pa.int64()))
        return out

    return BatchMapTransform(encode).apply(ds)


@register(
    "dedup_words_docs",
    """
    WITH segs AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS seg,
             unnest(generate_series(1, len(string_split(text, ' '))))
                 AS ord
      FROM documents WHERE text IS NOT NULL
    ), firsts AS (
      SELECT doc_id, seg, min(ord) AS ord
      FROM segs GROUP BY doc_id, seg
    )
    SELECT doc_id, string_agg(seg, ' ' ORDER BY ord) AS text_dedup
    FROM firsts GROUP BY doc_id
    """,
)
def dedup_words_docs(sf_dir: str):
    """Within-document duplicate-segment removal keeping first
    occurrence (the Gopher repetition scrub as a rewrite, not just a
    score) — ``dedup_delimited`` with the space delimiter, since this
    corpus has no newlines. Shuffle-free: one Arrow split, one pandas
    C duplicated over (row, segment), one binary_join per batch."""
    from etlray.functions.text import dedup_delimited
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"],
             filter=pc.field("text").is_valid()).read()
    ds = BatchMapTransform(
        lambda t: dedup_delimited(t, "text", " ")).apply(ds)
    return BatchMapTransform(
        lambda t: t.select(["doc_id", "text_dedup"])).apply(ds)


@register(
    "running_avg_value_by_user",
    """
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_id, user_id,
           CAST(sum(cents) OVER w AS DOUBLE) / count(cents) OVER w
               AS avg_cents
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def running_avg_value_by_user(sf_dir: str):
    """Running mean per user in event order — RunningAggTransform's
    avg mode (running sum / non-null count so far in one pass through
    the same single exchange; empty window → NULL). Compared in exact
    CENTS: a float running mean of 2-dp money lands on 4-dp rounding
    ties (…375/…625) where engine-specific last-ulp noise flips the
    driver hash; over ints both engines perform the IDENTICAL single
    IEEE division, so the doubles are bit-equal."""
    from etlray.stages import RunningAggTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"]).read()
    ds = _scale_int_cols(ds, {"value": 100.0})
    out = RunningAggTransform("user_id", "ts", "value", agg="avg",
                              tiebreak="event_id",
                              out_col="avg_cents").apply(ds)
    return out.select_columns(["event_id", "user_id", "avg_cents"])


@register(
    "sort_multi_key_orders",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key_orders(sf_dir: str):
    """Multi-key global sort with mixed directions + limit — the range
    shuffle carries three sort keys, tiebroken deterministic by the
    unique order key (the driver hash is order-insensitive; the LIMIT
    boundary is what the tiebreak pins)."""
    from etlray.stages import LimitTransform, SortTransform

    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_orderstatus",
                      "o_totalprice"]).read()
    ds = SortTransform(["o_orderstatus", "o_totalprice", "o_orderkey"],
                       descending=[False, True, False]).apply(ds)
    return LimitTransform(100).apply(ds)


@register(
    "paginate_events_by_value",
    """
    SELECT event_id, value, rn FROM (
        SELECT event_id, value,
               row_number() OVER (ORDER BY value DESC, event_id) AS rn
        FROM events WHERE value IS NOT NULL
    ) WHERE rn BETWEEN 31 AND 50
    """,
)
def paginate_events_by_value(sf_dir: str):
    """LIMIT/OFFSET pagination with a stable global position — pure
    composition: global sort → zip_with_index (prefix scan over block
    row counts, phase one reads no data) → pushdown-style range
    filter. No new operator; the page boundary is deterministic via
    the event_id tiebreak."""
    from etlray.functions.sampling import zip_with_index
    from etlray.stages import FilterTransform, SortTransform

    ds = _pq(sf_dir, "events", columns=["event_id", "value"],
             filter=pc.field("value").is_valid()).read()
    ds = SortTransform(["value", "event_id"],
                       descending=[True, False]).apply(ds)
    ds = zip_with_index(ds, out_col="rn0")
    ds = FilterTransform(
        lambda t: pc.and_(pc.greater_equal(t["rn0"], 30),
                          pc.less_equal(t["rn0"], 49))).apply(ds)

    def rn1(t: pa.Table) -> pa.Table:
        out = t.select(["event_id", "value"])
        return out.append_column("rn", pc.add(t["rn0"], 1))

    from etlray.stages import BatchMapTransform

    return BatchMapTransform(rn1).apply(ds)


@register(
    "having_high_value_types",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_sum_c
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    HAVING count(*) > 100 AND avg(value) > 45
    """,
)
def having_high_value_types(sf_dir: str):
    """GROUP BY … HAVING as the natural composition: aggregate, then a
    filter over the aggregate's output columns (the HAVING predicate
    references both a kept column and avg derived from the exact-int
    sum)."""
    from etlray.stages import (AggregateTransform, BatchMapTransform,
                               FilterTransform, RenameColumnsTransform)

    ds = _pq(sf_dir, "events", columns=["event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    ds = _scale_int_cols(ds, {"value": 100.0})
    agg = AggregateTransform(
        ["event_type"], [("event_type", "count"), ("value", "sum")],
        exact_int=True).apply(ds)

    def having(t: pa.Table) -> pa.Table:
        n = t["event_type_count"]
        avg = pc.divide(
            pc.cast(t["value_sum"], pa.float64(), safe=False),
            pc.multiply(pc.cast(n, pa.float64(), safe=False), 100.0))
        keep = pc.and_(pc.greater(n, 100), pc.greater(avg, 45.0))
        return t.filter(keep)

    ds = BatchMapTransform(having).apply(agg)
    return RenameColumnsTransform(
        {"event_type_count": "n_events",
         "value_sum": "value_sum_c"}).apply(ds)


@register(
    "union_distinct_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def union_distinct_users(sf_dir: str):
    """SQL UNION (distinct, vs the in-window union_all_events): union
    the streams, then one hash-distinct — the distinct's per-block
    pre-collapse keeps the shuffle input small."""
    from etlray.stages import DistinctTransform, UnionTransform

    clicks = _pq(sf_dir, "events", columns=["user_id"],
                 filter=pc.field("event_type") == "click").read()
    buys = _pq(sf_dir, "events", columns=["user_id"],
               filter=pc.field("event_type") == "purchase").read()
    ds = UnionTransform(buys).apply(clicks)
    return DistinctTransform(["user_id"]).apply(ds)


@register(
    "running_distinct_types_by_user",
    """
    WITH f AS (
      SELECT event_id, user_id, ts, event_type,
             (row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) = 1
              AND event_type IS NOT NULL) AS first_seen
      FROM events)
    SELECT event_id, user_id,
           CAST(sum(CASE WHEN first_seen THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS types_seen
    FROM f
    """,
)
def running_distinct_types_by_user(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user in event order —
    SQL windows cannot spell DISTINCT, so the oracle is the standard
    first-occurrence-flag rewrite; the transform computes the same
    flag with one pandas C duplicated over (key, value) in frame
    order plus a segmented cumsum, never materializing the distinct
    set."""
    from etlray.stages import RunningDistinctCountTransform

    ds = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"]).read()
    out = RunningDistinctCountTransform(
        "user_id", "ts", "event_type", tiebreak="event_id",
        out_col="types_seen").apply(ds)
    return out.select_columns(["event_id", "user_id", "types_seen"])


# ---------------------------------------------------------------------------
# Round-5 continuation width: CASE WHEN tiering, greatest/least/nullif
# scalars, exact weighted average, RANK-ties top-k, MAD, month rollup.
# ---------------------------------------------------------------------------
@register(
    "case_when_value_tiers",
    """
    SELECT CASE WHEN value IS NULL THEN 'none'
                WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS tier,
           count(*) AS n_events,
           CAST(sum(CASE WHEN value IS NULL THEN 0
                         ELSE CAST(round(value * 100) AS BIGINT) END)
                AS BIGINT) AS sum_value_c
    FROM events GROUP BY tier
    """,
)
def case_when_value_tiers(sf_dir: str):
    """SQL CASE WHEN as nested ``pc.if_else`` over Arrow (the NULL arm
    first, so inner comparisons never leak a null tier), then the
    ordinary partial-combine aggregate on the computed key — searched
    CASE costs one vectorized pass, no per-row Python."""
    from etlray.stages import BatchMapTransform, RenameColumnsTransform

    ds = _pq(sf_dir, "events", columns=["value"]).read()

    def tiers(t: pa.Table) -> pa.Table:
        v = t["value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        tier = pc.if_else(
            pc.is_null(v), pa.scalar("none"),
            pc.if_else(pc.less(v, 50.0), pa.scalar("low"),
                       pc.if_else(pc.less(v, 150.0), pa.scalar("mid"),
                                  pa.scalar("high"))))
        cents = pc.if_else(
            pc.is_null(v), pa.scalar(0, pa.int64()),
            pc.cast(pc.round(pc.multiply(v, 100.0)), pa.int64()))
        out = pa.table({"tier": tier, "cents": cents})
        return out

    ds = BatchMapTransform(tiers).apply(ds)
    agg = AggregateTransform(["tier"],
                             [("tier", "count"), ("cents", "sum")],
                             exact_int=True).apply(ds)
    return RenameColumnsTransform({"tier_count": "n_events",
                                   "cents_sum": "sum_value_c"}).apply(agg)


@register(
    "greatest_least_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, 25.0) AS qty_floor25,
           least(l_discount, l_tax) AS min_rate,
           coalesce(nullif(l_returnflag, 'N'), '-') AS flag_or_dash,
           nullif(l_linestatus, 'O') AS status_nulled
    FROM lineitem
    """,
)
def greatest_least_lineitem(sf_dir: str):
    """greatest / least / nullif / coalesce as Arrow element-wise
    kernels: ``max_element_wise`` / ``min_element_wise`` skip NULLs by
    default — verified equal to DuckDB's NULL-ignoring greatest/least
    — and NULLIF is a typed-null ``if_else`` with COALESCE as
    ``fill_null``. One projection pass, zero-copy in."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity",
                      "l_discount", "l_tax", "l_returnflag",
                      "l_linestatus"]).read()

    def funcs(t: pa.Table) -> pa.Table:
        out = t.select(["l_orderkey", "l_linenumber"])
        out = out.append_column(
            "qty_floor25", pc.max_element_wise(t["l_quantity"], 25.0))
        out = out.append_column(
            "min_rate", pc.min_element_wise(t["l_discount"], t["l_tax"]))
        flag = pc.if_else(pc.equal(t["l_returnflag"], "N"),
                          pa.scalar(None, pa.string()), t["l_returnflag"])
        out = out.append_column("flag_or_dash", pc.fill_null(flag, "-"))
        return out.append_column(
            "status_nulled",
            pc.if_else(pc.equal(t["l_linestatus"], "O"),
                       pa.scalar(None, pa.string()), t["l_linestatus"]))

    return BatchMapTransform(funcs).apply(ds)


@register(
    "weighted_avg_discount_by_flag",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
               AS wavg_disc_h
    FROM lineitem GROUP BY l_returnflag
    """,
)
def weighted_avg_discount_by_flag(sf_dir: str):
    """Quantity-weighted average discount per return flag with EXACT
    integer numerator/denominator (quantities are integral, discounts
    carry 2 decimals → ×100): the weighted sums ride the ordinary
    partial-combine aggregate bit-deterministically at any block
    order, and only the final one-row-per-group division is float."""
    from etlray.stages import BatchMapTransform

    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_discount"]).read()
    ds = _scale_int_cols(ds, {"l_quantity": 1.0, "l_discount": 100.0})

    def prep(t: pa.Table) -> pa.Table:
        out = t.select(["l_returnflag", "l_quantity"])
        return out.append_column(
            "wd", pc.multiply(t["l_quantity"], t["l_discount"]))

    ds = BatchMapTransform(prep).apply(ds)
    agg = AggregateTransform(["l_returnflag"],
                             [("wd", "sum"), ("l_quantity", "sum")],
                             exact_int=True).apply(ds)

    def finish(t: pa.Table) -> pa.Table:
        out = t.select(["l_returnflag"])
        return out.append_column(
            "wavg_disc_h",
            # safe=False: SQL CAST(BIGINT AS DOUBLE) rounds past 2^53;
            # Arrow's default safe cast would RAISE there — sums above
            # 2^53 are the normal case at scale (caught by test)
            pc.divide(pc.cast(t["wd_sum"], pa.float64(), safe=False),
                      pc.cast(t["l_quantity_sum"], pa.float64(),
                              safe=False)))

    return BatchMapTransform(finish).apply(agg)


@register(
    "rank_ties_topk_per_type",
    """
    SELECT event_id, event_type, value FROM (
      SELECT event_id, event_type, value,
             rank() OVER (PARTITION BY event_type ORDER BY value DESC)
                 AS r
      FROM events WHERE value IS NOT NULL) WHERE r <= 3
    """,
)
def rank_ties_topk_per_type(sf_dir: str):
    """Top-k WITH TIES (the RANK()-gated variant of
    topk_events_per_type's row_number top-k): every row whose value
    ties a top-3 rank survives, so k is a floor, not an exact count.
    Same one-exchange rank kernel, descending order, then a plain
    filter on the rank column."""
    from etlray.stages import (DenseRankTransform, FilterTransform,
                               SelectColumnsTransform)

    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             filter=pc.field("value").is_valid()).read()
    ds = DenseRankTransform("event_type", "value", descending=True,
                            dense=False, out_col="r").apply(ds)
    ds = FilterTransform(pc.field("r") <= 3).apply(ds)
    return SelectColumnsTransform(
        ["event_id", "event_type", "value"]).apply(ds)


@register(
    "mad_value_by_type",
    """
    SELECT event_type, mad(value) AS value_mad
    FROM events GROUP BY event_type
    """,
)
def mad_value_by_type(sf_dir: str):
    """Median absolute deviation per group — DuckDB ``mad(DOUBLE)`` is
    ``quantile_cont(|x − quantile_cont(x, .5)|, .5)`` (verified on
    hand cases). Two exact-quantile passes over the same
    (group, value, count)-collapsed exchange; the per-group medians
    (a groups-sized table) broadcast into the second pass as a plain
    dict closure."""
    import numpy as np

    from etlray.stages import BatchMapTransform, QuantilePerGroupTransform

    cols = ["event_type", "value"]
    med_ds = QuantilePerGroupTransform(
        "event_type", "value", [0.5], names=["med"],
        interpolation="linear").apply(_pq(sf_dir, "events", columns=cols).read())
    med = {r["event_type"]: r["med"] for r in med_ds.take_all()}

    ds = _pq(sf_dir, "events", columns=cols).read()

    def absdev(t: pa.Table) -> pa.Table:
        import pandas as pd

        g = pd.Series(t["event_type"].to_numpy(zero_copy_only=False))
        m = pa.array(g.map(med).to_numpy(dtype=np.float64,
                                         na_value=np.nan))
        adev = pc.abs(pc.subtract(t["value"], m))
        return t.select(["event_type"]).append_column("adev", adev)

    ds = BatchMapTransform(absdev).apply(ds)
    return QuantilePerGroupTransform(
        "event_type", "adev", [0.5], names=["value_mad"],
        interpolation="linear").apply(ds)


@register(
    "monthly_order_totals",
    """
    SELECT date_trunc('month', o_orderdate) AS month_ts,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_c
    FROM orders GROUP BY month_ts
    """,
)
def monthly_order_totals(sf_dir: str):
    """Calendar-month rollup (windowed_agg's hour floor generalized to
    month boundaries — Arrow floor_temporal(unit='month') matches SQL
    date_trunc exactly): exact-cents totals through the
    partial-combine aggregate."""
    from etlray.stages import BatchMapTransform, RenameColumnsTransform

    ds = _pq(sf_dir, "orders",
             columns=["o_orderdate", "o_totalprice"]).read()
    ds = _scale_int_cols(ds, {"o_totalprice": 100.0})

    def trunc(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t["o_orderdate"], unit="month")
        out = pa.table({"month_ts": m.combine_chunks()
                        if isinstance(m, pa.ChunkedArray) else m})
        return out.append_column("c", t["o_totalprice"])

    ds = BatchMapTransform(trunc).apply(ds)
    agg = AggregateTransform(["month_ts"],
                             [("month_ts", "count"), ("c", "sum")],
                             exact_int=True).apply(ds)
    return RenameColumnsTransform({"month_ts_count": "n_orders",
                                   "c_sum": "total_c"}).apply(agg)


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_c4 DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped three-table composition (adapted to this
    schema's o_orderpriority) — the end-to-end showcase wiring the
    join/aggregate/sort family together the way a real report does:

    * segment-filtered customer KEYS semi-join orders through the
      partitioned hash join with a Bloom prefilter — customers are a
      fact-sized table at 100 TB (a fifth of its keys do NOT fit a
      broadcast), so the keys pay one exchange like any large side and
      the Bloom bits drop non-segment orders before shuffle bytes;
    * orders⋈lineitem runs as the same partitioned hash join + Bloom —
      both sides large at scale, one exchange each, lineitem rows
      whose order already failed the date/segment gate never pay the
      shuffle;
    * revenue is EXACT int64 (cents × (100−disc_h) = 10^-4 units), so
      the group sums are associative and the top-10 ordering can never
      wobble on float summation order;
    * partial-combine aggregate, then a global sort of the group-sized
      result + LIMIT.

    Predicates push into the parquet scan (columns= + filter= on all
    three reads)."""
    from etlray.stages import PartitionedHashJoinTransform

    cutoff = pa.scalar(__import__("datetime").datetime(1998, 6, 1),
                       pa.timestamp("us"))
    cust = _pq(sf_dir, "customer", columns=["c_custkey"],
               filter=(pc.field("c_mktsegment") == "BUILDING")).read()
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate",
                          "o_orderpriority"],
                 filter=(pc.field("o_orderdate") < cutoff)).read()
    orders = PartitionedHashJoinTransform(
        cust, on="o_custkey", right_on="c_custkey",
        how="left_semi", bloom_prefilter=True).apply(orders)
    # the second join consumes this Dataset TWICE (its Bloom pass +
    # the exchange); pin the semi-join result in the object store so
    # the customer⋈orders pipeline doesn't re-execute per consumption
    # (review finding). Bounded: date+segment-filtered orders — and it
    # is the join build side, so it must be held somewhere regardless.
    orders = orders.materialize()
    line = _pq(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               filter=(pc.field("l_shipdate") > cutoff)).read()

    def revenue(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                         pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc_h))
        out = t.select(["l_orderkey"])
        return out.append_column(
            "rev", rev.combine_chunks() if isinstance(rev, pa.ChunkedArray)
            else rev)

    from etlray.stages import BatchMapTransform

    line = BatchMapTransform(revenue).apply(line)
    joined = PartitionedHashJoinTransform(
        orders, on="l_orderkey", right_on="o_orderkey", how="inner",
        bloom_prefilter=True).apply(line)
    agg = AggregateTransform(
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        [("rev", "sum")], exact_int=True).apply(joined)
    agg = RenameColumnsTransform({"rev_sum": "revenue_c4"}).apply(agg)
    agg = SortTransform(["revenue_c4", "o_orderdate", "l_orderkey"],
                        descending=[True, False, False]).apply(agg)
    return LimitTransform(10).apply(agg)


@register(
    "promo_revenue_by_month",
    """
    SELECT date_trunc('month', l.l_shipdate) AS month_ts,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l.l_discount * 100)
                                            AS BIGINT))
                         ELSE 0 END) AS BIGINT) AS promo_c4,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS total_c4
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY month_ts
    """,
)
def promo_revenue_by_month(sf_dir: str):
    """TPC-H Q14-shaped promo-revenue split per ship month — the first
    query over the ``part`` table. Part scales WITH the fact tables in
    this schema (it is not a bounded dimension), so it joins lineitem
    through the partitioned hash join — only (p_partkey, p_type) pays
    the exchange; the PROMO indicator folds into an exact-int
    conditional revenue column and both sums ride ONE partial-combine
    aggregate keyed on the month floor."""
    from etlray.stages import BatchMapTransform, PartitionedHashJoinTransform

    part = _pq(sf_dir, "part", columns=["p_partkey", "p_type"]).read()
    line = _pq(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"]).read()
    ds = PartitionedHashJoinTransform(part, on="l_partkey",
                                      right_on="p_partkey",
                                      how="inner").apply(line)

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                         pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc_h))
        promo = pc.if_else(pc.equal(t["p_type"], "PROMO"), rev,
                           pa.scalar(0, pa.int64()))
        m = pc.floor_temporal(t["l_shipdate"], unit="month")
        out = pa.table({"month_ts": m.combine_chunks()
                        if isinstance(m, pa.ChunkedArray) else m})
        out = out.append_column(
            "promo", promo.combine_chunks()
            if isinstance(promo, pa.ChunkedArray) else promo)
        return out.append_column(
            "rev", rev.combine_chunks()
            if isinstance(rev, pa.ChunkedArray) else rev)

    ds = BatchMapTransform(prep).apply(ds)
    agg = AggregateTransform(["month_ts"],
                             [("promo", "sum"), ("rev", "sum")],
                             exact_int=True).apply(ds)
    return RenameColumnsTransform({"promo_sum": "promo_c4",
                                   "rev_sum": "total_c4"}).apply(agg)


@register(
    "supplier_stats_by_nation",
    """
    SELECT n.n_name, count(*) AS n_suppliers,
           CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS acctbal_c
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def supplier_stats_by_nation(sf_dir: str):
    """Supplier census per nation — the first query over the
    ``supplier`` table: nation broadcasts (25 rows), account balances
    aggregate as exact cents through the partial-combine path."""
    from etlray.stages import BroadcastJoinTransform

    sup = _pq(sf_dir, "supplier",
              columns=["s_nationkey", "s_acctbal"]).read()
    sup = _scale_int_cols(sup, {"s_acctbal": 100.0})
    nat = _pq(sf_dir, "nation",
              columns=["n_nationkey", "n_name"]).read()
    ds = BroadcastJoinTransform(nat, on="s_nationkey",
                                right_on="n_nationkey",
                                how="inner").apply(sup)
    agg = AggregateTransform(["n_name"],
                             [("n_name", "count"), ("s_acctbal", "sum")],
                             exact_int=True).apply(ds)
    return RenameColumnsTransform({"n_name_count": "n_suppliers",
                                   "s_acctbal_sum": "acctbal_c"}).apply(agg)


# ---------------------------------------------------------------------------
# Driver-gate ordering.
#
# The correctness driver checks the FIRST 50 entries of ``queries()``; a
# registered query past position 50 gets no driver-recorded CORRECTNESS row
# even if its oracle is green locally. Keep the best representative of every
# operator family inside that window and push to the tail (a) the six
# no-oracle rows (multimodal / CDC replay — sha256 & round-trip pytest-gated
# by design) and (b) oracled-but-redundant exact-baseline variants whose
# family already has an in-window representative. ``scripts/check_oracles.py``
# still sweeps ALL oracled queries, tail included.
_GATE_TAIL = [
    # oracled, redundant with an in-window family representative
    "ngram_jaccard_pairs",       # exact baseline for minhash_near_dups
    "quantiles_value_by_type",   # exact baseline for approx_quantiles_value_by_type
    "approx_quantiles_value",    # global variant of ..._by_type
    "histogram_event_values",    # sketch family: heavy_hitters + quantiles in-window
    "cube_lineitem_flags",       # same RollupTransform as rollup_lineitem_flags
    "group_concat_nations",      # AggregateTransform has 4 in-window queries
    "explode_embeddings",        # explode_text_records covers flat_map
    "zip_docs_with_index",       # sampling family: per_lang/weighted/pack in-window
    "sample_docs_deterministic", # same md5-threshold kernel as sample_docs_per_lang
    "trim_docs_above_p95",       # truncate_docs_tokens covers truncation
    "embedding_near_dups_code_only",  # wide-vector routing of in-window
                                      # embedding_near_dups, same oracle
    "percentile_cont_value_by_type",  # linear companion of the in-window
                                      # approx_quantiles_value_by_type
    "dense_rank_events_by_type",      # window family: lag/rank in-window
    "ntile_events_by_type",           # window family representative in-window
    "mode_value_by_type",             # agg family well covered in-window
    "except_click_value_floors",      # set-op family: union/distinct in-window
    "intersect_click_purchase_users",
    "cross_join_region_nation",       # join family: 3 variants in-window
    "running_sum_value_by_user",      # window family well covered in-window
    "first_last_value_by_user",       # window family (full-frame first/last)
    "percent_rank_value_by_type",     # window family (rank stats)
    "grouping_sets_lineitem",         # rollup family: rollup in-window
    "moving_minmax_user_value",       # window family (bounded-frame min/max)
    "unpivot_event_counts",           # pivot family (wide→long inverse)
    "corr_qty_discount_by_flag",      # agg family (exact-int corr/covar)
    "string_funcs_docs",              # scalar-function width (utf8 kernels)
    "date_parts_events",              # scalar-function width (temporal)
    "embedding_list_stats",           # list-column per-row aggregates
    "regex_extract_docs",             # scalar-function width (regex)
    "event_lag2_per_user",            # window family (lag/lead offset k)
    "ratio_to_report_value_by_user",  # window family (partition share)
    "nth_value_event_per_user",       # window family (full-frame nth)
    "argmax_event_per_user",          # agg family (max_by / arg_max)
    "conditional_agg_events",         # agg family (FILTER-clause form)
    "join_semi_customers_with_orders",   # join family (EXISTS)
    "join_anti_customers_without_orders",  # join family (NOT EXISTS)
    "array_agg_events_per_user",      # agg family (nested list output)
    "range_window_sum_user_value",    # window family (sliding RANGE)
    "gapfill_hourly_user_events",     # time-series densification
    "stddev_value_by_type",           # agg family (variance closed forms)
    "locf_fill_user_value",           # time-series LOCF repair
    "bitwise_bool_aggs_lineitem",     # agg family (ufunc folds)
    "product_discount_by_order",      # agg family (ufunc folds)
    "skew_kurt_value_by_type",        # agg family (higher moments)
    "entropy_event_type_by_user",     # agg family (category entropy)
    "interp_fill_user_value",         # time-series two-sided interp
    "orc_roundtrip_agg",              # source/sink family (ORC)
    "csv_roundtrip_agg",              # source/sink family (CSV write)
    "feather_roundtrip_agg",          # source/sink family (Arrow IPC)
    "json_extract_props_k",           # scalar-function width (JSON)
    "levenshtein_text_chunks",        # string-metric width
    "math_funcs_lineitem",            # scalar-function width (math)
    "date_arith_orders",              # scalar-function width (temporal arith)
    "rank_events_by_type",            # window family (plain RANK)
    "zscore_minmax_value_by_type",    # ML-prep feature scaling
    "label_encode_event_type",        # ML-prep label encoding
    "onehot_event_types",             # ML-prep one-hot encoding
    "dedup_words_docs",               # within-doc repetition scrub
    "running_avg_value_by_user",      # window family (running mean)
    "sort_multi_key_orders",          # sort family (multi-key mixed dirs)
    "paginate_events_by_value",       # composition (LIMIT/OFFSET paging)
    "having_high_value_types",        # composition (GROUP BY HAVING)
    "union_distinct_users",           # set-op family (UNION distinct)
    "running_distinct_types_by_user", # window family (running distinct)
    "case_when_value_tiers",          # scalar family (searched CASE)
    "greatest_least_lineitem",        # scalar family (greatest/least/nullif)
    "weighted_avg_discount_by_flag",  # aggregate family (exact weighted avg)
    "rank_ties_topk_per_type",        # window family (RANK-ties top-k)
    "mad_value_by_type",              # aggregate family (two-pass MAD)
    "monthly_order_totals",           # aggregate family (month date_trunc)
    "tpch_q3_shipping_priority",      # composition (3-table join+agg+topk)
    "promo_revenue_by_month",         # composition (part⋈lineitem Q14 shape)
    "supplier_stats_by_nation",       # composition (supplier census)
    # no-oracle by design
    "multimodal_decode",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "multimodal_features",
    "multimodal_audio_features",
    "cdc_replay_flagship",
    "cdc_delta_replay",
    "cdc_snapshot_diff",
    "cdc_incremental_view",
]


def _apply_gate_order() -> None:
    tail = set(_GATE_TAIL)
    missing = sorted(tail - QUERIES.keys())
    assert not missing, f"_GATE_TAIL names not registered: {missing}"
    head = [n for n in QUERIES if n not in tail]
    assert len(head) <= 50, (
        f"{len(head)} queries ahead of the driver's 50-entry gate; "
        "demote the overflow into _GATE_TAIL")
    no_oracle_in_head = [n for n in head if n not in ORACLES]
    assert not no_oracle_in_head, (
        f"no-oracle queries waste gate slots: {no_oracle_in_head}")
    ordered = {n: QUERIES[n] for n in head}
    ordered.update({n: QUERIES[n] for n in _GATE_TAIL})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_gate_order()
