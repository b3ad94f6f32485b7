"""Oracle-SQL builders shared across query-family modules (split out
of catalog.py in r12): the portable-md5 MinHash CTE chain, the
hyperplane-LSH band SQL, and the 60-bit hex helper that replays
`dedup.md5_long`. Used by the lsh/curation/text/graph modules; the
split keeps each family file under ~2k lines without duplicating these
generators."""

from __future__ import annotations

from purpleair_data_logger_spark.operators import dedup as dd
from purpleair_data_logger_spark.operators import similarity as sim


def _hyperplane_band_sql(n_planes: int, bands: int, dim: int):
    """DuckDB replica of `similarity.lsh_band_signatures`: per-band sign
    signatures against the SAME splitmix-derived hyperplanes Spark uses
    (`similarity.random_hyperplanes` is engine-independent integer math,
    so both sides evaluate identical plane literals). Dots run in double
    on both sides; a sign flip would need |dot| within ~1e-13 of zero —
    measure-zero for continuous embeddings, and verified exact at both
    sf0.001 and sf0.01. Returns (band_cols, band_union) SQL fragments
    over a CTE exposing (vec_id, v double[])."""
    planes = sim.random_hyperplanes(dim, n_planes)
    per_band = n_planes // bands

    def band_val(b: int) -> str:
        terms = " + ".join(
            "(CASE WHEN list_dot_product(v, [%s]) >= 0 THEN CAST(%d AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END)"
            % (", ".join(repr(x) for x in planes[b * per_band + r]), 1 << r)
            for r in range(per_band)
        )
        return f"({terms})"

    band_cols = ",\n      ".join(f"{band_val(b)} AS _b{b}" for b in range(bands))
    band_union = "\n      UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band_idx, _b{b} AS band_val FROM sig"
        for b in range(bands)
    )
    return band_cols, band_union


def _knn_lsh_oracle(n_planes: int, bands: int, dim: int, k: int, q_below: int) -> str:
    """Full-pipeline replay of `knn_lsh_bucketed`: band signatures for
    corpus and queries, band-collision candidates, exact-cosine
    row_number rank (ties broken on neighbor_id, as in Spark)."""
    band_cols, band_union = _hyperplane_band_sql(n_planes, bands, dim)
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    sig AS (SELECT vec_id, v,
      {band_cols}
    FROM base),
    bnd AS ({band_union}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.v AS qv, c.v AS cv
      FROM bnd c JOIN bnd q
        ON c.band_idx = q.band_idx AND c.band_val = q.band_val
      WHERE q.vec_id < {q_below} AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id)
                 AS INTEGER) AS knn_rank
      FROM cand)
    SELECT query_id, neighbor_id, knn_rank FROM ranked WHERE knn_rank <= {k}
    """


def _hex60_sql(expr: str) -> str:
    """DuckDB replica of `operators.dedup.md5_long` applied to a 32-char
    md5 hex expression: nibble-parse the first 15 hex digits to int64."""
    return (
        "CAST(list_sum(list_transform(range(1,16), j -> "
        f"CAST(strpos('0123456789abcdef', substr({expr}, j, 1))-1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << (4*(15-j))))) AS BIGINT)"
    )


def _minhash_lsh_cte(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    *,
    pair_cond: str = "a.doc_id < b.doc_id",
    a_alias: str = "doc_id_a",
    b_alias: str = "doc_id_b",
    max_bucket_size: int | None = None,
) -> str:
    """Shared CTE chain replaying the portable-md5 MinHash+LSH pipeline
    up to the distinct candidate-pair set (`cand`); `sh` exposes the
    per-doc distinct shingle sets for verify-stage reuse. ``pair_cond``
    selects which banded pairs become candidates (within-corpus a<b by
    default; a cross-split predicate for the incremental variant —
    band signatures don't depend on the split, so banding ALL docs and
    filtering at the join mirrors banding each side separately).
    ``max_bucket_size`` replays `dedup.keep_buckets_within_cap`: the
    candidate join reads only band rows whose bucket is within the
    cap (r12's degenerate-bucket ceiling)."""
    rpb = num_hashes // bands
    p = dd.MERSENNE_P31
    mh_cols = ",\n           ".join(
        f"min((_h * {a} + {b}) % {p}) AS _mh{i}"
        for i, (a, b) in enumerate(dd.affine_seeds(num_hashes))
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, %d AS band_idx, md5(concat_ws(',', %s)) AS band_hash FROM mh"
        % (b, ", ".join(f"_mh{b * rpb + r}" for r in range(rpb)))
        for b in range(bands)
    )
    if max_bucket_size is None:
        cap_ctes, join_src = "", "bnd"
    else:
        cap_ctes = f"""
    bkeep AS (SELECT band_idx, band_hash FROM bnd
              GROUP BY 1, 2 HAVING count(*) <= {int(max_bucket_size)}),
    bndk AS (SELECT b.* FROM bnd b JOIN bkeep USING (band_idx, band_hash)),"""
        join_src = "bndk"
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t)-{shingle_n - 1}, 1)+1),
               i -> array_to_string(t[i:i+{shingle_n - 1}], ' '))) AS shing
           FROM toks),
    ex AS (SELECT doc_id, unnest(shing) AS s FROM sh),
    exh AS (SELECT doc_id, {_hex60_sql("md5(s)")} % {p} AS _h FROM ex),
    mh AS (SELECT doc_id,
           {mh_cols}
           FROM exh GROUP BY doc_id),
    bnd AS ({band_selects}),{cap_ctes}
    cand AS (
      SELECT DISTINCT a.doc_id AS {a_alias}, b.doc_id AS {b_alias}
      FROM {join_src} a JOIN {join_src} b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND {pair_cond})
    """
