"""Scale-rehearsal data generator: replicate a driver testdata dir K×
into a larger scale factor with referential integrity preserved.

Usage: python tools/gen_sf.py [BASE_DIR] [OUT_DIR] [K]
Defaults: /root/testdata/sf0.1 → ./testdata_sf1, K=10.

Each replica r shifts every key family by r × (max_key+1) — customer /
supplier / part / order / doc / vec / event / user ids — so joins resolve
within a replica exactly as they do in the base data (10× more entities,
same selectivities), never across replicas. Every text TOKEN gets a per-replica letter
appended (suffix-only perturbation is not enough: replicas of a doc would
still share almost all shingles and LSH would pair them — 298k pairs in
the first attempt vs ~30k real; per-token renaming keeps duplicate
structure strictly within-replica so candidate counts scale linearly,
measuring plan scaling rather than a data artifact). Entity NAMES are re-derived
from the shifted key (base naming convention at the new id) — replicas
keeping the base names verbatim formed cross-replica identical-name
cliques, turning blocked entity resolution quadratic in K (measured
ratio 48 at 10×; re-keyed names restore the base block-size
distribution per replica). Embeddings rotate
cyclically by r positions (norm- and distribution-preserving, low
cross-replica cosine — same reasoning for ANN bucket structure).
region/nation stay fixed — they are genuine dimensions. Deterministic: no
randomness anywhere.

This feeds the sf0.1 → sf1 scaling appendix (BENCH_SCALING.md): the
bench's superlinear guard gets a 100× lever arm (sf0.01 → sf1) instead
of 10×.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb


def stride(con, path: str, key: str) -> int:
    return con.sql(f"SELECT max({key}) + 1 FROM '{path}'").fetchone()[0]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    strides = {
        "cust": stride(con, f"{base}/customer.parquet", "c_custkey"),
        "supp": stride(con, f"{base}/supplier.parquet", "s_suppkey"),
        "part": stride(con, f"{base}/part.parquet", "p_partkey"),
        "order": stride(con, f"{base}/orders.parquet", "o_orderkey"),
        "doc": stride(con, f"{base}/documents.parquet", "doc_id"),
        "vec": stride(con, f"{base}/embeddings.parquet", "vec_id"),
        "event": stride(con, f"{base}/events.parquet", "event_id"),
        "user": stride(con, f"{base}/events.parquet", "user_id"),
    }

    selects = {
        "region": None,  # dimensions: copy once, unscaled
        "nation": None,
        "customer": f"""
            SELECT c_custkey + r * {strides['cust']} AS c_custkey,
                   'Customer#' || lpad((c_custkey + r * {strides['cust']})::VARCHAR, 9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment""",
        "supplier": f"""
            SELECT s_suppkey + r * {strides['supp']} AS s_suppkey,
                   'Supplier#' || lpad((s_suppkey + r * {strides['supp']})::VARCHAR, 9, '0') AS s_name,
                   s_nationkey, s_acctbal""",
        "part": f"""
            SELECT p_partkey + r * {strides['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice""",
        "orders": f"""
            SELECT o_orderkey + r * {strides['order']} AS o_orderkey,
                   o_custkey + r * {strides['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""",
        "lineitem": f"""
            SELECT l_orderkey + r * {strides['order']} AS l_orderkey,
                   l_partkey + r * {strides['part']} AS l_partkey,
                   l_suppkey + r * {strides['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate""",
        "events": f"""
            SELECT event_id + r * {strides['event']} AS event_id, ts,
                   user_id + r * {strides['user']} AS user_id,
                   event_type, value, props""",
        "documents": f"""
            SELECT doc_id + r * {strides['doc']} AS doc_id,
                   replace(text, ' ', chr((97 + r)::INTEGER) || ' ') || chr((97 + r)::INTEGER)
                     AS text,
                   lang, source,
                   length(replace(text, ' ', chr((97 + r)::INTEGER) || ' ')
                          || chr((97 + r)::INTEGER))::BIGINT AS n_chars""",
        "embeddings": f"""
            SELECT vec_id + r * {strides['vec']} AS vec_id,
                   (list_slice(embedding, r + 1, len(embedding))
                    || list_slice(embedding, 1, r))::FLOAT[] AS embedding,
                   label""",
    }

    for name, sel in selects.items():
        src = f"{base}/{name}.parquet"
        dst = out / f"{name}.parquet"
        if sel is None:
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            con.sql(
                f"COPY ({sel} FROM '{src}', range({k}) t(r)) TO '{dst}' "
                "(FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
