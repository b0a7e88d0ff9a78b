"""DuckDB oracle SQL for the hash-based approximate queries.

Round 1 shipped ``q_dedup_minhash`` / ``q_dedup_simhash`` / ``q_ann_lsh``
/ ``q_ann_ivf`` with rows-only checks ("hash-algorithm-specific"). This
module removes that excuse: it ports Spark's XXH64 (seed-42 fold
semantics — see webx/xxh64.py, bit-identical to the JVM) to pure DuckDB
SQL — ``CREATE TEMP MACRO`` arithmetic on HUGEINT with wraparound via
``% 2^64`` and split 32×32-bit multiplication — so the oracle recomputes
the SAME MinHash signatures, LSH band hashes, and SimHash values
independently, then mirrors the banding/bucketing/verify pipeline in
relational SQL. The driver's plain ``con.execute(sql)`` runs the whole
thing: DuckDB executes the semicolon-separated macro prelude and returns
the final SELECT.

Design notes:
* All sequential hash phases (stripe loop, 8-byte tail, byte tail,
  final mix) run as ``list_reduce`` folds whose accumulator is a VALUE —
  never as nested macro textual expansion, which would duplicate the
  argument expression tree exponentially.
* Per-(shingle, slot) work is flattened to rows (CROSS JOIN a slot
  series) instead of list lambdas so DuckDB vectorizes and parallelizes
  it.
* The signature min is a SIGNED 64-bit min (Spark ``least`` on longs);
  u64 values convert at the comparison boundary.

Correctness of the port is tested in tests/test_oracle_sql.py against
webx.xxh64 (which tests/test_xxh64.py ties to the JVM).
"""

from __future__ import annotations

from webx import xxh64 as X

U = "18446744073709551616::HUGEINT"
_P = {f"P{i}": f"{v}::HUGEINT" for i, v in enumerate((X.P1, X.P2, X.P3, X.P4, X.P5), 1)}
P1, P2, P3, P4, P5 = _P["P1"], _P["P2"], _P["P3"], _P["P4"], _P["P5"]

# WS_SPLIT mirror (webx/textstats.py) — already used by passing oracles
WS = "'[ \\t\\r\\n]+'"

XXH64_MACROS = f"""
CREATE OR REPLACE TEMP MACRO xmul(a, b) AS
  ((a::HUGEINT % 4294967296::HUGEINT) * b::HUGEINT
   + (((a::HUGEINT // 4294967296::HUGEINT) * (b::HUGEINT % 4294967296::HUGEINT))
      % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {U};
CREATE OR REPLACE TEMP MACRO xrotl(x, s) AS
  ((x::HUGEINT * (1::HUGEINT << s::INT)) % {U}) + (x::HUGEINT >> (64 - s::INT));
CREATE OR REPLACE TEMP MACRO xfmix(h) AS
  list_reduce(
    list_prepend([h::HUGEINT],
                 [[33::HUGEINT, {P2}], [29::HUGEINT, {P3}], [32::HUGEINT, 1::HUGEINT]]),
    (acc, op) -> [xmul(xor(acc[1]::HUGEINT, acc[1]::HUGEINT >> op[1]::INT), op[2])]
  )[1];
CREATE OR REPLACE TEMP MACRO xround(acc, inp) AS
  xmul(xrotl((acc::HUGEINT + xmul(inp, {P2})) % {U}, 31), {P1});
CREATE OR REPLACE TEMP MACRO xtail8(h, v) AS
  (xmul(xrotl(xor(h::HUGEINT, xround(0::HUGEINT, v)), 27), {P1}) + {P4}) % {U};
CREATE OR REPLACE TEMP MACRO xmerge(h, v) AS
  (xmul(xor(h::HUGEINT, xround(0::HUGEINT, v)), {P1}) + {P4}) % {U};
CREATE OR REPLACE TEMP MACRO xhash_long(v, seed) AS
  xfmix(xtail8((seed::HUGEINT + {P5} + 8::HUGEINT) % {U}, v));
CREATE OR REPLACE TEMP MACRO xhash_int(v, seed) AS
  xfmix(
    (xmul(xrotl(xor((seed::HUGEINT + {P5} + 4::HUGEINT) % {U},
                    xmul(v::HUGEINT % 4294967296::HUGEINT, {P1})), 23), {P2}) + {P3}) % {U}
  );
CREATE OR REPLACE TEMP MACRO xsigned(v) AS
  CASE WHEN v::HUGEINT >= 9223372036854775808::HUGEINT
       THEN (v::HUGEINT - {U})::BIGINT ELSE v::BIGINT END;
CREATE OR REPLACE TEMP MACRO xunsigned(v) AS
  CASE WHEN v::HUGEINT < 0::HUGEINT THEN v::HUGEINT + {U} ELSE v::HUGEINT END;
"""


def xxh64_str_ctes(src: str, keycols: str, strcol: str, out: str = "xh_out") -> str:
    """CTE chain body: from table ``src`` (cols ``keycols``, ``strcol``)
    to CTE ``out`` with (keycols, h HUGEINT) = Spark ``xxhash64(strcol)``
    over UTF-8 bytes, seed 42. keycols must keep rows unique."""
    return f"""
{out}_b AS (
  SELECT {keycols}, hex(encode({strcol})) AS hx, octet_length(encode({strcol})) AS n
  FROM {src}),
{out}_bs AS (
  SELECT {keycols}, n,
    list_transform(generate_series(1, n),
      i -> ('0x' || substr(hx, 2*i - 1, 2))::UBIGINT::HUGEINT) AS bs
  FROM {out}_b),
{out}_w AS (
  SELECT {keycols}, n, bs,
    list_transform(generate_series(1, n // 8),
      j -> bs[8*j-7] + 256*bs[8*j-6] + 65536*bs[8*j-5] + 16777216*bs[8*j-4]
         + 4294967296*bs[8*j-3] + 1099511627776*bs[8*j-2]
         + 281474976710656*bs[8*j-1] + 72057594037927936*bs[8*j]) AS w
  FROM {out}_bs),
{out}_stripe AS (
  SELECT {keycols}, n, bs, w,
    CASE WHEN n >= 32 THEN
      list_reduce(
        list_prepend(
          [(42::HUGEINT + {P1} + {P2}) % {U}, (42::HUGEINT + {P2}) % {U},
           42::HUGEINT, (42::HUGEINT - {P1} + {U}) % {U}],
          list_transform(generate_series(1, n // 32),
            s -> [w[4*s-3], w[4*s-2], w[4*s-1], w[4*s]])),
        (acc, q) -> [xround(acc[1], q[1]), xround(acc[2], q[2]),
                     xround(acc[3], q[3]), xround(acc[4], q[4])])
    ELSE NULL END AS st
  FROM {out}_w),
{out}_base AS (
  SELECT {keycols}, n, bs, w,
    CASE WHEN n >= 32 THEN
      list_reduce(
        list_prepend(
          [(xrotl(st[1], 1) + xrotl(st[2], 7) + xrotl(st[3], 12)
            + xrotl(st[4], 18)) % {U}],
          [[st[1]], [st[2]], [st[3]], [st[4]]]),
        (acc, v) -> [xmerge(acc[1], v[1])])[1]
    ELSE (42::HUGEINT + {P5}) % {U} END AS hb
  FROM {out}_stripe),
{out}_t8 AS (
  SELECT {keycols}, n, bs,
    list_reduce(
      list_prepend([(hb + n) % {U}],
                   list_transform(w[(4*(n//32))+1 : n//8], v -> [v])),
      (acc, v) -> [xtail8(acc[1], v[1])])[1] AS h8
  FROM {out}_base),
{out}_t4 AS (
  SELECT {keycols}, n, bs,
    CASE WHEN n % 8 >= 4 THEN
      (xmul(xrotl(xor(h8,
         xmul(bs[(n//8)*8+1] + 256*bs[(n//8)*8+2] + 65536*bs[(n//8)*8+3]
              + 16777216*bs[(n//8)*8+4], {P1})), 23), {P2}) + {P3}) % {U}
    ELSE h8 END AS h4,
    (n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END AS tail_off
  FROM {out}_t8),
{out} AS (
  SELECT {keycols},
    xfmix(
      list_reduce(
        list_prepend([h4], list_transform(bs[tail_off+1 : n], b -> [b])),
        (acc, b) -> [xmul(xrotl(xor(acc[1], xmul(b[1], {P5})), 11), {P1})])[1]
    ) AS h
  FROM {out}_t4)
"""


# Corpus CTE shared by the dedup oracles — mirrors _docs_with_neardups
# (__spark_entry__.py): documents ∪ planted near-dups (last word dropped)
CORPUS_CTE = r"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, regexp_replace(text, '\s+\S+$', '')
  FROM documents WHERE doc_id < 20)
"""


def _chain(src_sql: str, steps: list[tuple[str, str]], out_cols: str) -> str:
    """Flatten a sequential hash computation into nested subqueries — one
    plain column per step, so DuckDB executes it as vectorized columnar
    arithmetic instead of per-row list_reduce lambdas (~100× faster on
    the hot stages)."""
    q = src_sql
    for name, expr in steps:
        q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return f"SELECT {out_cols} FROM ({q})"


def _hash_long_steps(v: str, seed: str, p: str) -> list[tuple[str, str]]:
    """Spark hashLong(v, seed) as flat steps; result column ``{p}hh``."""
    return [
        (f"{p}h1", f"({seed} + {P5} + 8::HUGEINT) % {U}"),
        (f"{p}k1", f"xmul({v}, {P2})"),
        (f"{p}k2", f"xrotl({p}k1, 31)"),
        (f"{p}k3", f"xmul({p}k2, {P1})"),
        (f"{p}h2", f"xor({p}h1, {p}k3)"),
        (f"{p}h3", f"xrotl({p}h2, 27)"),
        (f"{p}h4", f"(xmul({p}h3, {P1}) + {P4}) % {U}"),
    ] + _fmix_steps(f"{p}h4", p)


def _hash_int_steps(v: str, seed: str, p: str) -> list[tuple[str, str]]:
    """Spark hashInt(v, seed) as flat steps; result column ``{p}hh``."""
    return [
        (f"{p}h1", f"({seed} + {P5} + 4::HUGEINT) % {U}"),
        (f"{p}k1", f"xmul({v}::HUGEINT % 4294967296::HUGEINT, {P1})"),
        (f"{p}h2", f"xor({p}h1, {p}k1)"),
        (f"{p}h3", f"xrotl({p}h2, 23)"),
        (f"{p}h4", f"(xmul({p}h3, {P2}) + {P3}) % {U}"),
    ] + _fmix_steps(f"{p}h4", p)


def _fmix_steps(src: str, p: str) -> list[tuple[str, str]]:
    return [
        (f"{p}f1", f"xor({src}, {src} >> 33)"),
        (f"{p}f2", f"xmul({p}f1, {P2})"),
        (f"{p}f3", f"xor({p}f2, {p}f2 >> 29)"),
        (f"{p}f4", f"xmul({p}f3, {P3})"),
        (f"{p}hh", f"xor({p}f4, {p}f4 >> 32)"),
    ]


# Shared front half of the dedup oracles: corpus → tokens (with position
# and multiplicity) → DISTINCT token vocabulary string-hashed once via
# the byte-level XXH64 CTE chain → hashes joined back per occurrence.
def _token_hash_ctes(corpus_cte: str = CORPUS_CTE) -> str:
    return f"""{corpus_cte},
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), {WS}) AS toks FROM corpus),
tokr AS (
  -- parallel unnests zip: (pos, token) rows, multiplicity preserved
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
         unnest(toks) AS t
  FROM tok),
vocab AS (SELECT DISTINCT t FROM tokr),
{xxh64_str_ctes("vocab", "t", "t", "vh")},
thr AS (SELECT tokr.doc_id, tokr.pos, vh.h FROM tokr JOIN vh USING (t))
"""


def minhash_oracle_sql(
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    corpus_cte: str = CORPUS_CTE,
) -> str:
    """Exact mirror of webx.dedup.minhash_neardup: token-hash-fold
    signatures → banded LSH buckets → candidate pairs → n-gram Jaccard
    verify. Returns (id_a, id_b) — must equal the Spark pipeline's
    output bit-for-bit. The hot per-(shingle, slot) stage runs as
    flattened vectorized column arithmetic (see ``_chain``).
    ``corpus_cte`` overrides the (doc_id, text) source — composed
    oracles (q_curate_pipeline) inject their own surviving-docs CTE
    reference here."""
    rpb = n_hashes // bands
    k = shingle_k
    k1 = k - 1  # duckdb list slice is inclusive: toks[i:i+k-1]
    # shingle hash = seed-42 fold of the k consecutive token hashes
    # (generated for any k: k chained hash_long steps + the inner rehash)
    sh_steps: list[tuple[str, str]] = []
    prev = "42::HUGEINT"
    for j in range(k):
        p = f"s{j}"
        sh_steps += _hash_long_steps(f"t{j+1}", prev, p)
        prev = f"{p}hh"
    sh_steps += _hash_long_steps(prev, "42::HUGEINT", "d")  # inner rehash
    shw_src = (
        "SELECT doc_id, "
        + ", ".join(
            f"unnest(th[{j+1}:n-{k1 - j}]) AS t{j+1}" for j in range(k)
        )
        + f" FROM thl WHERE n >= {k}"
    )
    slot_steps = _hash_int_steps("slot", "ih", "s")
    slot_src = (
        "SELECT doc_id, ih, unnest(generate_series(0, "
        f"{n_hashes - 1})) AS slot FROM ih_all"
    )
    # band hash: seed-42 fold of the band's rpb signature slots (as
    # unsigned), then the band index (4-byte int path) — flattened
    band_src = (
        "SELECT doc_id, b.band AS band, "
        + ", ".join(
            f"xunsigned(sig[{rpb}*b.band+{j+1}]) AS v{j+1}" for j in range(rpb)
        )
        + " FROM sigl CROSS JOIN (SELECT unnest(generate_series(0, "
        f"{bands - 1})) AS band) b"
    )
    band_steps: list[tuple[str, str]] = []
    prev_seed = "42::HUGEINT"
    for j in range(rpb):
        p = f"w{j}"
        band_steps += _hash_long_steps(f"v{j+1}", prev_seed, p)
        prev_seed = f"{p}hh"
    band_steps += _hash_int_steps("band", prev_seed, "e")
    return XXH64_MACROS + f"""
WITH {_token_hash_ctes(corpus_cte)},
thl AS (
  SELECT doc_id, list(h ORDER BY pos) AS th, count(*) AS n
  FROM thr GROUP BY doc_id),
ih_win AS ({_chain(shw_src, sh_steps, "doc_id, dhh AS ih")}),
ih_short AS (
  -- docs with < k tokens: one shingle = fold of ALL token hashes
  SELECT doc_id,
    xhash_long(
      list_reduce(
        list_prepend([42::HUGEINT], list_transform(th, x -> [x])),
        (acc, v) -> [xhash_long(v[1], acc[1])])[1],
      42::HUGEINT) AS ih
  FROM thl WHERE n < {k}),
ih_all AS (SELECT * FROM ih_win UNION ALL SELECT * FROM ih_short),
slot AS ({_chain(slot_src, slot_steps, "doc_id, slot, shh AS sh64")}),
sig AS (
  SELECT doc_id, slot, min(xsigned(sh64)) AS m
  FROM slot GROUP BY doc_id, slot),
sigl AS (
  SELECT doc_id, list(m ORDER BY slot) AS sig FROM sig GROUP BY doc_id),
band AS MATERIALIZED ({_chain(band_src, band_steps, "doc_id, band, ehh AS bh")}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM band a JOIN band b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
shl AS (
  SELECT doc_id,
    list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - {k1}, 1)),
      i -> array_to_string(toks[i:i+{k1}], ' '))) AS sh
  FROM tok),
ver AS (
  SELECT c.id_a, c.id_b,
    len(list_intersect(sa.sh, sb.sh))
      / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jac
  FROM cand c
  JOIN shl sa ON sa.doc_id = c.id_a
  JOIN shl sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b FROM ver WHERE jac >= {threshold}
"""


def hash_bucket_sql(key_expr: str, salt: int, buckets: int = 1_000_000) -> str:
    """Mirror of webx.sampling.hash_bucket: pmod(xxhash64(key, salt),
    buckets) — key is a BIGINT column (8-byte path), salt an int literal
    (4-byte path), pmod on the SIGNED hash."""
    h = f"xsigned(xhash_int({salt}::HUGEINT, xhash_long(xunsigned({key_expr}), 42::HUGEINT)))"
    return f"((({h}) % {buckets}) + {buckets}) % {buckets}"


EMB_DIM = 64  # every driver embeddings table is 64-dim (TESTDATA.md)


def _dot_ff(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Mirror of webx.similarity._dot on two FLOAT arrays: per-element
    float multiply, cast to double, LEFT-ASSOCIATIVE sum from 0.0 —
    bit-identical to Spark's aggregate fold."""
    return "(0.0 + " + " + ".join(
        f"({a}[{i}] * {b}[{i}])::DOUBLE" for i in range(1, dim + 1)
    ) + ")"


def _dot_lit(a: str, coeffs: list, dim: int = EMB_DIM) -> str:
    """Mirror of _dot(float array, double literal array): element cast to
    double FIRST, then double multiply (Spark promotes float→double)."""
    return "(0.0 + " + " + ".join(
        f"({a}[{i}]::DOUBLE * {float(c)!r})" for i, c in zip(range(1, dim + 1), coeffs)
    ) + ")"


def _l2_cols(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Mirror of webx.similarity._l2_expr between a float-array column
    and a centroid float-array column: both elements cast to double,
    difference squared, left-associative sum from 0.0."""
    return "(0.0 + " + " + ".join(
        f"(({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE) * ({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE))"
        for i in range(1, dim + 1)
    ) + ")"


def _cos(a: str, b: str) -> str:
    return f"{_dot_ff(a, b)} / (sqrt({_dot_ff(a, a)}) * sqrt({_dot_ff(b, b)}))"


def _l2_sub(a: str, b: str, off: int, dsub: int) -> str:
    """``_l2_cols`` over a subvector window [off+1, off+dsub] — mirrors
    webx.similarity's ``_l2_fold(slice(a, off+1, dsub), slice(b, off+1,
    dsub))`` chain bit-for-bit."""
    return "(0.0 + " + " + ".join(
        f"(({a}[{off + i}]::DOUBLE - {b}[{off + i}]::DOUBLE) * "
        f"({a}[{off + i}]::DOUBLE - {b}[{off + i}]::DOUBLE))"
        for i in range(1, dsub + 1)
    ) + ")"


def _pq_ctes(m: int, ksub: int, dim: int) -> str:
    """Shared CTE prefix for the PQ oracles: per-subspace distances of
    every corpus vector to the ``ksub`` sampled-anchor codebooks, and
    the argmin codes (ordered-aggregate ``first`` = min_by with the
    same (d, cid) tie-break)."""
    dsub = dim // m
    dcols = ", ".join(
        f"{_l2_sub('e.embedding', 'c.cemb', j * dsub, dsub)} AS d{j}"
        for j in range(m)
    )
    codecols = ", ".join(
        f"first(cid ORDER BY d{j}, cid) AS code_{j}" for j in range(m)
    )
    return f"""
WITH cent AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cemb
              FROM embeddings WHERE vec_id < {ksub}),
a AS MATERIALIZED (
  SELECT e.vec_id, c.cid, {dcols}
  FROM embeddings e CROSS JOIN cent c),
codes AS (SELECT vec_id, {codecols} FROM a GROUP BY vec_id)"""


def rendezvous_oracle_sql(n_a: int = 8, n_b: int = 9) -> str:
    """Mirror of webx.sampling.rendezvous_assign run at two shard
    counts: per-shard weight = the Spark xxhash64(long, int) fold
    (xhash_int(s, xhash_long(key, 42))), winner = max weight with
    larger-shard tie-break (ordered-first = greatest's struct order)."""
    w = (
        "xsigned(xhash_int(s::HUGEINT, "
        "xhash_long(xunsigned(doc_id), 42::HUGEINT)))"
    )

    def side(n: int, name: str) -> str:
        vals = ", ".join(f"({i})" for i in range(n))
        return (
            f"{name}_sh(s) AS (VALUES {vals}), "
            f"{name}_w AS (SELECT d.doc_id, s, {w} AS w "
            f"FROM documents d CROSS JOIN {name}_sh), "
            f"{name} AS (SELECT doc_id, CAST(first(s ORDER BY w DESC, s DESC) "
            f"AS INT) AS shard FROM {name}_w GROUP BY doc_id)"
        )

    return XXH64_MACROS + (
        f"WITH {side(n_a, 'a')}, {side(n_b, 'b')} "
        "SELECT a.doc_id, a.shard AS shard_a, b.shard AS shard_b, "
        "a.shard <> b.shard AS moved "
        "FROM a JOIN b USING (doc_id)"
    )


def _cdc_ctes(corpus_sql: str, nbits: int) -> str:
    """Shared CTE prefix replaying webx/cdc.py's gear-hash chunking:
    the 256-entry gear table as literals (deterministic — xxh64(byte),
    same convention as the LSH hyperplane literals), position × offset
    expansion, the mod-2^64 shifted sum in HUGEINT, boundary predicate,
    and chunk reconstruction via lag over sorted cut positions."""
    from webx.cdc import GEAR

    gear_rows = ", ".join(f"({b}, {int(g)}::HUGEINT)" for b, g in enumerate(GEAR))
    pw_rows = ", ".join(
        f"({j}, {1 << j}::HUGEINT, {1 << (64 - j)}::HUGEINT)" for j in range(64)
    )
    thresh = 1 << (64 - nbits)
    return f"""
WITH corpus AS ({corpus_sql}),
gear(b, g) AS (VALUES {gear_rows}),
pw(j, p2j, p2m) AS (VALUES {pw_rows}),
pos AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p
        FROM corpus),
h AS (SELECT doc_id, p,
             sum((g.g % pw.p2m) * pw.p2j) % {U} AS h
      FROM pos
      JOIN pw ON pw.j < pos.p
      JOIN gear g ON g.b = ord(substr(pos.text, pos.p - pw.j, 1))
      GROUP BY doc_id, p),
ends AS (SELECT DISTINCT doc_id, e FROM (
           SELECT doc_id, p AS e FROM h WHERE h < {thresh}::HUGEINT
           UNION ALL
           SELECT doc_id, length(text) FROM corpus)),
chunks AS (SELECT doc_id,
                  CAST(row_number() OVER w - 1 AS INT) AS chunk_idx,
                  CAST(lag(e, 1, 0) OVER w AS INT) AS start,
                  CAST(e - lag(e, 1, 0) OVER w AS INT) AS length,
                  e
           FROM ends WINDOW w AS (PARTITION BY doc_id ORDER BY e))"""


def cdc_chunks_oracle_sql(corpus_sql: str, nbits: int = 6) -> str:
    """Exact mirror of webx.cdc.cdc_chunks boundary placement."""
    return (
        f"{_cdc_ctes(corpus_sql, nbits)} "
        "SELECT doc_id, chunk_idx, start, length FROM chunks"
    )


def cdc_dedup_oracle_sql(corpus_sql: str, nbits: int = 6) -> str:
    """Mirror of webx.cdc.cdc_dedup_stats. Groups by chunk CONTENT
    where Spark groups by xxhash64(chunk) — equal grouping barring a
    64-bit collision between distinct chunks (see webx/cdc.py)."""
    return f"""{_cdc_ctes(corpus_sql, nbits)},
withtext AS (SELECT c.doc_id, c.length,
                    substr(corpus.text, c.start + 1, c.length) AS chunk
             FROM chunks c JOIN corpus USING (doc_id)),
spread AS (SELECT chunk, count(DISTINCT doc_id) AS n_docs
           FROM withtext GROUP BY chunk)
SELECT w.doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared_chunks,
       sum(w.length)::BIGINT AS bytes,
       sum(CASE WHEN s.n_docs > 1 THEN w.length ELSE 0 END)::BIGINT AS shared_bytes
FROM withtext w JOIN spread s USING (chunk)
GROUP BY w.doc_id"""


def pq_codes_oracle_sql(m: int = 4, ksub: int = 8, dim: int = EMB_DIM) -> str:
    """Exact mirror of webx.similarity.pq_encode_deterministic."""
    cols = ", ".join(f"code_{j}" for j in range(m))
    return f"{_pq_ctes(m, ksub, dim)} SELECT vec_id, {cols} FROM codes"


def pq_adc_oracle_sql(
    m: int = 4, ksub: int = 8, dim: int = EMB_DIM, k: int = 5, n_queries: int = 4
) -> str:
    """Exact mirror of webx.similarity.pq_adc_topk: per-query lookup
    table of subspace distances, m equi-joins on the codes, ADC total as
    the same left-associative double sum, (adc, neighbor_id) rank."""
    dsub = dim // m
    lutcols = ", ".join(
        f"{_l2_sub('q.embedding', 'c.cemb', j * dsub, dsub)} AS dq{j}"
        for j in range(m)
    )
    joins = " ".join(
        f"JOIN lut l{j} ON l{j}.cid = codes.code_{j} "
        + ("" if j == 0 else f"AND l{j}.query_id = l0.query_id")
        for j in range(m)
    )
    total = " + ".join(f"l{j}.dq{j}" for j in range(m))
    return f"""{_pq_ctes(m, ksub, dim)},
lut AS (SELECT q.vec_id AS query_id, c.cid, {lutcols}
        FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < {n_queries}),
s AS (SELECT l0.query_id, codes.vec_id AS neighbor_id, {total} AS adc
      FROM codes {joins}
      WHERE codes.vec_id <> l0.query_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_lsh_oracle_sql(planes: list, k: int = 5, n_queries: int = 8) -> str:
    """Exact mirror of webx.similarity.lsh_topk: sign-bit bucket against
    the same hyperplane literals (passed in — generated by
    ``hyperplanes(dim, n_planes, seed)``), bucket equi-join, exact
    cosine rerank with (cos DESC, neighbor_id) tie-break."""
    bucket = " + ".join(
        f"CASE WHEN {_dot_lit('embedding', p)} > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
WITH c AS (SELECT vec_id AS neighbor_id, embedding AS ce, {bucket} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qe, {bucket} AS bucket
      FROM embeddings WHERE vec_id < {n_queries}),
s AS (SELECT q.query_id, c.neighbor_id, {_cos('q.qe', 'c.ce')} AS cos
      FROM c JOIN q USING (bucket) WHERE c.neighbor_id <> q.query_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= {k}
"""


def ann_ivf_oracle_sql(
    n_centroids: int = 16, n_probe: int = 4, k: int = 5, n_queries: int = 8
) -> str:
    """Exact mirror of q_ann_ivf (ivf_topk_deterministic with sampled
    anchors): centroids = embeddings of vec_id < n_centroids; assignment
    = argmin of the bit-identical L2 chain with lowest-index tie-break;
    probes = n_probe nearest centroids; exact cosine rerank."""
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
              WHERE vec_id < {n_centroids}),
a AS MATERIALIZED (
  SELECT e.vec_id, c.cid, {_l2_cols('e.embedding', 'c.cemb')} AS d
  FROM embeddings e CROSS JOIN cent c),
asn AS (
  SELECT vec_id AS neighbor_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM a) WHERE rn = 1),
prb AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM a WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}),
s AS (
  SELECT p.query_id, asn.neighbor_id, {_cos('qe.embedding', 'ne.embedding')} AS cos
  FROM prb p
  JOIN asn ON asn.cid = p.cid
  JOIN embeddings ne ON ne.vec_id = asn.neighbor_id
  JOIN embeddings qe ON qe.vec_id = p.query_id
  WHERE asn.neighbor_id <> p.query_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM s)
WHERE rank <= {k}
"""


def simhash_oracle_sql(max_hamming: int = 3) -> str:
    """Exact mirror of webx.dedup.simhash_neardup. The 4×16-bit chunk
    bucketing has recall 1 by pigeonhole (hamming ≤ 3 ⇒ some chunk
    equal), so the pipeline's output EQUALS the all-pairs hamming filter
    — which is what this oracle computes, from independently recomputed
    SimHash values (distinct tokens string-hashed once, counts carried
    through a join; the 64 per-bit counters are 64 aggregate columns in
    ONE group-by pass, no row explosion)."""
    bit_aggs = ", ".join(
        f"sum(c * CASE WHEN (h >> {i}) % 2 = 1 THEN 1 ELSE -1 END) AS c{i}"
        for i in range(64)
    )
    bit_val = " + ".join(
        f"CASE WHEN c{i} > 0 THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END"
        for i in range(64)
    )
    return XXH64_MACROS + f"""
WITH {_token_hash_ctes()},
tc AS (
  SELECT doc_id, h, count(*) AS c FROM thr GROUP BY doc_id, h),
bits AS (
  SELECT doc_id, {bit_aggs} FROM tc GROUP BY doc_id),
sh AS (
  SELECT doc_id, xsigned({bit_val}) AS simhash FROM bits)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def semdedup_oracle_sql(
    threshold: float = 0.93, n_centroids: int = 16, n_dup: int = 20
) -> str:
    """Exact mirror of webx.similarity.semdedup over the planted-copy
    corpus (embeddings UNION exact copies of vec_id < n_dup at
    vec_id + 10^6): pinned-fold L2 assignment with lowest-cid tie-break,
    within-cluster cosine pairs, transitive closure, keep = component
    minimum."""
    return f"""
WITH RECURSIVE ecorp AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < {n_dup}),
cent AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
         WHERE vec_id < {n_centroids}),
a AS MATERIALIZED (
  SELECT ecorp.vec_id, ecorp.embedding, c.cid,
         {_l2_cols('ecorp.embedding', 'c.cemb')} AS d
  FROM ecorp CROSS JOIN cent c),
asn AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM a) WHERE rn = 1),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM asn x JOIN asn y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE {_cos('x.embedding', 'y.embedding')} >= {threshold}),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (SELECT a AS node, b AS r FROM edges
          UNION SELECT g.a, r.r FROM edges g JOIN reach r ON g.b = r.node),
comp AS (SELECT node, least(node, min(r)) AS cluster_id
         FROM reach GROUP BY node)
SELECT ecorp.vec_id,
       (comp.node IS NULL OR comp.cluster_id = ecorp.vec_id) AS keep
FROM ecorp LEFT JOIN comp ON comp.node = ecorp.vec_id
"""


def embedding_outliers_oracle_sql(n_centroids: int = 16, k_far: int = 3) -> str:
    """Exact mirror of webx.similarity.embedding_outliers: pinned-fold
    L2 assignment with lowest-cid tie-break, per-cluster farthest rank
    (distance DESC, vec_id ASC)."""
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
              WHERE vec_id < {n_centroids}),
a AS MATERIALIZED (
  SELECT e.vec_id, c.cid, {_l2_cols('e.embedding', 'c.cemb')} AS d
  FROM embeddings e CROSS JOIN cent c),
asn AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM a) WHERE rn = 1)
SELECT vec_id, cid,
       CAST(row_number() OVER (PARTITION BY cid ORDER BY d DESC, vec_id)
            AS INT) AS far_rank,
       (row_number() OVER (PARTITION BY cid ORDER BY d DESC, vec_id)
            <= {k_far}) AS outlier
FROM asn
"""
