#!/usr/bin/env python3
"""Dev-only generator for the d03/d07 DuckDB oracle SQL.

NOT part of the engine (engine = Scala Spark only). DuckDB 1.0.0 has no
xxhash64, so the oracle inlines a full XXH64 (seed 42) in SQL over the
whitespace tokens of `documents.text`, then folds the per-bit majority
vote into the 64-bit SimHash fingerprint — mirroring
graft.functions.SimHashText/SimHash64 from first principles (the
xxHash spec), NOT by planting engine-computed values. Run this script
to (re)generate and self-check the SQL; paste the printed blocks into
SparkEntry.oracleSql.

Why generated: the oracle must be ONE SQL statement (no CREATE MACRO),
and every 64-bit wrapping multiply has to be inlined via HUGEINT
arithmetic (DuckDB raises on UBIGINT overflow instead of wrapping).
All XXH64 multiplies are by constant primes, so each expands to a
compact two-term split: a*b mod 2^64 =
(a*b_lo + ((a*b_hi mod 2^32) << 32)) mod 2^64, every intermediate
below 2^97 (HUGEINT-safe).

Caveats (hold for the harness corpus, asserted by the self-check):
- byte == codepoint (ASCII text; `unicode(substr(...))` reads bytes);
- tokens shorter than 32 bytes (no XXH64 stripe loop; max seen: 8).
"""

M64 = 18446744073709551616  # 2^64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def mulc(x, c):
    """x * c mod 2^64 for a constant c, all intermediates < 2^97.
    `x` should be a bare variable name (it appears twice)."""
    lo, hi = c % (1 << 32), c >> 32
    t1 = f"({x})::HUGEINT * {lo}::HUGEINT"
    if hi:
        t2 = f" + ((({x})::HUGEINT * {hi}::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT"
    else:
        t2 = ""
    return f"CAST((({t1}{t2}) % {M64}::HUGEINT) AS UBIGINT)"


def let(expr, var, body):
    """let-binding emulation: a single-element list_transform evaluates
    `expr` once and binds it to `var` inside `body` — without this,
    every rotl/xor duplicates its whole argument subtree textually and
    the inlined XXH64 explodes to ~25 KB of SQL."""
    return f"(list_transform([{expr}], {var} -> {body}))[1]"


def rotl(x, r):
    """(x << r | x >> (64-r)); left shift as a wrapping multiply
    (DuckDB raises on plain `<<` overflow). `x` must be a bare var."""
    return f"({mulc(x, (1 << r) % M64)} | (({x}) >> {64 - r}))"


def add(x, y):
    return f"CAST(((({x})::HUGEINT + ({y})::HUGEINT) % {M64}::HUGEINT) AS UBIGINT)"


def xxh64_sql(word_var="w", acc_var="a", byte_var="b"):
    """Emit the two fold-lambda bodies for the <32-byte path, using
    let-bindings so each stage's text appears once."""
    # 8-byte word step: acc ^= rotl31(k*P2)*P1; acc = rotl27(acc)*P1 + P4
    step8 = let(mulc(word_var, P2), "t1",
            let(rotl("t1", 31), "t2",
            let(mulc("t2", P1), "t3",
            let(f"xor({acc_var}, t3)", "t4",
            let(rotl("t4", 27), "t5",
            add(mulc("t5", P1), P4))))))
    # tail byte step: acc ^= b*P5; acc = rotl11(acc)*P1
    stepb = let(mulc(byte_var, P5), "u1",
            let(f"xor({acc_var}, u1)", "u2",
            let(rotl("u2", 11), "u3",
            mulc("u3", P1))))
    return step8, stepb


def word8(bs, off):
    """bs[off]..bs[off+7] little-endian (1-based list index expr `off`)."""
    terms = [f"({bs})[({off})+{j}]::UBIGINT * {1 << (8 * j)}::UBIGINT"
             if j else f"({bs})[({off})]::UBIGINT" for j in range(8)]
    # each term < 2^64 and the total IS a 64-bit value: plain + is safe
    return "(" + " + ".join(terms) + ")"


def word4(bs, off):
    terms = [f"({bs})[({off})+{j}]::UBIGINT * {1 << (8 * j)}::UBIGINT"
             if j else f"({bs})[({off})]::UBIGINT" for j in range(4)]
    return "(" + " + ".join(terms) + ")"


def fingerprint_ctes():
    """CTE chain: documents -> per-doc token occurrences -> distinct
    token XXH64 -> per-doc per-bit vote -> signed 64-bit fingerprint."""
    step8, stepb = xxh64_sql()
    acc0 = (SEED + P5) % M64  # n<32 init, constant-folded
    # 4-byte word step: acc ^= w4*P1; acc = rotl23(acc)*P2 + P3
    step4 = let(word4('bs', '(n // 8) * 8 + 1'), "v0",
            let(mulc("v0", P1), "v1",
            let("xor(a2, v1)", "v2",
            let(rotl("v2", 23), "v3",
            add(mulc("v3", P2), P3)))))
    # final avalanche
    aval = let("xor(a4, a4 >> 33)", "z1",
           let(mulc("z1", P2), "z2",
           let("xor(z2, z2 >> 29)", "z3",
           let(mulc("z3", P3), "z4",
           "xor(z4, z4 >> 32)"))))
    return f"""toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents) WHERE tok <> ''),
dtok AS (SELECT DISTINCT tok FROM toks),
""" + xxh64_token_ctes() + f""",
votes AS (
  SELECT t.doc_id, bit.k,
    sum(CASE WHEN (h.hu >> bit.k) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM toks t JOIN thash h USING (tok)
  CROSS JOIN (SELECT unnest(range(0, 64)) AS k) bit
  GROUP BY t.doc_id, bit.k),
fps AS (
  SELECT d.doc_id,
    coalesce(sum(CASE WHEN v.v > 0 THEN
      CASE WHEN v.k = 63 THEN -9223372036854775808
           ELSE (1::BIGINT << v.k::INT) END ELSE 0 END), 0)::BIGINT AS fp
  FROM documents d LEFT JOIN votes v USING (doc_id)
  GROUP BY d.doc_id)"""


def xxh64_token_ctes():
    """dtok (tok VARCHAR, ASCII, < 32 bytes) -> thash (tok, hu UBIGINT):
    the inlined XXH64(tok, seed 42) chain, reusable by any oracle that
    needs the hash of a token column (d03/d07 fingerprints, q58 HLL)."""
    step8, stepb = xxh64_sql()
    acc0 = (SEED + P5) % M64  # n<32 init, constant-folded
    # 4-byte word step: acc ^= w4*P1; acc = rotl23(acc)*P2 + P3
    step4 = let(word4('bs', '(n // 8) * 8 + 1'), "v0",
            let(mulc("v0", P1), "v1",
            let("xor(a2, v1)", "v2",
            let(rotl("v2", 23), "v3",
            add(mulc("v3", P2), P3)))))
    # final avalanche
    aval = let("xor(a4, a4 >> 33)", "z1",
           let(mulc("z1", P2), "z2",
           let("xor(z2, z2 >> 29)", "z3",
           let(mulc("z3", P3), "z4",
           "xor(z4, z4 >> 32)"))))
    return f"""tbytes AS (
  SELECT tok, strlen(tok)::BIGINT AS n,
    list_transform(range(1, strlen(tok) + 1),
      i -> unicode(substr(tok, i::INT, 1))::UBIGINT) AS bs
  FROM dtok),
-- XXH64(token, seed {SEED}), tokens < 32 bytes: no stripe loop
tacc AS (
  SELECT tok, n, bs,
    list_reduce(
      list_prepend({add(str(acc0), 'n::UBIGINT')},
        list_transform(range(0, n // 8), j -> {word8('bs', 'j*8 + 1')})),
      (a, w) -> {step8}) AS a2
  FROM tbytes),
tacc4 AS (
  SELECT tok, n, bs,
    CASE WHEN n % 8 >= 4 THEN {step4}
         ELSE a2 END AS a3
  FROM tacc),
tacct AS (
  SELECT tok,
    list_reduce(
      list_prepend(a3,
        list_transform(range(0, n % 4), j -> bs[n - (n % 4) + j + 1])),
      (a, b) -> {stepb}) AS a4
  FROM tacc4),
thash AS (
  SELECT tok, {aval} AS hu
  FROM tacct)"""


def hll_sql():
    """q58 oracle: DISTINCT o_custkey rendered as decimal text (the
    byte sequence the engine hashes via cast(string)), XXH64 inlined,
    then the pure-integer HLL register fold: bucket = low 6 bits,
    rho = trailing zeros of the remaining 58 bits + 1 (w = 0 -> 59).
    The trailing-zero rank runs on the SIGNED cast of w (< 2^58, so
    exact) to keep every subexpression raise-free in DuckDB's unsigned
    arithmetic."""
    return ("WITH dtok AS (SELECT DISTINCT o_custkey::VARCHAR AS tok FROM orders),\n"
            + xxh64_token_ctes() + """,
rho AS (
  SELECT CAST(hu & 63::UBIGINT AS BIGINT) AS bucket,
    CAST(hu >> 6 AS BIGINT) AS wi, tok
  FROM thash)
SELECT bucket, count(DISTINCT tok) AS n_keys,
  max(CASE WHEN wi = 0 THEN 59
       ELSE bit_count((wi & (-wi)) - 1)::INT + 1 END) AS max_rho
FROM rho GROUP BY bucket ORDER BY bucket""")


def hll_union_sql(year_a=1996, month_a=1, year_b=1998, month_b=7):
    """q104 oracle: the two per-epoch buyer key sets (1996-01 and
    1998-07 — narrow enough that the registers actually differ) hashed
    once (the union of the sets feeds the shared XXH64 CTE chain),
    tagged by membership, then per-bucket max rho per set and overall —
    the register-level union the engine computes by full-outer-joining
    two hllRegisters frames. Missing registers read as 0."""
    pa = f"(year(o_orderdate) = {year_a} AND month(o_orderdate) = {month_a})"
    pb = f"(year(o_orderdate) = {year_b} AND month(o_orderdate) = {month_b})"
    return (f"WITH tagged AS (SELECT DISTINCT o_custkey::VARCHAR AS tok,\n"
            f"    year(o_orderdate) AS yr FROM orders\n"
            f"  WHERE {pa} OR {pb}),\n"
            "dtok AS (SELECT DISTINCT tok FROM tagged),\n"
            + xxh64_token_ctes() + f""",
wr AS (
  SELECT tok, CAST(hu & 63::UBIGINT AS BIGINT) AS bucket,
    CAST(hu >> 6 AS BIGINT) AS wi
  FROM thash),
r AS (
  SELECT g.yr, wr.bucket,
    CASE WHEN wi = 0 THEN 59
         ELSE bit_count((wi & (-wi)) - 1)::INT + 1 END AS rho
  FROM wr JOIN tagged g USING (tok))
SELECT bucket,
  CAST(coalesce(max(CASE WHEN yr = {year_a} THEN rho END), 0) AS INT)
    AS rho_a,
  CAST(coalesce(max(CASE WHEN yr = {year_b} THEN rho END), 0) AS INT)
    AS rho_b,
  CAST(max(rho) AS INT) AS rho_union
FROM r GROUP BY bucket ORDER BY bucket""")


def st22_hll_sql():
    """st22 oracle: the q58 register build over the distinct user_ids
    of the 1-in-5 event slice, WITHOUT n_keys (per-build distinct
    counts are not register-mergeable, so the streaming accumulator
    never has them) — the from-scratch mirror of the incrementally
    merged standing table."""
    return ("WITH dtok AS (SELECT DISTINCT user_id::VARCHAR AS tok\n"
            "  FROM events WHERE user_id % 5 = 2),\n"
            + xxh64_token_ctes() + """,
rho AS (
  SELECT CAST(hu & 63::UBIGINT AS BIGINT) AS bucket,
    CAST(hu >> 6 AS BIGINT) AS wi
  FROM thash)
SELECT bucket,
  max(CASE WHEN wi = 0 THEN 59
       ELSE bit_count((wi & (-wi)) - 1)::INT + 1 END) AS max_rho
FROM rho GROUP BY bucket ORDER BY bucket""")


def minhash_union_sql(num_perms=16):
    """d22 oracle: per-source whitespace-token-set MinHash signatures
    (permutation i = wrapping 64-bit multiply of the XXH64 token hash
    by the odd constant 2000006*i + 12345, sign bit masked), plus the
    corpus '__all__' row computed FROM SCRATCH over all distinct tokens
    — the engine derives that row by element-wise-MIN-merging the shard
    signatures, so this gate proves merge == rescan."""
    return ("WITH tagged AS (SELECT DISTINCT source AS grp, tok FROM (\n"
            "    SELECT source, unnest(list_filter(\n"
            "      string_split(lower(text), ' '), x -> x <> '')) AS tok\n"
            "    FROM documents) t),\n"
            "dtok AS (SELECT DISTINCT tok FROM tagged),\n"
            + xxh64_token_ctes() + f""",
perms AS (SELECT CAST(range AS INT) AS perm,
    (2000006 * range + 12345)::UBIGINT AS a FROM range({num_perms})),
masked AS (
  SELECT t.tok, p.perm,
    CAST(CAST((t.hu::HUGEINT * p.a::HUGEINT) % 18446744073709551616::HUGEINT
      AS UBIGINT) & 9223372036854775807::UBIGINT AS BIGINT) AS mh
  FROM thash t CROSS JOIN perms p),
sigs AS (
  SELECT g.grp, m.perm, min(m.mh) AS sig
  FROM masked m JOIN tagged g USING (tok) GROUP BY 1, 2),
uni AS (
  SELECT '__all__' AS grp, perm, min(mh) AS sig
  FROM masked GROUP BY 2)
SELECT grp, perm, sig FROM (
  SELECT * FROM sigs UNION ALL SELECT * FROM uni) u
ORDER BY grp, perm""")


def cms_sql(depth=4, width=1024):
    """q69 oracle: the full Count-Min sketch mirrored from first
    principles — per-key counts of lineitem.l_partkey, XXH64 of the
    key's decimal text (the engine's cast(string) bytes), cells
    (d, (h1 + d*h2) mod width) summed over keys, then the probe-side
    min over the sketch rows for the 20 smallest keys. All hash
    arithmetic stays below 2^34 (h1, h2 < 2^32; d <= 7), so plain
    UBIGINT ops are raise-free."""
    return (
        "WITH dtok AS (SELECT l_partkey AS pk, l_partkey::VARCHAR AS tok,\n"
        "    count(*)::BIGINT AS c FROM lineitem GROUP BY 1, 2),\n"
        + xxh64_token_ctes() + f""",
hk AS (
  SELECT d.pk, d.c,
    (hu & 4294967295::UBIGINT) AS h1, (hu >> 32) AS h2
  FROM thash t JOIN dtok d USING (tok)),
cells AS (
  SELECT r.range AS depth,
    CAST((h1 + r.range::UBIGINT * h2) % {width}::UBIGINT AS BIGINT) AS col,
    sum(c)::BIGINT AS cnt
  FROM hk CROSS JOIN range({depth}) r
  GROUP BY 1, 2),
probes AS (SELECT pk, c, h1, h2 FROM hk WHERE pk <= 20),
est AS (
  SELECT p.pk, p.c,
    min(coalesce(cells.cnt, 0))::BIGINT AS cms_est
  FROM probes p CROSS JOIN range({depth}) r
  LEFT JOIN cells ON cells.depth = r.range
    AND cells.col = CAST((p.h1 + r.range::UBIGINT * p.h2) % {width}::UBIGINT AS BIGINT)
  GROUP BY p.pk, p.c)
SELECT pk AS l_partkey, c AS exact_cnt, cms_est,
  cms_est - c AS overcount
FROM est ORDER BY l_partkey""")


def d03_sql():
    return ("WITH " + fingerprint_ctes() +
            "\nSELECT doc_id, fp AS simhash64 FROM fps ORDER BY doc_id")


def d07_sql(max_hamming=3, max_bucket=64):
    # Engine semantics (TextDedup.simhashPairs): candidate pairs come
    # from 4x16-bit block buckets with 2 <= |bucket| <= 64 (oversized
    # buckets are DROPPED, not truncated), then hamming <= 3 verify.
    # For hamming <= 3 the blocking has perfect recall (pigeonhole:
    # 3 differing bits touch at most 3 of 4 blocks), so the oracle is
    # pairs sharing at least one NON-OVERSIZED block bucket with
    # bit_count(xor) <= 3.
    blocks = ", ".join(
        f"((fpu >> {b * 16}) & 65535) AS blk{b}" for b in range(4))
    return ("WITH " + fingerprint_ctes() + f""",
fpb AS (
  SELECT doc_id, fp,
    CASE WHEN fp < 0 THEN CAST(fp::HUGEINT + {M64}::HUGEINT AS UBIGINT)
         ELSE fp::UBIGINT END AS fpu
  FROM fps),
fblk AS (SELECT doc_id, fp, fpu, {blocks} FROM fpb),
bucketed AS (
  SELECT b.block, b.key, count(*) AS sz FROM (
    SELECT doc_id, unnest([{{'block': 0, 'key': blk0}}, {{'block': 1, 'key': blk1}},
                           {{'block': 2, 'key': blk2}}, {{'block': 3, 'key': blk3}}], recursive := true)
    FROM fblk) b
  GROUP BY b.block, b.key)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  bit_count(xor(a.fp, b.fp))::INT AS hamming
FROM fblk a JOIN fblk b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
  AND EXISTS (
    SELECT 1 FROM (VALUES (0, a.blk0, b.blk0), (1, a.blk1, b.blk1),
                          (2, a.blk2, b.blk2), (3, a.blk3, b.blk3)) s(blk, ka, kb)
    JOIN bucketed bu ON bu.block = s.blk AND bu.key = s.ka
    WHERE s.ka = s.kb AND bu.sz BETWEEN 2 AND {max_bucket})
ORDER BY id_a, id_b""")


if __name__ == "__main__":
    import sys
    import duckdb

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    vout = sys.argv[2] if len(sys.argv) > 2 else None
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    # self-check assumptions
    a = con.sql("SELECT max(strlen(tok)), max(CASE WHEN tok ~ '^[\\x00-\\x7F]*$' THEN 0 ELSE 1 END) FROM (SELECT unnest(string_split(lower(text),' ')) AS tok FROM documents) WHERE tok <> ''").fetchone()
    assert a[0] < 32, f"token >= 32 bytes ({a[0]}): stripe loop needed"
    assert a[1] == 0, "non-ASCII token: byte!=codepoint"
    for name, sql in (("d03_simhash", d03_sql()), ("d07_simhash_pairs", d07_sql()),
                      ("q58_hll_registers", hll_sql()),
                      ("q104_hll_union", hll_union_sql()),
                      ("d22_minhash_union", minhash_union_sql()),
                      ("st22_hll_monitor", st22_hll_sql()),
                      ("q69_cms_sketch", cms_sql())):
        got = con.sql(sql).fetchall()
        print(f"{name}: {len(got)} rows")
        if vout:
            want = con.sql(f"SELECT * FROM read_parquet('{vout}/{name}/*.parquet')").fetchall()
            want = sorted(want)
            assert sorted(got) == want, f"{name} MISMATCH: got {got[:3]}..., want {want[:3]}..."
            print(f"{name}: matches the engine dump exactly")
    if "--print" in sys.argv:
        print("\n-- d03 --\n" + d03_sql())
        print("\n-- d07 --\n" + d07_sql())
