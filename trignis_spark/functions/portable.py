"""Portable expression fragments, identical in Spark SQL and DuckDB SQL.

The correctness gate hash-compares Spark output against a DuckDB oracle,
so every text/dedup operator is built from expression fragments that
produce *bit-identical* results in both engines. This module is the
engine's dialect table — the same role the reference's ``SqlDialect``
record plays for SQL Server vs PostgreSQL (SURVEY §2.1 S9,
``Source/Data/SqlDialect.cs:14-143``): one logical operation, one entry
per dialect.

Hashing: the portable polynomial rolling hash below (31-base mod 2^31-1
over character code points) exists so DuckDB can replay it exactly. In a
production Spark deployment you would swap it for ``xxhash64`` (JVM
intrinsic, no lambda) via the ``portable=False`` switches on the dedup
operators — the algorithms are hash-agnostic.
"""

from __future__ import annotations

P31 = 2_147_483_647  # 2^31 - 1, modulus of the rolling hash

SPARK = "spark"
DUCK = "duck"

# MinHash permutation constants h_j(x) = (a_j * x + b_j) mod P31
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (1_299_721, 7),
    (15_485_863, 11),
    (32_452_843, 13),
    (49_979_687, 17),
    (67_867_967, 19),
    (86_028_121, 23),
    (104_395_301, 29),
    (122_949_823, 31),
)


def rolling_hash(dialect: str, x: str) -> str:
    """Polynomial rolling hash of a string expression → BIGINT in [0, P31)."""
    if dialect == SPARK:
        return (
            f"aggregate(transform(split({x}, ''), c -> CAST(ascii(c) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % {P31})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({x}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {P31})"
    )


def tokens(dialect: str, x: str) -> str:
    """Whitespace tokenization → ARRAY<STRING>."""
    if dialect == SPARK:
        return f"split({x}, '\\\\s+')"
    return f"string_split_regex({x}, '\\s+')"


def word_shingles(dialect: str, tokens_expr: str, n: int = 3) -> str:
    """Word n-gram shingles from a token array; [] when fewer than n tokens.

    Written with explicit 1-based element indexing so both engines build
    the exact same strings.
    """
    join = ", ".join(
        [f"{tokens_expr}[i + {k}]" if k else f"{tokens_expr}[i]" for k in range(n)]
    )
    if dialect == SPARK:
        join = ", ".join(f"element_at({tokens_expr}, i + {k})" for k in range(n))
        return (
            f"CASE WHEN size({tokens_expr}) >= {n} THEN "
            f"transform(sequence(1, size({tokens_expr}) - {n - 1}), "
            f"i -> concat_ws(' ', {join})) "
            f"ELSE array() END"
        )
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tokens_expr}) - {n - 2}), "
        f"i -> concat_ws(' ', {join})) "
        f"ELSE [] END"
    )


def count_in_list(dialect: str, arr: str, words: tuple[str, ...]) -> str:
    """Number of elements of an array expression that are in a fixed list."""
    lit = ", ".join(f"'{w}'" for w in words)
    if dialect == SPARK:
        return f"size(filter({arr}, t -> t IN ({lit})))"
    return f"len(list_filter({arr}, t -> t IN ({lit})))"


def sum_lengths(dialect: str, arr: str) -> str:
    """Total character length of all elements of a string array → BIGINT."""
    if dialect == SPARK:
        return (
            f"aggregate(transform({arr}, t -> CAST(length(t) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, b) -> a + b)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({arr}, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b)"
    )


def sha256_hex(dialect: str, x: str) -> str:
    """Lowercase hex SHA-256 of a string expression (both engines agree)."""
    if dialect == SPARK:
        return f"sha2({x}, 256)"
    return f"sha256({x})"


def simhash32(dialect: str, hash_col: str) -> str:
    """32-bit SimHash aggregate over a column of per-feature hashes.

    For each bit i: sign of sum(+1 if bit set else -1) over the feature
    multiset; bits packed into a BIGINT. Use inside GROUP BY doc.
    """
    terms = []
    for i in range(32):
        terms.append(
            f"(CASE WHEN sum(CASE WHEN ({hash_col} >> {i}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN CAST(1 AS BIGINT) << {i} "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def hamming32(dialect: str, a: str, b: str) -> str:
    """Hamming distance between two packed hashes (any width ≤ 63:
    BIGINT xor + popcount in both engines)."""
    if dialect == SPARK:
        return f"bit_count({a} ^ {b})"
    return f"bit_count(xor({a}, {b}))"


#: LCG remix constants extending the 31-bit feature hash to 62 bits
_LCG_A = 1103515245
_LCG_C = 12345

WIDE_BITS = 62  # 31 original + 31 remixed feature-hash bits


def simhash_wide(dialect: str, hash_col: str, bits: int = WIDE_BITS) -> str:
    """Wide SimHash aggregate (≤62 bits) over per-feature hashes.

    The production fingerprint width: a 32-bit simhash only admits
    4-bit blocking bands (16 buckets), which go quadratic as the corpus
    grows; 62 bits admit Manku-style ~16-bit bands. Feature bits 0-30
    come from the rolling hash, bits 31+ from a deterministic LCG remix
    of it — both engines evaluate the identical integer expression."""
    if not 1 <= bits <= 62:
        raise ValueError("simhash_wide supports 1..62 bits")
    h2 = f"(({_LCG_A} * {hash_col} + {_LCG_C}) % {P31})"
    terms = []
    for i in range(bits):
        src, j = (hash_col, i) if i < 31 else (h2, i - 31)
        terms.append(
            f"(CASE WHEN sum(CASE WHEN ({src} >> {j}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN CAST(1 AS BIGINT) << {i} "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def band_layout(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Partition ``bits`` into ``n_bands`` contiguous (offset, width)
    bands, widths as even as possible — the blocking layout shared by
    the Spark operator and the SQL oracle."""
    base, extra = divmod(bits, n_bands)
    out, off = [], 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        out.append((off, w))
        off += w
    return out


def token_hashes(dialect: str, tokens_expr: str) -> str:
    """Rolling hash of every token in an array → ARRAY<BIGINT>.

    Hashing each token once and combining per shingle (below) replaces
    char-level hashing of every shingle string — ~n× less work for
    n-gram shingles, and downstream joins run on 8-byte ints instead of
    strings.
    """
    if dialect == SPARK:
        return (
            f"transform({tokens_expr}, t -> "
            f"aggregate(transform(split(t, ''), c -> CAST(ascii(c) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % {P31}))"
        )
    return (
        f"list_transform({tokens_expr}, t -> "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {P31}))"
    )


def shingle_hashes(dialect: str, th_expr: str, n: int = 3) -> str:
    """Combine consecutive token hashes into n-gram shingle hashes.

    h(shingle) = fold(h_tok, (acc, h) -> (acc*31 + h) mod P) — pure
    integer arithmetic, no string materialization. [] when < n tokens.
    """
    if dialect == SPARK:
        combo = f"element_at({th_expr}, i)"
        for k in range(1, n):
            combo = f"(({combo}) * 31 + element_at({th_expr}, i + {k})) % {P31}"
        return (
            f"CASE WHEN size({th_expr}) >= {n} THEN "
            f"transform(sequence(1, size({th_expr}) - {n - 1}), i -> {combo}) "
            f"ELSE array() END"
        )
    combo = f"{th_expr}[i]"
    for k in range(1, n):
        combo = f"(({combo}) * 31 + {th_expr}[i + {k}]) % {P31}"
    return (
        f"CASE WHEN len({th_expr}) >= {n} THEN "
        f"list_transform(range(1, len({th_expr}) - {n - 2}), i -> {combo}) "
        f"ELSE [] END"
    )
