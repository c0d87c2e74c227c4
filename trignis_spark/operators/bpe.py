"""Distributed BPE merge learning — tokenizer training over a corpus.

Byte-pair encoding's training loop (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units"): start from characters,
repeatedly count adjacent symbol pairs across the corpus (weighted by
word frequency) and merge the most frequent pair into a new symbol.
The per-round work is exactly Spark-shaped:

- the corpus collapses once into a (word, freq) table — pair counting
  then runs over distinct words, not tokens (the standard trick; corpus
  size only enters through the initial word count);
- pair counting is explode → partial-agged groupBy (one shuffle, output
  bounded by the symbol-pair vocabulary);
- the argmax merge rule is a distributed TakeOrdered(1);
- applying a merge is a map-only greedy left-to-right fold per word.

Determinism: ties on pair count break lexicographically (left, then
right symbol); the greedy fold is the canonical non-overlapping
left-to-right application, expressed as an identical string fold in
Spark and DuckDB (symbols kept as a '|'-delimited string because
DuckDB's list_reduce cannot carry a list accumulator).

Symbols never contain '|' or ' ' by construction (words are
whitespace-split and '|'-free after the guard filter in `word_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): whitespace-tokenized corpus word frequencies,
    lowercased; words containing the '|' delimiter are dropped (none in
    the fixture corpus — the guard keeps the fold well-defined on any
    input)."""
    toks = docs.select(
        F.explode(F.expr(f"split(lower({text_col}), ' +')")).alias("w")
    ).filter(
        # '|' is the symbol delimiter; quotes/backslashes would need
        # SQL-literal escaping in the generated merge fold — drop the
        # (fixture-absent) pathological words instead of escaping them
        "w != '' AND w NOT LIKE '%|%' AND w NOT LIKE \"%'%\" "
        "AND w NOT LIKE '%\\\\\\\\%'"
    )
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))


def to_symbols(words: DataFrame) -> DataFrame:
    """(sym, freq): each word as its character sequence joined by '|'
    — the round-0 symbol string."""
    return words.select(
        F.expr("array_join(split(w, ''), '|')").alias("sym"), "freq"
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(left, right, n): corpus-frequency-weighted counts of adjacent
    symbol pairs. Explode of the per-word pair list → one groupBy."""
    pairs = symbols.filter("size(split(sym, '[|]')) >= 2").select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(sym, '[|]')) - 1), "
                "i -> named_struct("
                "'left', element_at(split(sym, '[|]'), i), "
                "'right', element_at(split(sym, '[|]'), i + 1)))"
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"), "freq")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("n"))
    )


def top_pair(counts: DataFrame) -> tuple[str, str, int] | None:
    """The merge rule: highest count, ties to the lexicographically
    smallest (left, right). Distributed TakeOrdered(1)."""
    row = (
        counts.orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
        .limit(1)
        .first()
    )
    return None if row is None else (row["left"], row["right"], row["n"])


def merge_expr(sym_col: str, left: str, right: str) -> str:
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    '|'-delimited symbol string, as a pure fold both engines evaluate
    identically. The accumulator carries a leading '|' so "ends with
    '|' + left" is well-defined for the first symbol too."""
    l, r = left, right  # quote/backslash-free by word_table's guard
    return (
        f"substr(aggregate(split({sym_col}, '[|]'), CAST('' AS STRING), "
        f"(acc, s) -> CASE WHEN s = '{r}' "
        f"AND right(acc, {len(l) + 1}) = '|{l}' "
        f"THEN concat(substr(acc, 1, length(acc) - {len(l) + 1}), "
        f"'|{l}{r}') ELSE concat(acc, '|', s) END), 2)"
    )


def apply_merge(symbols: DataFrame, left: str, right: str) -> DataFrame:
    return symbols.select(
        F.expr(merge_expr("sym", left, right)).alias("sym"), "freq"
    )


def learn_merges(docs: DataFrame, n_merges: int,
                 text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules. Each round is one Spark job
    (pair count + TakeOrdered); only the single winning rule touches the
    driver. Returns [(left, right, count), ...] in merge order."""
    symbols = to_symbols(word_table(docs, text_col)).localCheckpoint(
        eager=True
    )
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        rule = top_pair(pair_counts(symbols))
        if rule is None:
            break
        rules.append(rule)
        symbols = apply_merge(symbols, rule[0], rule[1]).localCheckpoint(
            eager=True
        )
    return rules
