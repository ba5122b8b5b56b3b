"""BPE (byte-pair encoding) tokenizer-vocabulary induction — the
training half of the tokenizer surface (token *counting* lives in
:mod:`operators.text_analysis`). No reference counterpart; the
LLM-pipeline north star.

Classic Sennrich-style training loop, restructured for Spark scale:

* **One corpus pass, then vocab-sized iteration.** The corpus is
  reduced to a (word, freq) table first (one shuffle); every merge
  iteration then runs over the *vocabulary* — millions of rows at
  web scale, not the corpus' trillions. This is exactly how
  production BPE trainers work (word-frequency pre-aggregation).
* **Merges are model parameters.** Each iteration collects ONE
  (left, right, count) row to the driver — the argmax pair — and
  re-enters the plan as a literal in a ``replace`` projection, the
  same model-parameter pattern as the PQ codebooks and Z-order
  bounds. Nothing corpus-sized ever reaches the driver.
* **Merge-by-replace.** A word is encoded as ``~~c1~~c2~~...~~``
  (``~`` cannot occur in the corpus' [a-z ] alphabet). Merging pair
  (l, r) is ``replace(e, '~l~~r~', '~lr~')``: the pattern consumes
  one separator from each side, so consecutive occurrences still
  match — string ``replace`` is left-to-right non-overlapping in
  Spark and DuckDB alike, which is precisely BPE's merge rule
  ("aab" + (a,b) → "a ab"; "abab" → "ab ab").

Determinism: pair counts are exact integers (overlapping adjacent
pairs, weighted by word frequency — "aaa" counts (a,a) twice); the
argmax tie-breaks lexicographically on (left, right). A DuckDB
oracle replays the whole training as an unrolled CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "~"


def char_encoded(words: DataFrame, word_col: str, freq_col: str) -> DataFrame:
    """(word, freq, e) with ``e`` the separator-encoded char sequence."""
    ss = SEP * 2
    return words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).alias("freq"),
        F.concat(
            F.lit(ss), F.regexp_replace(F.col(word_col), "(.)", "$1" + ss)
        ).alias("e"),
    )


def pair_counts(enc: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): adjacent-token pair frequencies over the
    encoded vocab, weighted by word frequency. One explode + one
    aggregation shuffle keyed on the pair."""
    t = F.filter(F.split("e", SEP * 2), lambda x: x != "")
    pairs_arr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("lhs"),
                F.element_at(t, i + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        enc.select("freq", F.explode(pairs_arr).alias("p"))
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    words: DataFrame, word_col: str, freq_col: str, num_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` merge rules; returns
    ``[(rank, lhs, rhs, cnt), ...]``. Stops early if the vocabulary
    runs out of pairs.

    Scale note: this launches one pair-count job + one driver
    round-trip PER MERGE — exactly right for the 3-merge conformance
    oracle, unusable for a real 30k-merge vocabulary (30k Spark
    jobs). Production training should call :func:`bpe_train_batched`,
    which learns provably-identical rules from one snapshot per
    batch."""
    enc = char_encoded(words, word_col, freq_col)
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        best = (
            pair_counts(enc)
            .orderBy(F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        rules.append((rank, lhs, rhs, cnt))
        pat = f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"
        rep = f"{SEP}{lhs}{rhs}{SEP}"
        enc = enc.withColumn("e", F.replace(F.col("e"), F.lit(pat), F.lit(rep)))
    return rules


def _conflicts(p, q) -> bool:
    """True if merging q can change p's pair count (or vice versa).

    Merging q = (a, b) destroys occurrences of pairs (x, a) and
    (b, y) (a token absorbed into ab) and creates/increases pairs
    involving the concatenated token "ab". Checked symmetrically so
    batch order never matters.
    """
    pl, pr, ql, qr = p[0], p[1], q[0], q[1]
    return (
        (pl == ql and pr == qr)
        or pl == qr
        or pr == ql
        or ql == pr  # symmetric destroy checks
        or qr == pl
        or pl == ql + qr
        or pr == ql + qr
        or ql == pl + pr
        or qr == pl + pr
    )


def bpe_train_batched(
    words: DataFrame,
    word_col: str,
    freq_col: str,
    num_merges: int,
    max_batch: int = 64,
    checkpoint_every: int = 16,
) -> list[tuple[int, str, str, int]]:
    """Batched BPE training — EXACTLY equivalent to :func:`bpe_train`
    (pytest-asserted) while launching one pair-count job per *batch*
    instead of one per *merge*.

    Why: ``bpe_train`` is the right shape for the 3-merge conformance
    oracle, but it runs one full Spark job + one driver round-trip per
    merge — a real 30k-merge vocabulary would mean 30k jobs. Here each
    round counts pairs once, collects the top ``4*max_batch`` rows
    (bounded model state, like the PQ codebooks), and accepts a batch
    of merges from one snapshot.

    Equivalence argument (why the batch replays sequential BPE
    bit-for-bit, including lexicographic tie-breaks):

    * Scan pairs in sequential-argmax order (cnt desc, lhs, rhs) and
      accept while mutually NON-conflicting (:func:`_conflicts`);
      stop at the first conflicting candidate, whose count is
      ``cnt_c``. Every conflicting pair therefore has count <= cnt_c.
    * Merging an accepted pair only changes counts of CONFLICTING
      pairs, and any created/increased occurrence consumes a snapshot
      occurrence of a conflicting pair, so every non-accepted pair's
      count stays <= snapshot + increase <= 2*cnt_c throughout the
      batch.
    * Trim the accepted prefix to cnt > 2*cnt_c (a prefix, since
      counts are sorted). Accepted counts never change (they conflict
      with nothing applied before them), so each is still the strict
      argmax at its own sequential step. If trimming empties the
      batch, fall back to the plain argmax — sequential by
      definition.

    ``checkpoint_every``: the merge-by-replace encoding chains one
    string ``replace`` per merge into the plan; every N rounds the
    encoded vocab is localCheckpoint()ed so plan depth stays bounded
    at web-scale vocab sizes (the vocab table itself is small — this
    is lineage hygiene, not data movement).
    """
    enc = char_encoded(words, word_col, freq_col)
    rules: list[tuple[int, str, str, int]] = []
    rounds = 0
    scan_limit = max(4 * max_batch, 8)
    while len(rules) < num_merges:
        scan = (
            pair_counts(enc)
            .orderBy(F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(scan_limit)
            .collect()
        )
        if not scan:
            break
        accepted: list = []
        cnt_c: int | None = None
        for r in scan:
            if len(accepted) >= max_batch:
                cnt_c = int(r["cnt"])
                break
            if any(_conflicts((r["lhs"], r["rhs"]), (q["lhs"], q["rhs"])) for q in accepted):
                cnt_c = int(r["cnt"])
                break
            accepted.append(r)
        else:
            if len(scan) == scan_limit:
                # more pairs exist beyond the fetch — be conservative
                cnt_c = int(scan[-1]["cnt"])
        if cnt_c is not None:
            accepted = [r for r in accepted if int(r["cnt"]) > 2 * cnt_c]
        if not accepted:
            accepted = [scan[0]]
        expr = F.col("e")
        for r in accepted:
            lhs, rhs, cnt = r["lhs"], r["rhs"], int(r["cnt"])
            rules.append((len(rules) + 1, lhs, rhs, cnt))
            pat = f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"
            rep = f"{SEP}{lhs}{rhs}{SEP}"
            expr = F.replace(expr, F.lit(pat), F.lit(rep))
            if len(rules) == num_merges:
                break
        enc = enc.withColumn("e", expr)
        rounds += 1
        if rounds % checkpoint_every == 0:
            enc = enc.localCheckpoint()
    return rules


def bpe_apply(
    words: DataFrame,
    word_col: str,
    freq_col: str,
    rules: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Tokenize the vocabulary with learned merge rules: apply each
    merge in rank order (the same literal replaces training used),
    then explode to (token, freq) rows. Pure projection + one
    explode — the corpus-sized tokenization this stands in for is a
    map-only pass."""
    enc = char_encoded(words, word_col, freq_col)
    for _, lhs, rhs, _ in sorted(rules):
        pat = f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"
        rep = f"{SEP}{lhs}{rhs}{SEP}"
        enc = enc.withColumn("e", F.replace(F.col("e"), F.lit(pat), F.lit(rep)))
    t = F.filter(F.split("e", SEP * 2), lambda x: x != "")
    return enc.select("freq", F.explode(t).alias("token"))
