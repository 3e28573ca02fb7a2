"""r13 NEGATIVE RESULT — Arrow batch Levenshtein (Myers bit-parallel), measured and REVERTED.

Wired into the fuzzy-match scorers this kernel was 3.4× SLOWER than the
JVM F.levenshtein on the sf0.1 cross-join extractOne (interleaved
min-of-3: fuzzy 9.8 s JVM vs 34.0 s Arrow; blocked multi_scorer 1.5 vs
2.7 s; unify 2.8-3.6 s — match_ab.log of 2026-08-18). The boundary cost of
materializing ~90M Python string objects (15M pairs × 6 string columns)
dwarfs the DP saving, and the token-set string construction stays in the
JVM either way, capping the theoretical win at ~1.25×. Kept as a runnable
record: the kernel itself is EXACT (pinned below against the classic DP
and F.levenshtein on adversarial unicode), so if a future environment has
zero-copy string access (mapInArrow + utf32 buffers) the math changes.

Original module docstring:

Batch Levenshtein — Myers' bit-parallel algorithm vectorized with numpy.

`F.levenshtein` runs an O(m·n) dynamic program per pair inside the JVM; the
fuzzy-match family evaluates it over cross/blocked joins (millions of pairs
× 3 scorers). This kernel computes the EXACT same code-point edit distance
for a whole Arrow batch at once:

- Myers 1999 / Hyyrö 2001 bit-parallel formulation: the DP column is packed
  into one 64-bit word (pattern ≤ 64 code points), each text character costs
  ~12 word ops. Vectorized across the batch with numpy uint64 arrays, one
  python-level loop over TEXT positions (max length in the batch), per-pair
  activity masks for ragged lengths.
- the SHORTER string of each pair is the pattern (distance is symmetric),
  so the fast path covers every pair whose shorter side is ≤ 64 code
  points; longer pairs fall back to a per-pair two-row DP (exact, rare —
  normalized entity names are tens of characters).
- unicode: Python iterates code points exactly like Spark's
  UTF8String.levenshteinDistance; astral plane included (ord ≤ 0x10FFFF).

Exactness is pinned by tests/test_lev_kernel.py against F.levenshtein on
randomized ascii/unicode/empty/ragged inputs, and by the oracle parity of
every query that uses it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _lev_classic(a: str, b: str) -> int:
    """Two-row DP fallback (pairs whose shorter side exceeds 64 cps)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def lev_batch(a_strs, b_strs) -> np.ndarray:
    """Exact Levenshtein distances for parallel lists of non-null strings."""
    n = len(a_strs)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    # pattern = shorter side; text = longer side
    pats, txts = [], []
    for a, b in zip(a_strs, b_strs):
        if len(a) <= len(b):
            pats.append(a)
            txts.append(b)
        else:
            pats.append(b)
            txts.append(a)
    m = np.fromiter((len(p) for p in pats), dtype=np.int64, count=n)
    tl = np.fromiter((len(t) for t in txts), dtype=np.int64, count=n)

    slow = m > 64
    if slow.any():
        for i in np.nonzero(slow)[0]:
            out[i] = _lev_classic(pats[i], txts[i])
    fast = ~slow
    # empty pattern → distance = text length (loop body never fires for
    # these because score starts at m=0 and Eq rows are all-zero, so handle
    # directly for clarity)
    empty = fast & (m == 0)
    out[empty] = tl[empty]
    run = fast & (m > 0)
    if not run.any():
        return out
    idx = np.nonzero(run)[0]
    k = len(idx)
    mi = m[idx]
    tli = tl[idx]
    max_t = int(tli.max()) if k else 0

    # per-batch alphabet over PATTERN code points (+ sentinel miss column 0)
    pat_codes = [np.fromiter(map(ord, pats[i]), dtype=np.int64) for i in idx]
    all_codes = np.concatenate(pat_codes) if k else np.empty(0, dtype=np.int64)
    alphabet = np.unique(all_codes)
    n_alpha = len(alphabet)
    Eq = np.zeros((k, n_alpha + 1), dtype=np.uint64)  # col 0 = miss
    pair_rep = np.repeat(np.arange(k), mi)
    pos_in_pat = np.concatenate([np.arange(len(c)) for c in pat_codes])
    a_idx = np.searchsorted(alphabet, all_codes) + 1
    np.bitwise_or.at(
        Eq, (pair_rep, a_idx), np.left_shift(np.uint64(1), pos_in_pat.astype(np.uint64))
    )

    # text code → alphabet column (0 when absent from the pair's pattern
    # alphabet — a miss only means Eq bits are 0 for that step, which is
    # exactly the algorithm's "no match" case)
    t_col = np.zeros((k, max_t), dtype=np.int64)
    for r, i in enumerate(idx):
        tc = np.fromiter(map(ord, txts[i]), dtype=np.int64)
        if len(tc):
            ins = np.searchsorted(alphabet, tc)
            ins_cl = np.minimum(ins, n_alpha - 1) if n_alpha else np.zeros_like(ins)
            hit = n_alpha > 0
            match = alphabet[ins_cl] == tc if hit else np.zeros(len(tc), bool)
            t_col[r, : len(tc)] = np.where(match, ins_cl + 1, 0)

    one = np.uint64(1)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    Pv = np.full(k, full, dtype=np.uint64)
    Mv = np.zeros(k, dtype=np.uint64)
    score = mi.copy()
    hibit = np.left_shift(one, (mi - 1).astype(np.uint64))
    rows = np.arange(k)
    for j in range(max_t):
        active = j < tli
        eq = Eq[rows, t_col[:, j]]
        Xv = eq | Mv
        Xh = (((eq & Pv) + Pv) ^ Pv) | eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        score = np.where(active & ((Ph & hibit) != 0), score + 1, score)
        score = np.where(active & ((Mh & hibit) != 0), score - 1, score)
        Ph = (Ph << one) | one
        Mh = Mh << one
        nPv = Mh | ~(Xv | Ph)
        nMv = Ph & Xv
        Pv = np.where(active, nPv, Pv)
        Mv = np.where(active, nMv, Mv)
    out[idx] = score
    return out


@pandas_udf(IntegerType())
def lev_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched exact Levenshtein; NULL in → NULL out (F.levenshtein
    semantics). Consumers use `lev_dist_udf_nd` (below): threshold filters
    over UDF-derived scores get pushed below the projection and DUPLICATE
    the Python evaluation (two ArrowEvalPython nodes — observed on
    match_multi_scorer/unify_entities; guide §4.4); the nondeterministic
    marking forbids the optimizer from copying the call. Values are of
    course deterministic — the marking only constrains plan rewrites."""
    av = a.to_numpy()
    bv = b.to_numpy()
    ok = np.fromiter(
        (x is not None and y is not None for x, y in zip(av, bv)),
        dtype=bool,
        count=len(av),
    )
    if ok.all():
        return pd.Series(lev_batch(list(av), list(bv)), dtype="int64").astype("int32")
    out = np.zeros(len(av), dtype=np.int64)
    if ok.any():
        ai = [x for x, o in zip(av, ok) if o]
        bi = [x for x, o in zip(bv, ok) if o]
        out[ok] = lev_batch(ai, bi)
    res = pd.Series(out, dtype=object)
    res[~ok] = None
    return res


#: the variant every scorer path uses — see lev_dist_udf's docstring
lev_dist_udf_nd = lev_dist_udf.asNondeterministic()


def _selfcheck(spark=None):
    """Correctness pins that used to live in tests/test_lev_kernel.py."""
    import random
    random.seed(13)
    uni = "aéλ𝔘 bc"
    cases = [("", ""), ("", "abc"), ("abc", ""), ("a", "a")]
    for _ in range(400):
        cases.append(("".join(random.choice(uni) for _ in range(random.randint(0, 70))),
                      "".join(random.choice(uni) for _ in range(random.randint(0, 70)))))
    for _ in range(20):
        cases.append(("".join(random.choice("abcde") for _ in range(random.randint(65, 120))),
                      "".join(random.choice("abcde") for _ in range(random.randint(65, 120)))))
    got = lev_batch([c[0] for c in cases], [c[1] for c in cases])
    assert all(got[i] == _lev_classic(x, y) for i, (x, y) in enumerate(cases))
    print(f"kernel == classic DP on {len(cases)} cases")
    if spark is not None:
        from pyspark.sql import functions as F
        rows = [(i, "".join(random.choice(uni) for _ in range(random.randint(0, 80))),
                 "".join(random.choice(uni) for _ in range(random.randint(0, 80))))
                for i in range(300)]
        df = spark.createDataFrame(rows, "id long, a string, b string").select(
            F.levenshtein("a", "b").alias("jvm"), lev_dist_udf_nd("a", "b").alias("arrow"))
        assert all(r["jvm"] == r["arrow"] for r in df.collect())
        print("kernel == F.levenshtein on 300 Spark rows")


if __name__ == "__main__":
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    _selfcheck()
