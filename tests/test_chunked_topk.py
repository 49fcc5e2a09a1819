"""Round 11: `_chunked_pair_topk` replaced the full-gram argpartition in
the knn block-pair workers (the full n_a×n_b gram plus its same-shape
argpartition temps were ~2 GB of fresh RSS per worker — measured
~300 s of page-fault time per pass on this rig; BASELINE.md round-11).
These tests pin the rewrite's contract: for every group shape, the
returned candidate pairs carry the SAME top-``keep`` score multisets
per row as the full-gram reference, in both directions, including the
diagonal self-exclusion — so the downstream exact-rescore + global
re-rank sees an identical candidate universe and the operator outputs
stay bit-identical (oracle hash parity re-proven at sf0.001/sf0.01
when the rewrite landed)."""

from collections import defaultdict

import numpy as np
import pytest

from quantum_rag_data_pipeline_spark.operators.similarity import (
    _chunked_pair_topk,
)


def _ref_rows(S: np.ndarray, keep: int) -> set:
    kk = min(keep, S.shape[1])
    out = set()
    if kk <= 0:
        return out
    idx = np.argpartition(S, S.shape[1] - kk, axis=1)[:, -kk:]
    for i in range(S.shape[0]):
        for j in idx[i]:
            out.add((i, int(j)))
    return out


def _score_multisets_equal(ref: set, got: set, M: np.ndarray) -> bool:
    """Ties may resolve to different column ids; compare per-row KEPT
    SCORE multisets, which is what bounds the candidate universe."""
    rs, gs = defaultdict(list), defaultdict(list)
    for i, j in ref:
        rs[i].append(round(float(M[i, j]), 12))
    for i, j in got:
        gs[i].append(round(float(M[i, j]), 12))
    return all(sorted(rs[i]) == sorted(gs[i]) for i in set(rs) | set(gs))


@pytest.mark.parametrize(
    "n_a,n_b,keep,chunk",
    [
        (300, 200, 13, 64),   # multi-chunk, uneven tail
        (50, 500, 13, 64),    # single chunk, wide B
        (10, 5, 13, 4),       # keep > n_b (keeps everything)
        (257, 257, 7, 64),    # prime sizes, chunk misaligned
        (5, 5, 13, 2),        # keep > both sides
        (1, 1, 13, 1),        # singleton blocks
        (128, 64, 1, 32),     # keep=1
    ],
)
def test_cross_and_diagonal_match_full_gram(n_a, n_b, keep, chunk):
    rng = np.random.default_rng(42 + n_a + n_b)
    A = rng.standard_normal((n_a, 16))
    B = rng.standard_normal((n_b, 16))
    An = A / np.linalg.norm(A, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)

    S = An @ Bn.T
    i1, j1, i2, j2 = _chunked_pair_topk(An, Bn, keep, diagonal=False,
                                        chunk=chunk)
    got_a = set(zip(i1.tolist(), j1.tolist()))
    got_b = set(zip(i2.tolist(), j2.tolist()))
    assert _score_multisets_equal(_ref_rows(S, keep), got_a, S)
    assert _score_multisets_equal(_ref_rows(S.T, keep), got_b, S.T)

    Sd = An @ An.T
    np.fill_diagonal(Sd, -np.inf)
    ref_d = _ref_rows(Sd, min(keep, n_a - 1)) if n_a > 1 else set()
    ii, jj = _chunked_pair_topk(An, An, keep, diagonal=True, chunk=chunk)
    got_d = set(zip(ii.tolist(), jj.tolist()))
    assert _score_multisets_equal(ref_d, got_d, Sd)
    # the diagonal path must never emit a self pair
    assert all(i != j for i, j in got_d)


def test_duplicate_ties_keep_exact_count():
    """All-identical vectors: every score ties at 1.0 — each row must
    still keep exactly min(keep, n-1) (diagonal) / min(keep, n_b)
    (cross) candidates, no more, no fewer."""
    v = np.ones((20, 8))
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    ii, jj = _chunked_pair_topk(vn, vn, 5, diagonal=True, chunk=6)
    per_row = defaultdict(int)
    for i in ii.tolist():
        per_row[i] += 1
    assert all(c == 5 for c in per_row.values()) and len(per_row) == 20
    i1, j1, i2, j2 = _chunked_pair_topk(vn[:7], vn, 5, diagonal=False,
                                        chunk=3)
    assert len(i1) == 7 * 5 and len(i2) == 20 * 5
