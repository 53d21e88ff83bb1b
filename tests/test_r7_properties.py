"""Property tests for the round-7 primitives: the type-widening
matrix (order-theoretic sanity) and the Hilbert curve (bijectivity +
locality on random subgrids).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mirror_lake_kusto_spark.sources.delta_log import is_type_widening
from mirror_lake_kusto_spark.sources.skipping import hilbert_index

_PRIMS = [
    "byte",
    "short",
    "integer",
    "long",
    "float",
    "double",
    "date",
    "timestamp_ntz",
    "string",
    "boolean",
    "decimal(5,2)",
    "decimal(10,0)",
    "decimal(10,2)",
    "decimal(14,4)",
    "decimal(20,0)",
    "decimal(22,2)",
    "decimal(38,10)",
]


@given(st.sampled_from(_PRIMS))
def test_widening_is_irreflexive(t):
    assert not is_type_widening(t, t)


@given(st.sampled_from(_PRIMS), st.sampled_from(_PRIMS))
def test_widening_is_asymmetric(a, b):
    """A lossless widening can never run both ways: a<->b round trips
    would imply the types are equivalent, and equal types are no-ops
    handled by callers."""
    assert not (is_type_widening(a, b) and is_type_widening(b, a))


@given(
    st.sampled_from(_PRIMS), st.sampled_from(_PRIMS), st.sampled_from(_PRIMS)
)
def test_widening_is_transitive(a, b, c):
    """If a->b and b->c are each lossless, a->c must be accepted too —
    otherwise a twice-widened source strands a mirror that only saw
    the endpoints (recorded schema a, latest schema c)."""
    if is_type_widening(a, b) and is_type_widening(b, c):
        assert is_type_widening(a, c), (a, b, c)


@given(
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_hilbert_injective_on_random_subsets(n, bits, seed):
    """Random coordinate sets map to DISTINCT indices in range (the
    full-grid exhaustive check lives in test_r7_clustering; this covers
    the dim/bits combinations the exhaustive test can't afford)."""
    rng = np.random.default_rng(seed)
    side = 1 << bits
    m = int(min(side**n, 64))
    pts = set()
    while len(pts) < m:
        pts.add(tuple(int(v) for v in rng.integers(0, side, size=n)))
    coords = np.array(sorted(pts), dtype=np.uint64).T.copy()
    idx = hilbert_index(coords, bits)
    assert len(set(idx.tolist())) == m
    assert int(idx.min()) >= 0 and int(idx.max()) < side**n


def test_hilbert_blocks_are_compact_in_every_dimension():
    """WHY the curve layout skips: split the curve into contiguous
    index blocks ("files") — each block's bounding box must be tight
    on EVERY dimension at once, where row-major order gives full-width
    strips (tight on one dimension, spanning the other end to end)."""
    bits, side, block = 5, 32, 64
    g = (
        np.stack(np.meshgrid(np.arange(side), np.arange(side), indexing="ij"))
        .reshape(2, -1)
        .astype(np.uint64)
    )
    order = np.argsort(hilbert_index(g, bits))
    pts = g[:, order].astype(np.int64)

    def mean_max_extent(p):
        exts = []
        for s in range(0, p.shape[1], block):
            blk = p[:, s : s + block]
            exts.append(max(blk[d].max() - blk[d].min() + 1 for d in range(2)))
        return float(np.mean(exts))

    hil = mean_max_extent(pts)
    row = mean_max_extent(g.astype(np.int64))  # row-major order
    # a 64-cell Hilbert block is ~an 8x8 square; a row-major block is a
    # 2x32 strip — max-extent 8 vs 32
    assert hil <= 10.0, hil
    assert hil < 0.5 * row, (hil, row)
