"""Codec round-trip property tests (FIXTURES.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import (
    bm25_stf, build_blocks, decode_block, decode_gaps, encode_gaps,
    vb_decode, vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    assert vb_decode(vb_encode(values)).tolist() == values


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=400)
)
@settings(max_examples=100, deadline=None)
def test_gap_roundtrip(gaps):
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    assert decode_gaps(encode_gaps(doc_ids)).tolist() == doc_ids.tolist()


def test_empty():
    assert vb_decode(b"").tolist() == []
    assert encode_gaps(np.array([], dtype=np.int64)) == b""


@given(
    st.integers(min_value=1, max_value=500),  # n postings
    st.integers(min_value=1, max_value=64),   # block size
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_block_roundtrip_and_maxscore_bound(n, block_size, seed):
    rng = np.random.default_rng(seed)
    doc_ids = np.cumsum(rng.geometric(0.01, size=n).astype(np.int64))
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    doc_lens = rng.integers(10, 5000, size=n).astype(np.int64)
    avgdl, k1, b = 800.0, 1.2, 0.75

    blocks = list(build_blocks(doc_ids, tfs, doc_lens, avgdl, k1, b, block_size))
    got_docs, got_tfs, got_dls = [], [], []
    for seq, cnt, mn, mx, max_tf, max_stf, gaps, tfb, dlb in blocks:
        d, t, dl = decode_block(gaps, tfb, dlb)
        assert len(d) == cnt == len(t) == len(dl)
        assert d[0] == mn and d[-1] == mx
        assert t.max() <= max_tf
        stf = bm25_stf(t, dl, avgdl, k1, b)
        # block-max bound is exact: >= every contained score factor
        assert (stf <= max_stf + 1e-12).all()
        got_docs.extend(d.tolist())
        got_tfs.extend(t.tolist())
        got_dls.extend(dl.tolist())
    assert got_docs == doc_ids.tolist()
    assert got_tfs == tfs.tolist()
    assert got_dls == doc_lens.tolist()
