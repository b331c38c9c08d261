"""Hypothesis fuzz: the vectorized n-gram kernels vs the naive Python spec
over adversarial text (unicode whitespace, empties, nulls, repeats)."""

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_filter_timestamp_format_ray.stages.ngrams import (
    repetition_stats_batch,
    word_ngram_hashes,
)

# tokens that stress boundaries: repeats, unicode, punctuation-ish
_token = st.sampled_from(["a", "bb", "ccc", "a", "Ω", "x.y", "--", "0"])
_doc = st.one_of(
    st.none(),
    st.lists(_token, max_size=12).map(" ".join),
    st.just(""),
    st.just("   "),
    st.just("\ta b\t"),
)


def _naive_grams(t, k):
    ws = (t or "").split()
    return [tuple(ws[i:i + k]) for i in range(max(len(ws) - k + 1, 0))]


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=20), st.integers(1, 6))
def test_gram_structure_matches_split_spec(docs, k):
    arr = pa.array(docs, pa.string())
    gh, ng, doc_of_g = word_ngram_hashes(arr, k)
    naive = [_naive_grams(t, k) for t in docs]
    assert ng.tolist() == [len(g) for g in naive]
    # hash-equality classes == gram-tuple equality classes
    flat = [g for gs in naive for g in gs]
    assert len(flat) == len(gh)
    cls = {}
    for h, g in zip(gh.tolist(), flat):
        assert cls.setdefault(g, h) == h


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=20))
def test_repetition_stats_matches_counter_spec(docs):
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    out = repetition_stats_batch(batch).to_pandas()
    for i, t in enumerate(docs):
        g2, g5 = _naive_grams(t, 2), _naive_grams(t, 5)
        c2, c5 = Counter(g2), Counter(g5)
        top2 = (max(c2.values()) * 1000) // len(g2) if g2 else 0
        dup5 = (sum(v for v in c5.values() if v > 1) * 1000) // len(g5) \
            if g5 else 0
        row = out.iloc[i]
        assert (row["n_grams_2"], row["top2_x1000"]) == (len(g2), top2)
        assert (row["n_grams_5"], row["dup5_x1000"]) == (len(g5), dup5)
