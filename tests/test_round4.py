"""Round-4 additions: TF-IDF big-vocab shuffle path parity."""

import numpy as np
import pandas as pd
import pytest


def _collect(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df.sort_values(["doc_id", "rank"])
            .reset_index(drop=True)[["doc_id", "rank", "term",
                                     "tf", "df", "score"]])


def test_tfidf_shuffle_path_matches_broadcast(ray_session, sf_dir):
    """The co-partitioned big-vocab path (broadcast_vocab_max=0) must be
    row-for-row and bit-for-bit identical to the broadcast path that the
    DuckDB oracle verifies."""
    import ray
    from shapefile_rs_ray.stages.tfidf import tfidf_top_terms

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    bc = _collect(tfidf_top_terms(docs, k=3))
    sh = _collect(tfidf_top_terms(docs, k=3, broadcast_vocab_max=0))
    assert len(bc) == len(sh) and len(bc) > 0
    pd.testing.assert_frame_equal(bc, sh)
    # scores are the exact rational tf/df in both paths
    assert np.array_equal(bc["score"].to_numpy(),
                          bc["tf"].to_numpy() / bc["df"].to_numpy())


def test_tfidf_empty_and_tokenless_docs(ray_session):
    """Docs with no [a-z0-9] token vanish from the result; others rank by
    (score desc, term asc)."""
    import ray
    from shapefile_rs_ray.stages.tfidf import tfidf_top_terms

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "alpha beta beta"},
        {"doc_id": 2, "text": "!!! ???"},
        {"doc_id": 3, "text": "beta gamma"},
    ])
    for kw in ({}, {"broadcast_vocab_max": 0}):
        out = tfidf_top_terms(docs, k=2, **kw).to_pandas()
        out = out.sort_values(["doc_id", "rank"]).reset_index(drop=True)
        assert set(out["doc_id"]) == {1, 3}
        d1 = out[out["doc_id"] == 1]
        # beta: tf=2 df=2 -> 1.0 ; alpha: tf=1 df=1 -> 1.0 ; tie -> term asc
        assert list(d1["term"]) == ["alpha", "beta"]
        d3 = out[out["doc_id"] == 3]
        # gamma: tf=1 df=1 -> 1.0 beats beta: tf=1 df=2 -> 0.5
        assert list(d3["term"]) == ["gamma", "beta"]
