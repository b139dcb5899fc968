

def test_pii_signals_counts():
    import pyarrow as pa

    from splunk_otel_collector_ray.stages.text_analysis import pii_signals

    t = pa.table({"text": [
        "mail a@b.co and c.d+x@e.org now",
        "from 10.0.0.1 to 192.168.1.255",
        "call 555-123-4567 or 555.987.6543",
        "nothing here",
    ]})
    out = pii_signals(t).to_pandas()
    assert list(out["n_emails"]) == [2, 0, 0, 0]
    assert list(out["n_ipv4"]) == [0, 2, 0, 0]
    assert list(out["n_phones"]) == [0, 0, 2, 0]
    assert list(out["has_pii"]) == [True, True, True, False]


def test_tfidf_top_terms(ray_session):
    import math

    import pandas as pd
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat cat dog", "dog fish", "fish fish fish bird"],
    })
    out = tfidf_top_terms(ray.data.from_pandas(docs), k=2).to_pandas()
    got = {(r.doc_id, r.token): (r.tf, r.score) for r in out.itertuples()}
    # doc 1: cat tf=2 df=1 → 2·ln3 beats dog tf=1 df=2 → ln(3/2)
    assert got[(1, "cat")][0] == 2
    assert math.isclose(got[(1, "cat")][1], 2 * math.log(3))
    assert math.isclose(got[(1, "dog")][1], math.log(3 / 2))
    # doc 3: fish tf=3 df=2 → 3·ln(3/2) vs bird tf=1 df=1 → ln3
    assert math.isclose(got[(3, "fish")][1], 3 * math.log(3 / 2))
    assert got[(3, "bird")][0] == 1
    assert len(out) == 6  # k=2 per doc


def test_inverted_index(ray_session):
    import pandas as pd
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import inverted_index

    docs = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["cat dog cat", "dog bird", "dog cat"],
    })
    out = inverted_index(ray.data.from_pandas(docs),
                         min_df=2).to_pandas()
    got = {r.token: (r.df, r.postings) for r in out.itertuples()}
    # cat appears in docs 2,3 (twice in 3 counts once); bird df=1 pruned
    assert got["cat"] == (2, "2,3")
    assert got["dog"] == (3, "1,2,3")
    assert "bird" not in got
