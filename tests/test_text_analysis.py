

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
