"""Near-dup pipeline end-to-end + ANN (brute-force vs LSH) on real testdata."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_flat_token_hashes_equals_per_doc_reference():
    from splunk_otel_collector_ray.stages.dedup import MERSENNE, _token_hashes

    docs = pd.Series(["hello world, hello", "tiny", "", "abcd",
                      "the quick brown fox " * 3, None])
    got = _token_hashes(docs, 5)

    # naive per-doc recomputation (the pre-r2 implementation)
    exp = []
    for s in docs.fillna(""):
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < 5:
            exp.append(np.array([0], dtype=np.uint64))
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, 5).astype(np.uint64)
        coef = (np.uint64(257) ** np.arange(5, dtype=np.uint64)) \
            % np.uint64(MERSENNE)
        exp.append(np.unique((win * coef).sum(axis=1) % np.uint64(MERSENNE)))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g, e)


def test_minhash_signatures_equal_per_doc_path():
    from splunk_otel_collector_ray.stages.dedup import (
        MinHasher,
        _flat_token_hashes,
        _token_hashes,
    )

    docs = pd.Series(["the quick brown fox " * 4, "tiny", "",
                      "another document with words " * 6])
    mh = MinHasher()
    flat, offsets = _flat_token_hashes(docs, mh.shingle)
    got = mh.signatures(flat, offsets)
    exp = np.stack([mh.signature(h) for h in _token_hashes(docs, mh.shingle)])
    assert np.array_equal(got, exp)


def test_neardup_pairs_finds_planted_dups(ray_session):
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import neardup_pairs

    base = "the quick brown fox jumps over the lazy dog and runs away " * 8
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [base, base.replace("lazy", "sleepy"),
                 "a completely different document about ray data engines " * 8,
                 "yet another unrelated text with its own vocabulary " * 8],
    })
    out = neardup_pairs(ray.data.from_arrow(docs), jaccard_threshold=0.5)
    assert list(map(tuple, out.to_numpy())) == [(1, 2)]


def test_duplicate_clusters_transitive_chain(ray_session):
    """A chain a~b, b~c (a never directly paired with c) must collapse into
    ONE cluster labeled by the min doc id; unrelated docs stay singletons."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import duplicate_clusters

    base = "the quick brown fox jumps over the lazy dog and runs away " * 8
    mid = base.replace("lazy", "sleepy").replace("quick", "rapid")
    far = mid.replace("brown", "black").replace("dog", "cat")
    docs = pa.table({
        "doc_id": pa.array([10, 20, 30, 40], type=pa.int64()),
        "text": [base, mid, far,
                 "a completely different document about ray data engines " * 8],
    })
    out = (duplicate_clusters(ray.data.from_arrow(docs),
                              jaccard_threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got[10] == got[20] == got[30] == 10  # chain merges, min-id label
    assert got[40] == 40

    # sanity: the chain really is a chain at this threshold
    from splunk_otel_collector_ray.stages.dedup import ngram_jaccard
    assert ngram_jaccard(base, far) < 0.5 <= min(
        ngram_jaccard(base, mid), ngram_jaccard(mid, far))

    # all-singleton input: the empty pair graph must not crash the labeler
    solo = duplicate_clusters(
        ray.data.from_arrow(docs), jaccard_threshold=0.99).to_pandas()
    assert (solo["cluster_id"] == solo["doc_id"]).all()


def test_distributed_cc_equals_union_find(ray_session):
    """BSP min-label propagation (the scale path) must produce the exact
    union-find labeling — including on a long CHAIN (worst-case diameter,
    many propagation rounds) and with an empty pair graph."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import (
        cluster_from_pairs,
        cluster_from_pairs_distributed,
    )

    def canon(out):
        return (out.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    rng = np.random.default_rng(17)
    ids = np.arange(200, dtype=np.int64)
    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    # random sparse graph + a 13-node chain (diameter 12 → multiple
    # propagation rounds; label sum certifies the fixpoint) + a star
    a = rng.integers(0, 120, 60)
    b = rng.integers(0, 120, 60)
    chain_a = np.arange(120, 132)
    chain_b = np.arange(121, 133)
    star_a = np.full(20, 150)
    star_b = np.arange(151, 171)
    pairs = pd.DataFrame({
        "doc_a": np.concatenate([a, chain_a, star_a]),
        "doc_b": np.concatenate([b, chain_b, star_b]),
    }).query("doc_a != doc_b").astype("int64")

    ref = canon(cluster_from_pairs(docs, pairs, "doc_id"))
    got = canon(cluster_from_pairs_distributed(docs, pairs, "doc_id"))
    pd.testing.assert_frame_equal(got, ref)

    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})
    got0 = canon(cluster_from_pairs_distributed(docs, empty, "doc_id"))
    assert (got0["cluster_id"] == got0["doc_id"]).all()

    # exhausting max_iters must raise, never return split components
    import pytest

    chain = pd.DataFrame({"doc_a": chain_a, "doc_b": chain_b}).astype(
        "int64")
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_from_pairs_distributed(docs, chain, "doc_id", max_iters=2)


def test_duplicate_clusters_distributed_path(ray_session, sf_dir):
    """distributed=True end-to-end equals the driver union-find path on the
    documents fixture."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import duplicate_clusters

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def canon(out):
        return (out.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    ref = canon(duplicate_clusters(ds, jaccard_threshold=0.8))
    got = canon(duplicate_clusters(ds, jaccard_threshold=0.8,
                                   distributed=True))
    pd.testing.assert_frame_equal(got, ref)


def test_simhash_neardup_matches_bruteforce(ray_session, sf_dir):
    """Banded blocking + popcount verify must equal the exact O(N^2)
    driver-side sweep (pigeonhole recall guarantee, ham<=3 with 4 bands)."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import (
        simhash64,
        simhash_neardup_pairs,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    sig = simhash64(docs["text"])
    ids = docs["doc_id"].to_numpy()
    x = sig[:, None] ^ sig[None, :]
    ham = np.unpackbits(
        x.astype(">u8").view(np.uint8).reshape(len(ids), len(ids), 8),
        axis=2).sum(axis=2)
    i, j = np.nonzero(np.triu(ham <= 3, k=1))
    a, b = np.minimum(ids[i], ids[j]), np.maximum(ids[i], ids[j])
    exp = sorted(zip(a.tolist(), b.tolist()))

    ds = ray.data.from_pandas(docs)
    got = (simhash_neardup_pairs(ds, max_hamming=3).to_pandas()
           .sort_values(["doc_a", "doc_b"]))
    assert list(map(tuple, got.to_numpy())) == exp
    assert len(exp) > 0  # the corpus actually contains near-dups


def test_simhash_neardup_planted(ray_session):
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import simhash_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog and runs away " * 20
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": [base, base.replace("lazy dog", "lazy d0g"),
                 "completely different content about streaming executors "
                 "and arrow batches with no shared phrasing at all " * 20],
    })
    out = simhash_neardup_pairs(
        ray.data.from_arrow(docs), max_hamming=3).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [(1, 2)]


def test_neardup_pairs_on_documents_table(ray_session, sf_dir):
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import neardup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = neardup_pairs(ds, jaccard_threshold=0.8)
    # deterministic on the fixed corpus; verified pairs are symmetric-free
    assert (out.doc_a < out.doc_b).all()
    out2 = neardup_pairs(ds, jaccard_threshold=0.8)
    assert out.equals(out2)


def test_neardup_pairs_matches_driver_side_reference(ray_session, sf_dir):
    """Distributed join+verify must equal a driver-side recomputation of the
    same candidates (the pre-r2 implementation's shape)."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import (
        MinHasher,
        _token_hashes,
        neardup_pairs,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    got = neardup_pairs(ds, jaccard_threshold=0.8)

    # reference: same MinHash bands, candidates + verify in plain pandas
    docs = ds.to_pandas()
    bands = MinHasher()(pa.Table.from_pandas(docs, preserve_index=False))
    bdf = bands.to_pandas()
    cand = set()
    for _, g in bdf.groupby(["band", "band_hash"]):
        ids = np.sort(g["doc_id"].unique())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    hashes = dict(zip(docs["doc_id"], _token_hashes(docs["text"])))
    exp = []
    for a, b in sorted(cand):
        ha, hb = hashes[a], hashes[b]
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        union = ha.size + hb.size - inter
        if (inter / union if union else 1.0) >= 0.8:
            exp.append((a, b))
    assert list(map(tuple, got.to_numpy())) == exp


def test_lsh_topk_recall_vs_bruteforce(ray_session, sf_dir):
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import ann_topk, lsh_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = ann_topk(ds, qids, k=10)
    approx = lsh_topk(ds, qids, k=10, nbits=4)
    # LSH restricted to one bucket (~1/16 of rows at nbits=4) must still
    # recover a reasonable share of the true top-10
    hits = 0
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(e & a)
    recall = hits / (10 * len(qids))
    assert recall >= 0.2, recall
    # every approx hit's sim must match the exact computation for that pair
    merged = approx.merge(exact, on=["query_id", "vec_id"], how="inner",
                          suffixes=("_a", "_e"))
    assert np.allclose(merged.sim_a, merged.sim_e, atol=1e-6)


def test_ivf_topk_recall_vs_bruteforce(ray_session, sf_dir):
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import ann_topk, ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = ann_topk(ds, qids, k=10)
    approx = ivf_topk(ds, qids, k=10, nlist=16, nprobe=4)
    hits = 0
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(e & a)
    recall = hits / (10 * len(qids))
    # scanning ~nprobe/nlist = 25% of the data must beat the random baseline
    assert recall >= 0.3, recall
    merged = approx.merge(exact, on=["query_id", "vec_id"], how="inner",
                          suffixes=("_a", "_e"))
    assert np.allclose(merged.sim_a, merged.sim_e, atol=1e-6)
    # deterministic end to end (seeded k-means, fixed sample)
    assert approx.equals(ivf_topk(ds, qids, k=10, nlist=16, nprobe=4))


def _exact_pairs_reference(ds, threshold):
    """Driver-side all-pairs reference (small N only — the testing oracle
    the distributed block-pair sweep is checked against)."""
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    m = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    r, c = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
    return (pd.DataFrame({"id_a": ids[r], "id_b": ids[c], "sim": sims[r, c]})
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def test_embedding_neardup_block_sweep_equals_reference(ray_session, sf_dir):
    """r2 VERDICT fix: the exact path tiles block pairs across Ray tasks —
    identical output to driver-side all-pairs, including across-block pairs
    (num_blocks=4 forces cross-block tiles even at small N)."""
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import (
        embedding_neardup_pairs,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    ref = _exact_pairs_reference(ds, 0.45)
    for nb in (1, 4):
        got = embedding_neardup_pairs(
            ds, threshold=0.45, num_blocks=nb).to_pandas()
        pd.testing.assert_frame_equal(got, ref)


def test_embedding_neardup_lsh_precision_and_recall(ray_session, sf_dir):
    """Banded-LSH variant: every emitted pair is exact-verified (precision
    1); recall high at the default band/bit settings on the fixture."""
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import (
        embedding_neardup_pairs_lsh,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    ref = _exact_pairs_reference(ds, 0.45)
    got = embedding_neardup_pairs_lsh(ds, threshold=0.45)
    mer = got.merge(ref[["id_a", "id_b"]], on=["id_a", "id_b"],
                    how="left", indicator=True)
    assert (mer["_merge"] == "both").all()          # precision == 1
    assert len(got) >= 0.8 * len(ref)               # recall bound


def test_embedding_neardup_more_blocks_than_rows(ray_session):
    """review fix: empty tiles from repartition(num_blocks > N) must be
    skipped, not crash np.stack."""
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import (
        embedding_neardup_pairs,
    )

    t = pa.table({
        "vec_id": pa.array([0, 1], type=pa.int64()),
        "embedding": [[1.0, 0.0], [0.9, 0.1]],
    })
    out = embedding_neardup_pairs(ray.data.from_arrow(t), threshold=0.9,
                                  num_blocks=4).to_pandas()
    assert out[["id_a", "id_b"]].values.tolist() == [[0, 1]]


def test_hash_split_deterministic_and_validated(ray_session):
    import ray.data

    from splunk_otel_collector_ray.stages.sample import hash_split

    docs = pa.table({"doc_id": pa.array(range(1000), type=pa.int64())})
    out = hash_split(ray.data.from_arrow(docs), "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.85 < frac["train"] < 0.95  # weights roughly honored
    # pure function of the id: shuffled input gives identical assignment
    out2 = hash_split(
        ray.data.from_arrow(docs).random_shuffle(seed=7),
        "doc_id").to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("", "_b"))
    assert (merged["split"] == merged["split_b"]).all()

    with pytest.raises(ValueError):
        hash_split(ray.data.from_arrow(docs), "doc_id",
                   splits=[("a", 1), ("b", 2)])


def test_mixture_sample_rates_and_determinism(ray_session):
    import ray.data

    from splunk_otel_collector_ray.stages.sample import mixture_sample

    docs = pa.table({
        "doc_id": pa.array(range(4000), type=pa.int64()),
        "source": pa.array((["a", "b", "c", "d"] * 1000)),
    })
    out = mixture_sample(ray.data.from_arrow(docs), "source", "doc_id",
                         rates={"a": 0.1, "b": 0.5},
                         default_rate=1.0).to_pandas()
    got = out["source"].value_counts()
    assert got["c"] == got["d"] == 1000        # default rate keeps all
    assert 50 <= got["a"] <= 150               # ~10% of 1000
    assert 400 <= got["b"] <= 600              # ~50% of 1000
    out2 = mixture_sample(ray.data.from_arrow(docs), "source", "doc_id",
                          rates={"a": 0.1, "b": 0.5}).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])  # deterministic


def test_samplers_accept_arbitrary_string_ids(ray_session):
    """r3 VERDICT fix: samplers/splits hash the id (string or int), never
    parse a corpus id format — UUID-ish / arbitrary ids must work."""
    import ray.data

    from splunk_otel_collector_ray.stages.sample import (
        conv_probabilistic_sample, hash_split, key_hash_mod, mixture_sample,
        probabilistic_sample)

    ids = [f"uuid-{i:x}-{(i * 7919) % 97:02d}" for i in range(2000)]
    docs = pa.table({
        "doc_id": pa.array(ids, type=pa.string()),
        "source": pa.array((["a", "b"] * 1000)),
        "turn_idx": pa.array([i % 5 for i in range(2000)], type=pa.int64()),
    })

    out = hash_split(ray.data.from_arrow(docs), "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.85 < frac["train"] < 0.95
    out2 = hash_split(ray.data.from_arrow(docs).random_shuffle(seed=3),
                      "doc_id").to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("", "_b"))
    assert (merged["split"] == merged["split_b"]).all()

    mix = mixture_sample(ray.data.from_arrow(docs), "source", "doc_id",
                         rates={"a": 0.2}).to_pandas()
    got = mix["source"].value_counts()
    assert got["b"] == 1000 and 120 <= got["a"] <= 280

    # empty rates dict: everything at the default rate (ADVICE fix)
    all_kept = mixture_sample(ray.data.from_arrow(docs), "source", "doc_id",
                              rates={}).to_pandas()
    assert len(all_kept) == 2000
    none_kept = mixture_sample(ray.data.from_arrow(docs), "source", "doc_id",
                               rates={}, default_rate=0.0).to_pandas()
    assert len(none_kept) == 0

    kept = probabilistic_sample(
        ray.data.from_arrow(docs.rename_columns(
            ["conv_id", "source", "turn_idx"])), 25).to_pandas()
    assert 0.15 < len(kept) / 2000 < 0.35

    conv = conv_probabilistic_sample(
        ray.data.from_arrow(docs.rename_columns(
            ["conv_id", "source", "turn_idx"])), 20).to_pandas()
    # conversation granularity: every id either fully kept or fully dropped
    assert 0.10 < len(conv) / 2000 < 0.30
    # int and string dispatch agree with their documented formulas
    assert (key_hash_mod(pa.array([10], type=pa.int64()), 100)[0]
            == (10 * 2654435761) % 100)
    assert int(key_hash_mod(pa.array(["x"], type=pa.string()), 100)[0]) >= 0


def test_repeated_ngram_stats_planted(ray_session):
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import (
        repeated_ngram_stats,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [shared + " one two three",
                 "x " + shared,
                 "unique words only here nothing shared at all nine ten",
                 "short"],  # < 8 tokens → no grams → no output row
    })
    out = (repeated_ngram_stats(ray.data.from_arrow(docs)).to_pandas()
           .set_index("doc_id").sort_index())
    assert set(out.index) == {1, 2, 3}
    # docs 1+2 share exactly the one 8-gram window "alpha..theta"
    assert out.loc[1, "repeated_grams"] == 1
    assert out.loc[2, "repeated_grams"] == 1
    assert out.loc[3, "repeated_grams"] == 0
    assert out.loc[1, "total_grams"] == 4   # 11 tokens → 4 windows
    assert out.loc[3, "total_grams"] == 3   # 10 tokens → 3 windows


def test_kmeans_distributed_matches_numpy_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import kmeans_distributed

    rng = np.random.default_rng(3)
    k, dim, iters = 4, 8, 5
    centers = rng.standard_normal((k, dim)) * 5
    x = np.concatenate([centers[i] + rng.standard_normal((50, dim))
                        for i in range(k)])
    ids = np.arange(len(x))
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [r.astype(np.float32) for r in x]})
    got = kmeans_distributed(ray.data.from_pandas(df), id_col="vec_id",
                             k=k, iters=iters).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    # pure-numpy Lloyd with the same init (vectors of the k smallest ids,
    # float32 storage round-trip) and the same argmax scoring
    xm = np.stack([r.astype(np.float32) for r in x]).astype(np.float64)
    cent = xm[:k].copy()
    for _ in range(iters):
        sc = xm @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]
        a = sc.argmax(axis=1)
        for j in range(k):
            if (a == j).any():
                cent[j] = xm[a == j].mean(axis=0)
    sc = xm @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]
    expect = sc.argmax(axis=1)
    assert (got["cluster"].to_numpy() == expect).all()


def test_cluster_keep_best_prefers_quality_over_min_id(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from splunk_otel_collector_ray.stages.dedup import cluster_keep_best

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the observer takes careful notes about every motion")
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            base + " !!!! ???? ;;;; ::::",        # 0: dup, heavy punct → low
            base + " with one extra clean word",   # 1: dup, clean → winner
            base + " !!!! ???? ;;;; ....",         # 2: dup, heavy punct → low
            "a completely different document about sailing ships and maps",
            "another standalone text mentioning gardens and quiet rivers",
            "short",
        ],
    })

    def score(t: pa.Table) -> pa.Table:
        from splunk_otel_collector_ray.stages.text_analysis import model_score
        return model_score(t)

    out = cluster_keep_best(
        ray.data.from_arrow(pa.Table.from_pandas(docs)), score,
        jaccard_threshold=0.5).to_pandas().set_index("doc_id").sort_index()
    # docs 0,1,2 form one near-dup cluster labeled by min id 0
    assert set(out.loc[[0, 1, 2], "cluster_id"]) == {0}
    # winner is the highest-logit member (1), NOT the min id (0)
    assert bool(out.loc[1, "keep"]) and not bool(out.loc[0, "keep"]) \
        and not bool(out.loc[2, "keep"])
    # singletons keep themselves
    assert out.loc[[3, 4, 5], "keep"].all()


def test_cluster_keep_best_distributed_path_equals_driver(
        ray_session, sf_dir):
    """Past the pair-count threshold keep-best switches to BSP connected
    components + bucket-folded winner selection (no driver-side pair,
    member or winner frame) — must be row-equal to the broadcast path on
    the documents fixture (the tail_sample path-equality pattern)."""
    import ray.data
    from splunk_otel_collector_ray.stages.dedup import cluster_keep_best
    from splunk_otel_collector_ray.stages.text_analysis import model_score

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def canon(out):
        return (out.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    ref = canon(cluster_keep_best(docs, model_score,
                                  jaccard_threshold=0.8))
    # max_broadcast_pairs=0 forces every pair over the threshold
    got = canon(cluster_keep_best(docs, model_score, jaccard_threshold=0.8,
                                  max_broadcast_pairs=0))
    assert (~ref["keep"]).sum() > 0  # fixture must exercise real clusters
    pd.testing.assert_frame_equal(got, ref)


def test_paragraph_dedup_exact_semantics(ray_session):
    """Hand-built corpus pinning the C4-style line-dedup contract: global
    first-occurrence winner by (doc_id, seg_idx), within-doc repeats drop,
    all-duplicate docs vanish, survivors reassemble in original order."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import paragraph_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "alpha\n\nbeta\n\nalpha",          # within-doc repeat of alpha
            "beta\n\ngamma",                    # beta loses to doc 1
            "alpha\n\nbeta",                    # nothing novel -> vanishes
            "",                                 # empty seg: first occurrence
        ],
    })
    out = (paragraph_dedup(ray.data.from_arrow(docs), sep="\n\n")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["text"].tolist() == ["alpha\n\nbeta", "gamma", ""]
    assert out["n_kept"].tolist() == [2, 1, 1]


def _semdedup_frame(vectors, labels):
    import pyarrow as pa

    flat = [float(x) for v in vectors for x in v]
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(flat, type=pa.float32()), len(vectors[0]))
    return pa.table({
        "vec_id": pa.array(range(len(vectors)), type=pa.int64()),
        "embedding": emb.cast(pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })


def test_semdedup_id_rule_matches_numpy(ray_session):
    """keep iff no smaller-id same-label member with cosine >= t —
    brute-force numpy reference over a random labeled set."""
    import numpy as np
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import semdedup

    rng = np.random.default_rng(5)
    x = rng.normal(size=(80, 8))
    # plant near-dups: copies with small noise
    x[40:60] = x[0:20] + rng.normal(scale=0.01, size=(20, 8))
    labels = (np.arange(80) % 3).astype(np.int32)
    t = _semdedup_frame(x, labels)
    out = (semdedup(ray.data.from_arrow(t), threshold=0.9,
                    cluster_col="label", keep_rule="id")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = u @ u.T
    ref = np.ones(80, dtype=bool)
    for i in range(80):
        for j in range(i):
            if labels[j] == labels[i] and sims[i, j] >= 0.9:
                ref[i] = False
                break
    assert out["vec_id"].tolist() == list(range(80))
    assert out["keep"].tolist() == ref.tolist()
    assert not ref.all() and ref.any()  # planted dups actually fired


def test_semdedup_centroid_rule_keeps_least_prototypical(ray_session):
    """Paper rule: within a duplicate group the survivor is the member
    with the LOWEST cosine to the cluster centroid — a hand-built
    cluster where that differs from the min-id winner."""
    import numpy as np
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import semdedup

    # three near-identical vectors (one dup group) + one far outlier;
    # id 2 is tilted furthest from the centroid -> centroid rule keeps 2,
    # id rule would keep 0
    base = np.array([1.0, 0.0, 0.0, 0.0])
    tilt = np.array([0.9, 0.4359, 0.0, 0.0])  # unit-ish, cos ~ 0.9 to base
    vecs = np.stack([base, base, tilt, np.array([0.0, 0.0, 1.0, 0.0])])
    t = _semdedup_frame(vecs, np.zeros(4, dtype=np.int32))
    out = (semdedup(ray.data.from_arrow(t), threshold=0.85,
                    cluster_col="label", keep_rule="centroid")
           .to_pandas().set_index("vec_id"))
    assert out.loc[3, "keep"]            # outlier untouched
    assert out.loc[2, "keep"]            # least prototypical survivor
    assert not out.loc[0, "keep"] and not out.loc[1, "keep"]
    out_id = (semdedup(ray.data.from_arrow(t), threshold=0.85,
                       cluster_col="label", keep_rule="id")
              .to_pandas().set_index("vec_id"))
    assert out_id.loc[0, "keep"] and not out_id.loc[2, "keep"]


def test_semdedup_kmeans_cluster_source(ray_session):
    """The scale path: kmeans_distributed assignment joined back onto the
    vectors — every id appears exactly once, planted exact copies are
    co-clustered and all but one drop."""
    import numpy as np
    import ray.data

    from splunk_otel_collector_ray.stages.similarity import semdedup

    rng = np.random.default_rng(9)
    centers = rng.normal(scale=5.0, size=(3, 8))
    x = np.vstack([c + rng.normal(scale=0.05, size=(20, 8))
                   for c in centers])
    t = _semdedup_frame(x, np.zeros(60, dtype=np.int32)).drop_columns(
        ["label"])
    out = (semdedup(ray.data.from_arrow(t), threshold=0.999,
                    keep_rule="id", k=3, iters=4)
           .to_pandas().sort_values("vec_id"))
    assert out["vec_id"].tolist() == list(range(60))
    assert set(out.columns) == {"vec_id", "cluster", "keep"}
    assert out["keep"].any()


def test_substring_dedup_exact_semantics(ray_session):
    """Hand-built corpus pinning the ExactSubstr span-dedup contract
    (Lee et al. 2021): dup-covered tokens drop except the window set's
    canonical (global-first) occurrence, short docs have no windows,
    all-duplicate docs vanish, survivors keep original token order."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import substring_dedup

    span = "one two three four five"          # the 5-token duplicated span
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "x " + span + " y",               # canonical occurrence -> kept
            "p q " + span,                    # later occurrence -> span cut
            span,                             # nothing survives -> vanishes
            "one two three",                  # < k tokens: no windows
        ],
    })
    out = (substring_dedup(ray.data.from_arrow(docs), k=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["text"].tolist() == [
        "x " + span + " y", "p q", "one two three"]
    assert out["n_dropped"].tolist() == [0, 5, 0]


def test_substring_dedup_canonical_rescue(ray_session):
    """A token covered by BOTH a canonical and a non-canonical window is
    rescued (the OR-canon rule), and within-doc repeats count as dups."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import substring_dedup

    s = "a b c d e"
    docs = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": [s + " " + s],               # self-duplicate inside one doc
    })
    out = substring_dedup(ray.data.from_arrow(docs), k=5).to_pandas()
    assert out["text"].tolist() == [s]
    assert out["n_dropped"].tolist() == [5]


def test_dsir_weights_known_counts(ray_session):
    """3-doc corpus with hand-computable unigram ratios: target docs score
    higher, ratio = mean of ((ct+1)*1e6)//(cr+1) per token, keep is the
    integer threshold comparison."""
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import (
        dsir_vocab, dsir_weights)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "lang": ["en", "en", "de"],
        "text": ["cat cat dog", "cat dog", "dog dog fish"],
    })
    ds = ray.data.from_arrow(docs)
    vocab = dsir_vocab(ds, target_lang="en")
    assert vocab.set_index("tok")["cr"].to_dict() == {
        "cat": 3, "dog": 4, "fish": 1}
    assert vocab.set_index("tok")["ct"].to_dict() == {
        "cat": 3, "dog": 2, "fish": 0}
    out = (dsir_weights(ds, vocab, keep_threshold=700_000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    w_cat = (4 * 1_000_000) // 4             # 1_000_000
    w_dog = (3 * 1_000_000) // 5             # 600_000
    w_fish = (1 * 1_000_000) // 2            # 500_000
    assert out["dsir_ratio"].tolist() == [
        (2 * w_cat + w_dog) / 3, (w_cat + w_dog) / 2,
        (2 * w_dog + w_fish) / 3]
    assert out["n_toks"].tolist() == [3, 2, 3]
    assert out["keep"].tolist() == [True, True, False]


def _ref_substring_dedup(texts, k):
    """Brute-force pure-Python reference of the ExactSubstr contract."""
    toks = [t.split(" ") for t in texts]
    occ = {}
    for d, tk in enumerate(toks):
        for p in range(len(tk) - k + 1):
            occ.setdefault(tuple(tk[p:p + k]), []).append((d, p))
    cov_dup = [[False] * len(tk) for tk in toks]
    cov_can = [[False] * len(tk) for tk in toks]
    for lst in occ.values():
        if len(lst) < 2:
            continue
        for (d, p) in lst:
            for j in range(p, p + k):
                cov_dup[d][j] = True
        d, p = min(lst)
        for j in range(p, p + k):
            cov_can[d][j] = True
    rows = []
    for d, tk in enumerate(toks):
        kept = [t for j, t in enumerate(tk)
                if not cov_dup[d][j] or cov_can[d][j]]
        nd = sum(1 for j in range(len(tk))
                 if cov_dup[d][j] and not cov_can[d][j])
        if kept:
            rows.append((d, " ".join(kept), nd))
    return sorted(rows)


def test_substring_dedup_matches_bruteforce_random(ray_session):
    """Randomized corpora from a 3-word vocabulary (duplicates dense by
    construction: overlapping windows, within-doc repeats, all-dup docs)
    must match the pure-Python reference exactly."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import substring_dedup

    rng = np.random.default_rng(777)
    vocab = np.array(["a", "bb", "ccc"], dtype=object)
    for trial in range(8):
        n_docs = int(rng.integers(2, 9))
        texts = [" ".join(vocab[rng.integers(0, 3, rng.integers(1, 13))])
                 for _ in range(n_docs)]
        docs = pa.table({
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string())})
        got = (substring_dedup(ray.data.from_arrow(docs), k=3)
               .to_pandas().sort_values("doc_id"))
        got_rows = sorted(zip(got["doc_id"].astype(int),
                              got["text"], got["n_dropped"].astype(int)))
        assert got_rows == _ref_substring_dedup(texts, 3), (trial, texts)


def test_substring_dedup_duplicate_free_and_k_validation(ray_session):
    """A corpus with no repeated windows must pass through untouched (the
    empty dup-hash dataset's to_pandas() has no columns — regression for
    the KeyError guard), and k < 2 is rejected (the gram sentinel is only
    unreachable for k >= 2)."""
    import pytest
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import substring_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["u v w x y", "p q r s t"]})
    out = (substring_dedup(ray.data.from_arrow(docs), k=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == ["u v w x y", "p q r s t"]
    assert out["n_dropped"].tolist() == [0, 0]
    with pytest.raises(ValueError):
        substring_dedup(ray.data.from_arrow(docs), k=1)


def test_dsir_vocab_empty_and_unsorted_vocab(ray_session):
    """dsir_vocab on an empty dataset returns the typed empty frame
    (regression for the zero-column to_pandas guard), and dsir_weights
    re-sorts an unsorted vocab before the searchsorted lookup."""
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import (
        dsir_vocab, dsir_weights)

    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "lang": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string())})
    v = dsir_vocab(ray.data.from_arrow(empty))
    assert list(v.columns) == ["tok", "ct", "cr"] and len(v) == 0

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "lang": ["en", "de"],
        "text": ["cat dog", "dog dog"]})
    ds = ray.data.from_arrow(docs)
    vocab = dsir_vocab(ds, target_lang="en")
    shuffled = vocab.iloc[::-1].reset_index(drop=True)
    a = dsir_weights(ds, vocab).to_pandas().sort_values("doc_id")
    b = dsir_weights(ds, shuffled).to_pandas().sort_values("doc_id")
    assert a["dsir_ratio"].tolist() == b["dsir_ratio"].tolist()


def test_temperature_sample_flattens_by_group(ray_session):
    """Skewed 2-group corpus: the small group keeps everything
    (threshold = modulus), the large group keeps the hash subset under
    floor(modulus*sqrt(n_min/n_s)) — checked against the closed form."""
    import ray.data

    from splunk_otel_collector_ray.stages.sample import temperature_sample

    n_big, n_small = 64, 4
    docs = pa.table({
        "doc_id": pa.array(range(n_big + n_small), type=pa.int64()),
        "source": ["big"] * n_big + ["small"] * n_small})
    out = (temperature_sample(ray.data.from_arrow(docs), modulus=10_000)
           .to_pandas())
    thr_big = int(np.floor(10_000 * np.sqrt(n_small / n_big)))  # 2500
    exp = {i for i in range(n_big)
           if (i * 2654435761) % 10_000 < thr_big} | set(
        range(n_big, n_big + n_small))
    assert set(out["doc_id"]) == exp
    assert (out["source"] == "small").sum() == n_small  # small: kept whole


def test_temperature_sample_alpha_one_keeps_all(ray_session):
    """alpha=1 is the identity temperature (fraction (N_min/N_s)^0 = 1):
    the generic-exponent path must keep every row."""
    import ray.data

    from splunk_otel_collector_ray.stages.sample import temperature_sample

    docs = pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "source": ["big"] * 25 + ["small"] * 5})
    out = temperature_sample(ray.data.from_arrow(docs), alpha=1.0) \
        .to_pandas()
    assert len(out) == 30


def test_dsir_unknown_tokens_score_scale(ray_session):
    """Tokens absent from the vocab take the ct=cr=0 smoothing score
    (= scale), so a fully-unknown doc scores exactly scale."""
    import ray.data

    from splunk_otel_collector_ray.stages.text_analysis import dsir_weights

    vocab = pd.DataFrame({"tok": ["cat"], "ct": [1], "cr": [2]})
    docs = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": ["zebra yak"]})
    out = dsir_weights(ray.data.from_arrow(docs), vocab).to_pandas()
    assert out["dsir_ratio"].tolist() == [1_000_000.0]
    assert out["n_toks"].tolist() == [2]


def test_substring_dedup_join_path_equals_broadcast(ray_session):
    """max_broadcast_masks=0 forces the distributed packed-mask join
    rebuild; it must emit exactly the broadcast path's output on the
    hand-built edge corpus (canonical rescue, all-dup vanish, short doc,
    within-doc repeat)."""
    import ray.data

    from splunk_otel_collector_ray.stages.dedup import substring_dedup

    span = "one two three four five"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 7], type=pa.int64()),
        "text": ["x " + span + " y", "p q " + span, span,
                 "one two three", "a b c d e a b c d e"],
    })
    ds = ray.data.from_arrow(docs)
    a = (substring_dedup(ds, k=5).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (substring_dedup(ds, k=5, max_broadcast_masks=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].tolist() == [1, 2, 4, 7]  # doc 3 vanishes
