"""Similarity search vs numpy brute force on the embeddings table."""

import numpy as np
import pytest

from geotile import multimodal, simsearch


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, x


def _brute_cosine_topk(ids, x, q, k):
    q = np.asarray(q, dtype=np.float64)
    cos = (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
    return [(int(ids[i]), cos[i]) for i in order]


def test_brute_topk_matches_numpy(emb, emb_np):
    ids, x = emb_np
    q = x[0].tolist()
    got = simsearch.brute_topk(emb, q, k=10).collect()
    expect = _brute_cosine_topk(ids, x, q, 10)
    assert [r["vec_id"] for r in got] == [e[0] for e in expect]
    for r, e in zip(got, expect):
        assert r["cosine"] == pytest.approx(e[1], abs=1e-9)


def test_lsh_topk_high_recall(emb, emb_np):
    ids, x = emb_np
    q = x[7].tolist()
    exact = {e[0] for e in _brute_cosine_topk(ids, x, q, 10)}
    # these embeddings are ~random unit vectors: true neighbors sit at
    # cos ~0.33 (70 deg), so per-plane agreement is only ~0.61.  With 4
    # planes + 2-bit multiprobe P(candidate) ~0.83 -> expect ~8/10.
    got = {r["vec_id"] for r in simsearch.lsh_bucket_topk(
        emb, q, k=10, nbits=4, multiprobe=2).collect()}
    assert len(exact & got) >= 6


def test_ivf_topk_high_recall(emb, emb_np):
    ids, x = emb_np
    q = x[3].tolist()
    exact = {e[0] for e in _brute_cosine_topk(ids, x, q, 10)}
    # these embeddings are ~random unit vectors (no cluster structure),
    # so IVF recall ~ scanned fraction; probe 6/8 lists -> expect >= 60%
    cents = simsearch.train_centroids(emb, n_centroids=8, sample=400)
    got = {r["vec_id"] for r in simsearch.ivf_topk(emb, q, cents, k=10, nprobe=6).collect()}
    assert len(exact & got) >= 6


def test_lsh_bucket_deterministic(emb):
    b1 = {r["vec_id"]: r["bucket"] for r in
          simsearch.with_lsh_bucket(emb, 64, 8).select("vec_id", "bucket").collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in
          simsearch.with_lsh_bucket(emb.repartition(7), 64, 8).select("vec_id", "bucket").collect()}
    assert b1 == b2


# --- multimodal plumbing ---------------------------------------------------


def test_multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.attach_fake_media(docs)
    assert media.columns == ["media_id", "kind", "payload", "meta"]
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism across partitionings
    f2 = multimodal.extract_features(media.repartition(5), fake=True).collect()
    assert {r["media_id"]: tuple(r["feature"]) for r in feats} == \
           {r["media_id"]: tuple(r["feature"]) for r in f2}


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"bytes", fake=False)


def test_frame_sampling(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.attach_fake_media(docs)
    frames = multimodal.sample_frames(media, every_ms=60000)
    rows = frames.collect()
    vids = media.where("kind = 'video'").select("media_id", "meta.duration_ms").collect()
    expect = sum(r["duration_ms"] // 60000 + 1 for r in vids)
    assert len(rows) == expect


def test_cosine_near_dup_pairs_zero_vectors_excluded(spark, emb, emb_np):
    """Zero-norm vectors (e.g. a df-capped embedding of an all-
    boilerplate doc) are excluded up front: no ANSI divide-by-zero, no
    pairs involving them, and the manufactured all-ones sign bucket
    they would share never forms."""
    from pyspark.sql import functions as F

    ids, mat = emb_np
    dim = mat.shape[1]
    zeros = spark.createDataFrame(
        [(2000000 + i, [0.0] * dim, "z") for i in range(5)],
        "vec_id long, embedding array<double>, label string")
    df = emb.unionByName(zeros)
    got = simsearch.cosine_near_dup_pairs(df, threshold=0.3).collect()
    base = simsearch.cosine_near_dup_pairs(emb, threshold=0.3).collect()
    assert {(r["a"], r["b"]) for r in got} == {(r["a"], r["b"]) for r in base}
    assert all(r["a"] < 2000000 and r["b"] < 2000000 for r in got)


def test_cosine_near_dup_pairs(spark, emb, emb_np):
    """Embedding near-dup: a planted exact copy is always found
    (identical vectors share every bucket in every table) at cosine
    1.0, and every reported pair's cosine is the true cosine."""
    from pyspark.sql import functions as F

    ids, mat = emb_np
    first_id = int(ids.min())
    dup = (emb.where(F.col("vec_id") == first_id)
           .select((F.col("vec_id") + 1000000).alias("vec_id"),
                   "embedding", "label"))
    df = emb.unionByName(dup)
    got = simsearch.cosine_near_dup_pairs(df, threshold=0.3).collect()
    pairs = {(r["a"], r["b"]): r["cosine"] for r in got}
    assert (first_id, first_id + 1000000) in pairs
    assert pairs[(first_id, first_id + 1000000)] == pytest.approx(1.0)
    # reported cosines match numpy ground truth; no pair below threshold
    id_to_row = {int(i): mat[k] for k, i in enumerate(ids)}
    id_to_row[first_id + 1000000] = id_to_row[first_id]
    for (a, b), c in pairs.items():
        va, vb = id_to_row[a], id_to_row[b]
        true = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c == pytest.approx(true, abs=1e-9)
        assert c >= 0.3


def test_resize_image_area_and_nearest():
    # constant image stays constant at any size
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    for m in ("area", "nearest"):
        out = multimodal.resize_image(img, 4, 4, method=m)
        assert out.shape == (4, 4, 3) and (out == 100).all()
    # 2x2 checkerboard tiled to 8x8: 2x2 area-downsample averages to 127/128
    cb = np.indices((8, 8)).sum(axis=0) % 2 * 255
    img = np.stack([cb] * 3, axis=2).astype(np.uint8)
    out = multimodal.resize_image(img, 4, 4, method="area")
    assert out.shape == (4, 4, 3)
    assert np.abs(out.astype(int) - 127).max() <= 1
    # nearest at same size is identity
    assert (multimodal.resize_image(img, 8, 8, method="nearest") == img).all()
    # upscale keeps values in range
    up = multimodal.resize_image(img, 16, 16, method="area")
    assert up.shape == (16, 16, 3)


def test_thumbnails_and_audio_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = multimodal.attach_fake_media(docs)
    th = multimodal.thumbnails(media, out_h=4, out_w=4).collect()
    assert th and all(len(r["thumb"]) == 4 * 4 * 3 for r in th)
    assert all(0.0 <= v <= 1.0 for v in th[0]["thumb"])
    # deterministic across recomputation
    th2 = multimodal.thumbnails(media, out_h=4, out_w=4).collect()
    assert {r["media_id"]: tuple(r["thumb"]) for r in th} == \
           {r["media_id"]: tuple(r["thumb"]) for r in th2}
    au = multimodal.audio_features(media).collect()
    assert au and all(len(r["rms"]) == 2048 // 256 for r in au)
    assert all(v >= 0.0 for v in au[0]["rms"])
    assert all(0.0 <= v <= 1.0 for v in au[0]["zcr"])


def test_real_decode_paths_raise():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x", fake=False)
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"x", fake=False)


def test_lsh_bucket_topk_stored_bucket_prunes_partitions(spark, tmp_path):
    """Stored-index path: a table partitioned by its precomputed bucket
    serves probes as a PRUNED scan (PartitionFilters at the FileScan),
    with results identical to the ad-hoc computed-bucket path."""
    import numpy as np

    n, dim = 400, 16
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, dim)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "emb_by_bucket")
    (simsearch.with_lsh_bucket(df, dim, nbits=4, seed=42)
     .write.partitionBy("bucket").parquet(path))
    stored = spark.read.parquet(path)
    query = [float(x) for x in vecs[0]]
    ad_hoc = simsearch.lsh_bucket_topk(df, query, k=5, nbits=4)
    pruned = simsearch.lsh_bucket_topk(stored, query, k=5, nbits=4)
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in pruned.collect()] == \
           [(r["vec_id"], round(r["cosine"], 9)) for r in ad_hoc.collect()]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in part_filters  # probe IN list prunes partitions
    assert "ArrowEvalPython" not in plan  # stored path needs no Python


def test_ivf_topk_stored_cluster_prunes_partitions(spark, tmp_path):
    """Stored IVF index: probing a cluster-partitioned table prunes at
    the scan and skips the assignment UDF, with identical results."""
    import numpy as np

    n, dim = 300, 8
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(n, dim)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    cents = simsearch.train_centroids(df, n_centroids=4, sample=128)
    path = str(tmp_path / "emb_by_cluster")
    (simsearch.with_ivf_cluster(df, cents)
     .write.partitionBy("ivf_cluster").parquet(path))
    stored = spark.read.parquet(path)
    query = [float(x) for x in vecs[3]]
    ad_hoc = simsearch.ivf_topk(df, query, cents, k=5, nprobe=2)
    pruned = simsearch.ivf_topk(stored, query, cents, k=5, nprobe=2)
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in pruned.collect()] == \
           [(r["vec_id"], round(r["cosine"], 9)) for r in ad_hoc.collect()]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "ivf_cluster" in part_filters
    assert "ArrowEvalPython" not in plan


def test_scalar_quantize_brute_force(spark):
    import math

    from geotile import simsearch

    rows = [(0, [0.0, 5.0, -1.0]), (1, [10.0, 5.0, 3.0]), (2, [5.0, 5.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["vec_id"], r["i"]): r["q"]
           for r in simsearch.scalar_quantize(df).collect()}
    mins = [0.0, 5.0, -1.0]
    maxs = [10.0, 5.0, 3.0]
    for vid, vec in rows:
        for i, v in enumerate(vec):
            if maxs[i] == mins[i]:
                assert got[(vid, i)] == 0   # constant dim
            else:
                q = min(255.0, max(0.0, math.floor(
                    (v - mins[i]) / (maxs[i] - mins[i]) * 255.0)))
                assert got[(vid, i)] == int(q)


def test_semdedup_brute_force(spark):
    """semdedup == brute-force reference: all-pairs cosine within the
    SAME cluster assignment, transitive closure, min-id keep-one."""
    import numpy as np

    from geotile import cache, simsearch

    rng = np.random.default_rng(7)
    base = rng.normal(size=(12, 8))
    # plant near-duplicate groups: rows 12..15 are tiny perturbations
    # of rows 0/0/3/3 -> cosines ~1 inside each pair/triple
    vecs = np.vstack([base,
                      base[0] + 1e-3, base[0] - 1e-3,
                      base[3] + 1e-3, base[3] - 1e-3])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    thr = 0.99
    out = simsearch.semdedup(df, threshold=thr, n_centroids=3, sample=64)
    got = {r["vec_id"]: (r["canon_id"], r["keep"]) for r in out.collect()}
    cache.release(out)

    # brute-force reference with the identical centroids/assignment
    cents = simsearch.train_centroids(df, n_centroids=3, sample=64)
    cl = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    n = len(vecs)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nrm = np.sqrt((vecs ** 2).sum(axis=1))
    for i in range(n):
        for j in range(i + 1, n):
            if cl[i] == cl[j] and nrm[i] > 0 and nrm[j] > 0 \
                    and vecs[i] @ vecs[j] / (nrm[i] * nrm[j]) >= thr:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    want = {i: (find(i), int(find(i) == i)) for i in range(n)}
    assert got == want
    # the planted duplicates actually collapsed (non-trivial test)
    assert sum(1 for _, k in got.values() if k == 0) >= 3


def test_semdedup_all_output_no_nulls(spark):
    """Every input id appears exactly once; singletons keep themselves;
    a zero-norm vector is an implicit singleton, never a pair member."""
    from geotile import cache, simsearch

    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = simsearch.semdedup(df, threshold=0.5, n_centroids=1, sample=8)
    got = sorted((r["vec_id"], r["canon_id"], r["keep"]) for r in out.collect())
    cache.release(out)
    assert got == [(0, 0, 1), (1, 1, 1), (2, 2, 1)]


def test_knn_graph_brute_force(spark):
    """knn_graph == numpy within-bucket top-k with the identical
    centroids/assignment and (cosine desc, id asc) tie rule."""
    import numpy as np

    from geotile import cache, simsearch

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    k = 3
    out = simsearch.knn_graph(df, k=k, n_centroids=2, sample=64)
    got = [(r["a"], r["b"], r["rank"]) for r in
           out.orderBy("a", "rank").collect()]
    cache.release(out)

    cents = simsearch.train_centroids(df, n_centroids=2, sample=64)
    cl = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    nrm = np.sqrt((vecs ** 2).sum(axis=1))
    want = []
    for a in range(len(vecs)):
        cands = [(-(vecs[a] @ vecs[b] / (nrm[a] * nrm[b])), b)
                 for b in range(len(vecs)) if b != a and cl[b] == cl[a]]
        for rank, (_, b) in enumerate(sorted(cands)[:k], start=1):
            want.append((a, b, rank))
    assert got == want


def test_pq_codes_match_numpy(emb, emb_np):
    ids, x = emb_np
    cents = simsearch.train_pq(emb, m=4, ksub=8, sample=256)
    assert cents.shape == (4, 8, x.shape[1] // 4)
    got = {r["vec_id"]: list(r["pq_codes"])
           for r in simsearch.pq_codes(emb, cents).collect()}
    db = x.shape[1] // 4
    for n, vid in enumerate(ids):
        want = [int(((x[n, b * db:(b + 1) * db] - cents[b]) ** 2)
                    .sum(axis=1).argmin()) for b in range(4)]
        assert got[int(vid)] == want
    assert all(0 <= c < 8 for cs in got.values() for c in cs)


def test_pq_adc_topk_matches_numpy(emb, emb_np):
    import math

    ids, x = emb_np
    cents = simsearch.train_pq(emb, m=4, ksub=8, sample=256)
    q = [float(v) for v in x[ids.argmin()]]
    out = [(r["vec_id"], r["adc6"]) for r in
           simsearch.pq_adc_topk(emb, q, cents, topk=10).collect()]
    # numpy replica: encode, LUT, fixed left-assoc sum
    db = x.shape[1] // 4
    qv = np.asarray(q)
    rep = []
    for n, vid in enumerate(ids):
        adc = 0.0
        for b in range(4):
            c = int(((x[n, b * db:(b + 1) * db] - cents[b]) ** 2)
                    .sum(axis=1).argmin())
            adc = adc + float(((qv[b * db:(b + 1) * db]
                                - cents[b, c]) ** 2).sum())
        rep.append((int(vid), adc))
    rep.sort(key=lambda t: (t[1], t[0]))
    want = [(v, float(np.round(a, 6))) for v, a in rep[:10]]
    assert [v for v, _ in out] == [v for v, _ in want]
    for (_, a), (_, b) in zip(out, want):
        assert math.isclose(a, b, rel_tol=0, abs_tol=5e-7)
    # the query's own vector quantizes to distance <= any other
    assert out[0][0] == int(ids.min()) or out[0][1] <= out[1][1]


def test_knn_classify_majority_and_ties(spark):
    # train: two tight clusters on orthogonal axes, labels 0 and 1,
    # with one mislabeled point in each cluster (majority still wins)
    rows = []
    for i in range(5):
        rows.append((i, [1.0, 0.01 * i, 0.0], 0 if i < 4 else 1))
    for i in range(5):
        rows.append((10 + i, [0.0, 0.01 * i, 1.0], 1 if i < 4 else 0))
    train = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    probes = spark.createDataFrame(
        [(100, [1.0, 0.02, 0.0], -1), (101, [0.0, 0.02, 1.0], -1)],
        "vec_id long, embedding array<float>, label int")
    got = {r["qid"]: (r["pred_label"], r["n_votes"])
           for r in simsearch.knn_classify(train, probes, k=5).collect()}
    assert got[100] == (0, 4) and got[101] == (1, 4)
    # salted pre-thin is bit-identical
    salted = {r["qid"]: (r["pred_label"], r["n_votes"])
              for r in simsearch.knn_classify(train, probes, k=5,
                                              salt_mod=4).collect()}
    assert salted == got
    # vote tie (k=2: one vote per label) resolves to the SMALLER label
    tie_train = spark.createDataFrame(
        [(0, [1.0, 0.0], 7), (1, [1.0, 0.0], 3)],
        "vec_id long, embedding array<float>, label int")
    tie_probe = spark.createDataFrame(
        [(9, [1.0, 0.0], -1)], "vec_id long, embedding array<float>, label int")
    r = simsearch.knn_classify(tie_train, tie_probe, k=2).collect()[0]
    assert (r["pred_label"], r["n_votes"]) == (3, 1)


def test_kmeans_lloyd_matches_pure_python_reference(spark):
    import math

    # deterministic pseudo-random 6-dim vectors; ids 0..k-1 seed
    vs = [[math.sin(i * 7 + j * 3) for j in range(6)] for i in range(40)]
    a = [[math.floor(x * 1e6) for x in v] for v in vs]
    k, iters = 3, 2
    cents = {i: list(a[i]) for i in range(k)}

    def assign(c):
        out = []
        for v in a:
            best = None
            for ci in sorted(c):
                d = sum((x - y) ** 2 for x, y in zip(v, c[ci]))
                if best is None or (d, ci) < best:
                    best = (d, ci)
            out.append(best)
        return out

    for _ in range(iters):
        upd = {}
        for (d, ci), v in zip(assign(cents), a):
            u = upd.setdefault(ci, [[0] * len(v), 0])
            u[0] = [s + x for s, x in zip(u[0], v)]
            u[1] += 1
        for ci, (s, n) in upd.items():
            cents[ci] = [x // n for x in s]
    want = {}
    for d, ci in assign(cents):
        r = want.setdefault(ci, [0, 0])
        r[0] += 1
        r[1] += d
    want = {ci: (n, inert, sum(x * x for x in cents[ci]))
            for ci, (n, inert) in want.items()}

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>")
    got = {r["cluster"]: (r["n_members"], r["inertia"], r["centroid_norm"])
           for r in simsearch.kmeans_lloyd(df, k=k, iters=iters).collect()}
    assert got == want


def test_ann_recall_full_probe_is_exact(spark):
    """With nbits=1 and multiprobe=1 the probe set covers BOTH buckets,
    so the LSH top-k must equal the exact top-k (recall 1.0) — the
    q176 audit's upper-bound sanity."""
    import numpy as np
    from pyspark.sql import functions as F

    from geotile import simsearch

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = rows[0][1]
    exact = [r["vec_id"] for r in
             simsearch.brute_topk(df, qv, k=10).collect()]
    approx = [r["vec_id"] for r in
              simsearch.lsh_bucket_topk(df, qv, k=10, nbits=1,
                                        multiprobe=1).collect()]
    assert set(exact) == set(approx)


def test_dedup_threshold_sweep_monotone(spark):
    """Pair/doc counts must be non-increasing in the threshold — the
    q202 sweep's defining property, checked on planted duplicates."""
    import numpy as np
    from pyspark.sql import functions as F

    from geotile import cache, simsearch

    rng = np.random.RandomState(3)
    base = rng.randn(20, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + rng.randn(16) * 0.05]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = simsearch.cosine_near_dup_pairs(df, threshold=0.8)
    rowsp = pairs.collect()
    cache.release(pairs)
    counts = [sum(1 for r in rowsp if r["cosine"] >= t)
              for t in (0.8, 0.9, 0.95)]
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[0] > 0  # the planted near-dups are found


def test_mutual_knn_pairs_reciprocity(spark):
    """Every emitted pair is reciprocal in the underlying kNN graph,
    and every reciprocal graph pair is emitted — exact set equality."""
    from geotile import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = {(r["a"], r["b"]): r["rank"]
         for r in simsearch.knn_graph(emb, k=4).collect()}
    got = {(r["a"], r["b"]): (r["rank_ab"], r["rank_ba"])
           for r in simsearch.mutual_knn_pairs(emb, k=4).collect()}
    want = {(a, b): (g[(a, b)], g[(b, a)])
            for (a, b) in g if a < b and (b, a) in g}
    assert got == want
    assert all(a < b for (a, b) in got)


def test_quantized_label_centroids_consistency(spark):
    """Moments agree with a driver-side rollup of scalar_quantize."""
    from collections import defaultdict

    from geotile import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = {(r["vec_id"], r["i"]): r["q"]
         for r in simsearch.scalar_quantize(emb).collect()}
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    want = defaultdict(lambda: [0, 0, 0])
    for (vid, i), qq in q.items():
        acc = want[(labels[vid], i)]
        acc[0] += 1
        acc[1] += qq
        acc[2] += qq * qq
    got = {(r["label"], r["i"]): [r["n"], r["q_sum"], r["q2_sum"]]
           for r in simsearch.quantized_label_centroids(emb).collect()}
    assert got == dict(want)


def test_triplet_audit_separable_labels(spark):
    """Two well-separated label clusters: zero violations, positive
    margins; a deliberately misplaced vector violates."""
    from geotile import cache, simsearch

    rows = [
        (1, [0.0, 0.0], 0), (2, [0.1, 0.0], 0), (3, [0.0, 0.1], 0),
        (4, [5.0, 5.0], 1), (5, [5.1, 5.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = simsearch.triplet_audit(emb)
    g = {r["label"]: r for r in out.collect()}
    cache.release(out)
    assert g[0]["n_triplets"] == 3 and g[0]["n_violations"] == 0
    assert g[1]["n_triplets"] == 2 and g[1]["n_violations"] == 0
    assert g[0]["margin_sum"] > 0 and g[1]["margin_sum"] > 0
    rows2 = rows + [(6, [5.0, 5.2], 0)]  # label-0 vector in cluster 1
    emb2 = spark.createDataFrame(
        rows2, "vec_id long, embedding array<float>, label int")
    out2 = simsearch.triplet_audit(emb2)
    g2 = {r["label"]: r for r in out2.collect()}
    cache.release(out2)
    assert g2[0]["n_violations"] >= 1


def test_prefix_dim_recall_full_dim_anchor(spark, sf_dir):
    """The full-dimension row must recall the entire exact top-10;
    every row stays within [0, k]."""
    import __spark_entry__ as E
    from geotile import simsearch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = simsearch.prefix_dim_recall(
        emb, E._ann_query_vectors(sf_dir), dims=(4, 16, 64), k=10).collect()
    assert len(rows) == len(E._ann_query_vectors(sf_dir)) * 3
    for r in rows:
        assert 0 <= r["n_hit"] <= 10
        assert r["recall_micro"] == r["n_hit"] * 1000000 // 10
        if r["d"] == 64:
            assert r["n_hit"] == 10


def test_rbo_eval_identical_rankings(spark, sf_dir):
    """prefix_d = full dimension: rankings identical, so first_div is
    the 0 sentinel, ov_k = k, and the RBO sum is the closed-form
    geometric series of floored terms."""
    import __spark_entry__ as E
    from geotile import simsearch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = simsearch.rbo_eval(emb, E._ann_query_vectors(sf_dir),
                              prefix_d=64, k=10).collect()
    expected_sum = sum((d * 1000000) // (d * (1 << (d - 1)))
                       for d in range(1, 11))
    for r in rows:
        assert r["ov_k"] == 10 and r["first_div"] == 0
        assert r["rbo_sum_micro"] == expected_sum
