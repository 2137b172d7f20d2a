"""LAION-style image+caption curation (operators/curation.py) and DSIR
importance resampling (operators/sampling.py): hand-value checks, the
real corpus_df integration, and selection-semantics sanity."""

import math

import pytest
from pyspark.sql import functions as F

from sosse_spark.operators.curation import curate_image_captions
from sosse_spark.operators.sampling import dsir_gumbel_topk, dsir_weights

IMG_SCHEMA = "image_id string, w int, h int, fmt string, caption string, phash long"


def _curate(spark, rows, **kw):
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    out = curate_image_captions(df, **kw)
    return {r["image_id"]: r.asDict() for r in out.collect()}


def test_gate_flags_hand_values(spark):
    rows = [
        # big, square, long caption -> only sim decides
        ("ok", 256, 256, "png", "amber basalt cedar dune ember fjord", 0x0F0F0F0F0F0F0F0),
        ("small", 32, 256, "png", "amber basalt cedar dune ember fjord", 0x0F0F0F0F0F0F0F0),
        ("stretched", 256, 2560, "png", "amber basalt cedar dune ember fjord", 0x0F0F0F0F0F0F0F0),
        ("shortcap", 256, 256, "png", "amber basalt", 0x0F0F0F0F0F0F0F0),
        ("emptycap", 256, 256, "png", "", 0x0F0F0F0F0F0F0F0),
    ]
    got = _curate(
        spark, rows, min_dim=64, max_aspect=4.0, min_caption_words=5, sim_threshold=-1.0
    )
    assert got["ok"]["size_ok"] and got["ok"]["aspect_ok"] and got["ok"]["caption_ok"]
    assert got["ok"]["n_caption_words"] == 6
    assert not got["small"]["size_ok"] and not got["small"]["keep"]
    assert not got["stretched"]["aspect_ok"]
    assert got["stretched"]["aspect"] == 10.0
    assert not got["shortcap"]["caption_ok"]
    # empty caption: zero vector -> alignment defined as 0.0, word gate fails
    assert got["emptycap"]["n_caption_words"] == 0
    assert got["emptycap"]["alignment"] == 0.0
    assert not got["emptycap"]["caption_ok"]
    # sim_threshold=-1.0 never fails on its own
    assert all(v["sim_ok"] for v in got.values())


def test_alignment_is_cosine_of_stub_embeddings(spark):
    """Recompute one row's alignment in Python from the documented
    embedding rules (md5 bucket/sign bag x phash nibbles)."""
    import hashlib

    caption = "amber basalt cedar dune ember"
    phash = 0x123456789ABCDEF
    got = _curate(
        spark,
        [("x", 128, 128, "png", caption, phash)],
        min_dim=64,
        max_aspect=4.0,
        min_caption_words=3,
        sim_threshold=0.0,
    )["x"]
    tvec = [0.0] * 15
    for tok in caption.split():
        hh = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        tvec[hh % 15] += 1.0 if ((hh >> 4) & 1) == 0 else -1.0
    ivec = [((phash >> (4 * d)) & 15) - 7.5 for d in range(15)]
    dot = sum(t * i for t, i in zip(tvec, ivec))
    tn = math.sqrt(sum(t * t for t in tvec))
    inn = math.sqrt(sum(i * i for i in ivec))
    assert got["alignment"] == pytest.approx(dot / (tn * inn), abs=1e-9)
    assert got["sim_ok"] == (round(dot / (tn * inn), 9) >= 0.0)


def test_curate_over_real_corpus(spark):
    """The operator runs over the REAL input_hint generator
    (sources/corpus.py): dims cycle 16/32/64 x 16/24/48, so min_dim=32
    drops every w=16 or h=16/24 row; captions are 5-7 words + the
    'caption <i>' prefix, all >= 5."""
    from sosse_spark.sources.corpus import corpus_df, dims_for

    imgs = corpus_df(spark, 60, partitions=4).drop("bytes")
    out = curate_image_captions(
        imgs, min_dim=32, max_aspect=4.0, min_caption_words=5, sim_threshold=-1.0
    ).collect()
    assert len(out) == 60
    by_id = {r["image_id"]: r for r in out}
    for i in range(60):
        w, h = dims_for(i)
        r = by_id[f"img-{i:012d}"]
        assert (r["w"], r["h"]) == (w, h)
        assert r["size_ok"] == (w >= 32 and h >= 32)
        assert r["caption_ok"]  # every generated caption has >= 5 tokens
        assert r["keep"] == (r["size_ok"] and r["aspect_ok"])


def test_dsir_prefers_target_like_docs(spark):
    """Two disjoint-vocabulary clusters; target = cluster A. Every
    cluster-A raw doc must outweigh every cluster-B raw doc."""
    a = [(i, f"alpha beta gamma delta epsilon word{i % 3}") for i in range(20)]
    b = [(100 + i, f"zeta eta theta iota kappa item{i % 3}") for i in range(20)]
    raw = spark.createDataFrame(a + b, "doc_id long, text string")
    target = spark.createDataFrame(a, "doc_id long, text string")
    w = {r["doc_id"]: r["log_w"] for r in dsir_weights(raw, target, n_buckets=256).collect()}
    assert min(w[i] for i, _ in a) > max(w[i] for i, _ in b)


def test_dsir_gumbel_topk_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 5} tok{i % 3} filler common words here") for i in range(50)],
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") % 2 == 0)
    w = dsir_weights(docs, target, n_buckets=128)
    s1 = sorted(r["doc_id"] for r in dsir_gumbel_topk(w, k=10, seed=7).collect())
    s2 = sorted(r["doc_id"] for r in dsir_gumbel_topk(w, k=10, seed=7).collect())
    assert s1 == s2 and len(s1) == 10
    s3 = sorted(r["doc_id"] for r in dsir_gumbel_topk(w, k=10, seed=8).collect())
    assert s3 != s1  # a different seed reshuffles the draw
    # k >= corpus: everything comes back
    assert dsir_gumbel_topk(w, k=500).count() == 50


def test_dsir_weight_formula_hand_check(spark):
    """One doc, tiny vocab: recompute log_w from the smoothed-count
    definition."""
    import hashlib

    raw = spark.createDataFrame([(1, "aa bb"), (2, "aa aa")], "doc_id long, text string")
    target = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in dsir_weights(raw, target, n_buckets=64).collect()}

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % 64

    # raw features: doc1 {aa, bb, 'aa bb'}, doc2 {aa, aa, 'aa aa'}
    rc, tc = {}, {}
    for f in ["aa", "bb", "aa bb", "aa", "aa", "aa aa"]:
        rc[bucket(f)] = rc.get(bucket(f), 0) + 1
    for f in ["aa", "bb", "aa bb"]:
        tc[bucket(f)] = tc.get(bucket(f), 0) + 1
    tr, tt = 6.0, 3.0

    def lr(b):
        return (
            math.log(tc.get(b, 0) + 1.0)
            - math.log(tt + 64.0)
            - math.log(rc[b] + 1.0)
            + math.log(tr + 64.0)
        )

    exp1 = sum(lr(bucket(f)) for f in ["aa", "bb", "aa bb"])
    exp2 = sum(lr(bucket(f)) for f in ["aa", "aa", "aa aa"])
    assert got[1]["n_feats"] == 3 and got[2]["n_feats"] == 3
    assert got[1]["log_w"] == pytest.approx(exp1, abs=1e-6)
    assert got[2]["log_w"] == pytest.approx(exp2, abs=1e-6)
    # the doc matching the target outweighs the one that doesn't
    assert got[1]["log_w"] > got[2]["log_w"]


def test_dsir_single_token_doc_has_no_bigrams(spark):
    raw = spark.createDataFrame([(1, "solo"), (2, "two words")], "doc_id long, text string")
    w = {r["doc_id"]: r for r in dsir_weights(raw, raw, n_buckets=32).collect()}
    assert w[1]["n_feats"] == 1  # unigram only
    assert w[2]["n_feats"] == 3  # 2 unigrams + 1 bigram


def test_aesthetic_score_replicates_head(spark):
    """md5-seeded default weights: recompute one row's sigmoid score in
    Python; explicit weights override; threshold gates the keep flag."""
    import hashlib

    from sosse_spark.operators.curation import aesthetic_score

    phash = 0x0ABCDEF12345678
    df = spark.createDataFrame([("x", 64, 64, "png", "cap", phash)], IMG_SCHEMA)
    got = aesthetic_score(df).collect()[0]
    weights = [
        (int(hashlib.md5(f"{d}|aw".encode()).hexdigest()[:8], 16) / float(1 << 32) - 0.5) * 4.0
        for d in range(15)
    ]
    z = sum(w * ((((phash >> (4 * d)) & 15) - 7.5) / 7.5) for d, w in enumerate(weights))
    exp = 1.0 / (1.0 + math.exp(-z))
    assert got["score"] == pytest.approx(exp, abs=1e-9)
    assert got["keep_aesthetic"] == (round(exp, 9) >= 0.5)
    # an all-positive explicit head on an all-high-nibble phash saturates
    hi = aesthetic_score(
        spark.createDataFrame([("y", 64, 64, "png", "cap", 0xFFFFFFFFFFFFFFF)], IMG_SCHEMA),
        weights=[1.0] * 15,
    ).collect()[0]
    assert hi["score"] > 0.99 and hi["keep_aesthetic"]
    lo = aesthetic_score(
        spark.createDataFrame([("z", 64, 64, "png", "cap", 0)], IMG_SCHEMA),
        weights=[1.0] * 15,
        keep_threshold=0.5,
    ).collect()[0]
    assert lo["score"] < 0.01 and not lo["keep_aesthetic"]


# ---------------------------------------------------------------------------
# aspect-ratio bucketing
# ---------------------------------------------------------------------------


def _assign_replica(w, h, buckets):
    ar = w / h
    dists = [max(ar / (bw / bh), (bw / bh) / ar) for bw, bh in buckets]
    return dists.index(min(dists))


def test_aspect_bucket_assignment_replicates_argmin(spark):
    """Spark's LEAST+CASE argmin == the Python ratio-distance replica,
    including the lowest-id tie-break (square image vs a grid holding
    two identical-AR buckets)."""
    from sosse_spark.operators.curation import aspect_bucket_grid, assign_aspect_buckets

    grid = aspect_bucket_grid()
    rows = [(f"i{w}x{h}", w, h, "png", "c", 7) for w in (32, 100, 256, 544) for h in (32, 200, 512)]
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    got = {r["image_id"]: r for r in assign_aspect_buckets(df, grid).collect()}
    for iid, w, h, *_ in rows:
        b = _assign_replica(w, h, grid)
        assert got[iid]["bucket_id"] == b
        assert (got[iid]["bucket_w"], got[iid]["bucket_h"]) == grid[b]
    # tie-break: both buckets at distance sqrt-free equal -> lowest id
    tie_grid = [(64, 128), (64, 128), (128, 64)]
    tdf = spark.createDataFrame([("t", 50, 100, "png", "c", 7)], IMG_SCHEMA)
    assert assign_aspect_buckets(tdf, tie_grid).collect()[0]["bucket_id"] == 0


def test_bucket_batches_replicates_salted_rank(spark):
    """Two-phase salted rank == a straight (salt, digest, id) sort per
    bucket; batch_no floors; drop_last cuts exactly the ragged tail."""
    import hashlib
    from collections import defaultdict

    from sosse_spark.operators.curation import assign_aspect_buckets, bucket_batches

    grid = [(64, 64), (64, 128), (128, 64)]
    rows = [(f"img{i:03d}", 40 + (i * 13) % 120, 40 + (i * 7) % 120, "png", "c", 7)
            for i in range(57)]
    df = assign_aspect_buckets(spark.createDataFrame(rows, IMG_SCHEMA), grid)
    got = {r["image_id"]: r for r in
           bucket_batches(df, batch_size=4, salt_buckets=4, drop_last=False).collect()}
    # replica
    rep = []
    for iid, w, h, *_ in rows:
        b = _assign_replica(w, h, grid)
        dg = hashlib.md5(iid.encode()).hexdigest()
        rep.append((b, int(dg[:4], 16) % 4, dg, iid))
    rep.sort()
    ranks: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    for b, *_ in rep:
        totals[b] += 1
    for b, _salt, _dg, iid in rep:
        ranks[b] += 1
        assert got[iid]["bucket_rank"] == ranks[b], iid
        assert got[iid]["batch_no"] == (ranks[b] - 1) // 4
    assert len(got) == 57
    dropped = {r["image_id"] for r in
               bucket_batches(df, batch_size=4, salt_buckets=4, drop_last=True).collect()}
    expect = {iid for b, _s, _d, iid in rep
              if (got[iid]["bucket_rank"] - 1) // 4 < totals[b] // 4}
    assert dropped == expect and len(dropped) < 57


def test_bucket_resize_plan_hand_values(spark):
    from sosse_spark.operators.curation import assign_aspect_buckets, bucket_resize_plan

    grid = [(64, 64)]
    df = spark.createDataFrame(
        [("a", 100, 50, "png", "c", 7), ("b", 50, 100, "png", "c", 7),
         ("c", 64, 64, "png", "c", 7), ("d", 99, 64, "png", "c", 7)],
        IMG_SCHEMA,
    )
    got = {r["image_id"]: r for r in bucket_resize_plan(assign_aspect_buckets(df, grid)).collect()}
    # landscape: height binds -> rh=64, rw=floor(100*64/50)=128, center crop
    assert (got["a"]["resize_w"], got["a"]["resize_h"]) == (128, 64)
    assert (got["a"]["crop_left"], got["a"]["crop_top"]) == (32, 0)
    # portrait: mirrored
    assert (got["b"]["resize_w"], got["b"]["resize_h"]) == (64, 128)
    assert (got["b"]["crop_left"], got["b"]["crop_top"]) == (0, 32)
    # exact fit: no crop
    assert (got["c"]["resize_w"], got["c"]["resize_h"], got["c"]["crop_left"], got["c"]["crop_top"]) == (64, 64, 0, 0)
    # odd overflow floors the center crop: rw=floor(99*64/64)=99, left=(99-64)//2=17
    assert (got["d"]["resize_w"], got["d"]["crop_left"]) == (99, 17)
    # invariants: cover-resize never undershoots the bucket
    for r in got.values():
        assert r["resize_w"] >= r["bucket_w"] and r["resize_h"] >= r["bucket_h"]
        assert r["resize_w"] == r["bucket_w"] or r["resize_h"] == r["bucket_h"]


# ---------------------------------------------------------------------------
# webdataset shard packing
# ---------------------------------------------------------------------------


def test_wds_shard_plan_replicates_layout(spark):
    """Salted two-phase global rank == a straight (salt, digest, id)
    sort; shard floor/mod split; 512-aligned tar entry sizes; running
    per-shard byte offsets.  Whole plan replicated in Python."""
    import hashlib

    from sosse_spark.operators.curation import wds_shard_plan

    rows = [
        (f"img{i}", 32 + (i % 5) * 16, 32 + (i % 3) * 16, "png", f"c{i}", i * 7 + 1)
        for i in range(53)
    ]
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    got = {
        r["image_id"]: r.asDict()
        for r in wds_shard_plan(df, samples_per_shard=8, salt_buckets=4).collect()
    }
    assert len(got) == 53  # count-based sharding never drops samples

    def key(iid):
        d = hashlib.md5(iid.encode()).hexdigest()
        return (int(d[:4], 16) % 4, d, iid)

    order = sorted((iid for iid, *_ in rows), key=key)
    offsets = {}
    for rk, iid in enumerate(order):
        w, h = next((r[1], r[2]) for r in rows if r[0] == iid)
        entry = 512 + (w * h * 3 + 511) // 512 * 512
        sid, sidx = rk // 8, rk % 8
        g = got[iid]
        assert (g["shard_id"], g["shard_index"]) == (sid, sidx), iid
        assert g["entry_bytes"] == entry
        assert g["byte_offset"] == offsets.get(sid, 0)
        offsets[sid] = offsets.get(sid, 0) + entry
    # determinism: a second invocation yields the identical plan
    again = {
        r["image_id"]: r.asDict()
        for r in wds_shard_plan(df, samples_per_shard=8, salt_buckets=4).collect()
    }
    assert again == got


def test_wds_shard_plan_custom_raw_bytes(spark):
    from sosse_spark.operators.curation import wds_shard_plan

    df = spark.createDataFrame([("a", 10, 10, "png", "c", 1)], IMG_SCHEMA)
    got = wds_shard_plan(
        df, samples_per_shard=4, salt_buckets=2, raw_bytes=F.lit(1)
    ).collect()[0]
    # 1 payload byte pads to one 512 block + one header block
    assert got["entry_bytes"] == 1024
    assert (got["shard_id"], got["shard_index"], got["byte_offset"]) == (0, 0, 0)


def test_vlm_token_plan_hand_values(spark):
    """ViT ceil-divide patch grid over the bucket resolution + shared
    tokenizer caption count + extras."""
    from sosse_spark.operators.curation import assign_aspect_buckets, vlm_token_plan

    grid = [(224, 224), (448, 224)]
    rows = [
        ("sq", 200, 200, "png", "Two words", 1),      # 224x224 -> 16*16
        ("wide", 400, 200, "png", "", 2),             # 448x224 -> 32*16, 0 txt
        ("odd", 200, 199, "png", "a-b c 42", 3),      # square bucket, 4 toks
    ]
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    got = {
        r["image_id"]: r.asDict()
        for r in vlm_token_plan(
            assign_aspect_buckets(df, grid), patch=14, extra_tokens=2
        ).collect()
    }
    assert got["sq"]["img_tokens"] == 16 * 16 and got["sq"]["txt_tokens"] == 2
    assert got["sq"]["total_tokens"] == 256 + 2 + 2
    assert got["wide"]["img_tokens"] == 32 * 16 and got["wide"]["txt_tokens"] == 0
    assert got["odd"]["txt_tokens"] == 4  # a, b, c, 42
    # non-divisible bucket: patch=15 -> ceil(224/15)=15 per axis
    odd_patch = vlm_token_plan(
        assign_aspect_buckets(df, grid), patch=15
    ).collect()
    assert {r["img_tokens"] for r in odd_patch if r["bucket_w"] == 224} == {15 * 15}


def test_image_dedup_keep_best_hand_values(spark):
    """Two near-dup clusters + a singleton: highest-resolution member
    keeps, ties break to the lowest id, singletons keep themselves."""
    from sosse_spark.operators.curation import image_dedup_keep_best

    rows = [
        # cluster {a, b, c}: phash within 1 bit; b has the most pixels
        ("a", 100, 100, "png", "c", 0b1111000),
        ("b", 200, 150, "png", "c", 0b1111001),
        ("c", 200, 150, "png", "c", 0b1111010),  # same pixels as b -> id tie
        # singleton: far away in hamming
        ("z", 50, 50, "png", "c", 0b0000000000000000111111111111111),
    ]
    df = spark.createDataFrame(rows, IMG_SCHEMA)
    got = {
        r["image_id"]: r.asDict()
        for r in image_dedup_keep_best(df, max_hamming=2, n_bits=31).collect()
    }
    assert len(got) == 4
    assert got["a"]["cluster"] == got["b"]["cluster"] == got["c"]["cluster"] == "a"
    assert not got["a"]["keep_best"]  # 10k pixels < 30k
    assert got["b"]["keep_best"]      # tie with c -> lowest id wins
    assert not got["c"]["keep_best"]
    assert got["z"]["cluster"] == "z" and got["z"]["keep_best"]
    assert got["b"]["pixels"] == 30000
