"""Training-data pipeline operators over the driver testdata tables."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from drain3_spark.pipeline import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_text_stats(spark, docs):
    out = text.with_text_stats(docs).collect()
    assert all(r.tokens_ws >= 0 and r.tokens_bpe >= r.tokens_ws * 0 for r in out)
    assert all(0.0 <= r.quality <= 1.0 for r in out)
    assert all(len(r.fingerprint) == 32 for r in out)
    langs = {r.lang_pred for r in out}
    assert langs <= {"en", "de", "fr", "es", "und"}
    # duckdb cross-check of the whitespace token count
    con = duckdb.connect()
    dd = con.sql(f"""
        select doc_id, len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                       x -> x != '')) as t
        from parquet_scan('{SF_DIR}/documents.parquet')""").df()
    got = {r.doc_id: r.tokens_ws for r in out}
    for _, row in dd.iterrows():
        assert got[row.doc_id] == row.t, row.doc_id


def test_exact_duplicates(spark, docs):
    dup_src = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text").limit(5))
    groups = dedup.exact_duplicates(dup_src).collect()
    assert len(groups) == 5
    assert all(g.n_docs == 2 and g.keeper_id < 100000 for g in groups)


def test_jaccard_and_minhash(spark, docs):
    dup_src = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text").limit(5))
    jp = dedup.jaccard_pairs(dup_src, threshold=0.99).collect()
    exact_pairs = {(r.id_a, r.id_b) for r in jp}
    assert {(i, i + 100000) for i in range(5)} <= exact_pairs

    mh = dedup.minhash_lsh_duplicates(dup_src, threshold=0.99).collect()
    mh_pairs = {(r.id_a, r.id_b) for r in mh}
    # LSH candidates + exact verify must find all identical-doc pairs
    assert {(i, i + 100000) for i in range(5)} <= mh_pairs
    assert mh_pairs <= exact_pairs


def test_simhash(spark, docs):
    dup_src = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text").limit(3))
    out = dedup.simhash_duplicates(dup_src).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    for i in range(3):
        assert pairs.get((i, i + 100000)) == 0


def test_cosine_topk_vs_duckdb(spark, emb):
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    got = similarity.cosine_topk(emb, query, k=5).collect()
    assert got[0].vec_id == 0 and abs(got[0].cosine - 1.0) < 1e-6
    con = duckdb.connect()
    want = con.sql(f"""
        with q as (select embedding as qv from parquet_scan('{SF_DIR}/embeddings.parquet')
                   where vec_id = 0)
        select vec_id, round(list_cosine_similarity(embedding::double[], qv::double[]), 6) as cosine
        from parquet_scan('{SF_DIR}/embeddings.parquet'), q
        order by cosine desc, vec_id limit 5""").fetchall()
    assert [(r.vec_id, round(r.cosine, 5)) for r in got] == \
        [(v, round(c, 5)) for v, c in want]


def test_ivf_topk_recall(spark, emb):
    query = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    brute = [r.vec_id for r in similarity.cosine_topk(emb, query, k=10).collect()]
    approx = [r.vec_id for r in
              similarity.ivf_topk(emb, query, k=10, num_centroids=8,
                                  probes=4).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.3, (brute, approx)  # probing half the buckets
    assert 7 in approx  # the query vector itself must be found


def test_embedding_near_dup(spark, emb):
    dup = emb.unionByName(
        emb.filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"))
    pairs = {(r.id_a, r.id_b): r.cosine
             for r in similarity.cosine_near_dup_pairs(dup, threshold=0.999).collect()}
    for i in range(3):
        assert abs(pairs[(i, i + 100000)] - 1.0) < 1e-5


def test_multimodal_plumbing(spark):
    from drain3_spark import fixtures as FX
    clips = FX.gen_clips(spark, 20, dur_lo=200, dur_hi=400)
    feats = multimodal.audio_features(clips).collect()
    assert len(feats) == 20
    assert all(f.n_samples > 0 and 0 < f.rms < 1 and f.zero_crossings > 0
               for f in feats)

    items = clips.select(F.col("clip_id").alias("item_id"),
                         F.col("bytes").alias("payload"))
    hist = multimodal.image_features(items, fake_decoder=True).collect()
    assert len(hist) == 20
    assert all(abs(sum(h.histogram) - 1.0) < 1e-9 for h in hist)

    with pytest.raises(Exception) as ei:
        multimodal.image_features(items, fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_ivf_assignment_narrow_and_paths_agree(spark, emb):
    """Bucket assignment must be a narrow pass (zero Exchange) and the
    literal-Catalyst and broadcast-numpy paths must agree exactly."""
    lit_df = similarity.assign_ivf_buckets(emb, num_centroids=8)
    plan = lit_df._jdf.queryExecution().executedPlan().toString()
    # the embedding side must never shuffle; the centroid table arrives
    # as a ONE-ROW BroadcastExchange (r8: replaces the C x dim literal
    # expression tree whose codegen dominated the query's first run)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    lit = {r.vec_id: r.bucket for r in lit_df.collect()}

    old_max = similarity._IVF_LITERAL_MAX
    similarity._IVF_LITERAL_MAX = 0  # force the pandas-UDF path
    try:
        udf_df = similarity.assign_ivf_buckets(emb, num_centroids=8)
        uplan = udf_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in uplan, uplan
        udf = {r.vec_id: r.bucket for r in udf_df.collect()}
    finally:
        similarity._IVF_LITERAL_MAX = old_max
    assert lit == udf
    # every centroid vector sits in its own bucket
    for r in emb.orderBy("vec_id").limit(8).collect():
        assert lit[r.vec_id] == r.vec_id


def test_jaccard_df_cap_bounds_hot_shingles(spark):
    """A stopword shingle shared by every doc must not quadratically
    inflate the self-join; rare-shingle near-dups must survive the cap."""
    common = "the quick brown"  # one 3-gram every doc shares
    rows = [(i, f"{common} filler{i} mid{i} tail{i}") for i in range(40)]
    rows += [(100, f"{common} alpha beta gamma delta"),
             (101, f"{common} alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.jaccard_pairs(df, k=3, threshold=0.5, df_cap=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got                 # near-dup pair found
    assert all(a >= 100 for a, b in got)     # filler docs share only hot grams
    # without the cap the hot shingle alone creates 42*41/2 join rows;
    # with it, the common gram is gone so jaccard reflects rare grams only
    j = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}[(100, 101)]
    uncapped = {(r.id_a, r.id_b): r.jaccard
                for r in dedup.jaccard_pairs(df, k=3, threshold=0.5,
                                             df_cap=None).collect()}
    assert j <= 1.0 and (100, 101) in uncapped


def test_audio_spectral_features(spark):
    """Spectral DSP against known signals: the fixture clips are pure
    sines (+1% noise) at a freq derivable from the clip id, so the
    dominant frequency must land on the tone within FFT bin resolution;
    tones are spectrally flat-ZERO and never silent.  A crafted silent
    clip and an undecodable payload pin the edge rows."""
    import numpy as np
    from drain3_spark import fixtures as FX
    from drain3_spark.audio.codecs import encode
    from drain3_spark.audio.synth import clip_params
    from drain3_spark.pipeline.multimodal import audio_spectral_features

    clips = FX.gen_clips(spark, 40, dirty=False, dur_lo=300, dur_hi=600)
    feats = {r.clip_id: r for r in audio_spectral_features(clips).collect()}
    assert len(feats) == 40
    for cid, r in feats.items():
        p = clip_params(cid, 300, 600)
        bin_hz = p["sr_hz"] / r.n_samples
        assert abs(r.dominant_freq_hz - p["freq"]) <= 2 * bin_hz + 1e-9, \
            (cid, r.dominant_freq_hz, p["freq"])
        assert r.flatness < 0.1          # tone, not noise
        assert r.silence_ratio == 0.0    # 0.8 amplitude sine
        assert r.rolloff_hz >= r.dominant_freq_hz * 0.9

    silent = encode(np.zeros(16000, dtype=np.float32), "pcm_s16le")
    junk = b"\x01\x02\x03"
    edge = spark.createDataFrame(
        [("sil-1", bytearray(silent), 16000, "pcm_s16le"),
         ("bad-1", bytearray(junk), 16000, "pcm_f32le")],
        "clip_id string, bytes binary, sr_hz int, codec string")
    er = {r.clip_id: r for r in audio_spectral_features(edge).collect()}
    assert er["sil-1"].silence_ratio == 1.0
    assert er["sil-1"].dominant_freq_hz == 0.0
    assert er["bad-1"].centroid_hz is None and er["bad-1"].n_samples == 0


def test_lsh_incremental_equals_full_cross_pairs(spark):
    """Incremental dedup (new batch vs corpus index) must find exactly
    the full-corpus LSH pairs that cross the batch/corpus split, with
    identical exact-verified jaccard — whether the index is precomputed
    or derived in-call."""
    rows = [(i, f"background doc {i} with its own words w{i}a w{i}b w{i}c")
            for i in range(20)]
    # planted near-dups crossing the split (ids 100/101, 110/111: one
    # even=new, one odd=corpus) and one inside the corpus (201/203)
    rows += [(100, "the quick brown fox jumps over the lazy dog tonight"),
             (101, "the quick brown fox jumps over the lazy dog today"),
             (110, "pack my box with five dozen liquor jugs right now"),
             (111, "pack my box with five dozen liquor jugs right here"),
             (201, "sphinx of black quartz judge my vow immediately ok"),
             (203, "sphinx of black quartz judge my vow immediately no")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter("doc_id % 2 = 0")
    corpus = df.filter("doc_id % 2 = 1")

    full = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.jaccard
            for r in dedup.minhash_lsh_duplicates(df, threshold=0.5).collect()}
    new_ids = {r[0] for r in rows if r[0] % 2 == 0}
    want = {}
    for (a, b), j in full.items():
        if (a in new_ids) != (b in new_ids):
            n, o = (a, b) if a in new_ids else (b, a)
            want[(n, o)] = j
    assert (100, 101) in want and (110, 111) in want
    assert (201, 203) not in want          # corpus-internal: out of scope

    inc = {(r.new_id, r.old_id): r.jaccard
           for r in dedup.lsh_incremental_duplicates(
               new, corpus, threshold=0.5).collect()}
    assert inc == want

    idx = dedup.minhash_band_index(corpus)
    inc_df = dedup.lsh_incremental_duplicates(new, corpus, index=idx,
                                              threshold=0.5)
    inc2 = {(r.new_id, r.old_id): r.jaccard for r in inc_df.collect()}
    assert inc2 == want

    # the O(batch + candidates) claim, plan-asserted: every join that
    # touches a shingle column is keyed on a candidate doc id (the
    # corpus shingles only exist downstream of the candidate semi-join)
    plan = inc_df._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Join" in ln and "shingle" in ln:
            assert ("new_id" in ln or "old_id" in ln
                    or "id#" in ln or "id_" in ln), ln


def test_connected_components_and_dedup_groups(spark):
    """Hash-min + pointer-jump components: a long path (worst diameter),
    a star, an isolated pair, and a cycle all collapse to min-id groups;
    keepers are exactly the component minima."""
    edges = ([(i, i + 1) for i in range(10, 18)]       # path 10..18
             + [(30, 31), (30, 32), (30, 33)]          # star at 30
             + [(40, 41)]                              # pair
             + [(50, 51), (51, 52), (52, 50)])         # cycle
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.group_id
           for r in dedup.connected_components(pairs).collect()}
    want = {**{i: 10 for i in range(10, 19)},
            **{i: 30 for i in (30, 31, 32, 33)},
            40: 40, 41: 40, 50: 50, 51: 50, 52: 50}
    assert got == want
    keepers = {r.id for r in dedup.dedup_groups(pairs)
               .filter("is_keeper").collect()}
    assert keepers == {10, 30, 40, 50}


def test_connected_components_random_vs_union_find(spark):
    """Randomized (seeded) graph: the distributed label propagation must
    agree with a sequential union-find on every node."""
    import numpy as np
    rng = np.random.RandomState(4242)
    n = 300
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(400, 2))
             if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    involved = {v for e in edges for v in e}
    want = {v: find(v) for v in involved}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.group_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == want


def test_jaccard_default_cap_keeps_recall_on_straddling_pairs(spark):
    """Evidence for DEFAULT_DF_CAP=256 (the 'rare shingles carry the
    signal' claim): near-dup pairs whose shared shingles STRADDLE the
    cap — one shingle hotter than 256 docs (dropped) plus many rare ones
    (kept) — must be found by the default capped plan exactly as by
    ``df_cap=None`` at threshold >= 0.7."""
    common = "alpha beta gamma"
    rows = [(i, f"{common} filler{i} mid{i} tail{i}") for i in range(280)]
    pair_ids = []
    for p in range(4):
        base = " ".join(f"w{p}x{j}" for j in range(10))
        a, b = 1000 + 2 * p, 1001 + 2 * p
        rows += [(a, f"{common} {base}"),
                 (b, f"{common} {base} extra{p}")]
        pair_ids.append((a, b))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # the shared head shingle really does exceed the default cap
    from pyspark.sql import functions as F
    hot_df = (dedup.shingle_rows(df, k=3)
              .filter(F.col("shingle") == common).count())
    assert hot_df > dedup.DEFAULT_DF_CAP

    uncapped = {(r.id_a, r.id_b)
                for r in dedup.jaccard_pairs(df, k=3, threshold=0.7,
                                             df_cap=None).collect()}
    capped = {(r.id_a, r.id_b)
              for r in dedup.jaccard_pairs(df, k=3, threshold=0.7).collect()}
    assert set(pair_ids) <= uncapped
    assert uncapped <= capped, uncapped - capped


def test_jaccard_default_is_capped_no_self_join(spark):
    """The signature default must take the inverted-index path: no join
    keyed on the shingle column anywhere in the physical plan, and the
    results must equal an explicit DEFAULT_DF_CAP call."""
    rows = [(i, f"alpha beta gamma doc{i} tail{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.jaccard_pairs(df, k=3, threshold=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.splitlines()
                  if "Join" in ln and "shingle" in ln]
    assert not join_lines, join_lines
    explicit = dedup.jaccard_pairs(df, k=3, threshold=0.1,
                                   df_cap=dedup.DEFAULT_DF_CAP)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, explicit.collect()))


def test_lsh_verify_is_candidate_bounded(spark):
    """Pathological corpus: every document shares a hot shingle but the
    docs are otherwise unique, so an all-pairs verify would compute
    n²/2 Jaccards.  The candidate-bounded verify must (a) still find
    the true near-dup pair, (b) show every verify join keyed on a
    candidate id — never a raw shingle-only self-join — and (c) agree
    with the old formulation (candidates ∩ full exact Jaccard)."""
    common = "the quick brown"
    rows = [(i, f"{common} u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(300)]
    rows += [(9100, f"{common} alpha beta gamma delta epsilon zeta"),
             (9101, f"{common} alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = dedup.minhash_lsh_duplicates(df, threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert (9100, 9101) in got

    plan = out._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Join" in ln and "shingle" in ln:
            # any join touching shingle must also be keyed on a doc id
            assert "id_a" in ln or "id_b" in ln or "id#" in ln or "id_" in ln, ln

    # old formulation on the same corpus (kept cheap by df_cap here,
    # exact on this corpus since no shingle exceeds the cap)
    cand = dedup.lsh_candidate_pairs(df)
    true_pairs = dedup.jaccard_pairs(df, threshold=0.0, df_cap=400)
    old = {(r.id_a, r.id_b): r.jaccard
           for r in cand.join(true_pairs, ["id_a", "id_b"])
           .filter(F.col("jaccard") >= 0.3).collect()}
    assert got == old


def test_near_dup_blas_path_matches_catalyst(spark, emb):
    """The BLAS per-block Gram-matrix path must find the same pairs as
    the expression self-join, with cosines equal to float tolerance."""
    cat = {(r.id_a, r.id_b): r.cosine for r in
           similarity.cosine_near_dup_pairs(emb, threshold=0.35).collect()}
    blas = {(r.id_a, r.id_b): r.cosine for r in
            similarity.cosine_near_dup_pairs(emb, threshold=0.35,
                                             method="blas").collect()}
    assert set(cat) == set(blas)
    assert cat, "threshold should admit at least one pair"
    for k in cat:
        assert abs(cat[k] - blas[k]) <= 1e-6, (k, cat[k], blas[k])


def _encode_ppm(img):
    h, w = img.shape[:2]
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + img.tobytes()


def _encode_bmp(img):
    import struct
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)   # bottom-up BGR
    px = rows.tobytes()
    off = 14 + 40
    fh = b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                     2835, 2835, 0, 0)
    return fh + ih + px


def test_image_decode_real_formats(spark):
    """PPM and BMP decode natively (pure numpy) end-to-end through the
    Spark image path: dimensions, luma histogram, and nearest-neighbor
    resize all verified against numpy ground truth."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)

    # kernel-level roundtrip for both containers
    assert np.array_equal(multimodal.decode_image(_encode_ppm(img)), img)
    assert np.array_equal(multimodal.decode_image(_encode_bmp(img)), img)

    items = spark.createDataFrame(
        [("ppm", bytearray(_encode_ppm(img))),
         ("bmp", bytearray(_encode_bmp(img)))],
        "item_id string, payload binary")
    feats = {r.item_id: r for r in multimodal.image_features(items).collect()}
    luma = img.mean(axis=2).astype(np.uint8).ravel()
    want = np.bincount(luma >> 4, minlength=16) / luma.size
    for r in feats.values():
        assert (r.width, r.height, r.channels) == (17, 24, 3)
        assert np.allclose(r.histogram, want)

    resized = {r.item_id: r for r in
               multimodal.resize_images(items, out_w=8, out_h=6).collect()}
    truth = multimodal._resize_nn(img, 6, 8)
    for r in resized.values():
        got = np.frombuffer(bytes(r.pixels), np.uint8).reshape(6, 8, 3)
        assert np.array_equal(got, truth)

    # grayscale PGM path
    gray = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    pgm = b"P5\n9 5\n255\n" + gray.tobytes()
    dec = multimodal.decode_image(pgm)
    assert dec.shape == (5, 9, 1) and np.array_equal(dec[:, :, 0], gray)

    # PNG and JPEG are real decoders now: corrupt payloads (signature
    # but truncated structure) are decode ERRORS, not missing-codec stubs
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0....")
    # GIF is real too: a signature with no image descriptor is a
    # decode error
    with pytest.raises(ValueError):
        multimodal.decode_image(b"GIF89a" + b"\x00" * 7 + b"\x3b")
    # WebP lossless is a real decoder now: an empty container is a
    # decode error; only the LOSSY VP8 path stays a declared stub
    with pytest.raises(ValueError):
        multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBP")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00junk")


def _encode_y4m(frames_rgb):
    """Encode RGB frames as raw Y4M 4:2:0 (BT.601 full range) for the
    decoder roundtrip test."""
    h, w = frames_rgb[0].shape[:2]
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A0:0 C420jpeg\n" % (w, h)]
    for rgb in frames_rgb:
        f = rgb.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        u = np.clip(np.rint(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
        v = np.clip(np.rint(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
        u2 = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        v2 = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        out.append(b"FRAME\n" + y.astype(np.uint8).tobytes()
                   + np.rint(u2).astype(np.uint8).tobytes()
                   + np.rint(v2).astype(np.uint8).tobytes())
    return b"".join(out)


def test_video_frame_sampling_y4m(spark):
    """Raw Y4M decodes natively: frame count, sampling stride,
    dimensions, and (approximate, due to 4:2:0 chroma subsampling)
    pixel roundtrip verified through the Spark path."""
    # smooth gradient frames: 4:2:0 chroma subsampling averages 2x2
    # blocks, so only smooth content roundtrips closely
    yy, xx = np.mgrid[0:8, 0:12]
    base = np.stack([xx * 255 // 11, yy * 255 // 7,
                     (xx + yy) * 255 // 18], axis=2).astype(np.uint8)
    frames = [np.clip(base.astype(int) + 10 * k, 0, 255).astype(np.uint8)
              for k in range(6)]
    payload = _encode_y4m(frames)

    # kernel-level: every frame, correct count and shape
    decoded = list(multimodal.decode_y4m_frames(payload))
    assert [i for i, _ in decoded] == list(range(6))
    assert all(f.shape == (8, 12, 3) for _, f in decoded)
    for (_, got), want in zip(decoded, frames):
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 16

    items = spark.createDataFrame([("vid0", bytearray(payload))],
                                  "item_id string, payload binary")
    rows = multimodal.sample_video_frames(items, every_nth=2).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 2, 4]
    assert all((r.width, r.height) == (12, 8) for r in rows)

    with pytest.raises(NotImplementedError):
        list(multimodal.decode_y4m_frames(b"\x00\x00\x01\xba mpeg-ps"))


def test_video_frame_sampling_mjpeg_avi(spark):
    """Motion-JPEG AVI decodes natively end-to-end: container walk,
    per-frame JPEG decode pixel-identical to a direct decode of the
    same encoder's output, stride through the Spark path, and the
    fixture corpus's frames regenerable by id."""
    from drain3_spark import fixtures as FX
    from drain3_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
              for _ in range(5)]
    payload = multimodal.encode_avi_mjpeg(frames, fps=10)
    decoded = list(multimodal.decode_avi_mjpeg_frames(payload))
    assert [i for i, _ in decoded] == list(range(5))
    for (_, got), src in zip(decoded, frames):
        assert np.array_equal(got, decode_jpeg(encode_jpeg(src,
                                                           quality=92)))

    items = spark.createDataFrame([("vidm", bytearray(payload))],
                                  "item_id string, payload binary")
    rows = multimodal.sample_video_frames(items, every_nth=2).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    assert all((r.width, r.height) == (16, 12) for r in rows)

    # fixture contract: odd ids are mjpeg-avi with md5-keystream frames
    vids = {r.item_id: r for r in
            FX.gen_videos_all_formats(spark, 4).collect()}
    assert vids["vid-00000001"].fmt == "mjpeg-avi"
    got = dict(multimodal.decode_avi_mjpeg_frames(
        bytes(vids["vid-00000001"].payload)))
    want = decode_jpeg(encode_jpeg(FX._mjpeg_frame(1, 0, 16, 12),
                                   quality=92))
    assert np.array_equal(got[0], want)


def test_connected_components_string_ids(spark):
    """String id columns (clip_id-style corpora) work natively — ids are
    never cast; group_id is the lexicographically smallest member."""
    edges = [("clip-b", "clip-c"), ("clip-a", "clip-b"),
             ("clip-x", "clip-y")]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r.id: r.group_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == {"clip-a": "clip-a", "clip-b": "clip-a",
                   "clip-c": "clip-a", "clip-x": "clip-x",
                   "clip-y": "clip-x"}
    assert dict(dedup.connected_components(pairs).dtypes) == {
        "id": "string", "group_id": "string"}


def test_connected_components_rejects_mixed_id_types(spark):
    pairs = spark.createDataFrame([(1, "a")], "id_a long, id_b string")
    with pytest.raises(TypeError, match="integer or string"):
        dedup.connected_components(pairs)


def test_connected_components_checkpoint_dir(spark, tmp_path):
    """Passing a reliable checkpoint_dir must actually land generations
    there (fault-tolerant truncation on cluster runs)."""
    ckpt = str(tmp_path / "cc_ckpt")
    edges = [(i, i + 1) for i in range(0, 12)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    sc = spark.sparkContext
    try:
        stats = {}
        got = {r.id: r.group_id
               for r in dedup.connected_components(
                   pairs, checkpoint_dir=ckpt, stats=stats).collect()}
        assert got == {i: 0 for i in range(13)}
        assert stats["converged"] and stats["iterations"] >= 1
        import os
        found = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs]
        assert found, "no checkpoint files written to the reliable dir"
    finally:
        # best-effort unset so later tests keep the localCheckpoint default
        try:
            none_obj = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(none_obj)
        except Exception:
            pass


def test_connected_components_max_iter_warning(spark, caplog):
    """Exhausting max_iter without convergence must WARN and set
    stats['converged']=False (ADVICE r04: silent non-convergence)."""
    import logging
    # a long path needs several generations; max_iter=1 cannot converge
    edges = [(i, i + 1) for i in range(0, 40)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    stats = {}
    with caplog.at_level(logging.WARNING, logger="drain3_spark.pipeline.dedup"):
        dedup.connected_components(pairs, max_iter=1, stats=stats).collect()
    assert stats["converged"] is False
    assert any("without converging" in r.message for r in caplog.records)


def test_connected_components_iterations_logarithmic(spark):
    """Pointer jumping certifies O(log diameter): a 256-node path (the
    worst diameter per edge) converges in <= 2*ceil(log2(n)) + 2
    generations, far below the O(n) a plain hash-min propagation needs."""
    import math
    n = 256
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    stats = {}
    got = {r.id: r.group_id
           for r in dedup.connected_components(pairs, stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["converged"]
    assert stats["iterations"] <= 2 * math.ceil(math.log2(n)) + 2, stats


def test_update_band_index_sequential_equals_one_shot(spark):
    """Two ingest batches maintained via update_band_index must leave
    the stored index identical to minhash_band_index over the unioned
    corpus — and batch-2 incremental dedup against the maintained index
    must equal dedup against a freshly built index."""
    rows0 = [(i, f"base document number {i} with shared words alpha beta")
             for i in range(20)]
    rows1 = [(100 + i, f"base document number {i} with shared words alpha beta")
             for i in range(5)]            # near-dups of corpus docs
    rows2 = [(200 + i, f"base document number {i} with shared words alpha beta")
             for i in range(5)]            # near-dups of corpus AND batch-1
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    corpus, b1, b2 = mk(rows0), mk(rows1), mk(rows2)

    idx0 = dedup.minhash_band_index(corpus)
    d1 = dedup.lsh_incremental_duplicates(b1, corpus, index=idx0, threshold=0.5)
    assert d1.count() > 0
    idx1 = dedup.update_band_index(idx0, dedup.minhash_band_index(b1))

    # index equivalence: maintained == one-shot over the union
    union1 = corpus.unionByName(b1)
    want_idx = {tuple(r) for r in dedup.minhash_band_index(union1).collect()}
    got_idx = {tuple(r) for r in idx1.collect()}
    assert got_idx == want_idx

    # batch-2 dedup through the maintained index == through a fresh one
    got2 = {tuple(r) for r in dedup.lsh_incremental_duplicates(
        b2, union1, index=idx1, threshold=0.5).collect()}
    want2 = {tuple(r) for r in dedup.lsh_incremental_duplicates(
        b2, union1, index=dedup.minhash_band_index(union1),
        threshold=0.5).collect()}
    assert got2 == want2 and got2
    # batch-2 must see batch-1 docs (ids 100+) through the maintained index
    assert any(r[1] >= 100 for r in got2)


def test_update_band_index_keeper_filter(spark):
    """Rejected duplicates must not enter the maintained index."""
    corpus = spark.createDataFrame(
        [(1, "totally unique corpus document one two three")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "accepted new document alpha beta gamma"),
         (11, "rejected duplicate document delta epsilon zeta")],
        "doc_id long, text string")
    keep = spark.createDataFrame([(10,)], "id long")
    idx = dedup.update_band_index(dedup.minhash_band_index(corpus),
                                  dedup.minhash_band_index(batch),
                                  keeper_ids=keep)
    ids = {r.id for r in idx.select("id").distinct().collect()}
    assert ids == {1, 10}


def test_auto_near_dup_multiprobe_recall(spark):
    """Self-blocking near-dup (q38): precision 1 vs brute force by
    construction, and probes=2 must recover boundary-straddling pairs
    that probes=1 loses — measured recall on a clustered corpus."""
    rng = np.random.RandomState(38)
    centers = rng.randn(6, 8) * 4.0
    rows = []
    vid = 0
    # round-robin across clusters so the deterministic coarse quantizer
    # ("first C vectors by id") spans the space instead of sampling one
    # blob — the layout a pre-shuffled real corpus has
    for _ in range(40):
        for c in range(6):
            v = centers[c] + rng.randn(8) * 0.35
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    embd = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    th = 0.97
    # ground truth: full all-pairs cosine over the 240 vectors
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    truth = {(i, j) for i in range(vid) for j in range(i + 1, vid)
             if S[i, j] >= th}
    assert len(truth) > 50, "fixture must contain real near-dup pairs"

    def run(probes):
        out = similarity.cosine_near_dup_pairs_auto(
            embd, threshold=th, num_centroids=12, probes=probes)
        return {(r.id_a, r.id_b): r.cosine for r in out.collect()}

    got1, got2 = run(1), run(2)
    # precision 1: every reported pair is a true pair with the exact cosine
    for (i, j), cos in got2.items():
        assert (i, j) in truth
        assert abs(cos - S[i, j]) <= 1e-6
    r1 = len(set(got1) & truth) / len(truth)
    r2 = len(set(got2) & truth) / len(truth)
    assert r2 >= r1, (r1, r2)
    assert r2 >= 0.9, f"multi-probe recall too low: {r2} (single-probe {r1})"


def _png_forward_filter(img: np.ndarray, ftypes) -> bytes:
    """Test-side PNG builder applying a GIVEN filter type per scanline
    (independent forward implementation of RFC 2083 §6, so the
    decoder's unfiltering is exercised adversarially, not just against
    our own filter-0 writer)."""
    import struct as _st
    import zlib
    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int32)
    out = []
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if (i >= nch and y > 0) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        out.append(bytes([f]) + enc.astype(np.uint8).tobytes())

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = _st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(out)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_and_all_filters():
    rng = np.random.RandomState(89)
    img = rng.randint(0, 256, (13, 17, 3), np.uint8)

    # our own writer (filter 0) -> our decoder
    got = multimodal.decode_image(multimodal.encode_png(img))
    assert np.array_equal(got, img)
    gray = img[..., :1]
    assert np.array_equal(multimodal.decode_image(multimodal.encode_png(gray)),
                          gray)

    # every scanline filter type, cycled across rows, via the
    # independent forward filterer
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _png_forward_filter(img, ftypes)
        assert np.array_equal(multimodal.decode_image(payload), img), ftypes

    # RGBA: alpha dropped, RGB planes exact (Pillow convert('RGB') parity)
    rgba = rng.randint(0, 256, (9, 7, 4), np.uint8)
    got = multimodal.decode_image(_png_forward_filter(rgba, [4]))
    assert np.array_equal(got, rgba[..., :3])
    # gray+alpha: alpha dropped, stays 1-channel
    ga = rng.randint(0, 256, (6, 5, 2), np.uint8)
    got = multimodal.decode_image(_png_forward_filter(ga, [2]))
    assert np.array_equal(got, ga[..., :1])


def test_png_palette_and_declared_limits():
    import struct as _st
    import zlib

    def chunk(tag, body):
        return (_st.pack(">I", len(body)) + tag + body
                + _st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    # palette image: indices 0..3 mapped through a 4-entry PLTE
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, (5, 6), np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                    np.uint8)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", _st.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte.tobytes())
               + chunk(b"IDAT", zlib.compress(rows))
               + chunk(b"IEND", b""))
    assert np.array_equal(multimodal.decode_image(payload), plte[idx])

    # declared limits: 16-bit and interlaced raise NotImplementedError
    for depth, interlace in ((16, 0), (8, 1)):
        bad = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", _st.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0,
                                         interlace))
               + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
               + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(bad)


def test_png_through_spark_image_ops(spark):
    """PNG payloads flow through the same mapInPandas feature/resize
    plumbing as the uncompressed formats."""
    rng = np.random.RandomState(31)
    rows = []
    for i in range(6):
        img = rng.randint(0, 256, (16, 16, 3), np.uint8)
        rows.append((f"png-{i}", bytearray(multimodal.encode_png(img))))
    items = spark.createDataFrame(rows, "item_id string, payload binary")
    feats = {r.item_id: r for r in multimodal.image_features(items).collect()}
    assert len(feats) == 6
    assert all(r.width == 16 and r.height == 16 and r.channels == 3
               for r in feats.values())
    resized = multimodal.resize_images(items, out_w=4, out_h=4).collect()
    assert all(len(r.pixels) == 4 * 4 * 3 for r in resized)


def test_auto_near_dup_blas_matches_catalyst(spark, emb):
    """The self-blocking near-dup's BLAS scale path must produce the
    same pairs as the Catalyst expression path, cosines to float
    tolerance (the 6-dp round makes them equal in practice)."""
    cat = {(r.id_a, r.id_b): r.cosine
           for r in similarity.cosine_near_dup_pairs_auto(
               emb, threshold=0.35, num_centroids=8, probes=2).collect()}
    blas = {(r.id_a, r.id_b): r.cosine
            for r in similarity.cosine_near_dup_pairs_auto(
                emb, threshold=0.35, num_centroids=8, probes=2,
                method="blas").collect()}
    assert set(cat) == set(blas)
    assert cat and all(abs(cat[k] - blas[k]) <= 1e-6 for k in cat)


def test_gif_roundtrip_and_through_spark(spark):
    """GIF87a/89a decode (real LZW incl. variable code widths, table
    reset at 4096, interlace) — round trips against our own encoder and
    flows through the Spark image plumbing."""
    rng = np.random.RandomState(41)
    pal = rng.randint(0, 256, (256, 3), np.uint8)

    # plain, interlaced, width-growth, and table-reset cases
    small = rng.randint(0, 7, (23, 31), np.uint8)
    assert np.array_equal(
        multimodal.decode_image(multimodal.encode_gif(small, pal[:7])),
        pal[:7][small])
    assert np.array_equal(
        multimodal.decode_image(
            multimodal.encode_gif(small, pal[:7], interlace=True)),
        pal[:7][small])
    big = rng.randint(0, 256, (64, 101), np.uint8)
    assert np.array_equal(
        multimodal.decode_image(multimodal.encode_gif(big, pal)), pal[big])
    grad = (np.add.outer(np.arange(200), np.arange(300)) % 256).astype(np.uint8)
    assert np.array_equal(
        multimodal.decode_image(multimodal.encode_gif(grad, pal)), pal[grad])

    rows = []
    for i in range(4):
        idx = rng.randint(0, 256, (16, 16), np.uint8)
        rows.append((f"gif-{i}", bytearray(multimodal.encode_gif(idx, pal))))
    items = spark.createDataFrame(rows, "item_id string, payload binary")
    feats = {r.item_id: r for r in multimodal.image_features(items).collect()}
    assert len(feats) == 4
    assert all(r.width == 16 and r.height == 16 and r.channels == 3
               for r in feats.values())


def test_tiff_roundtrip_and_through_spark(spark):
    """Baseline TIFF decode (uncompressed + PackBits, II and MM byte
    orders, gray photometric inversion) — exact round trips and the
    Spark plumbing."""
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (23, 31, 3), np.uint8)
    gray = rng.randint(0, 256, (9, 14, 1), np.uint8)
    for bo in ("<", ">"):
        for pb in (False, True):
            assert np.array_equal(
                multimodal.decode_image(
                    multimodal.encode_tiff(img, packbits=pb, byte_order=bo)),
                img), (bo, pb)
            assert np.array_equal(
                multimodal.decode_image(
                    multimodal.encode_tiff(gray, packbits=pb, byte_order=bo)),
                gray), (bo, pb)
    # run-heavy payload exercises PackBits repeats
    rep = np.repeat(rng.randint(0, 256, (23, 4, 3), np.uint8), 8, axis=1)
    assert np.array_equal(
        multimodal.decode_image(multimodal.encode_tiff(rep, packbits=True)),
        rep)
    # literal segments longer than 128 bytes must split: a 129-byte
    # literal would emit header 128 — the PackBits NO-OP — and desync
    # the decoder (regression: fixture img-53 hit this)
    runfree = np.tile(np.arange(256, dtype=np.uint8), 3)[:600]
    long_lit = np.concatenate([runfree, np.full(24, 7, np.uint8)])
    img_ll = long_lit[:624].reshape(13, 16, 3)
    assert np.array_equal(
        multimodal.decode_image(multimodal.encode_tiff(img_ll, packbits=True)),
        img_ll)
    # declared limit: LZW-compressed TIFF
    payload = bytearray(multimodal.encode_tiff(gray))
    # compression tag (259) is the 4th sorted entry; set value to 5 (LZW)
    import struct as _st
    off = 8 + 2 + 3 * 12
    assert _st.unpack_from("<H", payload, off)[0] == 259
    _st.pack_into("<H", payload, off + 8, 5)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(bytes(payload))

    rows = [(f"tif-{i}", bytearray(multimodal.encode_tiff(
        rng.randint(0, 256, (16, 16, 3), np.uint8), packbits=bool(i % 2))))
        for i in range(4)]
    items = spark.createDataFrame(rows, "item_id string, payload binary")
    feats = multimodal.image_features(items).collect()
    assert len(feats) == 4
    assert all(r.width == 16 and r.height == 16 and r.channels == 3
               for r in feats)
