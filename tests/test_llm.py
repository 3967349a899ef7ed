"""Behavioral tests for the LLM-pipeline operators: LSH recall vs exact
ground truth, language-ID on multilingual fixtures, simhash determinism,
multimodal stub plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.llm.dedup import (
    _shingles_expr,
    lsh_candidate_pairs,
    minhash_signature,
)
from prometheus_remote_kinesis_spark.llm.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
)
from prometheus_remote_kinesis_spark.llm.text import language_id
from tests.conftest import SF_SMOKE


def test_quadratic_shingles_helper_fenced():
    """r9 VERDICT task #7: the O(tokens²) expression-composition helper
    ``_shingles_expr`` must never be referenced by package code — every
    registered query shingles through ``shingled_docs`` (tokenize-once,
    measured 9.2→2.7 s at sf0.1). A grep over the package source is the
    fence: the only permitted occurrences are its own definition and
    docstring in llm/dedup.py."""
    import pathlib

    import prometheus_remote_kinesis_spark as pkg

    pkg_root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for py in pkg_root.rglob("*.py"):
        src = py.read_text()
        if "_shingles_expr" in src and py.name != "dedup.py":
            offenders.append(str(py))
    assert not offenders, (
        f"quadratic _shingles_expr referenced outside llm/dedup.py: {offenders}"
    )
    # and inside dedup.py, only the def + docstring/test pointer — no call
    dedup_src = (pkg_root / "llm" / "dedup.py").read_text()
    calls = [
        ln
        for ln in dedup_src.splitlines()
        if "_shingles_expr(" in ln and not ln.lstrip().startswith(("def ", "#"))
        and "test_" not in ln
    ]
    assert not calls, f"_shingles_expr called inside dedup.py: {calls}"


def test_minhash_signature_expr_matches_column_path(spark):
    """The r13 parsed-string fast path (column NAME argument) must
    produce the bit-identical signature as the Column-algebra fold the
    tests and arbitrary-expression callers use — pins the two
    `minhash_signature` code paths to one Catalyst tree."""
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "x y"), (2, "a b c d e f g h i")],
        "doc_id long, text string",
    ).select("doc_id", _shingles_expr(F.col("text")).alias("sh"))
    via_name = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", minhash_signature("sh").alias("sig")
        ).collect()
    }
    via_column = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", minhash_signature(F.col("sh")).alias("sig")
        ).collect()
    }
    assert via_name == via_column


def test_minhash_estimates_jaccard(spark):
    """Near-identical docs get high estimated jaccard; disjoint docs low."""
    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(49)) + " tokX"
    far = " ".join(f"other{i}" for i in range(50))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    ).select(
        "doc_id", minhash_signature(_shingles_expr(F.col("text"))).alias("sig")
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in lsh_candidate_pairs(df).collect()
    }
    assert pairs.get((0, 1), 0) > 0.5  # near-dup found with high estimate
    assert pairs.get((0, 2), 0) < 0.2 and pairs.get((1, 2), 0) < 0.2


def test_lsh_recall_vs_exact(spark):
    """Every exact-Jaccard≥0.5 pair at sf0.001 must be an LSH candidate
    (8 bands × 4 rows ⇒ P(miss at j=0.5) = (1-0.5⁴)⁸ ≈ 0.6 per band-set;
    with the real corpus we assert recall on the actually-present pairs)."""
    from prometheus_remote_kinesis_spark.llm.dedup import (
        l2_minhash_lsh_pairs,
        l2b_ngram_jaccard,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in l2b_ngram_jaccard(spark, SF_SMOKE).collect()
        if r["jaccard"] >= 0.5
    }
    candidates = {
        (r["id_a"], r["id_b"]) for r in l2_minhash_lsh_pairs(spark, SF_SMOKE).collect()
    }
    if exact:
        recall = len(exact & candidates) / len(exact)
        assert recall >= 0.8


def test_language_id_on_multilingual_fixtures(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is friendly to all"),
            (2, "el gato y la casa es bonita los dias"),
            (3, "le chat est dans la maison et une porte"),
            (4, "der hund ist ein freund und die katze"),
            (5, "这 是 的 一个 测试 在 这里"),
            (6, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in df.select("doc_id", language_id(F.col("text")).alias("pred")).collect()
    }
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "zh", 6: "und"}


def test_simhash_deterministic_and_locality(spark):
    from prometheus_remote_kinesis_spark.llm.dedup import l2c_simhash

    a = {r["doc_id"]: r["simhash"] for r in l2c_simhash(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["simhash"] for r in l2c_simhash(spark, SF_SMOKE).collect()}
    assert a == b  # platform/run stable (md5-derived)
    assert len(set(a.values())) > 1


def test_decode_media_dispatch():
    """The mime dispatcher routes every real decoder and keeps the
    honest NotImplementedError boundary for codec formats."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        encode_bmp24,
        encode_png_rgb8,
        encode_wav_pcm16,
    )

    assert decode_media(b"abc", "text/plain") == (97 + 98 + 99) / 3
    assert decode_media(b"", "text/plain") == 0.0

    px = np.arange(2 * 3 * 3, dtype=np.int64).reshape(2, 3, 3) % 256
    mean_px = px.sum() / px.size
    assert decode_media(encode_png_rgb8(px.astype(np.uint8)), "image/png") == mean_px
    assert decode_media(encode_bmp24(px.astype(np.uint8)), "image/bmp") == mean_px

    s = np.array([-4, 2, 6], dtype=np.int16)
    assert decode_media(encode_wav_pcm16(s), "audio/wav") == (4 + 2 + 6) / 3

    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")  # DCT codec not stdlib
    with pytest.raises(NotImplementedError):
        decode_media(b"\0\0\0\x18ftyp", "video/mp4")


def test_bmp24_roundtrip_and_layout():
    """REAL BMP codec: random arrays round-trip encode→decode exactly,
    including non-multiple-of-4 strides (row padding) and the bottom-up
    storage flip; corrupt/unsupported inputs raise."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (16, 15), (7, 4), (5, 31)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_bmp24(encode_bmp24(px)) == px).all(), (h, w)
    # the stored bytes really are bottom-up: first data row == last logical
    px = np.zeros((2, 1, 3), dtype=np.uint8)
    px[0] = 10  # logical TOP row
    px[1] = 20
    blob = encode_bmp24(px)
    assert blob[54] == 20  # file starts with the BOTTOM (last logical) row
    with pytest.raises(ValueError):
        decode_bmp24(b"\x89PNG" + b"\0" * 60)
    with pytest.raises(NotImplementedError):
        # 8-bpp header (unsupported depth)
        import struct as _s

        bad = bytearray(encode_bmp24(px))
        _s.pack_into("<H", bad, 28, 8)
        decode_bmp24(bytes(bad))


def test_wav_pcm16_roundtrip():
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = np.array([-32768, -1, 0, 1, 32767, 1234], dtype=np.int16)
    rate, back = decode_wav_pcm16(encode_wav_pcm16(s, rate=16000))
    assert rate == 16000
    assert (back == s).all()


def test_resize_nearest_selection():
    """Nearest-neighbor resize picks source pixel ((yd*h)//oh, (xd*w)//ow)
    — the selection the l6d oracle recomputes arithmetically."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import resize_nearest

    h, w = 16, 15
    px = np.arange(h * w * 3, dtype=np.int32).reshape(h, w, 3)
    small = resize_nearest(px, 5, 5)
    for yd in range(5):
        for xd in range(5):
            assert (small[yd, xd] == px[(yd * h) // 5, (xd * w) // 5]).all()


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame([(7, "hi")], "doc_id long, text string")
    out = extract_features(documents_as_media(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["mime"], r["n_bytes"]) == (7, "text/plain", 2)
    assert r["feature"] == (ord("h") + ord("i")) / 2


def test_media_mix_dispatch_end_to_end(spark):
    """l6b's mixed-format assembly really routes each doc_id through its
    REAL decoder: doc_ids 0-3 cover png/bmp/wav/text, and every feature
    matches the oracle's closed-form doc_id arithmetic (incl. a NULL
    text row → empty blob → 0.0)."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import synthesize_media_mix

    docs = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z"), (3, "hi"), (7, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["mime"], r["feature"])
        for r in extract_features(synthesize_media_mix(docs)).collect()
    }
    i = np.arange(720, dtype=np.int64)
    k = np.arange(256, dtype=np.int64)
    assert out[0] == ("image/png", int(((0 * 17 + i * 23) % 256).sum()) / 720)
    assert out[1] == ("image/bmp", int(((1 * 31 + i * 7) % 256).sum()) / 720)
    assert out[2] == (
        "audio/wav",
        int(np.abs((2 * 13 + k * 11) % 2003 - 1001).sum()) / 256,
    )
    assert out[3] == ("text/plain", (ord("h") + ord("i")) / 2)
    assert out[7] == ("text/plain", 0.0)  # NULL text → empty blob → 0.0


def test_knn_lsh_overlap(spark):
    """LSH-ANN must agree with exact KNN on a reasonable fraction of
    top-3 neighbor edges (same-bucket recall)."""
    from prometheus_remote_kinesis_spark.llm.similarity import l4_knn_join, l4b_lsh_ann

    exact = {
        (r["qid"], r["nn_id"]) for r in l4_knn_join(spark, SF_SMOKE).collect()
    }
    ann = {(r["qid"], r["nn_id"]) for r in l4b_lsh_ann(spark, SF_SMOKE).collect()}
    qids = {q for q, _ in exact}
    hit = len(exact & ann) / len(exact)
    assert hit > 0.2  # 8-bit buckets: partial recall expected, not zero


def test_knn_ivf_recall(spark):
    """IVF-ANN (4 of 16 lists probed) recall vs exact top-3 KNN — coarse
    quantization on clustered embeddings should recover most edges."""
    from prometheus_remote_kinesis_spark.llm.similarity import l4_knn_join, l4c_ivf_ann

    exact = {(r["qid"], r["nn_id"]) for r in l4_knn_join(spark, SF_SMOKE).collect()}
    ivf = {(r["qid"], r["nn_id"]) for r in l4c_ivf_ann(spark, SF_SMOKE).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall > 0.5


def test_resize_and_frame_sample_plumbing(spark):
    """Multimodal stubs: resize maps blobs to exactly n_bytes; frame
    sampling fans one blob row out to every-Nth fixed-size frames."""
    from prometheus_remote_kinesis_spark.llm.multimodal import (
        FRAME_BYTES,
        documents_as_media,
        frame_sample,
        resize_stub,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 40), (2, "y" * 5)], "doc_id long, text string"
    )
    media = documents_as_media(docs)

    resized = {r["doc_id"]: r["media"] for r in resize_stub(media, 8).collect()}
    assert resized[1] == b"x" * 8          # truncated
    assert resized[2] == b"y" * 5 + b"\0" * 3  # zero-padded

    frames = frame_sample(media, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["frame"]))
    # doc 1: 40 bytes -> frames 0,1,2 (16,16,8 bytes); every 2nd -> idx 0,2
    assert [i for i, _ in sorted(by_doc[1])] == [0, 2]
    assert sorted(by_doc[1])[0][1] == b"x" * FRAME_BYTES
    assert sorted(by_doc[1])[1][1] == b"x" * 8
    # doc 2: 5 bytes -> one partial frame
    assert by_doc[2] == [(0, b"y" * 5)]


def test_pii_redaction_fixtures(spark):
    """Email/phone patterns on realistic PII fixtures: both redacted,
    plain text untouched, counts match."""
    from prometheus_remote_kinesis_spark.llm.pipeline import _EMAIL_RE, _PHONE_RE

    df = spark.createDataFrame(
        [
            (1, "mail a.b+tag@sub.example.org or +49-160-555-0100 now"),
            (2, "no pii here at all"),
        ],
        "id long, s string",
    ).select(
        "id",
        F.regexp_replace(
            F.regexp_replace("s", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("red"),
        F.regexp_count("s", F.lit(_EMAIL_RE)).alias("ne"),
        F.regexp_count("s", F.lit(_PHONE_RE)).alias("np"),
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["red"] == "mail <EMAIL> or <PHONE> now"
    assert (rows[1]["ne"], rows[1]["np"]) == (1, 1)
    assert rows[2]["red"] == "no pii here at all" and rows[2]["ne"] == 0


def test_sequence_packing_invariants(spark):
    """Every chunk except a partition's last must already hold >= budget
    tokens BEFORE its last doc was added? No — the greedy rule is: a doc
    starts a new chunk iff tokens-before-it crossed the budget boundary.
    Invariant checked: chunk ids are consecutive from 0 per lang, and
    total tokens are preserved."""
    from prometheus_remote_kinesis_spark.llm.pipeline import d2_sequence_packing

    out = d2_sequence_packing(spark, SF_SMOKE).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("long"))
    ).collect()[0][0]
    assert sum(r["chunk_tokens"] for r in out) == total_tokens
    for lang, rows in by_lang.items():
        ids = sorted(r["chunk_id"] for r in rows)
        assert ids == list(range(len(ids))), f"non-consecutive chunks for {lang}"


def test_train_split_deterministic_and_leak_free(spark):
    """The content-hash split is stable across runs/partitionings and
    sends duplicate texts to the same split (no leakage)."""
    from prometheus_remote_kinesis_spark.llm.pipeline import split_bucket

    df = spark.createDataFrame(
        [(i, f"doc body {i % 5}") for i in range(20)], "id long, text string"
    )
    a = df.select("id", split_bucket(F.col("text")).alias("b")).collect()
    b = df.repartition(7).select("id", split_bucket(F.col("text")).alias("b")).collect()
    assert sorted((r["id"], r["b"]) for r in a) == sorted((r["id"], r["b"]) for r in b)
    # identical text => identical bucket
    buckets = {}
    for r in df.select("text", split_bucket(F.col("text")).alias("b")).collect():
        buckets.setdefault(r["text"], set()).add(r["b"])
    assert all(len(v) == 1 for v in buckets.values())


def test_kmeans_invariants(spark):
    """l4d distributed k-means: deterministic across runs; assignments
    in-range; spherical objective (mean cosine to own induced centroid)
    improves over the seed-vector assignment."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.similarity import (
        KMEANS_K,
        l4d_kmeans,
    )
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    a1 = {r.vec_id: r.cluster for r in l4d_kmeans(spark, SF_SMOKE).collect()}
    a2 = {r.vec_id: r.cluster for r in l4d_kmeans(spark, SF_SMOKE).collect()}
    assert a1 == a2  # run-to-run determinism

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    ids = sorted(emb)
    mat = np.array([emb[i] / np.linalg.norm(emb[i]) for i in ids])
    lab = np.array([a1[i] for i in ids])
    assert set(lab) <= set(range(KMEANS_K))

    def objective(labels):
        total = 0.0
        for c in set(labels):
            members = mat[labels == c]
            centroid = members.mean(axis=0)
            centroid /= np.linalg.norm(centroid)
            total += (members @ centroid).sum()
        return total / len(labels)

    seeds = mat[: KMEANS_K]  # init = k lowest vec_ids, as in the operator
    init_lab = (mat @ seeds.T).argmax(axis=1)
    assert objective(lab) >= objective(init_lab) - 1e-9


def test_semdedup_invariants(spark):
    """SemDeDup (l2g): every removed vector must have a KEPT, lower-id,
    same-cluster neighbor at cosine >= tau (so removal never orphans a
    duplicate group), kept vectors must have no kept lower-id neighbor at
    >= tau in their cluster, and the whole assignment is deterministic."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.similarity import (
        SEMDEDUP_TAU,
        l2g_semdedup,
    )
    from prometheus_remote_kinesis_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    out = {r["vec_id"]: (r["cluster"], r["is_removed"])
           for r in l2g_semdedup(spark, SF_SMOKE).collect()}
    again = {r["vec_id"]: (r["cluster"], r["is_removed"])
             for r in l2g_semdedup(spark, SF_SMOKE).collect()}
    assert out == again  # deterministic

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    for k in emb:
        emb[k] = emb[k] / np.linalg.norm(emb[k])

    removed = {v for v, (_, r) in out.items() if r}
    assert removed, "threshold should remove something on the smoke corpus"
    for v, (cluster, is_removed) in out.items():
        kept_lower = [
            u for u, (c2, r2) in out.items()
            if c2 == cluster and u < v and not r2
            and float(emb[u] @ emb[v]) >= SEMDEDUP_TAU
        ]
        if is_removed:
            assert kept_lower or any(
                u for u, (c2, _) in out.items()
                if c2 == cluster and u < v and float(emb[u] @ emb[v]) >= SEMDEDUP_TAU
            ), f"removed {v} has no >=tau lower-id neighbor in cluster"
        else:
            assert not kept_lower, f"kept {v} duplicates kept {kept_lower}"


def test_png_rgb8_roundtrip():
    """REAL PNG codec: random arrays round-trip exactly through the
    all-five-filters encoder (rows cycle None/Sub/Up/Average/Paeth) and
    the CRC-validating decoder, across widths that stress the 3-byte
    pixel offset math."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        decode_png_rgb8,
        encode_png_rgb8,
    )

    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (16, 15), (7, 4), (6, 31), (5, 2)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png_rgb8(encode_png_rgb8(px)) == px).all(), (h, w)


def test_png_defilter_matches_spec_hand_computed():
    """Decoder correctness independent of OUR encoder (a matched
    inverse-pair bug would survive round-trip testing): hand-built IDAT
    streams with explicit filter bytes, expected reconstructions computed
    BY HAND from the W3C spec equations (Sub adds the reconstructed left
    neighbor; Average adds floor((left+up)/2); Paeth picks the neighbor
    closest to left+up-upleft with the a<=b<=c tie order)."""
    import struct
    import zlib

    import numpy as np

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        _png_chunk,
        decode_png_rgb8,
    )

    def build(w, h, raw):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # Up then Paeth (2x2): spec math worked out by hand in the comments
    raw = bytes([2, 1, 2, 3, 4, 5, 6]) + bytes([4, 1, 1, 1, 1, 1, 1])
    got = decode_png_rgb8(build(2, 2, raw))
    assert got.reshape(2, 6).tolist() == [[1, 2, 3, 4, 5, 6], [2, 3, 4, 5, 6, 7]]

    # None then Average
    raw = bytes([0, 10, 20, 30, 40, 50, 60]) + bytes([3, 1, 2, 3, 4, 5, 6])
    got = decode_png_rgb8(build(2, 2, raw))
    assert got.reshape(2, 6).tolist() == [
        [10, 20, 30, 40, 50, 60],
        [6, 12, 18, 27, 36, 45],
    ]

    # Sub only (1 row)
    raw = bytes([1, 5, 6, 7, 8, 9, 10])
    got = decode_png_rgb8(build(2, 1, raw))
    assert got.reshape(1, 6).tolist() == [[5, 6, 7, 13, 15, 17]]


def test_png_rejects_corruption_and_unsupported():
    import struct

    import numpy as np
    import pytest

    from prometheus_remote_kinesis_spark.llm.multimodal import (
        decode_png_rgb8,
        encode_png_rgb8,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_png_rgb8(px))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_rgb8(b"BM" + bytes(blob[2:]))
    # flip one IDAT payload byte -> chunk CRC must catch it
    corrupt = bytearray(blob)
    corrupt[8 + 12 + 13 + 8 + 2] ^= 0xFF  # inside IDAT data
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb8(bytes(corrupt))
    # grayscale color type -> honest NotImplementedError
    bad = bytearray(blob)
    struct.pack_into("B", bad, 8 + 8 + 9, 0)  # IHDR color byte
    bad[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", __import__("zlib").crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png_rgb8(bytes(bad))


def test_sign_bucket_ann_subset_and_recall(spark):
    """l4e invariants vs exact KNN (l4) at sf0.001: every returned
    neighbor's cosine must EQUAL the exact computation for that pair
    (bucketing only prunes candidates, never perturbs scores), and the
    1-probe sign-bucket recall@3 must clear a floor — with 64 buckets
    over ~600 vectors, same-bucket true neighbors are common enough that
    recall collapsing to ~0 would indicate a broken bucket key."""
    from prometheus_remote_kinesis_spark.llm.similarity import (
        l4_knn_join,
        l4e_sign_bucket_ann,
    )

    exact = {
        (r["qid"], r["nn_id"]): r["cos_sim"]
        for r in l4_knn_join(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["qid"], r["nn_id"]): r["cos_sim"]
        for r in l4e_sign_bucket_ann(spark, SF_SMOKE).collect()
    }
    assert approx, "sign-bucket ANN returned nothing"
    # scores for any (qid, nn) pair present in both must be identical
    both = set(exact) & set(approx)
    for k in both:
        assert exact[k] == approx[k], k
    recall = len(both) / len(exact)
    # 7-probe (1-bit multi-probe) floor on the near-random synthetic
    # corpus; measured ~0.3 at sf0.001 — far above the 7/64 random-
    # collision baseline, so the bucket key is doing real work
    assert recall >= 0.15, recall


def test_knn_pq_recall_and_determinism(spark):
    """PQ-ANN (8 subspaces x 32-entry codebooks, ADC shortlist-50 + exact
    re-rank) vs exact top-3 KNN: measured recall@3 is 0.87 at both SFs
    with the fixed seed-11 codebooks; assert a margin below it. Codebook
    learning, encoding, and the ADC scan are all deterministic, so two
    runs must return the identical edge set."""
    from prometheus_remote_kinesis_spark.llm.similarity import l4_knn_join, l4f_pq_ann

    exact = {(r["qid"], r["nn_id"]) for r in l4_knn_join(spark, SF_SMOKE).collect()}
    pq = {(r["qid"], r["nn_id"]) for r in l4f_pq_ann(spark, SF_SMOKE).collect()}
    assert len(exact & pq) / len(exact) > 0.7
    again = {(r["qid"], r["nn_id"]) for r in l4f_pq_ann(spark, SF_SMOKE).collect()}
    assert pq == again


def test_segment_dedup_first_occurrence_semantics(spark):
    """d17: recompute the keeper election in plain Python and check the
    Spark result against it — every kept segment is the globally FIRST
    occurrence of its text (lexicographic (doc_id, seg_idx) min), kept
    segments are an order-preserving subsequence of the doc's original
    segments, and the corpus actually contains duplicate segments at
    this SF (the dedup branch is exercised, not vacuous)."""
    from prometheus_remote_kinesis_spark.llm.pipeline import SEG_W
    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents")
        .where(F.col("text").isNotNull())
        .collect()
    }
    segments = {}  # (doc_id, seg_idx) -> seg_text
    first = {}  # seg_text -> (doc_id, seg_idx)
    for doc_id in sorted(docs):
        t = docs[doc_id]
        for i in range(0, (len(t) + SEG_W - 1) // SEG_W):
            s = " ".join(t[i * SEG_W : i * SEG_W + SEG_W])
            segments[(doc_id, i)] = s
            first.setdefault(s, (doc_id, i))
    expect = {}  # doc_id -> (text_dedup, n_kept, n_total)
    for doc_id in sorted(docs):
        n_total = (len(docs[doc_id]) + SEG_W - 1) // SEG_W
        kept = [
            segments[(doc_id, i)]
            for i in range(n_total)
            if first[segments[(doc_id, i)]] == (doc_id, i)
        ]
        if kept:
            expect[doc_id] = (" ".join(kept), len(kept), n_total)

    n_dups = len(segments) - len(first)
    assert n_dups > 0, "corpus has no duplicate segments; d17 is vacuous"

    got = {
        r.doc_id: (r.text_dedup, r.n_kept, r.n_total)
        for r in all_queries()["d17_segment_dedup"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_semdedup_quantized_bites_and_agrees_with_float_cosine(spark):
    """l2i: the integer threshold test (dot>0 AND 25·dot² ≥ 4·‖a‖²·‖b‖²)
    must (a) actually drop vectors at this SF — the dedup branch is
    exercised, not vacuous — and (b) agree with the plain float-cosine
    τ=0.4 election recomputed in numpy over the same quantized vectors
    (the integer form is algebraically identical, so any disagreement is
    an implementation bug, not rounding)."""
    import numpy as np

    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.llm.similarity import (
        KMQ_SCALE,
        _quantized_lloyd,
    )

    out = {
        r.vec_id: (r.cluster, r.kept)
        for r in all_queries()["l2i_semdedup_quantized"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert any(not kept for _, kept in out.values()), "dedup never bites"

    assigned, _, _ = _quantized_lloyd(spark, SF_SMOKE)
    rows = assigned.collect()
    by_cluster: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r.vec_id):
        by_cluster.setdefault(r.cluster, []).append(
            (r.vec_id, np.array(r.q, dtype=np.int64))
        )
    expect = {}
    for cid, members in by_cluster.items():
        for j, (jid, qj) in enumerate(members):
            dup = False
            for iid, qi in members[:j]:
                d = int(qi @ qj)
                if d > 0 and 25 * d * d >= 4 * int(qi @ qi) * int(qj @ qj):
                    dup = True
                    break
            expect[jid] = (cid, not dup)
    assert out == expect


def test_l2i_bigint_headroom(spark):
    """l2i's 25·dot² BIGINT arithmetic is overflow-safe iff
    |dot| ≤ ⌊√(2⁶³/25)⌋ ≈ 6.07e8. Assert the bound ON DATA (max|q|·dim
    from the actual quantized corpus) plus the static worst case
    (dim·KMQ_SCALE², components |x| < 1), so embedding growth toward the
    boundary fails here instead of as an ANSI overflow at runtime
    (r7 ADVICE: the old docstring claimed safety at |dot| ≤ 6.6e8,
    which is already past the true boundary)."""
    from pyspark.sql import functions as F

    from prometheus_remote_kinesis_spark.llm.similarity import (
        KMQ_SCALE,
        _quantized_lloyd,
    )

    dot_cap = int((2**63 / 25) ** 0.5)  # ≈ 6.07e8
    assigned, _, _ = _quantized_lloyd(spark, SF_SMOKE)
    row = assigned.select(
        F.max(F.array_max(F.transform("q", F.abs))).alias("maxq"),
        F.max(F.size("q")).alias("dim"),
    ).collect()[0]
    assert row.dim * row.maxq * row.maxq <= dot_cap // 4, (
        f"data headroom gone: dim·max|q|² = {row.dim * row.maxq**2:.3g} "
        f"exceeds a quarter of the |dot| cap {dot_cap:.3g}"
    )
    assert row.dim * KMQ_SCALE * KMQ_SCALE <= dot_cap // 4


def test_prefix_jaccard_join_matches_brute_force(spark):
    """l2j: the prefix-filtered join must return EXACTLY the pairs the
    brute-force all-pairs τ=1/2 Jaccard scan finds over the same shingle
    sets — completeness (prefix filtering provably loses nothing) AND
    soundness (verification keeps nothing extra), with the truncated-PPM
    similarity recomputed independently in Python."""
    from prometheus_remote_kinesis_spark.llm.dedup import (
        L2J_TAU_DEN,
        L2J_TAU_NUM,
        shingled_docs,
    )
    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    sets = {
        r.doc_id: set(r.sh)
        for r in shingled_docs(load_table(spark, SF_SMOKE, "documents")).collect()
    }
    expect = {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            i = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if L2J_TAU_DEN * i >= L2J_TAU_NUM * (na + nb - i):
                expect[(a, b)] = (i, na, nb, i * 1_000_000 // (na + nb - i))
    got = {
        (r.id_a, r.id_b): (r.i, r.na, r.nb, r.jaccard_ppm)
        for r in all_queries()["l2j_prefix_jaccard_join"].fn(spark, SF_SMOKE).collect()
    }
    assert expect, "corpus has no qualifying pair — test is vacuous"
    assert got == expect


def test_pq_quantized_adc_ranking_properties(spark):
    """l4j: the hash gate proves Spark==DuckDB; this pins that the result
    IS a PQ ADC ranking — the query itself ranks first at distance equal
    to its own quantization loss (≥ 0), distances are non-decreasing,
    codes fit the 12-bit range, and recall@10 vs the exact quantized-L2
    scan clears the floor a 4×8 codebook manages on random embeddings
    (measured 0.3 here; random vectors are PQ's hostile case — the
    operator's value is the 85× code compression, tuned k/m raise
    recall)."""
    import numpy as np

    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = all_queries()["l4j_pq_quantized"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)
    assert all(0 <= r.code < 8**4 for r in rows)

    emb = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("embedding").isNotNull())
        .collect()
    }
    qid = min(emb)
    assert rows[0].vec_id == qid  # the query is its own nearest code
    qv = emb[qid]
    exact = sorted(emb, key=lambda v: (int(((emb[v] - qv) ** 2).sum()), v))[:10]
    recall = len({r.vec_id for r in rows} & set(exact)) / 10
    assert recall >= 0.2, recall


def test_ivf_quantized_probe_properties(spark):
    """l4k: result rows come only from the query's nprobe=2 nearest
    inverted lists, the query ranks first at distance 0 (it is its own
    nearest vector), distances are non-decreasing, and recall@10 vs the
    exact quantized-L2 scan clears the IVF floor (the probed lists hold
    a bounded fraction of the corpus; misses are vectors whose cluster
    the probe skipped — the documented IVF trade)."""
    import numpy as np

    from prometheus_remote_kinesis_spark.llm.similarity import _quantized_lloyd
    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = all_queries()["l4k_ivf_quantized"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    dists = [r.l2_dist for r in rows]
    assert dists == sorted(dists)
    assert len({r.cluster for r in rows}) <= 2  # nprobe lists only

    emb = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("embedding").isNotNull())
        .collect()
    }
    qid = min(emb)
    assert rows[0].vec_id == qid and rows[0].l2_dist == 0
    qv = emb[qid]
    exact = sorted(emb, key=lambda v: (int(((emb[v] - qv) ** 2).sum()), v))[:10]
    recall = len({r.vec_id for r in rows} & set(exact)) / 10
    assert recall >= 0.3, recall

    # membership sanity: every returned vector belongs to a probed list
    assigned, _, _ = _quantized_lloyd(spark, SF_SMOKE)
    by_vec = {r.vec_id: r.cluster for r in assigned.collect()}
    clusters = {r.cluster for r in rows}
    assert all(by_vec[r.vec_id] == r.cluster for r in rows)
    assert by_vec[qid] in clusters


def test_distribution_drift_tv_properties(spark):
    """d18: TV distance recomputed in exact Python fractions from the
    same bucket counts must equal the query's truncated-PPM output for
    every series (the rational-arithmetic claim run end to end), TV must
    sit in [0, 1], and identical splits must score 0 (comparing the
    reference half against itself)."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    got = {
        r.event_type: (r.n_ref, r.n_cand, r.n_buckets, r.tv_ppm)
        for r in all_queries()["d18_distribution_drift"].fn(spark, SF_SMOKE).collect()
    }
    assert got

    events = (
        load_table(spark, SF_SMOKE, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", F.floor("value").cast("long").alias("b"))
        .collect()
    )
    buckets: dict[str, dict[int, list[int]]] = {}
    for r in events:
        c = buckets.setdefault(r.event_type, {}).setdefault(r.b, [0, 0])
        c[r.event_id % 2] += 1
    for et, bs in buckets.items():
        n_ref = sum(c[0] for c in bs.values())
        n_cand = sum(c[1] for c in bs.values())
        nb = len(bs)
        tv = Fraction(0)
        for c_ref, c_cand in bs.values():
            tv += abs(
                Fraction(c_ref + 1, n_ref + nb) - Fraction(c_cand + 1, n_cand + nb)
            )
        tv /= 2
        assert 0 <= tv <= 1
        expect_ppm = int(tv * 1_000_000)  # truncation, same as DIV
        assert got[et] == (n_ref, n_cand, nb, expect_ppm), et


def test_power_iteration_quantized(spark, tmp_path):
    """l4m vs two ground truths: (a) STEP-FOR-STEP equality with an
    integer numpy re-implementation of the identical quantized
    recurrence on the real corpus (catches any operand-order or DIV-sign
    divergence the oracle pair might share), and (b) CONVERGENCE — on an
    engineered anisotropic corpus (one dominant direction, spectral gap
    ~20×) the two-step fixed-point vector must align with numpy's exact
    top eigenvector of XᵀX (|cosine| > 0.99)."""
    import os

    import numpy as np

    from prometheus_remote_kinesis_spark.llm.similarity import (
        L4M_ITERS,
        L4M_SCALE,
        l4m_power_iteration_quantized,
    )
    from prometheus_remote_kinesis_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    def int_reference(xq: np.ndarray) -> np.ndarray:
        # xq: (n, d) int64; the EXACT integer recurrence
        v = np.full(xq.shape[1], L4M_SCALE, dtype=np.int64)
        for _ in range(L4M_ITERS):
            dot = xq @ v                      # (n,)
            u = xq.T @ dot                    # (d,)
            m = np.abs(u).max()
            v = np.where(u >= 0, (u * L4M_SCALE) // m, -((-u * L4M_SCALE) // m))
        return v

    # (a) real corpus, step-for-step
    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .orderBy("vec_id")
            .collect()
        ]
    )
    xq = np.round(emb * L4M_SCALE).astype(np.int64)
    exp = int_reference(xq)
    got = {
        r.dim_idx: r.pc1_fp
        for r in l4m_power_iteration_quantized(spark, SF_SMOKE).collect()
    }
    assert [got[j + 1] for j in range(xq.shape[1])] == exp.tolist()

    # (b) engineered anisotropic corpus: x_i = a_i * w + small noise
    rng = np.random.RandomState(7)
    d, n = 16, 300
    w = rng.randn(d)
    w /= np.linalg.norm(w)
    X = np.outer(rng.randn(n) * 5.0, w) + rng.randn(n, d) * 0.25
    X = np.clip(X, -30, 30) / 60.0  # keep |x| small like the corpus
    sf = str(tmp_path / "l4m_aniso")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    got2 = l4m_power_iteration_quantized(spark, sf).orderBy("dim_idx").collect()
    v2 = np.array([r.pc1_fp for r in got2], dtype=np.float64)
    # exact top eigenvector of the QUANTIZED Gram (the operator's input)
    Xq = np.round(np.array(
        [[float(np.float32(x)) for x in row] for row in X]
    ) * L4M_SCALE)
    evals, evecs = np.linalg.eigh(Xq.T @ Xq)
    top = evecs[:, -1]
    cos = abs(v2 @ top) / (np.linalg.norm(v2) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_freq_split_verify_all_tiers_vs_brute_force(spark, tmp_path, monkeypatch):
    """The r11 l2j/l2k verify rebuild on an ENGINEERED corpus that
    drives all three tiers at once — which the driver SFs never do
    (their max posting length ~25 < L2_HOT_F): L2_HOT_F is pinned to 2
    so the boilerplate shingle every doc shares goes HOT (per-doc
    hot-array intersection), the distinctive shingles stay RARE
    (index-join counts), and two exact-duplicate docs exercise the
    set-digest short-circuit. Ground truth is the brute-force all-pairs
    Python scan; both l2j (symmetric) and l2k (directional) must match
    it EXACTLY — pairs, i, na, nb, ppm."""
    from prometheus_remote_kinesis_spark import llm
    from prometheus_remote_kinesis_spark.llm.dedup import (
        L2J_TAU_DEN, L2J_TAU_NUM, L2K_TAU_DEN, L2K_TAU_NUM, shingled_docs,
    )
    from prometheus_remote_kinesis_spark.registry import all_queries

    monkeypatch.setattr(llm.dedup, "L2_HOT_F", 2)

    # "w0 w1 ... " prose with a shared boilerplate tail: the tail's
    # shingles appear in EVERY doc (posting length 8 > 2 → hot); each
    # doc's leading run is distinctive (posting ≤ 2 → rare). Docs 6/7
    # duplicate docs 0/1 exactly (equal-set tier); docs 2/3 are a
    # near-dup pair sharing most of their leading run.
    boiler = "the quick brown fox jumps over lazy dogs"
    bodies = [
        "alpha beta gamma delta epsilon zeta",
        "omicron pi rho sigma tau upsilon",
        "one two three four five six seven eight nine",
        "one two three four five six seven eight late",
        "red orange yellow green blue indigo",
        "north south east west upward downward",
    ]
    rows = [(i, f"{b} {boiler}") for i, b in enumerate(bodies)]
    rows += [(6, rows[0][1]), (7, rows[1][1])]  # exact duplicates
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_dir = str(tmp_path / "corpus")
    docs.write.parquet(out_dir + "/documents.parquet")

    sets = {r.doc_id: set(r.sh) for r in shingled_docs(docs).collect()}
    # the engineered posting profile actually splits at L2_HOT_F=2
    from collections import Counter

    freq = Counter(g for s in sets.values() for g in s)
    assert max(freq.values()) > 2 and min(freq.values()) <= 2

    exp_j, exp_k = {}, {}
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            i = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if a < b and L2J_TAU_DEN * i >= L2J_TAU_NUM * (na + nb - i):
                exp_j[(a, b)] = (i, na, nb, i * 1_000_000 // (na + nb - i))
            if L2K_TAU_DEN * i >= L2K_TAU_NUM * na:
                exp_k[(a, b)] = (i, na, nb, i * 1_000_000 // na)
    # the corpus exercises equal-set pairs AND partial overlaps
    assert (0, 6) in exp_j and (2, 3) in exp_j and len(exp_k) >= len(exp_j)

    got_j = {
        (r.id_a, r.id_b): (r.i, r.na, r.nb, r.jaccard_ppm)
        for r in all_queries()["l2j_prefix_jaccard_join"]
        .fn(spark, out_dir)
        .collect()
    }
    got_k = {
        (r.id_a, r.id_b): (r.i, r.na, r.nb, r.containment_ppm)
        for r in all_queries()["l2k_containment_join"]
        .fn(spark, out_dir)
        .collect()
    }
    assert got_j == exp_j
    assert got_k == exp_k
