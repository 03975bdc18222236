"""Semantic checks for the approximate/rows-only operators: the driver
only row-counts these, so the real guarantees are asserted here."""

from __future__ import annotations

import math

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_matches_exact_near_dup(spark, sf_dir):
    """The banded-minhash ∪ prefix-filter candidate union, after exact
    verification, must EQUAL the all-pairs truth: the prefix tier is
    recall-1 by the PPJoin lemma and the verifier is exact, so the op is
    an exact similarity join, not a high-probability approximation —
    that equality is what lets the driver hash-certify it against
    NEAR_PAIRS_SQL."""
    exact = _pairs(REGISTRY["dedup_near"].fn(spark, sf_dir))
    lsh = _pairs(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert exact, "exact near-dup pairs should exist (planted corpus)"
    assert lsh == exact, (
        f"minhash+prefix pair set must equal truth: "
        f"missing={sorted(exact - lsh)[:5]} extra={sorted(lsh - exact)[:5]}"
    )


def test_minhash_banded_subset_and_recall(spark, sf_dir):
    """dedup_minhash_banded (the bench variant — band tier only, no
    prefix-filter safety net) carries a full collision-set oracle since
    r11 (the portable md5+affine family, BANDED_PAIRS_SQL), but the
    oracle replays the same formula — it certifies engine agreement,
    not the S-curve semantics. Those stay pinned here: (1) PRECISION
    1 — every emitted pair passes the same exact row-local verify, so
    the output is a subset of the all-pairs truth with identical
    jaccard values; (2) RECALL = the b=4,r=4 S-curve — measured ≥ 0.95
    on the planted corpus (the sf0.001 value is 181/183 under the
    portable family; a drop below the floor means the fixture or
    coefficients changed and the bench variant no longer represents
    the certified op's cost shape)."""
    exact_df = REGISTRY["dedup_near"].fn(spark, sf_dir)
    banded_df = REGISTRY["dedup_minhash_banded"].fn(spark, sf_dir)
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact_df.collect()}
    banded = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in banded_df.collect()}
    assert exact, "exact near-dup pairs should exist (planted corpus)"
    extra = set(banded) - set(exact)
    assert not extra, f"banded emitted non-qualifying pairs: {sorted(extra)[:5]}"
    mismatched = [p for p in banded if banded[p] != exact[p]]
    assert not mismatched, f"jaccard mismatch on {mismatched[:5]}"
    recall = len(banded) / len(exact)
    assert recall >= 0.95, f"banded recall {recall:.3f} < 0.95 floor"


def test_portable_minhash_base_hash_parity(spark):
    """The dedup_minhash_banded oracle bridge rests on one cross-engine
    primitive: int64-of-first-15-md5-hex-chars must agree between Spark
    (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
    (`('0x'||substr(md5(s),1,15))::BIGINT`). md5 itself is standardized;
    this pins the hex-parse halves against each other on strings
    shaped like real shingles (plus edge shapes: empty, unicode,
    leading-zero hex digest)."""
    import duckdb

    samples = [
        "", "a", "the quick brown", "fox jumps over", "naïve café",
        "abc", "0", "lorem ipsum dolor", "12 34 56", "x" * 50,
    ]
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame(
            [(s,) for s in samples], "s string"
        ).selectExpr(
            "s", "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) AS h"
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        want = con.sql(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", params=[s]
        ).fetchone()[0]
        assert got[s] == want, f"hash divergence on {s!r}: {got[s]} != {want}"


def test_ann_lsh_overlaps_brute_force(spark, sf_dir):
    """Bucketed ANN top-10 should share members with the exact top-10."""
    exact = [r["vec_id"] for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()]
    ann = [r["vec_id"] for r in REGISTRY["sim_ann_lsh"].fn(spark, sf_dir).collect()]
    assert len(ann) > 0, "probe bucket must not be empty"
    # ANN scores exact cosine within the bucket, so any shared candidate
    # ranks identically; require non-trivial overlap.
    overlap = len(set(exact) & set(ann))
    assert overlap >= 2, f"ANN top-10 shares only {overlap} of exact top-10"


def test_ann_ivf_overlaps_brute_force(spark, sf_dir):
    """IVF top-10 (nprobe=4 of 16 lists) must overlap the exact top-10
    substantially — near neighbors concentrate in near lists."""
    exact = [r["vec_id"] for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()]
    ivf = [r["vec_id"] for r in REGISTRY["sim_ann_ivf"].fn(spark, sf_dir).collect()]
    assert len(ivf) == 10
    overlap = len(set(exact) & set(ivf))
    assert overlap >= 3, f"IVF top-10 shares only {overlap} of exact top-10"


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """The tolerance check is computed IN-PLAN (approx_ok); here we
    assert the verdict holds for every group and the exact side is
    sane."""
    rows = REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_ok"], f"{r['event_type']}: HLL outside 5% of exact"
        assert r["exact_users"] > 0


def test_dedup_cluster_transitive_closure(spark, sf_dir):
    """Planted triangle (base, +1M exact copy, +2M near copy) must land
    in one cluster with canonical = base doc_id."""
    rows = REGISTRY["dedup_cluster"].fn(spark, sf_dir).collect()
    assert rows, "dup clusters must exist"
    by_cluster = {r["cluster_id"]: r for r in rows}
    # Docs divisible by 70 have BOTH an exact copy (÷10) and a near copy
    # (÷7): all three must collapse into the base-id cluster of size >= 3.
    triangles = [c for c in by_cluster.values()
                 if c["cluster_id"] < 1000000 and c["cluster_id"] % 70 == 0]
    assert triangles, "expected triangle clusters for doc_id % 70 == 0"
    for c in triangles:
        assert c["canonical_id"] == c["cluster_id"], "canonical must be min id"
        assert c["cluster_size"] >= 3, f"triangle not closed: {c}"


def test_dedup_cluster_unpersists_superseded_generations(spark, sf_dir):
    """Iterative label propagation must not accumulate cached label
    generations: each round unpersists the superseded frame, so at most
    edges + the live labels (+ dedup_near's shingle base) stay cached
    after the run — at 100× each leaked generation is corpus-sized
    executor memory."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    REGISTRY["dedup_cluster"].fn(spark, sf_dir).collect()
    after = jsc.getPersistentRDDs().size()
    # edges + final labels + dedup_near's shingle persist = 3; ten label
    # generations would show up as ~12.
    assert after - before <= 3, (
        f"cached RDDs grew {before}->{after}: label generations leaking"
    )


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """Sketch-vs-exact tolerance is computed IN-PLAN (approx_ok);
    assert the verdict and exact-percentile ordering per group."""
    rows = REGISTRY["agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_ok"], f"{r['l_returnflag']}: sketch outside 2%"
        assert r["exact_p50"] <= r["exact_p95"]


def test_compaction_reduces_files_conserves_rows(spark, sf_dir):
    row = REGISTRY["sink_compaction"].fn(spark, sf_dir).collect()[0]
    assert row["conserved"]
    assert row["files_after"] < row["files_before"]
    assert row["files_after"] <= 4


def test_simhash_near_dups_are_close(spark, sf_dir):
    """Planted near-copies (doc_id+2_000_000) must land within small
    Hamming distance of their originals; random pairs must not."""
    sig = {r["doc_id"]: r["simhash"] for r in REGISTRY["dedup_simhash"].fn(spark, sf_dir).collect()}
    planted = [(d, d + 2000000) for d in sig if d < 1000000 and d + 2000000 in sig]
    assert planted, "planted near-dups missing"
    hams = [bin(sig[a] ^ sig[b]).count("1") for a, b in planted]
    # Appending 3 words to a ~60-word doc flips low-margin bits: expect a
    # small mean distance, clearly separated from the random baseline
    # (~16 of 32 bits for unrelated docs).
    base_ids = sorted(d for d in sig if d < 1000000)
    rand = [
        bin(sig[a] ^ sig[b]).count("1")
        for a, b in zip(base_ids[: len(planted)], base_ids[::-1][: len(planted)])
        if a != b
    ]
    mean_planted = sum(hams) / len(hams)
    mean_rand = sum(rand) / len(rand)
    assert mean_planted < 8, f"planted near-dup mean hamming {mean_planted:.1f}"
    assert mean_planted < mean_rand / 2, (
        f"no separation: planted {mean_planted:.1f} vs random {mean_rand:.1f}"
    )
    exact_copies = [(d, d + 1000000) for d in sig if d < 1000000 and d + 1000000 in sig]
    assert all(sig[a] == sig[b] for a, b in exact_copies), "exact copies must hash equal"


def test_dedup_exact_idempotent(spark, sf_dir):
    """Removing duplicates then re-running the detector finds nothing:
    dedup is a fixed point (SURVEY.md §5.2 property)."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.llmops.corpus import dup_corpus

    corpus = dup_corpus(spark, sf_dir)
    canonical = corpus.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = corpus.join(
        canonical, corpus.doc_id == canonical.doc_id, "left_semi"
    )
    again = (
        deduped.groupBy(F.md5("text"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    assert again.count() == 0


def test_minhash_signatures_deterministic_and_exact(spark, sf_dir):
    """Regression: rebuilding the minhash plan must give identical
    signatures (a Python-lambda-over-SQL-lambda nest once made them
    build-dependent), and array-min signatures must equal the exploded
    ground truth."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.llmops.corpus import dup_corpus, shingle_array

    def build():
        arrs = shingle_array(dup_corpus(spark, sf_dir))
        return arrs.select(
            "doc_id",
            F.expr("array_min(transform(grams, s -> xxhash64(s, 0)))").alias("mh0"),
        )

    a = {r["doc_id"]: r["mh0"] for r in build().collect()}
    b = {r["doc_id"]: r["mh0"] for r in build().collect()}
    assert a == b, "signatures must not depend on plan build"

    arrs = shingle_array(dup_corpus(spark, sf_dir))
    gt = (
        arrs.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id")
        .agg(F.min(F.xxhash64(F.col("g"), F.lit(0))).alias("m"))
    )
    want = {r["doc_id"]: r["m"] for r in gt.collect()}
    assert a == want, "array-min signature must equal exploded ground truth"


def test_decode_png_deterministic(spark, sf_dir):
    a = REGISTRY["multimodal_decode_png"].fn(spark, sf_dir).collect()
    b = REGISTRY["multimodal_decode_png"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["decoded_ok"] for r in a)


def test_png_codec_roundtrip_and_rejection():
    """The stdlib PNG codec's own contract, no Spark: (1) encode→decode
    round-trips width/height/mean over ids covering every filter-type
    mix and boundary widths; (2) a flipped IDAT byte fails the CRC
    check; (3) a truncated file and a non-PNG payload are rejected —
    dead-letter discipline, never silent garbage."""
    import struct
    import zlib

    from cdc_pubsub_spark.llmops.multimodal import _synth_png, decode_png

    for doc_id in [0, 1, 7, 13, 59, 107, 500]:
        png = _synth_png(doc_id)
        w, h = 5 + doc_id % 12, 4 + doc_id % 9
        raster = bytes(
            (doc_id * 23 + j * 7) % 256 for j in range(w * h * 3)
        )
        feats = decode_png(png)
        assert feats == {
            "width": w,
            "height": h,
            "mean_lum": sum(raster) // (w * h * 3),
        }, doc_id

    png = bytearray(_synth_png(42))
    # Locate IDAT and flip one payload byte WITHOUT fixing the CRC.
    idx = bytes(png).index(b"IDAT")
    (ln,) = struct.unpack(">I", bytes(png[idx - 4 : idx]))
    png[idx + 4 + ln // 2] ^= 0xFF
    try:
        decode_png(bytes(png))
        raise AssertionError("corrupted IDAT must fail the CRC check")
    except ValueError as ex:
        assert "CRC" in str(ex)

    good = _synth_png(42)
    try:
        decode_png(good[: len(good) - 20])
        raise AssertionError("truncated PNG must be rejected")
    except ValueError:
        pass
    try:
        decode_png(b"not a png at all")
        raise AssertionError("non-PNG payload must be rejected")
    except ValueError as ex:
        assert "signature" in str(ex)
    # zlib corruption INSIDE a chunk whose CRC was recomputed (a valid
    # container carrying a broken stream) must still raise, from inflate.
    idx = good.index(b"IDAT")
    (ln,) = struct.unpack(">I", good[idx - 4 : idx])
    body = bytearray(good[idx + 4 : idx + 4 + ln])
    body[0] ^= 0xFF
    fixed_crc = struct.pack(
        ">I", zlib.crc32(b"IDAT" + bytes(body)) & 0xFFFFFFFF
    )
    patched = (
        good[: idx + 4]
        + bytes(body)
        + fixed_crc
        + good[idx + 8 + ln :]
    )
    try:
        decode_png(patched)
        raise AssertionError("broken zlib stream must be rejected")
    except (ValueError, zlib.error):
        pass


def test_contamination_finds_planted_copies(spark, sf_dir):
    """Every probe must hit its own source doc, and probes whose source
    doc has a planted exact copy (doc_id % 10 == 0, which every % 50
    probe satisfies) must register that copy as a second hit. first_hit
    may be an EARLIER doc than the probe — the synthetic corpus contains
    genuine cross-doc prefix repetition (e.g. docs 0 and 50 share their
    opening 8-gram), which is exactly the contamination the op exists to
    surface."""
    rows = {
        r["probe_id"]: (r["n_hits"], r["first_hit"], r["self_hit"])
        for r in REGISTRY["text_contamination"].fn(spark, sf_dir).collect()
    }
    assert rows, "probes must exist"
    for probe_id, (n_hits, first_hit, self_hit) in rows.items():
        assert self_hit, f"probe {probe_id}: self-hit missing"
        assert first_hit <= probe_id, f"probe {probe_id}: min over hits broken"
        assert n_hits >= 2, f"probe {probe_id}: planted copy not caught"


def test_embed_centroid_partitions_all_vectors(spark, sf_dir):
    """Cluster sizes must sum to the table size; inertia is positive for
    any non-degenerate cluster."""
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["embed_centroid"].fn(spark, sf_dir).collect()
    total = load(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == total
    for r in rows:
        assert r["avg_dist"] > 0 and r["centroid_norm"] > 0


def test_pii_redact_exactly_planted_docs(spark, sf_dir):
    """Redaction must fire on exactly the planted docs (doc_id % 13 == 0)
    with one email + one phone each, and placeholders must appear."""
    rows = {
        r["doc_id"]: (r["n_emails"], r["n_phones"])
        for r in REGISTRY["text_pii_redact"].fn(spark, sf_dir).collect()
    }
    assert rows and all(d % 13 == 0 for d in rows)
    assert all(v == (1, 1) for v in rows.values())


def test_hll_sketch_union_within_tolerance(spark, sf_dir):
    """Per-type AND merged-global HLL tolerance verdicts (computed
    in-plan) must hold, and the global exact must equal the true
    distinct count over the table."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["agg_hll_sketch_union"].fn(spark, sf_dir).collect()
    by_type = {r.event_type: r for r in rows}
    assert "ALL" in by_type
    for t, r in by_type.items():
        assert r.approx_ok, f"{t}: sketch outside 5% of exact"
        assert r.exact_users > 0
    exact_all = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert by_type["ALL"].exact_users == exact_all


def test_chunk_overlap_reconstructs_documents(spark, sf_dir):
    """Chunk coverage invariants on the real corpus: (a) stride slices of
    the chunks concatenate back to the exact document; (b) consecutive
    chunks overlap by exactly chunk-stride chars; (c) every chunk except
    the last is full-length."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .collect()
    }
    # Re-run the operator but keep the chunk text for verification.
    chunks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, cast(floor((length(text)-1)/150) AS int)),"
                    " vk -> substring(text, vk * 150 + 1, 200))"
                )
            ).alias("chunk_id", "chunk"),
        )
        .collect()
    )
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk))
    assert set(by_doc) == set(docs)
    for doc_id, parts in by_doc.items():
        parts.sort()
        text = docs[doc_id]
        rebuilt = "".join(
            c[:150] if i < len(parts) - 1 else c for i, (_, c) in enumerate(parts)
        )
        assert rebuilt == text, f"doc {doc_id} not reconstructed"
        for (_, a), (_, b) in zip(parts, parts[1:]):
            assert a[150:200] == b[: len(a[150:200])], f"doc {doc_id} overlap broken"
        for cid, c in parts:
            start = cid * 150 + 1
            assert len(c) == min(200, len(text) - start + 1), f"doc {doc_id}"


def test_real_codecs_on_handcrafted_bytes():
    """The decoders are REAL parsers, not formula replays: feed them
    hand-built payloads the synthesizers never produce — a WAV with an
    extra LIST chunk and an odd-size pad before data, a PPM with a
    comment line and multi-digit dims — and check field-exact output."""
    import struct

    from cdc_pubsub_spark.llmops.multimodal import (
        decode_ppm,
        decode_ppm_stream,
        decode_wav,
    )

    # WAV: 3 samples at 22050 Hz, LIST chunk (odd size → pad byte) first.
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 22050, 1, 8)
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # pad
    body = (
        b"WAVE" + lst
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 3) + bytes([128, 28, 255])
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    feats = decode_wav(wav)
    assert feats == {
        "sample_rate": 22050,
        "duration_ms": 3 * 1000 // 22050,
        "peak_amp": 127,  # |255-128|
    }

    # PPM: comment in header, 12×2 raster of constant 10s → mean_lum 10.
    ppm = b"P6\n# a comment\n12 2\n255\n" + bytes([10] * (12 * 2 * 3))
    assert decode_ppm(ppm) == {"width": 12, "height": 2, "mean_lum": 10}

    # PPM stream: 3 frames of 2x1.
    frame = b"P6\n2 1\n255\n" + bytes(6)
    assert decode_ppm_stream(frame * 3) == {
        "n_frames": 3,
        "width": 2,
        "height": 1,
    }

    # Corrupt payloads must raise, not return garbage.
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + wav[4:])
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + bytes(5))  # truncated raster


def test_av_features_kernel_dispatch(spark, sf_dir):
    """Per-mime dispatch: each mime's feature columns are populated
    exactly as its real decoder computes them from the synthesized
    payload bytes (re-decoded locally), non-matching columns stay null,
    and unknown mimes survive with decoded_ok=false."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.llmops.multimodal import (
        _synth_ppm,
        _synth_ppm_stream,
        _synth_wav,
        decode_ppm,
        decode_ppm_stream,
        decode_wav,
    )
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    rows = {r.doc_id: r for r in REGISTRY["multimodal_av_features"].fn(spark, sf_dir).collect()}
    src = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 600).collect()
    assert len(rows) == len(src)
    n_by_mime: dict = {}
    for s in src:
        r = rows[s.doc_id]
        n_by_mime[r.mime] = n_by_mime.get(r.mime, 0) + 1
        if r.mime == "image/ppm":
            ref = decode_ppm(_synth_ppm(s.doc_id))
            assert (r.width, r.height, r.mean_lum) == (
                ref["width"], ref["height"], ref["mean_lum"],
            )
            assert r.duration_ms is None and r.n_frames is None
        elif r.mime == "audio/wav":
            ref = decode_wav(_synth_wav(s.doc_id))
            assert (r.duration_ms, r.sample_rate, r.peak_amp) == (
                ref["duration_ms"], ref["sample_rate"], ref["peak_amp"],
            )
            assert r.width is None and r.n_frames is None
        elif r.mime == "video/x-ppm-stream":
            ref = decode_ppm_stream(_synth_ppm_stream(s.doc_id))
            assert (r.n_frames, r.width, r.height) == (
                ref["n_frames"], ref["width"], ref["height"],
            )
            assert r.duration_ms is None
        else:
            assert not r.decoded_ok
            assert r.width is None and r.duration_ms is None and r.n_frames is None
    # All four routes must actually occur in the fixture slice.
    assert {
        "image/ppm", "audio/wav", "video/x-ppm-stream",
        "application/octet-stream",
    } <= set(n_by_mime)


def test_pca_projection_properties(spark, sf_dir):
    """PCA invariants on the real embeddings: (a) 8-dim output for every
    vector; (b) projected variance is non-increasing across components
    up to power-iteration convergence slack (T=6 deflated iterations,
    so adjacent components may be a whisker out of order but never
    grossly); (c) component means are ~0 (centering); (d) total
    projected variance ≤ total input variance with the top-8 capturing
    a strictly positive share; (e) deterministic across runs; (f) the
    iterate basis is near-orthonormal after de-quantization."""
    import numpy as np

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    out = REGISTRY["embed_pca_project"].fn(spark, sf_dir).collect()
    P = np.array([[getattr(r, f"p{c}") for c in range(8)] for r in out])
    assert P.shape == (len(out), 8)
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] * 0.9 - 1e-12 for i in range(7)), var
    assert np.abs(P.mean(axis=0)).max() < 1e-3
    X = np.stack([np.array(r.embedding, dtype=np.float64)
                  for r in load(spark, sf_dir, "embeddings").collect()])
    total_var = X.var(axis=0).sum()
    assert 0 < var.sum() <= total_var + 1e-6
    out2 = REGISTRY["embed_pca_project"].fn(spark, sf_dir).collect()
    key = lambda r: (r.vec_id, tuple(getattr(r, f"p{c}") for c in range(8)))
    assert sorted(map(key, out2)) == sorted(map(key, out))


def test_pca_reference_iteration_is_orthonormal_basis():
    """The quantized power iteration's basis quality, checked directly
    on exact moments from the sf0.001 embeddings: de-quantized iterate
    vectors are unit-norm by construction and pairwise near-orthogonal
    (deflation), and their Rayleigh quotients are non-increasing up to
    convergence slack."""
    import duckdb
    import numpy as np

    from cdc_pubsub_spark.llmops import pca

    con = duckdb.connect()
    X = np.stack(
        con.sql(
            "SELECT embedding FROM"
            " read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
            " ORDER BY vec_id"
        )
        .df()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    Xq = np.floor(X * 1000000.0 + 0.5).astype(object)
    n = len(Xq)
    S = [int(v) for v in Xq.sum(axis=0)]
    XX = [[int(v) for v in row] for row in (Xq.T @ Xq)]
    W, VV = pca.power_iteration_reference(n, S, XX)
    Wn = np.array(
        [[w / np.sqrt(vv) for w in row] for row, vv in zip(W, VV)]
    )
    G = Wn @ Wn.T
    assert np.abs(np.diag(G) - 1.0).max() < 1e-6
    off = np.abs(G - np.diag(np.diag(G))).max()
    assert off < 0.05, off  # deflation keeps components near-orthogonal
    M = np.array(
        [[float(n * XX[i][j] - S[i] * S[j]) for j in range(64)] for i in range(64)]
    )
    ray = [float(w @ M @ w) for w in Wn]
    assert all(ray[i] >= ray[i + 1] * 0.9 for i in range(len(ray) - 1)), ray


def test_kmeans_inertia_monotone_and_deterministic(spark, sf_dir):
    """Lloyd's guarantee on the real corpus: total inertia never
    increases across iterations, every vector lands in exactly one of
    k clusters, and the whole run is bit-deterministic across repeats
    (broadcast centroids + fixed tie-breaks)."""
    from cdc_pubsub_spark.llmops.similarity import _kmeans_run
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    _, trace, _, _ = _kmeans_run(spark, sf_dir, k=8, iters=4)
    assert len(trace) == 4
    for a, b in zip(trace, trace[1:]):
        assert b <= a * (1 + 1e-9), f"inertia increased: {trace}"
    assert trace[-1] < trace[0], "k-means never improved on init"

    out1 = REGISTRY["embed_kmeans"].fn(spark, sf_dir).collect()
    out2 = REGISTRY["embed_kmeans"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    n_total = sum(r["n_members"] for r in out1)
    assert n_total == load(spark, sf_dir, "embeddings").count()


def test_containment_catches_prefix_dups_jaccard_misses(spark, sf_dir):
    """Every planted 30-word prefix (doc_id+3M) must pair with its base
    doc at containment ~1.0 — and those same pairs must score BELOW the
    0.6 Jaccard near-dup threshold, proving the asymmetric measure
    catches subset duplication the symmetric one cannot."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in REGISTRY["dedup_containment"].fn(spark, sf_dir).collect()
    }
    base_ids = [
        r.doc_id
        for r in load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 1500) & (F.col("doc_id") % 9 == 0))
        # prefix shingling needs >= 30 words to differ from the base
        .filter(F.size(F.split("text", " ")) > 31)
        .collect()
    ]
    assert base_ids
    for d in base_ids:
        pair = (d, d + 3000000)
        assert pair in out, f"planted prefix pair {pair} not caught"
        assert out[pair] >= 0.97, f"{pair}: containment {out[pair]}"
    # The same prefix pairs under symmetric Jaccard: for docs at least
    # twice the prefix length, jacc ≈ 28/(n_words-2) < 0.6 — the subset
    # signal dilutes with the long side. (Short docs where the prefix IS
    # most of the doc are legitimately Jaccard-visible; skip those.)
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 1500).collect()}
    def shingleset(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i+3]) for i in range(len(ws) - 2)}
    long_ids = [d for d in base_ids if len(docs[d].split(" ")) >= 65]
    assert long_ids, "corpus has no docs twice the prefix length"
    for d in long_ids[:20]:
        full = shingleset(docs[d])
        pref = shingleset(" ".join(docs[d].split(" ")[:30]))
        jacc = len(full & pref) / len(full | pref)
        assert jacc < 0.6, f"doc {d}: prefix pair visible to Jaccard ({jacc:.2f})"


def test_frame_sample_stride_and_bounds(spark, sf_dir):
    """Frame sampling: every emitted index is a multiple of the stride
    (5), inside [0, n_frames), and each doc emits exactly
    ceil(n_frames/5) frames — the JVM-side expansion contract."""
    rows = REGISTRY["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    assert rows
    per_doc: dict = {}
    for r in rows:
        assert r.frame_idx % 5 == 0
        assert 0 <= r.frame_idx < r.n_frames
        per_doc.setdefault(r.doc_id, [0, r.n_frames])
        per_doc[r.doc_id][0] += 1
    for doc_id, (n_emitted, n_frames) in per_doc.items():
        assert n_emitted == -(-n_frames // 5), doc_id


def test_binary_ingest_round_trips_real_file_bytes(spark, sf_dir):
    """binaryFile ingestion: the written partition dirs' byte totals
    (re-read with binaryFile) must equal both the on-disk du of each
    g= directory AND the closed-form sum(utf8_bytes(text) + 1) per
    doc_id % 16 group."""
    import os

    from cdc_pubsub_spark.paths import work_dir

    got = {r.g: (r.n_docs, r.n_bytes) for r in
           REGISTRY["multimodal_binary_ingest"].fn(spark, sf_dir).collect()}
    docs = REGISTRY["multimodal_binary_ingest"]  # noqa: F841  (op ran above)
    out_dir = work_dir("multimodal_binary_ingest")
    for g, (n_docs, n_bytes) in got.items():
        d = os.path.join(out_dir, f"g={g}")
        on_disk = sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("part-")
        )
        assert on_disk == n_bytes, (g, on_disk, n_bytes)
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    expect: dict = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        g = doc_id % 16
        n, b = expect.get(g, (0, 0))
        expect[g] = (n + 1, b + len(text.encode("utf-8")) + 1)
    assert got == expect


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_dir):
    """The learned-quantizer IVF must return exact cosines that overlap
    the brute-force top-10 with recall >= 0.8, never include the probe,
    and agree with sim_cosine_topk's scores on the overlap."""
    truth = {
        r["vec_id"]: r["cos_sim"]
        for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    got = {
        r["vec_id"]: r["cos_sim"]
        for r in REGISTRY["sim_ann_ivf_kmeans"].fn(spark, sf_dir).collect()
    }
    assert 1 not in got, "probe must not be its own neighbor"
    hits = set(got) & set(truth)
    assert len(hits) >= 8, f"recall {len(hits)}/10 below 0.8"
    for v in hits:
        assert abs(got[v] - truth[v]) < 1e-9, "rescore must be exact cosine"


def test_ann_recall_audit_floors_and_determinism(spark, sf_dir):
    """The audit table must contain all four tiers, brute force at
    recall 1.0, every tier above its floor, and be identical across
    two runs (deterministic variants => reproducible audit)."""
    a = {
        r["variant"]: r
        for r in REGISTRY["sim_ann_recall_audit"].fn(spark, sf_dir).collect()
    }
    assert set(a) == {"brute_force", "ivf_seeded", "ivf_kmeans", "lsh_bucket"}
    assert a["brute_force"]["recall_at_10"] == 1.0
    for tier, floor in (("ivf_seeded", 0.8), ("ivf_kmeans", 0.8),
                        ("lsh_bucket", 0.3)):
        assert a[tier]["recall_at_10"] >= floor, (
            f"{tier} recall {a[tier]['recall_at_10']} under {floor}"
        )
    b = {
        r["variant"]: r["recall_at_10"]
        for r in REGISTRY["sim_ann_recall_audit"].fn(spark, sf_dir).collect()
    }
    assert b == {k: v["recall_at_10"] for k, v in a.items()}, (
        "audit must be rerun-deterministic"
    )


def test_ann_pq_overlaps_brute_force(spark, sf_dir):
    """PQ top-10 (8x16 deterministic codebooks, ADC ranking) must share
    members with the exact cosine top-10 — quantized distances are
    approximate, but near neighbors survive 32x compression."""
    exact = [
        r["vec_id"] for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    ]
    pq = [r["vec_id"] for r in REGISTRY["sim_ann_pq"].fn(spark, sf_dir).collect()]
    assert len(pq) == 10
    overlap = len(set(exact) & set(pq))
    assert overlap >= 2, f"PQ top-10 shares only {overlap} of exact top-10"


def test_ann_pq_adc_monotone_output(spark, sf_dir):
    """Rows come back ranked by the integer ADC distance (ascending),
    and every adc_ud2 is non-negative."""
    rows = REGISTRY["sim_ann_pq"].fn(spark, sf_dir).collect()
    ds = [r["adc_ud2"] for r in rows]
    assert ds == sorted(ds) and all(d >= 0 for d in ds)


def test_mmr_diversifies_and_ranks(spark, sf_dir):
    """MMR invariants: 10 distinct picks; rank 1 is the raw-relevance
    argmax; scores are the documented integer blend; and the selection
    is genuinely diversity-aware (every later pick's score folds in
    its max similarity to the already-selected set, keeping it within
    the +-3e6 micro-unit band around pure relevance)."""
    rows = REGISTRY["sim_rerank_mmr"].fn(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert len({r["vec_id"] for r in rows}) == 10
    assert rows[0]["score_u"] == 7 * rows[0]["relu"]
    # score = 7*relu - 3*max_sim with max_sim in [-1e6, 1e6] micro-units
    # (cosine can be negative, so score may EXCEED 7*relu): the blend
    # stays inside the +-3e6 band around pure relevance.
    assert all(abs(r["score_u"] - 7 * r["relu"]) <= 3_000_000 for r in rows)


def test_logreg_actually_learns(spark, sf_dir):
    """The certified logistic regression must genuinely descend: final
    accuracy well above the ~0.65 majority-class base rate, a non-zero
    weight vector, a populated confusion matrix (not the all-negative
    collapse), and counts that tile the corpus."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    r = REGISTRY["ml_logreg_quality"].fn(spark, sf_dir).collect()[0]
    n_docs = load(spark, sf_dir, "documents").count()
    assert r.tp + r.fp + r.fn + r.tn == n_docs
    assert r.tp > 0 and r.tn > 0, "degenerate single-class predictor"
    assert r.accuracy >= 0.85, r.accuracy
    assert any(getattr(r, f"w{j}") != 0 for j in range(8))


def test_linreg_recovers_planted_coefficients(spark, sf_dir):
    """The normal-equation solver must recover the planted generating
    coefficients (50000, 300, 1200) within the hash-noise error bar,
    with near-total variance explained."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["ml_linreg_normal_eq"].fn(spark, sf_dir).collect()[0]
    assert abs(r.w_intercept_cents - 50000) < 100, r.w_intercept_cents
    assert abs(r.w_qty_cents - 300) < 5, r.w_qty_cents
    assert abs(r.w_disc_cents - 1200) < 20, r.w_disc_cents
    assert r.r2_fit > 0.97, r.r2_fit


def test_roc_auc_recovers_planted_separation(spark, sf_dir):
    """The binned Mann-Whitney AUC must recover the planted monotone
    signal (positive rate = (150 + 14·q)/1000 over q ∈ 1..50): the
    closed-form AUC of that construction is ≈0.735, far from the 0.5
    no-signal point, and Gini must equal 2·AUC − 1 up to the two
    independent r4 roundings."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["ml_roc_auc"].fn(spark, sf_dir).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.70 <= r.auc <= 0.77, r.auc
    assert abs(r.gini - (2 * r.auc - 1)) < 2e-4, (r.gini, r.auc)
    # pairwise-win count is bounded by 2·P·N by construction
    assert 0 < r.auc_pairs_x2 < 2 * r.n_pos * r.n_neg


def test_kfold_cv_folds_recover_planted_model(spark, sf_dir):
    """Every leave-fold-out model must recover the planted coefficients
    and every held-out fold's RMSE must sit at the planted noise floor
    (uniform ±10 dollars → std ≈ 5.78), i.e. no fold overfits or
    leaks — the moment-subtraction trick yields five genuine models."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ml_kfold_cv"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]
    n_total = rows[0].n_train + rows[0].n_test
    for r in rows:
        assert r.n_train + r.n_test == n_total
        assert abs(r.w_qty_cents - 300) < 10, r
        assert abs(r.w_disc_cents - 1200) < 40, r
        assert 4.5 <= r.rmse_dollars <= 7.0, r


def test_collocations_pmi_marginal_consistency(spark, sf_dir):
    """Every surfaced pair respects its own marginals (c12 ≤ min(c1,
    c2)), meets min support, and pmi = ln(lift) up to the two
    independent r4 floors; the list is lift-descending."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["text_collocations_pmi"].fn(spark, sf_dir).collect()
    assert rows, "no collocations above min support"
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.c12 >= 5
        assert r.c12 <= min(r.c1, r.c2)
        assert r.lift > 0
        assert abs(r.pmi - math.log(r.lift)) < 2e-3, r


def test_calibration_matches_planted_generator(spark, sf_dir):
    """The score IS the generator, so every decile's observed rate must
    track its mean predicted probability within sampling noise and the
    overall ECE must sit at the noise floor — a miscalibrated result
    means one engine's binning or rate arithmetic is wrong."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ml_calibration_bins"].fn(spark, sf_dir).collect()
    assert 5 <= len(rows) <= 9
    for r in rows:
        # 4-sigma binomial noise bound for the bin's sample size
        sigma = (r.mean_pred * (1 - r.mean_pred) / r.n_rows) ** 0.5
        assert abs(r.obs_rate - r.mean_pred) <= 4 * sigma + 1e-4, r
    ece = rows[0].ece
    assert all(r.ece == ece for r in rows)
    assert ece <= 0.03, ece


def test_ngram_novelty_bounds_and_split_consistency(spark, sf_dir):
    """Novel types are a subset of val types; the rate matches the
    counts; the split populations agree with corpus_train_val_split
    (the one-place-threshold rule made observable)."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["text_ngram_novelty"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.n_novel_types <= r.n_val_types
    assert r.n_train_types > 0 and r.n_val_types > 0
    expect = (
        math.floor(r.n_novel_types / r.n_val_types * 10000 + 0.5) / 10000
    )
    assert r.novelty_rate == expect


def test_linreg_inference_error_bars(spark, sf_dir):
    """The planted coefficients must be recovered WITHIN their own
    reported error bars (|beta − truth| ≤ 4·se — the op's se must be
    a genuine confidence statement, not a decoration) and both slope
    t-statistics must be enormous (planted signal ≫ noise)."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ml_linreg_inference"].fn(spark, sf_dir).collect()
    by = {r.feature: r for r in rows}
    assert set(by) == {"intercept", "quantity", "discount"}
    truth = {"intercept": 50000, "quantity": 300, "discount": 1200}
    for name, r in by.items():
        assert r.se_cents > 0
        assert abs(r.beta_cents - truth[name]) <= 4 * r.se_cents, r
    assert by["quantity"].t_stat > 50
    assert by["discount"].t_stat > 50


def test_decode_gif_codec_rejects_corruption():
    """The GIF/LZW codec must decode its own encodings bit-exactly for
    every shape/palette combination AND hard-fail (never emit garbage)
    on signature, truncation, and bitstream corruption — the
    dead-letter stance of the sibling codecs."""
    from cdc_pubsub_spark.llmops.multimodal import _synth_gif, decode_gif

    for doc_id in range(0, 60):
        f = decode_gif(_synth_gif(doc_id))
        nc = 1 << (2 + doc_id % 3)
        w, h = 6 + doc_id % 14, 5 + doc_id % 11
        tot = sum(
            ((doc_id * 7 + j * 3) % nc * 37 + doc_id) % 256
            + ((doc_id * 7 + j * 3) % nc * 59 + doc_id * 2) % 256
            + ((doc_id * 7 + j * 3) % nc * 83 + doc_id * 3) % 256
            for j in range(w * h)
        )
        assert f == {
            "width": w,
            "height": h,
            "n_colors": nc,
            "mean_lum": tot // (w * h * 3),
        }, doc_id
    good = _synth_gif(123)
    for bad in (
        b"JFIF" + good[4:],          # wrong signature
        good[: len(good) - 6],       # truncated mid-stream
    ):
        try:
            decode_gif(bad)
            raise AssertionError("corrupt GIF must raise")
        except (ValueError, IndexError):
            pass
    # flip a byte INSIDE the LZW payload: the dictionary replay must
    # derail into a bad code or a pixel-count mismatch, never return
    # silently wrong stats for the planted construction
    corrupt = bytearray(good)
    lzw_start = 13 + 3 * (1 << (2 + 123 % 3)) + 10 + 1 + 1
    corrupt[lzw_start + 3] ^= 0xFF
    try:
        f = decode_gif(bytes(corrupt))
        # a lucky flip can still decode to SOME pixel string of the
        # right length; it must at least differ from the true image
        assert f != decode_gif(good)
    except (ValueError, IndexError):
        pass


def test_pr_auc_dominates_prevalence_and_is_bounded(spark, sf_dir):
    """AP of the planted monotone score must beat the random-classifier
    baseline (prevalence) and stay a valid probability; with ~half the
    rows positive, AP and ROC AUC should land in the same region."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["ml_pr_auc"].fn(spark, sf_dir).collect()[0]
    assert 0.0 < r.avg_precision <= 1.0
    assert r.avg_precision > r.prevalence + 0.05
    assert abs(r.prevalence - r.n_pos / (r.n_pos + r.n_neg)) < 1e-4


def test_js_divergence_bounds(spark, sf_dir):
    """JSD is symmetric and bounded by ln 2; two different natural
    languages over (mostly) disjoint vocabularies must land near the
    ceiling; bits = nats / ln 2 up to the two independent floors."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["text_js_divergence"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.jsd_nats <= math.log(2) + 1e-4
    assert 0.0 <= r.jsd_bits <= 1.0001
    assert abs(r.jsd_bits - r.jsd_nats / math.log(2)) < 2e-4
    # the synthetic corpus draws every language from ONE shared token
    # vocabulary (vocab_union ~31 types), so the true divergence is
    # small but strictly positive — languages differ only in mixture
    # weights here, and a zero would mean the conditional counts
    # collapsed
    assert r.jsd_nats > 0.0
    assert r.vocab_union > 0


def test_ridge_path_shrinks_toward_zero(spark, sf_dir):
    """λ = 0 must reproduce the OLS slopes; slopes shrink monotonically
    in |·| as λ grows, by roughly the known Var/(Var + λ) factor for
    the (near-orthogonal) planted features."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ml_ridge_path"].fn(spark, sf_dir).collect()
    by = {r.ridge_lambda_per_row: r for r in rows}
    assert set(by) == {0, 100, 1000}
    ols = REGISTRY["ml_linreg_normal_eq"].fn(spark, sf_dir).collect()[0]
    assert abs(by[0].w_qty_cents - ols.w_qty_cents) < 0.01
    assert abs(by[0].w_disc_cents - ols.w_disc_cents) < 0.01
    q = [abs(by[k].w_qty_cents) for k in (0, 100, 1000)]
    d = [abs(by[k].w_disc_cents) for k in (0, 100, 1000)]
    assert q[0] > q[1] > q[2] > 0
    assert d[0] > d[1] > d[2] > 0
    # quantity variance ~ uniform(1..50) ≈ 208: k=1000 shrinks ~6x
    assert q[2] < 0.4 * q[0]


def test_decode_qoi_codec_compresses_and_rejects_corruption():
    """QOI round-trips bit-exactly for every shape; the op stream
    genuinely compresses the engineered raster (runs/diffs/index all
    firing — a literal-only encoder would be ~3x larger); corrupt
    signatures, truncations, and end-marker damage hard-fail."""
    from cdc_pubsub_spark.llmops.multimodal import (
        _qoi_pixels,
        _synth_qoi,
        decode_qoi,
    )

    for doc_id in range(0, 70):
        f = decode_qoi(_synth_qoi(doc_id))
        w, h = 8 + doc_id % 9, 6 + doc_id % 7
        tot = sum(sum(p) for p in _qoi_pixels(doc_id, w * h))
        assert f == {
            "width": w,
            "height": h,
            "mean_lum": tot // (w * h * 3),
        }, doc_id
    good = _synth_qoi(123)
    w, h = 8 + 123 % 9, 6 + 123 % 7
    assert len(good) < 0.5 * (14 + 8 + 3 * w * h), "compression inactive"
    for bad in (
        b"qoix" + good[4:],          # wrong magic
        good[:-8],                   # missing end marker
        good[:20],                   # truncated op stream
    ):
        try:
            decode_qoi(bad)
            raise AssertionError("corrupt QOI must raise")
        except (ValueError, IndexError):
            pass


def test_gmm_em_recovers_planted_mixture(spark, sf_dir):
    """EM must recover the planted 40/60 mixture at 5000/8000 cents:
    means within the documented soft-assignment bias (~±250 at small
    sf), sds within the cross-component-leakage band around the true
    500, and the mixing weight near 0.4 — proves the E/M loop actually
    climbs the likelihood rather than echoing its init (4000/9000)."""
    r = REGISTRY["ml_gmm_em"].fn(spark, sf_dir).collect()[0]
    assert abs(r.mu1_cents - 5000) <= 250, r
    assert abs(r.mu2_cents - 8000) <= 250, r
    assert 420 <= r.sigma1_cents <= 760, r
    assert 420 <= r.sigma2_cents <= 760, r
    assert 0.33 <= r.w1 <= 0.47, r
    assert abs(r.w1 + r.w2 - 1.0) < 1e-6, r
    assert r.iters == 5


def test_isotonic_matches_pure_python_pav(spark, sf_dir):
    """The op computes the isotonic fit via the closed-form minimax;
    this test runs the classic sequential POOL-ADJACENT-VIOLATORS
    algorithm (exact Fractions) over the same bins — two different
    algorithms must land on the same fixed point. Also pins the
    definitional invariants: monotone fit, weighted-mean preservation."""
    from fractions import Fraction

    rows = sorted(
        REGISTRY["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    # PAV over (n, pos) in bin order: merge while the last mean exceeds
    # the incoming one.
    stack = []  # (n, pos)
    for r in rows:
        n, pos = r.n_rows, r.pos
        while stack and Fraction(stack[-1][1], stack[-1][0]) >= Fraction(
            pos, n
        ):
            pn, pp = stack.pop()
            n, pos = n + pn, pos + pp
        stack.append((n, pos))
    # Expand: each pooled block's mean applies to every bin it spans.
    expanded = []
    for n, pos in stack:
        covered = 0
        while covered < n:
            covered += rows[len(expanded)].n_rows
            expanded.append(Fraction(pos, n))
    assert len(expanded) == len(rows)
    for r, frac in zip(rows, expanded):
        import math

        want = math.floor(float(frac) * 10000 + 0.5) / 10000
        assert abs(r.iso_rate - want) <= 1e-4, (r.bin, r.iso_rate, want)
    # Monotone non-decreasing fit.
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # Weighted-mean preservation (L2-projection property), within the
    # r4 output grain.
    n_total = sum(r.n_rows for r in rows)
    assert (
        abs(
            sum(r.n_rows * r.iso_rate for r in rows)
            - sum(r.pos for r in rows)
        )
        <= 1e-4 * n_total + 1
    )
    # PAV must have actually pooled something (sampling noise
    # guarantees inversions at fixture scale) — otherwise the test is
    # vacuous.
    assert len(stack) < len(rows)


def test_levenshtein_block_finds_planted_pairs(spark, sf_dir):
    """Recall on the planted corpus: every ÷10 exact copy surfaces at
    distance exactly 0 and every ÷7 suffix near-copy at distance
    exactly len(' zq extra tail') = 14; precision: nothing above the
    threshold leaks through, and pairs are canonically ordered."""
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["dedup_levenshtein_block"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.dist for r in rows}
    ids = [
        r.doc_id
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    exact = [i for i in ids if i % 10 == 0]
    near = [i for i in ids if i % 7 == 0]
    assert exact and near, "fixture must plant both dup kinds"
    for i in exact:
        assert got.get((i, i + 1000000)) == 0, i
    for i in near:
        assert got.get((i, i + 2000000)) == 14, i
    assert all(d <= 16 for d in got.values())
    assert all(a < b for (a, b) in got)


def test_decode_bmp_codec_variants_and_corruption():
    """Unit-level checks on the real BMP codec: both encodings
    round-trip the closed-form raster, RLE genuinely compresses the
    run-structured raster, and corrupted payloads (bad magic,
    truncation, delta escape, top-down height) dead-letter."""
    import struct

    import pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _bmp_dims,
        _bmp_idx8,
        _bmp_pal,
        _bmp_px24,
        _synth_bmp,
        decode_bmp,
    )

    for doc_id in (0, 1, 2, 7, 13, 40, 255, 256, 311):
        w, h = _bmp_dims(doc_id)
        d = decode_bmp(_synth_bmp(doc_id))
        if doc_id % 2 == 0:
            tot = sum(sum(_bmp_px24(doc_id, j)) for j in range(w * h))
            tl = sum(_bmp_px24(doc_id, 0))
            bpp, comp = 24, 0
        else:
            tot = sum(
                sum(_bmp_pal(_bmp_idx8(doc_id, j))) for j in range(w * h)
            )
            tl = sum(_bmp_pal(_bmp_idx8(doc_id, 0)))
            bpp, comp = 8, 1
        assert d == {
            "width": w,
            "height": h,
            "bpp": bpp,
            "compression": comp,
            "mean_lum": tot // (w * h * 3),
            "topleft_lum": tl,
        }, (doc_id, d)
    # RLE8 payload must be smaller than the raw 8-bit raster it encodes
    # (runs of 9 — if the encoder emitted literals the sizes invert).
    raw = _synth_bmp(101)
    w, h = _bmp_dims(101)
    assert len(raw) - (14 + 40 + 1024) < w * h
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + raw[2:])
    with pytest.raises(ValueError):
        decode_bmp(raw[:60])
    # delta escape (00 02) is a dead-letter
    pos = raw.index(b"\x00\x00", 14 + 40 + 1024)
    bad = bytearray(raw)
    bad[pos : pos + 2] = b"\x00\x02"
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    # top-down (negative height) dead-letters
    even = bytearray(_synth_bmp(42))
    wh = struct.unpack("<i", even[22:26])[0]
    even[22:26] = struct.pack("<i", -wh)
    with pytest.raises(ValueError):
        decode_bmp(bytes(even))


def test_readability_score_sanity(spark, sf_dir):
    """Hand-check the Flesch pipeline on the corpus: per-source scores
    must equal an independent pandas recomputation of the same
    definition (collected raw text, python floats), within the micro
    quantization grain."""
    import math

    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["text_readability"].fn(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    by_src = {}
    for d in docs:
        t = d.text
        lt = t.lower()
        sents = max(t.count(".") + t.count("!") + t.count("?"), 1)
        words = t.count(" ") + 1
        vows = sum(lt.count(v) for v in "aeiou")
        f = 206.835 - 1.015 * (words / sents) - 84.6 * (vows / words)
        fq = math.floor(f * 1000000 + 0.5)
        agg = by_src.setdefault(d.source, [0, 0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += fq
        agg[2] += 1 if fq >= 60000000 else 0
        agg[3] += words
        agg[4] += sents
        agg[5] += vows
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        n, sfq, ne, sw, ss, sv = by_src[r.source]
        assert r.n_docs == n
        assert abs(r.avg_flesch - sfq / 1e6 / n) <= 0.011, r
        assert r.share_easy == math.floor(ne / n * 10000 + 0.5) / 10000
        assert abs(r.words_per_sentence - sw / ss) <= 0.011
        assert abs(r.vowels_per_word - sv / sw) <= 0.0011


def test_exif_tiff_parser_both_endians_and_corruption():
    """Unit-level checks on the TIFF IFD walker: both byte orders
    round-trip the synthesized fields (inline SHORT left-packing,
    offset RATIONAL/ASCII), and corrupted containers (bad byte-order
    mark, wrong magic, truncated ASCII) dead-letter."""
    import pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _synth_tiff,
        _tiff_fields,
        parse_tiff_meta,
    )

    for doc_id in (0, 1, 2, 3, 13, 255, 256, 399):
        f = _tiff_fields(doc_id)
        m = parse_tiff_meta(_synth_tiff(doc_id))
        assert m == {
            "byte_order": f["byte_order"],
            "width": f["width"],
            "height": f["height"],
            "bits_per_sample": 8,
            "orientation": f["orientation"],
            "xres_dpi": f["xres_num"] // f["xres_den"],
            "taken_at": f["datetime"],
        }, (doc_id, m)
    raw = _synth_tiff(7)
    with pytest.raises(ValueError):
        parse_tiff_meta(b"XX" + raw[2:])
    bad = bytearray(raw)
    bad[2] = 43 if raw[:2] == b"II" else bad[2]
    bad[3] = 0
    with pytest.raises(ValueError):
        parse_tiff_meta(bytes(_synth_tiff(8)[:2] + b"\x2b\x00" + _synth_tiff(8)[4:]))
    with pytest.raises(ValueError):
        parse_tiff_meta(raw[:-4])  # truncated trailing ASCII value


def test_bpe_apply_consistent_with_train(spark, sf_dir):
    """The encode op must agree with the train op it re-runs: summed
    per-doc token counts equal the train op's global total, every
    compression ratio is ≤ 1, some document actually contains merge
    products, and n_tokens_before is the raw whitespace word count."""
    from cdc_pubsub_spark.tables import load

    train = REGISTRY["corpus_bpe_train"].fn(spark, sf_dir).collect()
    total_tokens = train[0].total_tokens
    rows = REGISTRY["corpus_bpe_apply"].fn(spark, sf_dir).collect()
    assert sum(r.n_tokens_after for r in rows) == total_tokens
    assert all(r.n_tokens_after <= r.n_tokens_before for r in rows)
    assert any(r.n_merged_tokens > 0 for r in rows)
    assert all(
        r.n_tokens_after + r.n_merged_tokens >= r.n_tokens_before
        for r in rows
    ), "each word-level merge replaces exactly two tokens with one"
    raw = {
        d.doc_id: len(d.text.split())
        for d in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for r in rows:
        assert r.n_tokens_before == raw[r.doc_id]


def test_feature_ablation_ranks_rule_features(spark, sf_dir):
    """The planted label is (tlen >= 280 AND the_cnt >= 2): ablating
    the features that carry that rule must cost real accuracy, while
    the dead feature x4 (val_cnt — absent from the rule) must cost
    ~nothing. Also pins acc_full to the logreg op's known quality."""
    rows = {r.feature_idx: r
            for r in REGISTRY["ml_feature_ablation"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    acc_full = rows[1].acc_full
    assert acc_full >= 0.85
    assert all(r.acc_full == acc_full for r in rows.values())
    assert rows[4].importance <= 0.02, rows[4]
    top = max(rows.values(), key=lambda r: r.importance)
    assert top.importance >= 0.04, top
    assert top.feature_idx in (1, 2, 5, 6, 7), top
    for r in rows.values():
        assert abs(r.importance - round(acc_full - r.acc_ablated, 4)) < 2e-4


def test_decode_farbfeld_roundtrip_and_corruption():
    """Codec unit test: round-trip against the closed form for both
    dims parities, 16-bit component arithmetic (values above 255 must
    survive), and corruption dead-letters (bad magic, truncation)."""
    import pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _ff_dims,
        _ff_px,
        _synth_farbfeld,
        decode_farbfeld,
    )

    for doc_id in (0, 1, 6, 13, 255, 399):
        w, h = _ff_dims(doc_id)
        m = decode_farbfeld(_synth_farbfeld(doc_id))
        tot = sum(sum(_ff_px(doc_id, j)[:3]) for j in range(w * h))
        assert m == {
            "width": w,
            "height": h,
            "mean_lum16": tot // (w * h * 3),
            "alpha_min": 65535,
        }
    assert any(
        decode_farbfeld(_synth_farbfeld(d))["mean_lum16"] > 255
        for d in range(10)
    ), "16-bit depth must actually be exercised"
    raw = _synth_farbfeld(9)
    with pytest.raises(ValueError):
        decode_farbfeld(b"xxxxxxxx" + raw[8:])
    with pytest.raises(ValueError):
        decode_farbfeld(raw[:-3])


def test_knn_regression_beats_mean_baseline(spark, sf_dir):
    """Skill check: the planted target is linear in the embedding, so
    distance-weighted kNN must predict far better than the global-mean
    baseline (MAE under half), and y_true must equal the planted
    functional recomputed from the raw vectors."""
    import math

    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["knn_regression_weighted"].fn(spark, sf_dir).collect()
    assert rows and len(rows) <= 30
    emb = {
        r.vec_id: r.embedding
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    ys = {}
    for vid, v in emb.items():
        xq = [math.floor(x * 10000 + 0.5) for x in v]
        ys[vid] = xq[0] + 2 * xq[1] - xq[2]
    for r in rows:
        assert r.y_true == ys[r.vec_id]
        assert r.abs_err == abs(r.y_true - r.y_pred)
    ref_mean = sum(ys[v] for v in ys if v >= 30) / sum(
        1 for v in ys if v >= 30
    )
    base_mae = sum(abs(ys[r.vec_id] - ref_mean) for r in rows) / len(rows)
    knn_mae = sum(r.abs_err for r in rows) / len(rows)
    assert knn_mae < 0.5 * base_mae, (knn_mae, base_mae)


def test_audio_vad_codec_and_planted_layout():
    """Unit-level checks on the VAD kernel: real RIFF parse, frame
    energies, run-length fusion — the planted 64-sample alternation
    means segment counts are a closed form; corruption dead-letters."""
    import pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _synth_wav_vad,
        _vad_n_samples,
        vad_segments,
    )

    for doc_id in (0, 1, 2, 3, 17, 255, 398):
        n = _vad_n_samples(doc_id)
        nf = n // 16
        exp_active = [((f * 16) // 64) % 2 == 1 for f in range(nf)]
        segs = []
        run = 0
        for a in exp_active + [False]:
            if a:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        m = vad_segments(_synth_wav_vad(doc_id))
        assert m == {
            "n_frames": nf,
            "n_active": sum(exp_active),
            "n_segments": len(segs),
            "longest_segment": max(segs) if segs else 0,
        }, (doc_id, m)
        assert m["n_segments"] >= 2, "fixture must plant multiple segments"
        assert m["longest_segment"] == 4, "blocks are exactly 4 frames"
    raw = _synth_wav_vad(5)
    with pytest.raises(ValueError):
        vad_segments(b"RIFX" + raw[4:])
    with pytest.raises(ValueError):
        vad_segments(raw[:40])


def test_uuid_v3_python_replication_and_rfc_shape(spark, sf_dir):
    """Mint the same UUIDs in pure Python (md5 of the same names, same
    nibble surgery) and compare the per-variant aggregates exactly;
    RFC shape pins: version nibble 3 everywhere, all 36-char
    wellformed, minting injective."""
    import hashlib
    from collections import defaultdict

    from cdc_pubsub_spark.tables import load

    keys = [r.o_orderkey for r in
            load(spark, sf_dir, "orders").select("o_orderkey").collect()]
    agg = defaultdict(lambda: [0, set()])
    for k in keys:
        h = hashlib.md5(f"cdc:orders:{k}".encode()).hexdigest()
        variant = "89ab"[int(h[16], 16) % 4]
        uuid = (f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-{variant}{h[17:20]}"
                f"-{h[20:32]}")
        a = agg[variant]
        a[0] += 1
        a[1].add(uuid)
    rows = {r.variant_nibble: r for r in
            REGISTRY["fn_uuid_v3"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for v, (n, uuids) in agg.items():
        r = rows[v]
        assert r.n == n and r.n_distinct == len(uuids) == n
        assert r.n_version3 == n and r.n_wellformed == n
        assert r.sample_uuid == min(uuids)


def test_srt_round_trip_on_handcrafted_cue(spark):
    """Pin the timestamp render and parse offsets on a handcrafted
    millisecond value (1h02m03.456s) — independent of the fixture
    round trip the oracle certifies."""
    row = spark.sql(
        "SELECT concat(lpad(CAST(MS div 3600000 AS STRING), 2, '0'), ':',"
        " lpad(CAST(MS div 60000 % 60 AS STRING), 2, '0'), ':',"
        " lpad(CAST(MS div 1000 % 60 AS STRING), 2, '0'), ',',"
        " lpad(CAST(MS % 1000 AS STRING), 3, '0')) AS ts"
        " FROM (SELECT 3723456 AS MS)"
    ).collect()[0]
    assert row.ts == "01:02:03,456"
    back = spark.sql(
        "SELECT CAST(substring(ts, 1, 2) AS BIGINT) * 3600000"
        " + CAST(substring(ts, 4, 2) AS BIGINT) * 60000"
        " + CAST(substring(ts, 7, 2) AS BIGINT) * 1000"
        " + CAST(substring(ts, 10, 3) AS BIGINT) AS ms"
        " FROM (SELECT '01:02:03,456' AS ts)"
    ).collect()[0]
    assert back.ms == 3723456
    rows = REGISTRY["multimodal_subtitle_srt"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:50]:
        assert 3 <= r.n_cues <= 5
        assert 0 < r.speech_ratio <= 1.0
        assert r.speech_ms <= r.last_end_ms


def test_conformal_coverage_guarantee(spark, sf_dir):
    """The conformal guarantee is finite-sample and distribution-free:
    realized test coverage must sit in the [0.9 − slack, 1] band
    (slack from calibration-sample noise); the fit must recover the
    planted coefficients; q_hat must be consistent with the planted
    ±1000 noise plus model error."""
    r = REGISTRY["ml_conformal_interval"].fn(spark, sf_dir).collect()[0]
    assert r.n_train > r.n_cal > 0 and r.n_test > 0
    total = r.n_train + r.n_cal + r.n_test
    assert 0.5 < r.n_train / total < 0.7
    assert abs(r.w0 - 50000) < 300, r
    assert abs(r.w1 - 300) < 30, r
    assert abs(r.w2 - 1200) < 30, r
    import math

    slack = 2.0 / math.sqrt(r.n_cal)
    assert 0.9 - slack <= r.coverage <= 1.0, (r.coverage, slack)
    assert 700 <= r.q_hat <= 1200, r.q_hat
    assert r.target_coverage == 0.9


def test_kneser_ney_matches_python_replication(spark, sf_dir):
    """Full pure-Python KN replication from an independent DuckDB word
    stream: same 25% training sample, same discount/backoff algebra,
    same micro-quantized negative log-likelihoods — per-source
    perplexities must match exactly at the r2 grain."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    docs = con.sql(
        "SELECT doc_id, source, trim(text)"
        f" FROM read_parquet('{sf_dir}/documents.parquet')"
        " WHERE length(trim(text)) > 0"
    ).fetchall()
    cbg = defaultdict(int)
    allbg = []
    for doc_id, source, t in docs:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            pair = (ws[i], ws[i + 1])
            allbg.append((source, pair))
            if doc_id % 4 == 0:
                cbg[pair] += 1
    cw1 = defaultdict(int)
    ntypes = defaultdict(int)
    nleft = defaultdict(int)
    for (w1, w2), c in cbg.items():
        cw1[w1] += c
        ntypes[w1] += 1
        nleft[w2] += 1
    total_types = len(cbg)
    D = 0.75
    agg = defaultdict(lambda: [0, 0])
    for source, (w1, w2) in allbg:
        if (w1, w2) in cbg:
            p = (cbg[(w1, w2)] - D) / cw1[w1] + D * ntypes[w1] / cw1[
                w1
            ] * nleft.get(w2, 0) / total_types
        elif w1 in cw1:
            p = D * ntypes[w1] / cw1[w1] * max(
                nleft.get(w2, 0) / total_types, 1e-9
            )
        else:
            p = 1e-6
        q = math.floor(-math.log(p) * 1000000 + 0.5)
        a = agg[source]
        a[0] += 1
        a[1] += q
    rows = REGISTRY["text_lm_kneser_ney"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        n, sq = agg[r.source]
        assert r.n_bigrams == n
        want = math.floor(math.exp(sq / (1000000.0 * n)) * 100 + 0.5) / 100
        assert r.kn_perplexity == want, (r.source, r.kn_perplexity, want)
        assert r.kn_perplexity > 1.0


def test_id3v1_codec_version_dispatch_and_corruption():
    """Unit checks on the ID3 parser: v1.1 round-trip, the v1.0
    full-width-comment dispatch (track must come back 0), and
    corruption dead-letters (short payload, missing magic)."""
    import pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _id3_fields,
        _synth_id3v1,
        parse_id3v1,
    )

    for d in (0, 7, 39, 255, 400):
        f = _id3_fields(d)
        m = parse_id3v1(_synth_id3v1(d))
        assert m["artist"] == f["artist"] and m["track"] == f["track"]
        assert m["year"] == int(f["year"]) and m["genre"] == f["genre"]
    # v1.0-style tag: 30-byte comment with no NUL at byte 28 -> track 0
    raw = bytearray(_synth_id3v1(3))
    raw[-31:-1] = b"a full thirty byte comment xyz"
    m = parse_id3v1(bytes(raw))
    assert m["track"] == 0
    assert m["comment"].startswith("a full thirty byte comment")
    with pytest.raises(ValueError):
        parse_id3v1(b"\x00" * 100)
    bad = bytearray(_synth_id3v1(4))
    bad[-128:-125] = b"XXX"
    with pytest.raises(ValueError):
        parse_id3v1(bytes(bad))


def test_levenshtein_block_star_cap_on_hot_block(spark, tmp_path):
    """The r10 pair-emission cap: a planted 12-member hot block (> the
    8-member cap) must emit STAR pairs only — every row anchored at the
    block's min doc_id, n-1 rows, never the 66 all-pairs — while a
    3-member block keeps exact all-pairs; and the DuckDB oracle applies
    the IDENTICAL cap on the same planted fixture (no shipped sf ever
    exceeds 6 members, so parity on the capped path needs this planted
    corpus). Ids avoid the %10/%7 dup-corpus multiples so the corpus is
    exactly the planted docs."""
    import duckdb

    big_ids = [11, 13, 23, 29, 31, 37, 41, 43, 53, 59, 61, 67]
    small_ids = [71, 73, 79]
    big_prefix = "B" * 40
    small_prefix = "S" * 40
    rows = [
        (i, f"{big_prefix} tail {chr(97 + k)}", "en", "synth", 0)
        for k, i in enumerate(big_ids)
    ] + [
        (i, f"{small_prefix} tail {chr(97 + k)}", "en", "synth", 0)
        for k, i in enumerate(small_ids)
    ]
    rows = [(i, t, lg, s, len(t)) for (i, t, lg, s, _) in rows]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    fixture = str(tmp_path / "fixture")
    df.coalesce(1).write.parquet(fixture + "/documents.parquet")

    out = REGISTRY["dedup_levenshtein_block"].fn(spark, fixture).toPandas()
    got = {(a, b): d for a, b, d in zip(out.doc_a, out.doc_b, out.dist)}
    star = {(a, b) for (a, b) in got if a in big_ids or b in big_ids}
    assert star == {(11, i) for i in big_ids[1:]}, star
    allp = {(a, b) for (a, b) in got if a in small_ids}
    assert allp == {(71, 73), (71, 79), (73, 79)}, allp
    assert all(0 <= d <= 16 for d in got.values())

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fixture}/documents.parquet/*.parquet')"
    )
    oracle = con.sql(REGISTRY["dedup_levenshtein_block"].oracle).df()
    cols = sorted(out.columns)
    assert cols == sorted(oracle.columns)
    s = sorted(map(str, out[cols].round(4).itertuples(index=False, name=None)))
    d = sorted(
        map(str, oracle[cols].round(4).itertuples(index=False, name=None))
    )
    assert s == d, "capped-path oracle parity broken on the planted corpus"
